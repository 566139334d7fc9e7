"""Semantic pins for the round-6c operators (the oracle harness in
test_oracle.py covers the cross-engine differential; these pin the
properties a single fixture draw can't witness):

- minhash-md5: identical texts pair at jaccard == mh_est == 1.0, and
  every emitted pair's exact Jaccard recomputes independently;
- url dedup: canonicalization invariants (no port/fragment/utm/slash
  residue, lowercase, keep-first winner);
- chunking: stride arithmetic, full coverage, fingerprints recompute
  from the raw text;
- stratified split: partition of the corpus, deterministic, ~80/10/10
  globally;
- int8 quantization: code_sum/code_fp recompute from numpy float64
  (independent of both engines);
- linear interpolation: unmasked rows pass through, masked rows match
  a pandas lerp;
- reservoir sample: exactly the K hash-smallest rows per group.
"""

from __future__ import annotations

import hashlib
import math
import os

import numpy as np
import pandas as pd

from lsd_spark.registry import QUERIES, load_all
from tests.conftest import SF_DIR

load_all()


def test_minhash_md5_identical_docs_pair(spark, tmp_path):
    base = " ".join(f"w{i}" for i in range(30))
    other = " ".join(f"z{i}" for i in range(30))
    rows = [(1, base), (2, base), (3, other)]
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
        os.path.join(tmp_path, "documents.parquet")
    )
    out = QUERIES["llm_dedup_minhash_md5"](spark, str(tmp_path)).toPandas()
    got = {(r.doc_a, r.doc_b): (r.jaccard, r.mh_est) for r in out.itertuples(index=False)}
    assert got == {(1, 2): (1.0, 1.0)}


def _shingles(text: str) -> set[str]:
    t = text.split(" ")
    hi = max(len(t) - 2, 1)
    return {" ".join(t[i : i + 3]) for i in range(hi)}


def test_minhash_md5_jaccard_recomputes(spark):
    out = QUERIES["llm_dedup_minhash_md5"](spark, SF_DIR).toPandas()
    assert len(out) > 0, "fixture produced no near-dup pairs"
    docs = pd.read_parquet(os.path.join(SF_DIR, "documents.parquet"))
    text = dict(zip(docs.doc_id, docs.text))
    for r in out.itertuples(index=False):
        sa, sb = _shingles(text[r.doc_a]), _shingles(text[r.doc_b])
        want = round(len(sa & sb) / len(sa | sb), 4)
        assert abs(r.jaccard - want) < 1e-9
        assert 0.0 <= r.mh_est <= 1.0


def test_url_dedup_canonical_invariants(spark):
    out = QUERIES["llm_dedup_url"](spark, SF_DIR).toPandas()
    assert len(out) > 0
    assert (out.n_docs > 1).all()
    for u in out.canonical_url:
        assert u == u.lower()
        assert ":443" not in u and "#" not in u and "utm_" not in u
        assert not u.endswith("/") and not u.endswith("?")
        assert u.startswith("https://www.example.com/")


def test_chunk_docs_coverage_and_fps(spark):
    from lsd_spark.llm.packing import CHUNK_LEN, CHUNK_STRIDE

    out = QUERIES["llm_chunk_docs"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet(os.path.join(SF_DIR, "documents.parquet"))
    text = dict(zip(docs.doc_id, docs.text))
    nch = dict(zip(docs.doc_id, docs.n_chars))
    # stride arithmetic + count per doc
    for doc_id, g in out.groupby("doc_id"):
        starts = g.start_pos.sort_values().to_numpy()
        assert starts[0] == 1
        assert ((starts[1:] - starts[:-1]) == CHUNK_STRIDE).all()
        n = nch[doc_id]
        want_last = max(n - (CHUNK_LEN - CHUNK_STRIDE), 1)
        assert starts[-1] + CHUNK_STRIDE > want_last  # no missing tail chunk
        # coverage: last chunk reaches the end of the doc
        assert starts[-1] + CHUNK_LEN - 1 >= n
    # fingerprints recompute from the raw text (sample)
    for r in out.head(50).itertuples(index=False):
        chunk = text[r.doc_id][r.start_pos - 1 : r.start_pos - 1 + CHUNK_LEN]
        assert r.chunk_len == len(chunk)
        assert r.chunk_fp == hashlib.md5(chunk.encode()).hexdigest()


def test_split_stratified_partitions_corpus(spark):
    out = QUERIES["llm_split_stratified"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet(os.path.join(SF_DIR, "documents.parquet"))
    assert out.n_docs.sum() == len(docs)
    assert out.n_chars.sum() == docs.n_chars.sum()
    shares = out.groupby("split").n_docs.sum() / len(docs)
    assert 0.70 <= shares["train"] <= 0.90
    assert shares.get("val", 0) > 0 and shares.get("test", 0) > 0
    # deterministic: a second build returns identical rows
    again = QUERIES["llm_split_stratified"](spark, SF_DIR).toPandas()
    pd.testing.assert_frame_equal(out, again)


def test_embed_quantize_recomputes_in_numpy(spark):
    from lsd_spark.llm.simsearch import QUANT_LEVELS

    out = QUERIES["llm_embed_quantize"](spark, SF_DIR).toPandas()
    emb = pd.read_parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    vecs = dict(zip(emb.vec_id, emb.embedding))
    assert len(out) == len(emb)
    for r in out.itertuples(index=False):
        e = np.asarray(vecs[r.vec_id], dtype=np.float64)
        mn, mx = e.min(), e.max()
        if mx > mn:
            q = np.floor((e - mn) * QUANT_LEVELS / (mx - mn) + 0.5).astype(np.int64)
        else:
            q = np.zeros(len(e), dtype=np.int64)
        assert (q >= 0).all() and (q <= QUANT_LEVELS).all()
        assert r.code_sum == q.sum()
        fp = hashlib.md5(",".join(str(int(x)) for x in q).encode()).hexdigest()
        assert r.code_fp == fp


def test_interpolate_linear_semantics(spark):
    from lsd_spark.operators.windows import INTERP_MASK_MOD

    out = QUERIES["win_interpolate_linear"](spark, SF_DIR).toPandas()
    ev = pd.read_parquet(os.path.join(SF_DIR, "events.parquet"))
    assert len(out) == len(ev)
    assert (out.was_masked == (out.event_id % INTERP_MASK_MOD == 0)).all()
    val = dict(zip(ev.event_id, ev.value))
    # unmasked rows pass through (rounded)
    um = out[~out.was_masked]
    for r in um.head(200).itertuples(index=False):
        assert math.isclose(r.value_filled, round(val[r.event_id], 4), abs_tol=1e-9)
    # masked rows: recompute the lerp in pandas per user
    ev = ev.assign(t_us=ev.ts.astype("int64") // 1000)
    ev = ev.sort_values(["user_id", "t_us", "event_id"])
    checked = 0
    for _, g in ev.groupby("user_id"):
        ids = g.event_id.to_numpy()
        ts = g.t_us.to_numpy()
        vs = g.value.to_numpy()
        masked = ids % INTERP_MASK_MOD == 0
        for i in np.nonzero(masked)[0]:
            prev = [j for j in range(i) if not masked[j]]
            nxt = [j for j in range(i + 1, len(ids)) if not masked[j]]
            if prev and nxt:
                p, n = prev[-1], nxt[0]
                want = vs[p] + (vs[n] - vs[p]) * (ts[i] - ts[p]) / (ts[n] - ts[p])
            elif prev:
                want = vs[prev[-1]]
            elif nxt:
                want = vs[nxt[0]]
            else:
                continue
            got = out.loc[out.event_id == ids[i], "value_filled"].iloc[0]
            assert math.isclose(got, round(want, 4), abs_tol=1e-9)
            checked += 1
        if checked > 50:
            break
    assert checked > 0


def test_reservoir_sample_is_hash_smallest(spark):
    from lsd_spark.operators.aggregates import RESERVOIR_K

    out = QUERIES["agg_sample_reservoir"](spark, SF_DIR).toPandas()
    ev = pd.read_parquet(os.path.join(SF_DIR, "events.parquet"))
    ev = ev.assign(
        h=[hashlib.md5(f"{i}|rsv".encode()).hexdigest() for i in ev.event_id]
    )
    for et, g in ev.groupby("event_type"):
        want = set(
            g.sort_values(["h", "event_id"]).head(RESERVOIR_K).event_id
        )
        got = set(out.loc[out.event_type == et, "event_id"])
        assert got == want, f"{et}: sample membership diverged"
        assert len(got) == min(RESERVOIR_K, len(g))


def test_mm_phash_dedup_groups_match_exact_text_groups(spark):
    """The image derives from md5(text), so docs with identical text
    MUST share a pHash group; and every reported group has >1 member
    with keep_id == min member."""
    out = QUERIES["mm_phash_dedup"](spark, SF_DIR).toPandas()
    assert len(out) > 0
    assert (out.n_images > 1).all()
    docs = pd.read_parquet(os.path.join(SF_DIR, "documents.parquet"))
    # exact-duplicate texts -> identical digest -> identical image
    dup_texts = docs.groupby("text").doc_id.agg(["count", "min"])
    dup_texts = dup_texts[dup_texts["count"] > 1]
    assert dup_texts["count"].sum() <= out.n_images.sum()


def test_knn_ivf_sq8_close_to_ivf_raw(spark):
    """SQ8 refine ranks on reconstructed vectors: same buckets as
    knn_ivf, similar (not identical) top-k — at 8-bit resolution the
    neighbor overlap per query should be high."""
    raw = QUERIES["knn_ivf"](spark, SF_DIR).toPandas()
    sq8 = QUERIES["knn_ivf_sq8"](spark, SF_DIR).toPandas()
    assert set(sq8.vec_id) == set(raw.vec_id)
    overlaps = []
    for q in sorted(set(raw.vec_id)):
        a = set(raw.loc[raw.vec_id == q, "neighbor_id"])
        b = set(sq8.loc[sq8.vec_id == q, "neighbor_id"])
        overlaps.append(len(a & b) / len(a))
    assert sum(overlaps) / len(overlaps) >= 0.6, overlaps


def test_dedup_cluster_is_transitive_closure_of_pairs(spark):
    """Clusters == connected components of the thresholded MinHash
    pair graph (recomputed in pure python union-find)."""
    pairs = QUERIES["llm_dedup_minhash_md5"](spark, SF_DIR).toPandas()
    out = QUERIES["llm_dedup_cluster"](spark, SF_DIR).toPandas()
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs.doc_a, pairs.doc_b):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps = {}
    for n in parent:
        comps.setdefault(find(n), []).append(n)
    want = {
        (cid, len(m), hashlib.md5(",".join(map(str, sorted(m))).encode()).hexdigest())
        for cid, m in comps.items()
        if len(m) > 1
    }
    got = {(r.cluster_id, r.n_docs, r.member_fp) for r in out.itertuples(index=False)}
    assert got == want


def test_win_ewma_recomputes_in_pandas(spark):
    from lsd_spark.operators.windows import EWMA_ALPHA, EWMA_W

    out = QUERIES["win_ewma"](spark, SF_DIR).toPandas()
    ev = pd.read_parquet(os.path.join(SF_DIR, "events.parquet"))
    assert len(out) == len(ev)
    ev = ev.assign(t_us=ev.ts.astype("int64") // 1000)
    got = dict(zip(out.event_id, out.ewma))
    checked = 0
    for _, g in ev.groupby("user_id"):
        g = g.sort_values(["t_us", "event_id"])
        vals = g.value.to_numpy()
        ids = g.event_id.to_numpy()
        for i in range(len(vals)):
            lo = max(0, i - EWMA_W + 1)
            window = vals[lo : i + 1][::-1]  # most recent first
            ws = [EWMA_ALPHA**k for k in range(len(window))]
            want = round(sum(w * v for w, v in zip(ws, window)) / sum(ws), 4)
            assert math.isclose(got[ids[i]], want, abs_tol=1e-9), (ids[i], got[ids[i]], want)
            checked += 1
        if checked > 300:
            break
    assert checked > 0

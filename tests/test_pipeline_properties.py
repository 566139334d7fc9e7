"""Independent re-implementations (numpy/pandas — neither Spark nor
DuckDB) of packing and spatial matching, compared exactly at
sf0.001: a third opinion beyond the oracle harness."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from lsd_spark.registry import QUERIES, load_all

load_all()

SF = "/root/testdata/sf0.001"


def test_pack_sequences_matches_pandas_reimpl(spark):
    from lsd_spark.llm.packing import N_SHARDS, TOKEN_BUDGET

    got = QUERIES["llm_pack_sequences"](spark, SF).toPandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "text"]]
    docs["n_tokens"] = docs["text"].map(lambda t: len(t.split(" ")))
    docs["shard"] = docs["doc_id"] % N_SHARDS
    docs = docs.sort_values("doc_id")
    docs["cum"] = docs.groupby("shard")["n_tokens"].cumsum()
    docs["bin_id"] = docs["shard"] * 100000 + (docs["cum"] - docs["n_tokens"]) // TOKEN_BUDGET
    exp = docs[["doc_id", "shard", "bin_id", "n_tokens"]].reset_index(drop=True)
    got = got.sort_values("doc_id").reset_index(drop=True).astype("int64")
    pd.testing.assert_frame_equal(got, exp.astype("int64"))


def _coords(event_ids):
    xs, ys = [], []
    for e in event_ids:
        hx = int(hashlib.md5(f"{e}x".encode()).hexdigest()[:15], 16) % 100000
        hy = int(hashlib.md5(f"{e}y".encode()).hexdigest()[:15], 16) % 100000
        xs.append(hx / 1000.0)
        ys.append(hy / 1000.0)
    return np.array(xs), np.array(ys)


def test_xmatch_2d_matches_numpy_brute_force(spark):
    from lsd_spark.plans.spatial import RADIUS

    got = {
        (r.l_id, r.r_id) for r in QUERIES["join_xmatch_2d"](spark, SF).collect()
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")[["event_id", "event_type"]]
    p = ev[ev.event_type == "purchase"]["event_id"].to_numpy()
    c = ev[ev.event_type == "click"]["event_id"].to_numpy()
    px, py = _coords(p)
    cx, cy = _coords(c)
    d = np.sqrt((px[:, None] - cx[None, :]) ** 2 + (py[:, None] - cy[None, :]) ** 2)
    exp = set()
    for i in range(len(p)):
        within = np.where(d[i] <= RADIUS)[0]
        if len(within):
            # nearest with (dist, r_id) tiebreak — same rule as the op
            order = sorted(within, key=lambda j: (d[i, j], c[j]))
            exp.add((int(p[i]), int(c[order[0]])))
    assert got == exp

def test_interval_overlap_matches_numpy_brute_force(spark):
    got = {
        (r.l_id, r.n_overlaps)
        for r in QUERIES["join_interval_overlap"](spark, SF).collect()
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")[["event_id", "event_type", "ts"]]
    # resolution-agnostic epoch µs (testdata has shipped ts as both
    # TIMESTAMP(NANOS) and TIMESTAMP(MICROS))
    ev["us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    ev["dur"] = (5 + ev["event_id"] % 25) * 60_000_000
    p = ev[ev.event_type == "purchase"]
    c = ev[ev.event_type == "click"]
    ls, le = p["us"].to_numpy(), (p["us"] + p["dur"]).to_numpy()
    rs, re = c["us"].to_numpy(), (c["us"] + c["dur"]).to_numpy()
    overlap = (ls[:, None] < re[None, :]) & (rs[None, :] < le[:, None])
    counts = overlap.sum(axis=1)
    exp = {
        (int(eid), int(n))
        for eid, n in zip(p["event_id"].to_numpy(), counts)
        if n > 0
    }
    assert got == exp


def test_winnowing_guarantee_on_near_dups(spark):
    """Winnowing's contract: any two docs sharing a run of at least
    K+W-1 words share at least one selected fingerprint. The
    llm_dedup_edit pairs share a 50-char prefix (> 8 words here), so
    every such pair must collide in fingerprint space."""
    pairs = [(r.doc_a, r.doc_b) for r in QUERIES["llm_dedup_edit"](spark, SF).collect()]
    if not pairs:
        return  # no near-dups at this SF: vacuous
    fps: dict[int, set] = {}
    for r in QUERIES["llm_winnowing"](spark, SF).collect():
        fps.setdefault(r.doc_id, set()).add(r.fp)
    docs = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "text"]]
    text = dict(zip(docs.doc_id, docs.text))
    checked = 0
    for a, b in pairs:
        # the guarantee applies only when the shared WORD run is
        # >= K+W-1 = 8 complete words (a 50-char prefix can split
        # mid-word, making the true shared run shorter)
        wa, wb = text[a].split(" "), text[b].split(" ")
        shared = 0
        for x, y in zip(wa, wb):
            if x != y:
                break
            shared += 1
        if shared < 8:
            continue
        checked += 1
        assert fps.get(a, set()) & fps.get(b, set()), (a, b, shared)
    assert checked > 0  # the fixture's near-dups do include long runs

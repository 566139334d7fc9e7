"""Source/sink and streaming parity tests (consolidated from the
round-4..7 files in round 10): CDC, SCD2, partition overwrite,
format roundtrips, stream==batch equivalences."""


from __future__ import annotations


import numpy as np
import pandas as pd
from tests.conftest import SF_DIR
import hashlib
import os
from lsd_spark.registry import QUERIES, load_all
import math
from collections import Counter


load_all()


SF_SMALL = "/root/testdata/sf0.001"


def _events() -> pd.DataFrame:
    ev = pd.read_parquet(os.path.join(SF_DIR, "events.parquet"))
    # events.parquet is TIMESTAMP(NANOS); mirror catalog.load's
    # microsecond truncation (robust to pandas reading ns OR us units)
    ev["t_us"] = ev.ts.astype("datetime64[us]").astype("int64")
    return ev


def _docs() -> pd.DataFrame:
    return pd.read_parquet(os.path.join(SF_DIR, "documents.parquet"))


def test_scd2_intervals_partition_each_users_timeline(spark):
    from lsd_spark.registry import QUERIES, load_all

    load_all()
    got = QUERIES["merge_scd2"](spark, SF_SMALL).toPandas()
    for uid, g in got.groupby("user_id"):
        g = g.sort_values("version")
        assert list(g.version) == list(range(1, len(g) + 1))
        assert g.is_current.sum() == 1 and g.iloc[-1].is_current == 1
        # contiguous validity: each row's valid_to is the next valid_from
        assert (
            g.valid_to_us.iloc[:-1].to_numpy() == g.valid_from_us.iloc[1:].to_numpy()
        ).all()
        assert pd.isna(g.valid_to_us.iloc[-1])
        # change records: no two consecutive versions share a type
        types = list(g.event_type)
        assert all(a != b for a, b in zip(types, types[1:]))


def test_jsonl_roundtrip_counts(spark):
    out = QUERIES["source_jsonl_import"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet(os.path.join(SF_DIR, "documents.parquet"))
    by_src = docs.groupby("source").agg(cnt=("doc_id", "size"), tc=("n_chars", "sum"))
    got = out.set_index("source")
    assert (got.cnt == by_src.cnt.reindex(got.index)).all()
    assert (got.total_chars == by_src.tc.reindex(got.index)).all()
    fp = docs.assign(
        h=[int(hashlib.md5(t.encode()).hexdigest()[:8], 16) for t in docs.text]
    ).groupby("source").h.sum()
    assert (got.text_fp == fp.reindex(got.index)).all()


def test_bloom_prune_no_false_negatives_and_bounded_fp(spark):
    out = QUERIES["join_bloom_prune"](spark, SF_DIR).toPandas()
    orders = pd.read_parquet(os.path.join(SF_DIR, "orders.parquet"))
    cust = pd.read_parquet(os.path.join(SF_DIR, "customer.parquet"))
    build = set(orders[orders.o_totalprice > 490_000.0].o_custkey)
    passed = set(out.c_custkey)
    # Bloom guarantee: zero false negatives
    assert build <= passed
    # in_build labeling is the exact membership truth
    assert set(out[out.in_build == 1].c_custkey) == build
    fp = out[out.in_build == 0]
    non_members = len(set(cust.c_custkey) - build)
    # design envelope: (1 - e^(-k n / m))^k with k=3, m=4096, padded 4x
    n, m, k = len(build), 4096, 3
    fpp = (1 - np.exp(-k * n / m)) ** k
    assert len(fp) <= max(8, 4 * fpp * non_members)


def test_referential_audit_detects_orphans(spark, tmp_path):
    """On the pristine fixture all orphan counts are 0; on a crafted
    copy with a deleted parent and a NULL fk the audit must report
    exactly the injected damage."""
    out = QUERIES["agg_referential_audit"](spark, SF_DIR).toPandas()
    assert (out.n_orphan == 0).all()
    import shutil

    d = tmp_path / "broken"
    d.mkdir()
    for t in (
        "lineitem orders customer nation region supplier part events "
        "documents embeddings".split()
    ):
        shutil.copy(os.path.join(SF_DIR, f"{t}.parquet"), d / f"{t}.parquet")
    nat = pd.read_parquet(d / "nation.parquet")
    dropped = nat.n_nationkey.iloc[0]
    nat[nat.n_nationkey != dropped].to_parquet(d / "nation.parquet", index=False)
    cust = pd.read_parquet(d / "customer.parquet")
    n_orph_cust = int((cust.c_nationkey == dropped).sum())
    cust.loc[cust.index[:3], "c_nationkey"] = None
    n_orph_cust -= int(
        (pd.read_parquet(os.path.join(SF_DIR, "customer.parquet"))
         .c_nationkey.iloc[:3] == dropped).sum()
    )
    cust.to_parquet(d / "customer.parquet", index=False)
    from lsd_spark.registry import clear_plan_cache

    clear_plan_cache()
    try:
        broken = QUERIES["agg_referential_audit"](spark, str(d)).toPandas()
    finally:
        clear_plan_cache()
    row = broken[broken.fk_edge == "customer.c_nationkey"].iloc[0]
    assert int(row.n_null) == 3
    assert int(row.n_orphan) == n_orph_cust
    assert int(row.n_orphan) > 0


def test_cdc_apply_delete_wins_over_update(spark):
    out = QUERIES["merge_cdc_apply"](spark, SF_DIR).toPandas()
    cust = pd.read_parquet(os.path.join(SF_DIR, "customer.parquet"))
    keys = set(cust.c_custkey)
    got = set(out.c_custkey)
    # terminal deletes remove the key — INCLUDING keys updated at seq 1
    deleted = {k for k in keys if k % 15 == 0}
    assert not (got & deleted)
    assert any(k % 30 == 0 for k in deleted)  # the update-then-delete case
    # inserts present, updates applied, untouched rows intact
    inserted = {k + 2000000 for k in keys if k % 23 == 0}
    assert inserted <= got
    bal = dict(zip(out.c_custkey, out.acctbal_cents))
    for _, c in cust.iterrows():
        k = c.c_custkey
        if k % 15 == 0:
            continue
        expect = c.c_acctbal + 50 if k % 10 == 0 else c.c_acctbal
        assert bal[k] == math.floor(expect * 100 + 0.5)
    for k in inserted:
        assert bal[k] == 0


def test_partition_overwrite_replaces_only_target(spark):
    out = QUERIES["sink_partition_overwrite"](spark, SF_DIR).toPandas()
    ev = _events()
    base = ev.groupby("event_type").size()
    for _, r in out.iterrows():
        if r.event_type == "click":
            assert r.cnt == 2 * base["click"]
        else:
            assert r.cnt == base[r.event_type]


def test_orc_roundtrip_fingerprint(spark):
    out = QUERIES["source_orc_roundtrip"](spark, SF_DIR).toPandas()
    cust = pd.read_parquet(os.path.join(SF_DIR, "customer.parquet"))
    assert out.n_rows.iloc[0] == len(cust)
    assert out.n_keys.iloc[0] == cust.c_custkey.nunique()
    chain = "".join(
        hashlib.md5(n.encode()).hexdigest()
        for n in cust.sort_values("c_custkey").c_name
    )
    assert out.name_fp.iloc[0] == hashlib.md5(chain.encode()).hexdigest()


def test_file_manifest_disjoint_and_total(spark):
    out = QUERIES["sink_file_manifest"](spark, SF_DIR).toPandas()
    od = pd.read_parquet(os.path.join(SF_DIR, "orders.parquet"))
    assert out.n_rows.sum() == len(od)
    prev_max = -1
    for _, r in out.sort_values("bucket").iterrows():
        assert r.bucket * 4096 <= r.min_key <= r.max_key < (r.bucket + 1) * 4096
        assert r.min_key > prev_max  # file ranges disjoint => skippable
        prev_max = r.max_key


def test_stream_parquet_sink_equals_batch(spark):
    out = QUERIES["stream_parquet_sink"](spark, SF_DIR).toPandas()
    ev = _events()
    ev["v_m"] = np.floor(ev.value * 1000 + 0.5).astype("int64")
    exp = ev.groupby("event_type").agg(cnt=("event_id", "size"), s=("v_m", "sum"))
    for _, r in out.iterrows():
        assert r.cnt == exp.loc[r.event_type, "cnt"]
        assert r.sum_milli == exp.loc[r.event_type, "s"]
    assert out.cnt.sum() == len(ev)


def test_csv_malformed_quarantine_split(spark):
    out = QUERIES["source_csv_malformed"](spark, SF_DIR).toPandas()
    docs = _docs()
    corrupt = docs.doc_id % 13 == 0
    exp = docs.groupby("lang").apply(
        lambda s: pd.Series(
            {
                "g": int((s.doc_id % 13 != 0).sum()),
                "b": int((s.doc_id % 13 == 0).sum()),
                "ch": int(s[s.doc_id % 13 != 0].n_chars.sum()),
            }
        ),
        include_groups=False,
    )
    for _, r in out.iterrows():
        assert r.n_good == exp.loc[r.lang, "g"]
        assert r.n_corrupt == exp.loc[r.lang, "b"]
        assert r.chars_good == exp.loc[r.lang, "ch"]
    assert out.n_corrupt.sum() == int(corrupt.sum())
    assert out.n_corrupt.sum() > 0


def test_stream_topk_matches_batch_rank(spark):
    out = QUERIES["stream_topk_windowed"](spark, SF_DIR).toPandas()
    out["win_start"] = pd.to_datetime(out.win_start).astype("datetime64[ns]")
    ev = _events()
    win = pd.to_datetime(ev.t_us, unit="us").dt.floor("h")
    cnt = (
        pd.DataFrame({"w": win, "t": ev.event_type})
        .groupby(["w", "t"])
        .size()
        .reset_index(name="cnt")
    )
    for w, sub in cnt.groupby("w"):
        top = sub.sort_values(["cnt", "t"], ascending=[False, True]).head(3)
        got = out[out.win_start == w].sort_values("rk")
        assert list(got.event_type) == list(top.t)
        assert list(got.cnt) == list(top.cnt)
        assert list(got.rk) == list(range(1, len(top) + 1))


def test_lateral_topn_equals_window_rank(spark):
    out = QUERIES["join_lateral_topn"](spark, SF_DIR).toPandas()
    cust = pd.read_parquet(os.path.join(SF_DIR, "customer.parquet"))
    nat = pd.read_parquet(os.path.join(SF_DIR, "nation.parquet"))
    j = cust.merge(nat, left_on="c_nationkey", right_on="n_nationkey")
    for n_name, sub in j.groupby("n_name"):
        top = sub.sort_values(
            ["c_acctbal", "c_name"], ascending=[False, True]
        ).head(2)
        got = out[out.n_name == n_name]
        assert set(got.c_name) == set(top.c_name)


def test_udtf_chunks_cover_every_token(spark):
    out = QUERIES["udtf_lateral_native"](spark, SF_DIR).toPandas()
    docs = _docs()
    ntok = docs.set_index("doc_id").text.str.split(" ").str.len()
    per_doc = out.groupby("doc_id").n_tokens.sum()
    assert (per_doc == ntok[per_doc.index]).all()
    # every chunk but the last is full-width
    for did, sub in out.groupby("doc_id"):
        s = sub.sort_values("chunk_idx")
        assert (s.n_tokens.iloc[:-1] == 40).all()
        assert list(s.chunk_idx) == list(range(len(s)))

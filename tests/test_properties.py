"""Algebraic invariant spot-checks (SURVEY.md §5.5).

Cross-operator equivalences that must hold on any input: if one of
these breaks, an operator's semantics drifted even if its oracle
query happens to still pass (e.g. a semi-join that starts
duplicating rows, a window rank that loses its tiebreak).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from lsd_spark.catalog import load
from tests.conftest import SF_DIR


def rows(df):
    return sorted(map(tuple, df.collect()))


def test_semi_join_equals_inner_distinct(spark):
    c = load(spark, SF_DIR, "customer")
    o = load(spark, SF_DIR, "orders")
    semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey")
    inner = (
        c.join(o, c.c_custkey == o.o_custkey, "inner").select("c_custkey").distinct()
    )
    assert rows(semi) == rows(inner)


def test_anti_join_equals_complement(spark):
    c = load(spark, SF_DIR, "customer")
    o = load(spark, SF_DIR, "orders")
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey")
    semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey")
    assert rows(anti) == rows(c.select("c_custkey").exceptAll(semi))
    assert anti.count() + semi.count() == c.count()


def test_window_top1_equals_groupby_max(spark):
    o = load(spark, SF_DIR, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    top1 = (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_totalprice")
    )
    gmax = o.groupBy("o_custkey").agg(F.max("o_totalprice").alias("o_totalprice"))
    assert rows(top1) == rows(gmax)


def test_union_distinct_is_idempotent(spark):
    n = load(spark, SF_DIR, "nation").select("n_nationkey")
    once = n.union(n).distinct()
    assert rows(once) == rows(n.distinct())


def test_rollup_total_matches_global(spark):
    o = load(spark, SF_DIR, "orders")
    ru = (
        o.rollup("o_orderstatus")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("o_orderstatus").isNull())
    )
    assert ru.collect()[0]["cnt"] == o.count()


def test_dedup_exact_idempotent(spark):
    docs = load(spark, SF_DIR, "documents")
    once = docs.dropDuplicates(["text"])
    twice = once.dropDuplicates(["text"])
    assert once.count() == twice.count()
    # and the dedup count agrees with the distinct-fingerprint count
    assert once.count() == docs.select(F.md5(F.col("text").cast("binary"))).distinct().count()


def test_histogram_buckets_partition_rows(spark):
    ev = load(spark, SF_DIR, "events").filter(F.col("value").isNotNull())
    hist = ev.groupBy(F.floor(F.col("value") / 50).alias("b")).count()
    assert hist.agg(F.sum("count")).collect()[0][0] == ev.count()


def test_minhash_bounds_jaccard(spark):
    """Every MinHash/LSH near-dup candidate pair must satisfy the
    Jaccard threshold it claims (no false positives post-refinement),
    and the pair list must be symmetric-free (a < b)."""
    from lsd_spark.registry import QUERIES, load_all

    load_all()
    pairs = QUERIES["llm_dedup_near"](spark, SF_DIR).collect()
    for r in pairs:
        assert r.doc_a < r.doc_b
        assert r.jaccard >= 0.6


def test_period_search_recovers_planted_period(spark):
    """Semantic check beyond the differential oracle: plant a clean
    periodic signal and assert the search finds its true period (and
    prefers it over aliases), while pure noise-free constant signal
    ties break to the shortest candidate period."""
    import math

    from lsd_spark.operators.aggregates import period_search_plan

    rows = []
    # user 1: sin with TRUE period 5 days, sampled every 6h for 60d
    # user 2: constant (no periodicity): all scores ~0, tiebreak -> 3
    for k in range(240):
        t_us = k * 6 * 3600 * 1_000_000
        rows.append((1, t_us, math.sin(2 * math.pi * t_us / (5 * 86400 * 1e6))))
        rows.append((2, t_us, 1.0))
    obs = spark.createDataFrame(rows, "user_id bigint, us bigint, v double")
    got = {
        r.user_id: r.best_period_days
        for r in period_search_plan(obs, period_days=[3, 5, 7, 11, 13]).collect()
    }
    assert got[1] == 5, got
    assert got[2] == 3, got


def test_packed_id_unpack_roundtrip_and_uniqueness(spark):
    """Packed _ID invariants on arbitrary-ish inputs: div/mod
    unpacking recovers (epoch, cell, index) exactly, _id is unique,
    and sorting by _id sorts by (epoch, cell, index) — the property
    that makes key ranges spatio-temporal scans."""
    from lsd_spark.plans.spatial import (
        PACK_CELL_SHIFT,
        PACK_EPOCH_SHIFT,
        stamp_packed_id,
    )

    df = spark.range(3000).select(
        F.col("id").alias("det_id"),
        (F.col("id") % 7 + 19000).alias("epoch"),
        (F.col("id") * 37 % 200).alias("cx"),
        (F.col("id") * 11 % 200).alias("cy"),
    )
    out = stamp_packed_id(df, "epoch", "cx", "cy", "det_id").select(
        "det_id", "epoch", "_id",
        (F.col("_id") / PACK_EPOCH_SHIFT).cast("long").alias("epoch_u"),
        (F.col("_id") % PACK_CELL_SHIFT).alias("idx_u"),
        ((F.col("_id") / PACK_CELL_SHIFT).cast("long")
         % (PACK_EPOCH_SHIFT // PACK_CELL_SHIFT)).alias("cell_u"),
    )
    got = out.collect()
    assert all(r.epoch_u == r.epoch for r in got)
    ids = [r._id for r in got]
    assert len(set(ids)) == len(ids)  # primary key
    # _id order == (epoch, cell, idx) lexicographic order
    by_id = sorted(got, key=lambda r: r._id)
    by_fields = sorted(got, key=lambda r: (r.epoch_u, r.cell_u, r.idx_u))
    assert [r.det_id for r in by_id] == [r.det_id for r in by_fields]


def test_margin_refresh_commutes_with_any_split(spark, tmp_path):
    """refresh_margin_table must be split-invariant: build(full) ==
    build(part) + refresh(rest) for an arbitrary (non-temporal!)
    split — stronger than the last-day case the registered op uses,
    because margin copies of old and new rows interleave freely."""
    from lsd_spark.plans.margin import (
        HOUR_US,
        ZONE_US,
        build_margin_table,
        refresh_margin_table,
    )

    clicks = load(spark, SF_DIR, "events").filter(
        F.col("event_type") == "click"
    ).select("user_id", "ts", "event_id").limit(2000)
    old = clicks.filter(F.col("event_id") % 3 != 0)
    new = clicks.filter(F.col("event_id") % 3 == 0)
    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    build_margin_table(spark, old, ts="ts", zone_width_us=ZONE_US,
                       out_path=inc, margin_us=HOUR_US)
    refresh_margin_table(spark, new, inc, ts="ts",
                         zone_width_us=ZONE_US, margin_us=HOUR_US)
    build_margin_table(spark, clicks, ts="ts", zone_width_us=ZONE_US,
                       out_path=full, margin_us=HOUR_US)
    cols = ["user_id", "ts", "event_id", "_cached", "zone"]
    assert rows(spark.read.parquet(inc).select(*cols)) == rows(
        spark.read.parquet(full).select(*cols)
    )


def test_uf_roots_matches_bfs_components_property():
    """Property (round-12): the driver-side union-find used by
    min_label_fixpoint's quotient solve must label every node with
    its connected component's MINIMUM id — checked against an
    independent BFS over hypothesis-generated random edge sets,
    including duplicate and self-referencing edges."""
    from hypothesis import given, settings, strategies as st

    from lsd_spark.plans.cluster import _uf_roots

    edges_st = st.lists(
        st.tuples(st.integers(0, 60), st.integers(0, 60)),
        min_size=0,
        max_size=200,
    )

    @settings(max_examples=200, deadline=None)
    @given(edges_st)
    def run(edges):
        roots = _uf_roots(edges)
        # reference: BFS components over the same undirected graph
        adj: dict[int, set[int]] = {}
        for u, v in edges:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        want: dict[int, int] = {}
        seen: set[int] = set()
        for start in adj:
            if start in seen:
                continue
            comp, frontier = set(), {start}
            while frontier:
                comp |= frontier
                frontier = {
                    n for f in frontier for n in adj[f]
                } - comp
            m = min(comp)
            seen |= comp
            for n in comp:
                want[n] = m
        assert roots == want

    run()

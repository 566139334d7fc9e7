"""Materialized cross-match tables — LSD's signature architecture
[lsd:lsd-xmatch script, join_ops.py — UNVERIFIED]: nearest-neighbor
matches are computed ONCE by a build job and stored as a first-class
mapping table (m1, m2, dist); query-time 'spatial joins' are then
plain equi-joins through the mapping (SURVEY.md §3.3, §4).

Spark mapping: build = zones-technique candidates + window rank ->
`write.parquet`; consume = two broadcast/shuffle hash joins. At
100 TB the build is one bounded shuffle on (key, zone) and the
mapping table is tiny relative to the inputs (nmax rows per left
row), so consuming queries never pay the match cost again.

Both registered ops share join_asof_nearest's oracle: three
physically different plans (direct band join / zoned equi-join /
materialized mapping) must produce byte-identical results.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lsd_spark.catalog import load, session_key
from lsd_spark.plans.zones import rank_nearest, zoned_asof_candidates
from lsd_spark.registry import register

# oracle shared by the three as-of implementations (joins.py has the
# direct band-join variant)
ASOF_ORACLE = (
    "SELECT purchase_id, click_id FROM ("
    "SELECT p.event_id AS purchase_id, c.event_id AS click_id, "
    "ROW_NUMBER() OVER (PARTITION BY p.event_id "
    "ORDER BY c.ts DESC, c.event_id DESC) AS rn "
    "FROM events p JOIN events c ON p.user_id = c.user_id "
    "AND c.ts < p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR "
    "WHERE p.event_type = 'purchase' AND c.event_type = 'click') "
    "WHERE rn = 1"
)

HOUR_US = 3_600_000_000


def _asof_pairs(spark, sf_dir) -> DataFrame:
    """Zoned as-of: purchases matched to latest prior click ≤1h."""
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    cands = zoned_asof_candidates(purchases, clicks, key="user_id", ts="ts", max_delta_us=HOUR_US)
    best = rank_nearest(
        cands,
        partition_cols=["l_event_id"],
        order_cols=[F.col("r_ts").desc(), F.col("r_event_id").desc()],
        nmax=1,
    )
    return best.select(
        F.col("l_event_id").alias("purchase_id"), F.col("r_event_id").alias("click_id")
    )


@register("join_asof_zoned", oracle=ASOF_ORACLE, cacheable=False)
def join_asof_zoned(spark, sf_dir):
    """join_asof_nearest computed via pure zone equi-joins (constant
    2-zone probe fan-out) — the plan shape that survives 100 TB."""
    return _asof_pairs(spark, sf_dir)


def build_xmatch(
    spark: SparkSession,
    sf_dir: str,
    out_path: str | None = None,
) -> str:
    """The lsd-xmatch build job: materialize the (m1, m2, dist_us)
    mapping table as Parquet and return its path."""
    out = out_path or tempfile.mkdtemp(prefix="lsd_xmatch_") + "/purchase_click"
    pairs = _asof_pairs(spark, sf_dir)
    ev = load(spark, sf_dir, "events").select("event_id", "ts")
    with_dist = (
        pairs.join(ev.withColumnRenamed("ts", "p_ts"), pairs.purchase_id == ev.event_id)
        .drop("event_id")
        .join(
            ev.withColumnRenamed("ts", "c_ts").withColumnRenamed("event_id", "e2"),
            F.col("click_id") == F.col("e2"),
        )
        .select(
            F.col("purchase_id").alias("m1"),
            F.col("click_id").alias("m2"),
            (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("dist_us"),
        )
    )
    with_dist.write.mode("overwrite").parquet(out)
    return out


# one build per (session, sf_dir): the mapping table is immutable
# once written (the offline-build contract), so repeated consuming
# queries must NOT pay the build again — that is the whole point of
# materialized cross-matches. Cache/cleanup via plans/materialize.py
# (invalidated by registry.clear_plan_cache).
def cached_xmatch_path(spark: SparkSession, sf_dir: str) -> str:
    from lsd_spark.plans.materialize import materialized

    return materialized(
        spark, "xmatch_purchase_click", sf_dir,
        lambda base: build_xmatch(
            spark, sf_dir, out_path=base + "/purchase_click"
        ),
        prefix="lsd_xmatch_",
    )


@register("xmatch_consume", oracle=ASOF_ORACLE, cacheable=False)
def xmatch_consume(spark, sf_dir):
    """Query-time join THROUGH a pre-built xmatch table: build the
    mapping (normally offline, once), then answer the as-of query as
    a pure equi-join against it — LSD's `FROM t1, t2` with a declared
    join [lsd:src/lsd/join_ops.py — UNVERIFIED]."""
    path = cached_xmatch_path(spark, sf_dir)
    mapping = spark.read.parquet(path)
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id")
    return (
        purchases.join(mapping, purchases.event_id == mapping.m1)
        .select(F.col("m1").alias("purchase_id"), F.col("m2").alias("click_id"))
    )


@register("join_asof_union_window", oracle=ASOF_ORACLE)
def join_asof_union_window(spark, sf_dir):
    """As-of via union + ordered window — the SIXTH physically-
    distinct implementation of the shared as-of semantics (direct
    band join / zoned / materialized / margin / stream-stream /
    union-window), and the only one with no join operator at all:
    one shuffle, one sort, carried state."""
    from lsd_spark.plans.zones import asof_union_window

    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    return asof_union_window(purchases, clicks, HOUR_US)

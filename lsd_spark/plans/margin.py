"""Margin-duplicated write layout — LSD's neighbor cache, literally
[lsd:src/lsd/table.py neighbor-cache machinery — UNVERIFIED;
SURVEY.md §1.1, §4 stretch].

LSD stores, inside every cell, read-only copies of rows from
adjacent cells within the match radius, flagged `_CACHED=True`, so
spatial joins never need cross-cell communication. The Spark
re-expression: a **build job** writes the probe-side table with each
row duplicated into the NEXT zone (flagged `_cached=true`) and the
dataset partitioned by zone. A radius/as-of join against the margin
table is then a plain equi-join on zone alone — no probe-side
explode at query time, and with both sides partitioned by zone on
disk, no shuffle of the big side either (partition-local tasks).

Trade: +1x write amplification inside the margin (here: the whole
row set, since margin width == zone width) for shuffle-free reads —
the classic LSD bet, worth it when one write serves many queries.

`join_asof_margin` is the FOURTH physically-distinct implementation
of the same as-of semantics (direct band join / zoned equi-join /
materialized xmatch / margin layout), all sharing one oracle: the
engine's plan diversity is itself differential-tested.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from lsd_spark.catalog import load
from lsd_spark.plans.materialize import materialized
from lsd_spark.plans.xmatch import ASOF_ORACLE
from lsd_spark.plans.zones import rank_nearest
from lsd_spark.registry import register

HOUR_US = 3_600_000_000
# Zone width for the physical layout: must be >= the match delta
# (margin copies cover one full previous zone). 6h cells keep the
# partition-dir count bounded (hourly cells at sf0.1 = 1440 dirs and
# directory churn dominates the build; at 100 TB you size cells so
# each holds O(100 MB-1 GB), exactly like LSD's BHpix subdivision).
ZONE_US = 6 * HOUR_US


@dataclass(frozen=True)
class StripDim:
    """One rectangular margin dimension: `value` (numeric coordinate
    expression) is binned into cells of `width`; a row is ALSO copied
    into the lower/upper neighbor cell when it sits inside that
    boundary strip (`reach_lo` / `reach_hi` in coordinate units;
    0 disables copies in that direction)."""

    cell: str
    value: Column
    width: float
    reach_lo: float
    reach_hi: float


def strip_copies(df: DataFrame, dims: list[StripDim]) -> DataFrame:
    """Expand `df` with margin copies along rectangular dimensions —
    the shared boundary-strip + `_cached`-flag core of every margin
    layout (LSD's neighbor cache): the cartesian product of per-dim
    offsets in {-1,0,1}, each combination emitted only for rows
    inside the corresponding strip. Output = input columns + one
    cell column per dim + `_cached` (true on every non-home copy).

    Write amplification is only the strips (~reach/width per side
    per dim), never the naive (3^d)x — the conditional emission is
    what makes the layout affordable at 100 TB."""
    cells = [F.floor(d.value / F.lit(d.width)).cast("long") for d in dims]
    offsets_per_dim = [
        [o for o in (-1, 0, 1)
         if o == 0 or (o == -1 and d.reach_lo > 0)
         or (o == 1 and d.reach_hi > 0)]
        for d in dims
    ]
    emits = []
    for offs in itertools.product(*offsets_per_dim):
        cond = F.lit(True)
        fields = []
        for d, c, o in zip(dims, cells, offs):
            if o == 1:
                cond = cond & (
                    d.value >= (c + 1).cast("double") * d.width - d.reach_hi
                )
            elif o == -1:
                cond = cond & (d.value < c.cast("double") * d.width + d.reach_lo)
            fields.append((c + o).alias(d.cell))
        fields.append(F.lit(any(o != 0 for o in offs)).alias("_cached"))
        emits.append(F.when(cond, F.struct(*fields)))
    copy = F.col("_copy")
    return (
        df.withColumn("_copy", F.explode(F.array(*emits)))
        .filter(copy.isNotNull())
        .select(
            *df.columns,
            *[copy[d.cell].alias(d.cell) for d in dims],
            copy["_cached"].alias("_cached"),
        )
    )


def build_margin_table(
    spark: SparkSession,
    df: DataFrame,
    ts: str = "ts",
    zone_width_us: int = ZONE_US,
    out_path: str | None = None,
    margin_us: int | None = None,
) -> str:
    """Write `df` partitioned by zone with margin copies: a row
    within `margin_us` (default: the full zone) of its upper zone
    edge also appears in zone+1 flagged `_cached=true` (it can
    satisfy lookups from rows early in the next zone). Returns the
    path."""
    import tempfile

    out = out_path or tempfile.mkdtemp(prefix="lsd_margin_") + "/margin"
    expanded = strip_copies(
        df,
        [StripDim(
            "zone", F.unix_micros(F.col(ts)).cast("double"),
            float(zone_width_us), 0.0, float(margin_us or zone_width_us),
        )],
    )
    # repartition by zone first: without it, every one of the N write
    # tasks emits a sliver into every zone dir (tasks x zones tiny
    # files — 18s at sf0.1); with it, one file per zone.
    (
        expanded
        .repartition("zone")
        .write.mode("overwrite")
        .partitionBy("zone")
        .parquet(out)
    )
    return out


def refresh_margin_table(
    spark: SparkSession,
    delta: DataFrame,
    path: str,
    ts: str = "ts",
    zone_width_us: int = ZONE_US,
    margin_us: int | None = None,
) -> str:
    """INCREMENTAL margin maintenance (round-5 VERDICT #7): append
    new rows to an existing margin layout by expanding ONLY the delta
    with its margin copies and appending the result into the
    zone-partitioned dataset. Untouched zone dirs are not rewritten —
    their files are never even opened; the zones the delta lands in
    (home zone + zone+1 for boundary-strip copies) receive new files.

    Correct because the layout is append-structured: a zone dir's
    contents are the union of home rows and neighbors' boundary
    copies, each derived ROW-LOCALLY from the source row alone — so
    a new row's entire contribution to the layout is exactly its own
    strip expansion, independent of what's already on disk. This is
    LSD's nightly-ingest pattern: a day of new detections touches a
    day of zone dirs (plus one margin neighbor each), never the
    multi-year history [lsd:src/lsd/table.py append + neighbor-cache
    maintenance — UNVERIFIED]."""
    expanded = strip_copies(
        delta,
        [StripDim(
            "zone", F.unix_micros(F.col(ts)).cast("double"),
            float(zone_width_us), 0.0, float(margin_us or zone_width_us),
        )],
    )
    (
        expanded
        .repartition("zone")
        .write.mode("append")
        .partitionBy("zone")
        .parquet(path)
    )
    return path


def _asof_over_margin(spark, sf_dir: str, path: str) -> DataFrame:
    """The shared as-of probe (latest prior click <=1h per purchase)
    against a zone-partitioned margin layout at `path`: the left side
    probes ONLY its own zone — margin copies stand in for zone-1."""
    ev = load(spark, sf_dir, "events")
    margin = spark.read.parquet(path).select(
        F.col("user_id").alias("r_user_id"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
        "zone",
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("l_user_id"),
        F.col("ts").alias("l_ts"),
        F.col("event_id").alias("l_event_id"),
        F.floor(F.unix_micros("ts") / F.lit(ZONE_US)).alias("zone"),
    )
    cands = purchases.join(
        margin,
        (purchases.zone == margin.zone)
        & (F.col("l_user_id") == F.col("r_user_id"))
        & (F.col("r_ts") < F.col("l_ts"))
        & (F.unix_micros("l_ts") - F.unix_micros("r_ts") <= HOUR_US),
        "inner",
    )
    best = rank_nearest(
        cands,
        partition_cols=["l_event_id"],
        order_cols=[F.col("r_ts").desc(), F.col("r_event_id").desc()],
        nmax=1,
    )
    return best.select(
        F.col("l_event_id").alias("purchase_id"), F.col("r_event_id").alias("click_id")
    )


@register("join_asof_margin", oracle=ASOF_ORACLE, cacheable=False)
def join_asof_margin(spark, sf_dir):
    """As-of (latest prior click <=1h per purchase) against the
    margin-duplicated click table: the left side probes ONLY its own
    zone — the margin copies stand in for zone-1 — so the join is a
    single-key-pair equi-join over a zone-partitioned layout."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    path = materialized(
        spark, "margin_asof", sf_dir,
        lambda base: build_margin_table(
            spark, clicks, ts="ts", zone_width_us=ZONE_US,
            out_path=base + "/margin", margin_us=HOUR_US,
        ),
        prefix="lsd_margin_",
    )
    return _asof_over_margin(spark, sf_dir, path)


@register("sink_margin_refresh", oracle=ASOF_ORACLE, cacheable=False)
def sink_margin_refresh(spark, sf_dir):
    """Incremental append + neighbor-cache refresh, end-to-end: the
    margin layout is built from every click BEFORE the final day,
    then the final day's clicks are appended with
    `refresh_margin_table` (delta expansion only — untouched zone
    dirs keep their files, pinned by tests/test_margin_refresh.py),
    and the SAME as-of join runs over the refreshed layout. The
    oracle is the full-data as-of semantics, so a hash match proves
    the incrementally-maintained layout is indistinguishable from a
    full rebuild."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")

    def build(base: str) -> str:
        cutoff = clicks.agg(
            F.date_trunc("DAY", F.max("ts")).alias("d")
        ).collect()[0]["d"]  # one scalar: the last day's midnight
        path = build_margin_table(
            spark, clicks.filter(F.col("ts") < F.lit(cutoff)), ts="ts",
            zone_width_us=ZONE_US, out_path=base + "/margin",
            margin_us=HOUR_US,
        )
        return refresh_margin_table(
            spark, clicks.filter(F.col("ts") >= F.lit(cutoff)), path,
            ts="ts", zone_width_us=ZONE_US, margin_us=HOUR_US,
        )

    path = materialized(spark, "margin_refresh", sf_dir, build,
                        prefix="lsd_margin_")
    return _asof_over_margin(spark, sf_dir, path)

"""The zones technique — LSD's cell + neighbor-margin-cache strategy
[lsd:src/lsd/table.py neighbor cache, bhpix.py — UNVERIFIED]
re-expressed as a pure query shape (SURVEY.md §2.C design note):

    1. derive a zone/bucket column from the match dimension
       (time bucket, LSH band, IVF centroid, healpix pixel);
    2. EQUI-join on (key, zone), probing each neighbor zone the
       match radius can reach (the margin cache analog: the probe
       side is duplicated into adjacent zones, not the data);
    3. refine with the exact predicate;
    4. rank and keep nmax matches.

Candidate count scales with rows-per-zone, never quadratically with
table size — the property that makes radius/nearest joins feasible
at 100 TB. Shuffle is a plain hash partition on (key, zone).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def zoned_asof_candidates(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str = "ts",
    max_delta_us: int = 3_600_000_000,
) -> DataFrame:
    """Candidate pairs where right.ts is within (left.ts - delta,
    left.ts), generated via zone equi-joins only.

    Zone width == delta, so a left row's window spans at most its own
    zone and the previous one: the left side probes exactly 2 zones
    (constant fan-out). Returns left.* (prefixed l_), right.* (r_).
    """
    zone = lambda c: F.floor(F.unix_micros(F.col(c)) / F.lit(max_delta_us))  # noqa: E731
    l = left.select(
        F.col(key).alias("l_key"),
        F.col(ts).alias("l_ts"),
        *[F.col(c).alias(f"l_{c}") for c in left.columns if c not in (key, ts)],
        F.explode(F.array(zone(ts), zone(ts) - 1)).alias("zone"),
    )
    r = right.select(
        F.col(key).alias("r_key"),
        F.col(ts).alias("r_ts"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c not in (key, ts)],
        zone(ts).alias("r_zone"),
    )
    # (zone, key) BOTH in the equi condition -> Catalyst hash-joins on
    # the pair; the time predicates remain a cheap residual filter.
    cond = (
        (F.col("zone") == F.col("r_zone"))
        & (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") < F.col("l_ts"))
        & (F.unix_micros("l_ts") - F.unix_micros("r_ts") <= max_delta_us)
    )
    return l.join(r, cond, "inner")


def rank_nearest(
    cands: DataFrame,
    partition_cols: list[str],
    order_cols: list,
    nmax: int = 1,
) -> DataFrame:
    """Step 4: keep the nmax best candidates per left row."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return cands.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= nmax)


def asof_union_window(purchases: DataFrame, clicks: DataFrame, max_delta_us: int):
    """As-of matching with NO JOIN AT ALL: union both event kinds,
    one shuffle by key, one ordered window pass carrying the last
    click forward; purchases then read their answer off the carried
    columns. At equal timestamps the purchase sorts BEFORE the click
    (kind 0 < 1), preserving the strict c.ts < p.ts contract; among
    equal click timestamps the largest event_id wins (last in
    order) — identical tie rules to the ranked-join variants.

    The most shuffle-frugal as-of shape: at 100 TB it is exactly one
    hash partition + per-partition sort, state one row per key."""
    u = purchases.select(
        F.col("user_id"), F.col("ts"), F.lit(0).alias("kind"), F.col("event_id")
    ).unionByName(
        clicks.select(F.col("user_id"), F.col("ts"), F.lit(1).alias("kind"), F.col("event_id"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("kind").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_id = F.when(F.col("kind") == 1, F.col("event_id"))
    click_ts = F.when(F.col("kind") == 1, F.unix_micros("ts"))
    carried = u.select(
        "user_id",
        "ts",
        "kind",
        "event_id",
        F.last(click_id, ignorenulls=True).over(w).alias("last_click_id"),
        F.last(click_ts, ignorenulls=True).over(w).alias("last_click_us"),
    )
    return (
        carried.filter(F.col("kind") == 0)
        .filter(
            F.col("last_click_id").isNotNull()
            & (F.unix_micros("ts") - F.col("last_click_us") <= max_delta_us)
        )
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("last_click_id").alias("click_id"),
        )
    )

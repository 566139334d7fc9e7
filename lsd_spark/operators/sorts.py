"""§2.F sorts / limits / top-k. LSD sorts fetched results driver-side
with numpy (SURVEY.md §2.F); here ORDER BY + LIMIT compiles to
TakeOrderedAndProject (per-partition top-k then merge — no global
sort materialized), which is the scalable shape at 100 TB.

Determinism: every LIMIT carries a total-order tiebreak
(SURVEY.md §2 header).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from lsd_spark.catalog import load
from lsd_spark.registry import register


@register(
    "sort_multi",
    oracle=(
        "SELECT o_orderkey, o_orderdate, o_totalprice FROM orders "
        "ORDER BY o_orderdate DESC, o_orderkey ASC LIMIT 50"
    ),
)
def sort_multi(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").asc())
        .limit(50)
    )


@register(
    "topk_agg",
    oracle=(
        "SELECT l_orderkey, ROUND(SUM(l_extendedprice), 2) AS rev FROM lineitem "
        "GROUP BY l_orderkey ORDER BY rev DESC, l_orderkey ASC LIMIT 10"
    ),
)
def topk_agg(spark, sf_dir):
    """'Brightest N objects' pattern: agg then bounded top-k.
    Ranks on the ROUNDED sum so both engines order identically."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("rev"))
        .orderBy(F.col("rev").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@register(
    "limit_offset",
    oracle=(
        "SELECT o_orderkey, o_totalprice, "
        "CAST(10 + ROW_NUMBER() OVER (ORDER BY o_orderkey) AS INTEGER) AS rn "
        "FROM orders WHERE o_orderkey > ("
        "SELECT MAX(k) FROM (SELECT o_orderkey AS k FROM orders "
        "ORDER BY o_orderkey LIMIT 10)) "
        "ORDER BY o_orderkey LIMIT 10"
    ),
)
def limit_offset(spark, sf_dir):
    """Deterministic pagination, KEYSET style (page 2, size 10):
    `WHERE o_orderkey > last_seen ORDER BY o_orderkey LIMIT 10`.

    The boundary key (max of page 1) is itself a 1-row Spark plan
    broadcast into the predicate — no driver collect, and both the
    boundary and the page compile to TakeOrderedAndProject
    (per-partition top-k, merge of K rows). Unlike numbering every
    row through a single-partition window, the filter is pushdown-
    friendly: at 100 TB a sorted/bucketed layout prunes all cells
    below the boundary. The tiny row_number at the end runs on the
    10-row page (post-limit single partition of 10 rows), only to
    surface the page's absolute offsets."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    boundary = (
        o.select("o_orderkey")
        .orderBy("o_orderkey")
        .limit(10)
        .agg(F.max("o_orderkey").alias("page1_end"))
    )
    page = (
        o.join(F.broadcast(boundary), o.o_orderkey > F.col("page1_end"))
        .drop("page1_end")
        .orderBy("o_orderkey")
        .limit(10)
    )
    w = Window.orderBy("o_orderkey")  # 10 rows only: post-limit
    return page.withColumn("rn", (F.lit(10) + F.row_number().over(w)).cast("int"))

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
        "SELECT o_orderkey, o_totalprice, rn FROM ("
        "SELECT o_orderkey, o_totalprice, "
        "CAST(ROW_NUMBER() OVER (ORDER BY o_orderkey) AS INTEGER) AS rn FROM orders) "
        "WHERE rn BETWEEN 11 AND 20"
    ),
)
def limit_offset(spark, sf_dir):
    """Deterministic pagination: bare LIMIT/OFFSET is nondeterministic
    in a distributed engine, so page via row_number over a total order.
    (At 100 TB prefer keyset pagination — WHERE key > last_seen —
    which prunes instead of numbering every row; noted here.)"""
    o = load(spark, sf_dir, "orders")
    w = Window.orderBy("o_orderkey")
    return (
        o.select("o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn").between(11, 20))
    )

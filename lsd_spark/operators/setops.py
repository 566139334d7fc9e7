"""§2.G set operations — row-level analog of LSD's footprint algebra
(union/intersection of sky regions [lsd:src/lsd/bounds.py —
UNVERIFIED]). Spark set ops are hash-based distinct shuffles; at
100 TB prefer pre-partitioned inputs on the compared key so the
distinct is co-located.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lsd_spark.catalog import load
from lsd_spark.registry import register


@register(
    "set_union_all",
    oracle=(
        "SELECT o_custkey AS k FROM orders "
        "UNION ALL SELECT s_suppkey AS k FROM supplier"
    ),
)
def set_union_all(spark, sf_dir):
    o = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_suppkey").alias("k"))
    return o.unionByName(s)


@register(
    "set_union_distinct",
    oracle=(
        "SELECT c_nationkey AS k FROM customer "
        "UNION SELECT s_nationkey AS k FROM supplier ORDER BY k"
    ),
)
def set_union_distinct(spark, sf_dir):
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.unionByName(s).distinct().orderBy("k")


@register(
    "set_intersect",
    oracle=(
        "SELECT c_nationkey AS k FROM customer "
        "INTERSECT SELECT s_nationkey AS k FROM supplier ORDER BY k"
    ),
)
def set_intersect(spark, sf_dir):
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.intersect(s).orderBy("k")


@register(
    "set_except",
    oracle=(
        "SELECT c_nationkey AS k FROM customer "
        "EXCEPT SELECT s_nationkey AS k FROM supplier ORDER BY k"
    ),
)
def set_except(spark, sf_dir):
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.subtract(s).orderBy("k")  # subtract == SQL EXCEPT (distinct)


@register(
    "set_except_all",
    oracle=(
        "SELECT c AS custkey FROM ("
        "SELECT o_custkey AS c FROM orders "
        "EXCEPT ALL "
        "SELECT DISTINCT c_custkey AS c FROM customer) t ORDER BY custkey"
    ),
)
def set_except_all(spark, sf_dir):
    """Multiset EXCEPT ALL: each customer's first order is cancelled
    by their catalog row, repeat orders survive with multiplicity —
    the bag-semantics complement (set_except is the set version)."""
    o = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    c = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey")).distinct()
    return o.exceptAll(c).orderBy("custkey")


@register(
    "set_intersect_all",
    oracle=(
        "SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F' "
        "INTERSECT ALL "
        "SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O' "
        "ORDER BY o_orderpriority"
    ),
)
def set_intersect_all(spark, sf_dir):
    """Multiset INTERSECT ALL (bag semantics — min of the two
    multiplicities), completing the set-op family next to
    set_except_all."""
    o = load(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    op_ = o.filter(F.col("o_orderstatus") == "O").select("o_orderpriority")
    return f.intersectAll(op_).orderBy("o_orderpriority")


@register(
    "set_symmetric_diff",
    oracle=(
        "WITH a AS (SELECT DISTINCT o_custkey AS k FROM orders "
        "WHERE year(o_orderdate) = 1994), "
        "b AS (SELECT DISTINCT o_custkey AS k FROM orders "
        "WHERE year(o_orderdate) = 1995) "
        "SELECT k, 'a_only' AS side FROM a WHERE k NOT IN (SELECT k FROM b) "
        "UNION ALL "
        "SELECT k, 'b_only' AS side FROM b WHERE k NOT IN (SELECT k FROM a) "
        "ORDER BY k, side"
    ),
)
def set_symmetric_diff(spark, sf_dir):
    """Symmetric difference with provenance: customers active in
    exactly one of two years, tagged with WHICH side they came from
    — the churn/new-cohort split (A-only = churned, B-only =
    acquired) that a plain EXCEPT throws away. Completes the set-op
    family (union/intersect/except all have ops already).

    Plan: both branches are LEFT ANTI joins on the distinct key sets
    — each anti join broadcasts or shuffles on the SAME key, and the
    year filters push to the scan, so the whole op is two
    distinct-aggregates plus two anti joins over pruned scans.
    100 TB: anti join beats NOT IN at scale (null-safe, no
    materialized subquery); both sides shrink to |distinct keys|
    before any join."""
    o = load(spark, sf_dir, "orders")
    a = (
        o.filter(F.year("o_orderdate") == 1994)
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    b = (
        o.filter(F.year("o_orderdate") == 1995)
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    a_only = a.join(b, "k", "left_anti").select("k", F.lit("a_only").alias("side"))
    b_only = b.join(a, "k", "left_anti").select("k", F.lit("b_only").alias("side"))
    return a_only.unionByName(b_only).orderBy("k", "side")

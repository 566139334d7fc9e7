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

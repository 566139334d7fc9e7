"""§2.A scans — LSD cell scans → Parquet scans with Catalyst pruning.

LSD iterates cells and opens only the cgroup HDF5 files of referenced
columns [lsd:src/lsd/table.py fetch/scan — UNVERIFIED]; Parquet's
columnar layout + Catalyst ColumnPruning give the same effect for
free (SURVEY.md §4). Footprint→cell pruning [lsd:src/lsd/bounds.py —
UNVERIFIED] maps to partition pruning + row-group min/max skipping:
at 100 TB the engine writes fact tables ``partitionBy(epoch_bucket)``
(see sources/io_ops.sink_into) so a ts predicate never touches
out-of-range files; at test SF the driver's single parquet file still
gets row-group skipping via pushed filters.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lsd_spark.catalog import load
from lsd_spark.registry import register


@register("scan_full", oracle="SELECT * FROM lineitem")
def scan_full(spark, sf_dir):
    """Full scan, all columns — LSD `SELECT * FROM lineitem`."""
    return load(spark, sf_dir, "lineitem")


@register(
    "scan_projection",
    oracle="SELECT l_orderkey, l_quantity FROM lineitem",
)
def scan_projection(spark, sf_dir):
    """cgroup-pruned scan: only referenced columns are read. The
    physical plan's ReadSchema shows just these two columns."""
    return load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")


@register(
    "scan_partition_prune",
    oracle=(
        "SELECT count(*) AS cnt FROM events "
        "WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'"
    ),
)
def scan_partition_prune(spark, sf_dir):
    """Bounds→cell pruning analog: a ts predicate pushed to the scan
    (PushedFilters + row-group min/max; partition pruning once the
    table is written date-partitioned, see sink_into)."""
    ev = load(spark, sf_dir, "events")
    return ev.filter(F.col("ts") >= F.lit("2024-01-15 00:00:00").cast("timestamp")).agg(
        F.count("*").alias("cnt")
    )

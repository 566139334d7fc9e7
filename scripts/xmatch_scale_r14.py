"""Round-14 xmatch scaling check: time xmatch_sphere_count warm at an
inflated dir (default .cache/sf1, ~10x sf0.1) under bench-like session
settings at $SPARK_GRAFT_CPUS cores. Run once with CPUS=8 and once
with CPUS=32 to get the off-floor scaling ratio. Not part of the
driver contract.

Usage: SPARK_GRAFT_CPUS=8 python scripts/xmatch_scale_r14.py [dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.cache/sf1"
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    os.environ.setdefault("LSD_SHUFFLE_PARTITIONS", "8")
    from lsd_spark import catalog
    from lsd_spark.registry import QUERIES, load_all
    from lsd_spark.session import get_spark

    load_all()
    spark = get_spark(app_name="xmatch-scale-r14", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8m")
    df = catalog.load(spark, SF_DIR, "events")
    df.persist()
    df.count()

    fn = QUERIES["xmatch_sphere_count"]
    fn(spark, SF_DIR).collect()  # cold: plan build + warm the path
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).collect()
        times.append(round(time.perf_counter() - t0, 3))
    print(
        f"xmatch_sphere_count @ {SF_DIR} cpus={CPUS}: "
        f"runs={times} median={statistics.median(times)}"
    )


if __name__ == "__main__":
    main()

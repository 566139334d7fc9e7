"""A/B lab for the orderBy range-sampling double-compute (round-14
follow-up; OPTIMIZATION_r14.md §9 item 1): the RangePartitioning
exchange's bounds-sampling job re-executes every stage of the sort's
child AFTER the child's last shuffle — for join_xmatch_sphere that is
the whole join + haversine refine. Spark reuses shuffle MAP output
between the sampling job and the real job, so hash-repartitioning the
(small) refined result rows right before the orderBy moves the
join+refine into a map stage that is computed ONCE and reused.

Measures, under bench session settings, warm noop-sink medians + Spark
job/stage counts for:
  A: the registered join_xmatch_sphere plan (status quo)
  B: the same plan with repartition(dp, l_id, r_id) before orderBy

Usage: SPARK_GRAFT_SF_DIR=/root/repo/.cache/sf1 python scripts/sort_barrier_ab.py
Not part of the driver contract.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.cache/sf1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
RUNS = 5


def main() -> None:
    os.environ.setdefault("LSD_SHUFFLE_PARTITIONS", "8")
    from pyspark.sql import functions as F

    from lsd_spark.plans.sphere import R_SPHERE, sphere_points, sphere_xmatch
    from lsd_spark.registry import load_all
    from lsd_spark.session import get_spark

    load_all()
    spark = get_spark(app_name="lsd-sort-ab", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8m")
    sc = spark.sparkContext

    def njobs() -> int:
        return sc._jsc.sc().statusStore().jobsList(None).size()

    def cand():
        return sphere_xmatch(
            sphere_points(spark, SF_DIR, "purchase"),
            sphere_points(spark, SF_DIR, "click"),
            R_SPHERE,
        ).select("l_id", "r_id", F.round("dist", 9).alias("dist_deg"))

    dp = sc.defaultParallelism
    variants = {
        "A_status_quo": lambda: cand().orderBy("l_id", "r_id"),
        "B_repart_before_sort": lambda: cand()
        .repartition(dp, F.col("l_id"), F.col("r_id"))
        .orderBy("l_id", "r_id"),
    }

    # interleave runs so VM weather hits both variants equally
    times: dict[str, list[float]] = {k: [] for k in variants}
    jobs: dict[str, int] = {}
    for k, build in variants.items():  # warm (codegen, scan listing)
        build().write.format("noop").mode("overwrite").save()
    for _ in range(RUNS):
        for k, build in variants.items():
            df = build()
            j0 = njobs()
            t0 = time.perf_counter()
            sc.setJobDescription(f"sort-ab {k}")
            df.write.format("noop").mode("overwrite").save()
            times[k].append(time.perf_counter() - t0)
            jobs[k] = njobs() - j0
            sc.setJobDescription(None)
    for k in variants:
        ts = times[k]
        print(
            f"{k}: median {statistics.median(ts):.3f}s min {min(ts):.3f}s "
            f"jobs/run {jobs[k]} all={[round(t, 3) for t in ts]}"
        )

    # row-identity spot check: same rows, same order
    a = variants["A_status_quo"]().limit(2000).collect()
    b = variants["B_repart_before_sort"]().limit(2000).collect()
    print("first-2000-rows identical:", a == b)
    spark.stop()


if __name__ == "__main__":
    main()

"""Profiling lab for q_fof (cluster_fof_2d): stage-by-stage timing
under bench.py's session settings. Not part of the driver contract.

Usage: python scripts/profile_fof.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
RUNS = 5


def timed(label, fn, runs=RUNS):
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    print(f"{label}: median {statistics.median(samples):.3f}s "
          f"min {min(samples):.3f}s  all={[round(s, 3) for s in samples]}")


def main() -> None:
    os.environ.setdefault("LSD_SHUFFLE_PARTITIONS", "8")
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    from lsd_spark import catalog
    from lsd_spark.registry import QUERIES, cached_plan, load_all
    from lsd_spark.session import get_spark

    load_all()
    spark = get_spark(app_name="lsd-prof-fof", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8m")

    for t in ("events",):
        df = catalog.load(spark, SF_DIR, t)
        df.persist()
        df.count()

    from lsd_spark.plans import cluster as cl
    from lsd_spark.plans.spatial import FOF2D_R, points, self_radius_pairs

    qid = "cluster_fof_2d"
    QUERIES[qid](spark, SF_DIR).toPandas()
    QUERIES[qid](spark, SF_DIR).toPandas()
    print("fixpoint path:", cl.LAST_FIXPOINT_PATH["path"])

    pts = cached_plan(
        spark, SF_DIR, "fof2d_pts",
        lambda: points(spark, SF_DIR, "view").select(
            F.col("event_id").alias("vec_id")),
    )
    pairs = cached_plan(
        spark, SF_DIR, "fof2d_pairs",
        lambda: self_radius_pairs(spark, SF_DIR, "view", FOF2D_R),
    )
    print("n points:", pts.count(), " n pairs:", pairs.count())

    # edge generation alone (noop write = full compute, no sink)
    def edges_only():
        pairs.write.format("noop").mode("overwrite").save()

    timed("edge-gen (noop)", edges_only)

    # contraction + quotient collect (the fixpoint's single heavy job)
    def contraction():
        local_agg = (
            cl._local_cc_labels(pairs)
            .groupBy("vec_id")
            .agg(F.min("lmin").alias("lmin"),
                 F.collect_set("lmin").alias("labels"))
            .persist(StorageLevel.DISK_ONLY)
        )
        q_pd = (
            local_agg.filter(F.size("labels") > 1)
            .select(F.col("lmin").alias("u"), F.explode("labels").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .limit(cl.QUOTIENT_SINGLE_TASK_MAX + 1)
            .toPandas()
        )
        local_agg.unpersist()
        return len(q_pd)

    print("quotient rows:", contraction())
    timed("contraction+quotient collect", contraction)

    # contraction without persist (how much does DISK_ONLY write cost?)
    def contraction_nopersist():
        local_agg = (
            cl._local_cc_labels(pairs)
            .groupBy("vec_id")
            .agg(F.min("lmin").alias("lmin"),
                 F.collect_set("lmin").alias("labels"))
        )
        (local_agg.filter(F.size("labels") > 1)
         .select(F.col("lmin").alias("u"), F.explode("labels").alias("v"))
         .filter(F.col("u") != F.col("v"))
         .limit(cl.QUOTIENT_SINGLE_TASK_MAX + 1)
         .toPandas())

    timed("contraction+quotient (no persist)", contraction_nopersist)

    # the local union-find stage alone
    def uf_only():
        cl._local_cc_labels(pairs).write.format("noop").mode("overwrite").save()

    timed("edge-gen+mapInPandas (noop)", uf_only)

    # full query
    timed("full cluster_fof_2d", lambda: QUERIES[qid](spark, SF_DIR).toPandas())

    # pair partitions
    print("pairs partitions:", pairs.rdd.getNumPartitions())


if __name__ == "__main__":
    main()

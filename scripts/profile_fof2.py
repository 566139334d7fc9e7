"""Edge-gen dissection for q_fof: time sub-pieces and variants.

Usage: python scripts/profile_fof2.py
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
    fn()  # warm
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    print(f"{label}: median {statistics.median(samples):.3f}s "
          f"min {min(samples):.3f}s")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    os.environ.setdefault("LSD_SHUFFLE_PARTITIONS", "8")
    from pyspark.sql import functions as F

    from lsd_spark import catalog
    from lsd_spark.registry import load_all
    from lsd_spark.session import get_spark

    load_all()
    spark = get_spark(app_name="lsd-prof-fof2", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8m")

    ev = catalog.load(spark, SF_DIR, "events")
    ev.persist()
    print("events rows:", ev.count(), "partitions:", ev.rdd.getNumPartitions())

    from lsd_spark.plans.spatial import FOF2D_R, points, self_radius_pairs

    pts_spread = points(spark, SF_DIR, "view", spread=True)
    pts_plain = points(spark, SF_DIR, "view")
    timed("points(spread) noop", lambda: noop(pts_spread))
    timed("points(plain) noop", lambda: noop(pts_plain))
    print("pts partitions (spread):", pts_spread.rdd.getNumPartitions())
    print("pts partitions (plain):", pts_plain.rdd.getNumPartitions())

    pairs = self_radius_pairs(spark, SF_DIR, "view", FOF2D_R)
    timed("pairs noop (current SHJ)", lambda: noop(pairs))

    # variant: force broadcast join instead of shuffle_hash
    import lsd_spark.plans.spatial as sp

    cell = lambda c: F.coalesce(F.floor(F.col(c) / F.lit(FOF2D_R)), F.lit(-1))  # noqa: E731
    probe_cells = F.array(*[
        F.struct((cell("x") + dx).alias("cx"), (cell("y") + dy).alias("cy"),
                 F.lit(dx == 0 and dy == 0).alias("home"))
        for dx, dy in ((0, 0), (0, 1), (1, -1), (1, 0), (1, 1))
    ])

    def build_pairs(ptsdf_l, ptsdf_r, hint=None, sp_override=None):
        l = ptsdf_l.select(
            F.col("event_id").alias("u"), F.col("x").alias("lx"),
            F.col("y").alias("ly"), F.explode(probe_cells).alias("pc"),
        ).select("u", "lx", "ly", F.col("pc.cx").alias("cx"),
                 F.col("pc.cy").alias("cy"), F.col("pc.home").alias("home"))
        r = ptsdf_r.select(
            F.col("event_id").alias("v"), F.col("x").alias("rx"),
            F.col("y").alias("ry"), cell("x").alias("r_cx"),
            cell("y").alias("r_cy"))
        if hint == "broadcast":
            r = F.broadcast(r)
        elif hint:
            r = r.hint(hint)
        dist = F.sqrt((F.col("lx") - F.col("rx")) ** 2 + (F.col("ly") - F.col("ry")) ** 2)
        return (l.join(r, (F.col("cx") == F.col("r_cx"))
                       & (F.col("cy") == F.col("r_cy"))
                       & (~F.col("home") | (F.col("u") < F.col("v"))))
                .withColumn("dist", dist)
                .filter((F.col("dist") <= FOF2D_R) & (F.col("u") != F.col("v")))
                .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")))

    timed("pairs broadcast-r", lambda: noop(build_pairs(pts_spread, pts_plain, "broadcast")))
    timed("pairs SHJ spread-l plain-r", lambda: noop(build_pairs(pts_spread, pts_plain, "shuffle_hash")))
    timed("pairs SHJ plain both", lambda: noop(build_pairs(pts_plain, pts_plain, "shuffle_hash")))

    for spv in ("8", "16", "32"):
        spark.conf.set("spark.sql.shuffle.partitions", spv)
        timed(f"pairs SHJ sp={spv}", lambda: noop(self_radius_pairs(spark, SF_DIR, "view", FOF2D_R)))
    spark.conf.set("spark.sql.shuffle.partitions", "4")


if __name__ == "__main__":
    main()

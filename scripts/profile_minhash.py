"""Profiling lab for q_dedup_minhash (llm_dedup_cluster): times each
stage of the MinHash chain separately under bench.py's exact session
settings, so optimization targets the real hot stage, not a guess.
Not part of the driver contract.

Usage: python scripts/profile_minhash.py
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


def main() -> None:
    os.environ.setdefault("LSD_SHUFFLE_PARTITIONS", "8")
    from lsd_spark import catalog
    from lsd_spark.registry import QUERIES, drop_plans_matching, load_all
    from lsd_spark.session import get_spark

    load_all()
    spark = get_spark(app_name="lsd-prof", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8m")

    for t in ("documents",):
        df = catalog.load(spark, SF_DIR, t)
        df.persist()
        df.count()

    from lsd_spark.llm import dedup as dd

    # how many partitions does the signature frame run over?
    docs = catalog.load(spark, SF_DIR, "documents")
    print("documents partitions:", docs.rdd.getNumPartitions())

    qid = "llm_dedup_cluster"
    QUERIES[qid](spark, SF_DIR).toPandas()  # warm plan + codegen

    def timed(label, fn):
        samples = []
        for _ in range(RUNS):
            drop_plans_matching("ckpt:minhash")
            drop_plans_matching("ckpt:text_")
            t0 = time.perf_counter()
            fn()
            samples.append(time.perf_counter() - t0)
        print(f"{label}: median {statistics.median(samples):.3f}s "
              f"min {min(samples):.3f}s  all={[round(s,3) for s in samples]}")

    # stage 1: signature ckpt alone
    def sig_only():
        dd.ckpt_shared(
            spark, SF_DIR, "minhash_sig",
            lambda: dd._shingled(catalog.load(spark, SF_DIR, "documents")).selectExpr(
                "doc_id", "shingles",
                "array(" + ", ".join(dd._mh_spark(s) for s in range(dd.MINHASH_H)) + ") AS mh",
            ),
        )

    timed("sig ckpt build", sig_only)

    # stage 1+2: hits ckpt (includes sig build after drop)
    def hits():
        dd._minhash_hits(spark, SF_DIR)

    timed("sig+hits ckpt build", hits)

    # full query
    def full():
        QUERIES[qid](spark, SF_DIR).toPandas()

    timed("full llm_dedup_cluster", full)

    # partition count of sig frame
    sig = dd.ckpt_shared(
        spark, SF_DIR, "minhash_sig",
        lambda: dd._shingled(catalog.load(spark, SF_DIR, "documents")).selectExpr(
            "doc_id", "shingles",
            "array(" + ", ".join(dd._mh_spark(s) for s in range(dd.MINHASH_H)) + ") AS mh",
        ),
    )
    print("sig partitions:", sig.rdd.getNumPartitions())


if __name__ == "__main__":
    main()

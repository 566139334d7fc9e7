"""Bench experiment lab: sweep runtime-settable configs over the six
headline queries and print per-config warm medians. Not part of the
driver contract — a tuning tool for bench.py.

Usage: python scripts/bench_lab.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = 5

HEADLINE = {
    "q_scan_filter_agg": "agg_groupby_hash",
    "q_join3": "join_multiway",
    "q_window": "win_row_number",
    "q_topk": "topk_agg",
    "q_events_tumbling": "stream_tumbling",
    "q_knn_brute": "llm_simsearch_knn",
}

CONFIGS = [
    # (label, dict of runtime confs, cache_tables)
    ("r01-repro: aqe=on sp=8 mpb=4m", {"spark.sql.adaptive.enabled": "true",
      "spark.sql.shuffle.partitions": "8",
      "spark.sql.files.maxPartitionBytes": "4m"}, False),
    ("aqe=off sp=8 mpb=4m", {"spark.sql.adaptive.enabled": "false",
      "spark.sql.shuffle.partitions": "8",
      "spark.sql.files.maxPartitionBytes": "4m"}, False),
    ("aqe=off sp=4 mpb=8m", {"spark.sql.adaptive.enabled": "false",
      "spark.sql.shuffle.partitions": "4",
      "spark.sql.files.maxPartitionBytes": "8m"}, False),
    ("aqe=off sp=2 mpb=16m", {"spark.sql.adaptive.enabled": "false",
      "spark.sql.shuffle.partitions": "2",
      "spark.sql.files.maxPartitionBytes": "16m"}, False),
    ("aqe=off sp=8 mpb=4m CACHED", {"spark.sql.adaptive.enabled": "false",
      "spark.sql.shuffle.partitions": "8",
      "spark.sql.files.maxPartitionBytes": "4m"}, True),
    ("aqe=off sp=4 mpb=4m CACHED", {"spark.sql.adaptive.enabled": "false",
      "spark.sql.shuffle.partitions": "4",
      "spark.sql.files.maxPartitionBytes": "4m"}, True),
    ("aqe=on sp=8 mpb=4m CACHED", {"spark.sql.adaptive.enabled": "true",
      "spark.sql.shuffle.partitions": "8",
      "spark.sql.files.maxPartitionBytes": "4m"}, True),
]


def main() -> None:
    os.environ.setdefault("LSD_SHUFFLE_PARTITIONS", "8")
    from lsd_spark import catalog
    from lsd_spark.registry import QUERIES, load_all
    from lsd_spark.session import get_spark

    load_all()
    spark = get_spark(app_name="lsd-bench-lab", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    cached_now: list = []
    for label, confs, cache_tables in CONFIGS:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # toggle caching of the base tables
        for df in cached_now:
            df.unpersist()
        cached_now = []
        if cache_tables:
            for t in ["lineitem", "orders", "customer", "nation", "region",
                      "events", "embeddings"]:
                df = catalog.load(spark, SF_DIR, t)
                df.persist()
                df.count()
                cached_now.append(df)
        # warm twice per query (codegen + any broadcast warm)
        for qid in HEADLINE.values():
            QUERIES[qid](spark, SF_DIR).collect()
            QUERIES[qid](spark, SF_DIR).collect()
        meds = {}
        mins = {}
        for name, qid in HEADLINE.items():
            samples = []
            for _ in range(RUNS):
                t0 = time.perf_counter()
                QUERIES[qid](spark, SF_DIR).collect()
                samples.append(time.perf_counter() - t0)
            meds[name] = round(statistics.median(samples), 3)
            mins[name] = round(min(samples), 3)
        total_med = round(sum(meds.values()), 3)
        total_min = round(sum(mins.values()), 3)
        print(f"\n=== {label}")
        print(f"  median total {total_med}  min total {total_min}")
        for n in meds:
            print(f"    {n:22s} med {meds[n]:6.3f}  min {mins[n]:6.3f}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()

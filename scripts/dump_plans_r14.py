"""Dump .explain('formatted') for the headline bench queries into
plans/r14/<query>_<suffix>.txt (optimization-round evidence).

Usage: python scripts/dump_plans_r14.py before|after [query ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = {
    "q_scan_filter_agg": "agg_groupby_hash",
    "q_join3": "join_multiway",
    "q_window": "win_row_number",
    "q_topk": "topk_agg",
    "q_events_tumbling": "stream_tumbling",
    "q_knn_brute": "llm_simsearch_knn",
    "q_dedup_e2e": "llm_pipeline_e2e",
    "q_knn_ivf": "knn_ivf",
    "q_fof": "cluster_fof_2d",
    "q_xmatch_sphere": "join_xmatch_sphere",
    "q_dedup_minhash": "llm_dedup_cluster",
    "q_dedup_simhash": "llm_dedup_simhash",
}


def main() -> None:
    suffix = sys.argv[1]
    only = set(sys.argv[2:])
    os.environ.setdefault("LSD_SHUFFLE_PARTITIONS", "8")
    from lsd_spark.registry import QUERIES, load_all
    from lsd_spark.session import get_spark

    load_all()
    spark = get_spark(app_name="lsd-plans-r14", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8m")
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r14")
    os.makedirs(outdir, exist_ok=True)
    for name, qid in HEADLINE.items():
        if only and name not in only and qid not in only:
            continue
        df = QUERIES[qid](spark, SF)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} = {qid} @ {SF} ({suffix})\n")
            fh.write(buf.getvalue())
        print("wrote", path)


if __name__ == "__main__":
    main()

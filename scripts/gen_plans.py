"""Regenerate PLANS.md: annotated physical plans for the headline
bench queries. Run from the repo root: python scripts/gen_plans.py"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

COMMENTARY = {
    "agg_groupby_hash": (
        "q_scan_filter_agg (TPC-H Q1)",
        "Filter pushed to the parquet scan (PushedFilters), 6 of 16 columns read "
        "(ReadSchema), partial+final HashAggregate (map-side combine), whole plan "
        "in one codegen span until the 4-group exchange.",
    ),
    "join_multiway": (
        "q_join3 (TPC-H Q5-style 5-way)",
        "The selective dim chain region('ASIA')->nation->customer is built first and "
        "broadcast; orders joins lineitem on the natural key ONCE (the only "
        "shuffle-requiring join); final agg over 25 nations is map-side combined. "
        "At 100 TB the same shape holds, or the fact-fact shuffle disappears "
        "entirely with bucketed layout (see sink_bucketed).",
    ),
    "win_row_number": (
        "q_window (top-2 per customer)",
        "Single hash partition by customer + in-partition sort; rank filter applied "
        "before any further projection. No global sort.",
    ),
    "topk_agg": (
        "q_topk",
        "Partial agg -> exchange on the group key -> final agg -> "
        "TakeOrderedAndProject: the driver receives only k rows, never the sorted set.",
    ),
    "stream_tumbling": (
        "q_events_tumbling",
        "Epoch-aligned window grouping is a plain hash agg on (window, type): "
        "partial+final, no session state needed for tumbling windows in batch replay.",
    ),
    "llm_simsearch_knn": (
        "q_knn_brute",
        "JOIN-FREE: the 5 query vectors are inlined as literal structs exploded "
        "per corpus row (single scan, no broadcast build job); cosine is a JVM "
        "higher-order fold with the corpus norm hoisted to one column and query "
        "norms precomputed as literals (6 folds/row, was 15); per-query rank via "
        "WindowGroupLimit partial top-k before the only exchange.",
    ),
    "limit_offset": (
        "keyset pagination",
        "Boundary key = 1-row TakeOrdered plan, broadcast into the page filter; "
        "page = TakeOrderedAndProject after a pushdown-friendly range predicate. "
        "No single-partition window over the table.",
    ),
    "llm_dedup_embcos": (
        "bucketed semantic dedup",
        "Candidate pairs meet in an equi-join on centroid_id (IVF zones); the only "
        "nested-loop is corpus x 8 broadcast centroids (linear). Refine + rank on "
        "the bucket-bounded candidate set.",
    ),
    "join_xmatch_2d": (
        "2-D spatial cross-match",
        "3x3 neighbor-cell probe explode on the query side, stationary data side, "
        "hash equi-join on (cell_x, cell_y), exact-distance residual filter, "
        "window rank nmax=1. The BHpix cell-local join contract.",
    ),
    "llm_pipeline_e2e": (
        "q_dedup_e2e (curation pipeline)",
        "Quality filter fused into the scan; keep-first dedup is ONE corpus "
        "exchange (row_number window over the text fingerprint — round 6 replaced "
        "the agg+join formulation, which moved the corpus through a second "
        "exchange); hash subsample is map-only; final per-lang stats partial+final. "
        "Two corpus-bearing exchanges end-to-end.",
    ),
    "knn_ivf": (
        "q_knn_ivf (bucket-pruned ANN)",
        "Corpus x 8 broadcast centroids assigns buckets (linear, no pair "
        "explosion); queries probe nprobe=2 buckets via equi-join on centroid_id; "
        "cosine refine only on bucket-bounded candidates; per-query top-k through "
        "WindowGroupLimit. The IVF analog of the BHpix cell join.",
    ),
    "cluster_fof_2d": (
        "q_fof (friends-of-friends clustering)",
        "ITERATIVE op — the meaningful 'plan' is the barrier sequence, not one "
        "tree: (1) zone-bucketed candidate pair join checkpointed once (one-way; "
        "the symmetrized view is a lazy union over the checkpoint), (2) "
        "per-partition union-find contraction seed (one Arrow job), (3) one "
        "cross-label-edge probe proving the seed IS the min-label fixpoint "
        "(subcritical common case — no propagation loop at all), else the "
        "Pregel loop runs from the seed with quotient-graph-bounded rounds. "
        "The tree below is the returned labeling (checkpoint scan + sort).",
    ),
}


def main() -> None:
    os.environ.setdefault("LSD_SHUFFLE_PARTITIONS", "8")
    from lsd_spark.registry import QUERIES, load_all
    from lsd_spark.session import get_spark

    load_all()
    spark = get_spark(app_name="plans", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    out = [
        "# PLANS — audited physical plans for the headline queries",
        "",
        "Generated by scripts/gen_plans.py at sf0.1, shuffle.partitions=8, AQE on.",
        "These are the plans the engine is TESTED to keep (tests/test_plans.py);",
        "a regression in any of these shapes fails CI, not just the benchmark.",
        "",
    ]
    for qid, (title, note) in COMMENTARY.items():
        df = QUERIES[qid](spark, SF)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain(mode="formatted")
        head = buf.getvalue().split("\n\n")[0]
        out += [f"## {title} — `{qid}`", "", note, "", "```", head, "```", ""]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("PLANS.md written")


if __name__ == "__main__":
    main()

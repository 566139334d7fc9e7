"""Cross-SF invariants (SURVEY.md §5.3): row counts scale ~linearly
with the scale factor, and ANN variants are sane vs the exact
baseline (recall > 0 against llm_simsearch_knn's ground truth)."""

from __future__ import annotations

from lsd_spark.catalog import load
from lsd_spark.registry import QUERIES, load_all

load_all()

SF_A = "/root/testdata/sf0.001"
SF_B = "/root/testdata/sf0.01"


def test_counts_scale_linearly(spark):
    for table, lo, hi in (("lineitem", 8.0, 12.0), ("orders", 8.0, 12.0),
                          ("events", 8.0, 12.0)):
        a = load(spark, SF_A, table).count()
        b = load(spark, SF_B, table).count()
        assert lo <= b / a <= hi, (table, a, b)


def test_ann_recall_vs_exact(spark):
    exact = {
        (r.vec_id, r.neighbor_id)
        for r in QUERIES["llm_simsearch_knn"](spark, SF_B).collect()
    }
    for ann in ("knn_ivf", "knn_lsh"):
        got = {(r.vec_id, r.neighbor_id) for r in QUERIES[ann](spark, SF_B).collect()}
        recall = len(got & exact) / len(exact)
        assert recall >= 0.2, (ann, recall)  # buckets must find real neighbors

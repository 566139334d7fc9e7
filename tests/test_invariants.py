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
    """Measured recall@5 vs the exact baseline at sf0.01 (near-random
    vectors — the hardest case for bucketing):

        centroids   nprobe=1  2     3     4
        seed        0.92      0.92  0.92  0.96
        kmeans      0.80      0.92  0.96  0.96

    (knn_lsh with 2-bit multi-probe lands ~0.2-0.4 here; clustered
    real embeddings co-locate far better.) The floor below is kept
    loose on purpose — it guards 'buckets find real neighbors', not
    a particular tuning."""
    exact = {
        (r.vec_id, r.neighbor_id)
        for r in QUERIES["llm_simsearch_knn"](spark, SF_B).collect()
    }
    for ann in ("knn_ivf", "knn_ivf_kmeans", "knn_lsh"):
        got = {(r.vec_id, r.neighbor_id) for r in QUERIES[ann](spark, SF_B).collect()}
        recall = len(got & exact) / len(exact)
        assert recall >= 0.2, (ann, recall)  # buckets must find real neighbors


def test_embcos_bucketed_recall_vs_exact(spark):
    """The IVF-bucketed semantic-dedup op must recover most of the
    exact all-pairs duplicate set. At nprobe=2 over near-random
    fixture vectors (the hardest case for bucketing — real duplicate
    clusters co-locate far better) the measured recall is ~0.86 at
    sf0.01; pin a conservative floor, and precision must be 1.0
    (bucketing only ever drops candidates, never invents them)."""
    exact = {
        (r.vec_a, r.vec_b)
        for r in QUERIES["llm_dedup_embcos_exact"](spark, SF_B).collect()
    }
    bucketed = {
        (r.vec_a, r.vec_b) for r in QUERIES["llm_dedup_embcos"](spark, SF_B).collect()
    }
    assert bucketed <= exact, bucketed - exact  # precision == 1.0
    assert len(bucketed & exact) / len(exact) >= 0.5, (len(bucketed), len(exact))


def test_fof_bucketed_refines_exact_components(spark):
    """Bucketed FoF edges are a subset of exact edges, so its
    components REFINE the exact ones: any two vectors the bucketed
    op puts in the same object must also share an exact object."""
    exact = {r.vec_id: r.object_id for r in QUERIES["cluster_fof_exact"](spark, SF_B).collect()}
    bucketed = {r.vec_id: r.object_id for r in QUERIES["cluster_fof"](spark, SF_B).collect()}
    assert set(exact) == set(bucketed)
    by_obj: dict[int, list[int]] = {}
    for vid, oid in bucketed.items():
        by_obj.setdefault(oid, []).append(vid)
    for members in by_obj.values():
        assert len({exact[v] for v in members}) == 1, members


def test_semdedup_drop_rule_invariants(spark):
    """llm_dedup_semantic: some vectors must actually drop at sf0.01,
    every vector appears exactly once, and (the paper's rule) each
    cluster with any epsilon-similar pair keeps its centroid-farthest
    member — the minimum-c_sim vector of a cluster is NEVER dropped."""
    rows = QUERIES["llm_dedup_semantic"](spark, SF_B).collect()
    assert len(rows) == len({r.vec_id for r in rows})
    dropped = [r for r in rows if not r.kept]
    assert dropped, "fixture produced no semantic duplicates"
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for members in by_cluster.values():
        mn = min(members, key=lambda r: (r.c_sim, r.vec_id))
        assert mn.kept, f"centroid-farthest member {mn.vec_id} was dropped"

"""Round-13 optimization equivalence pins: the tile-partitioned FoF
contraction (plans/spatial.tiled_local_labels + seed_complete) and
the quotient map-literal mapping must be bit-identical to the paths
they replaced — the join-based edge generation feeding
_local_cc_labels, and the broadcast LocalRelation join."""

from __future__ import annotations

from pyspark.sql import functions as F

from lsd_spark.registry import cached_plan, load_all
from tests.conftest import SF_DIR

load_all()


def _labels(df):
    return {(r[0], r[1]) for r in df.collect()}


def test_tiled_contraction_matches_join_based_fixpoint(spark):
    """Same nodes, same final labeling: min_label_fixpoint over the
    tiled contraction (seed_complete) vs over the join-generated
    edges — the round-12 formulation. Exact set equality."""
    from lsd_spark.plans import cluster
    from lsd_spark.plans.spatial import (
        FOF2D_R,
        points,
        self_radius_pairs,
        tiled_local_labels,
    )

    pts = points(spark, SF_DIR, "view").select(
        F.col("event_id").alias("vec_id")
    )
    pairs = self_radius_pairs(spark, SF_DIR, "view", FOF2D_R)
    old = _labels(cluster.min_label_fixpoint(pts, pairs))
    local = tiled_local_labels(spark, SF_DIR, "view", FOF2D_R)
    new = _labels(
        cluster.min_label_fixpoint(
            pts, pairs, local_labels=local, seed_complete=True
        )
    )
    assert old == new
    assert len(new) == pts.count()  # isolated points present


def test_tiled_halo_covers_cross_tile_pairs(spark):
    """Hand-built mini-plane: pairs straddling a tile boundary must
    land in one component — the halo-duplication guarantee. Points
    sit in distinct tiles (FOF_TILE_CELLS apart) chained within one
    linking length of the boundary."""
    from lsd_spark.plans import cluster
    from lsd_spark.plans.spatial import FOF_TILE_CELLS

    # synthetic (vec_id, x, y): a chain crossing x-tile boundaries at
    # x = k * FOF_TILE_CELLS * R, R = 1.0
    R = 1.0
    b = FOF_TILE_CELLS * R
    rows = [
        (1, b - 0.4, 5.0),   # left tile, near boundary
        (2, b + 0.4, 5.0),   # right tile — within R of 1
        (3, b + 1.2, 5.0),   # right tile — within R of 2, not of 1
        (10, 2 * b - 0.3, 50.0),
        (11, 2 * b + 0.3, 50.0),
        (99, 5.0, 80.0),     # isolated
    ]
    pts = spark.createDataFrame(
        [(i,) for i, _, _ in rows], "vec_id long"
    )
    # build the tiled contraction inline over a literal point frame
    # (mirror tiled_local_labels' tagging over arbitrary points)
    from lsd_spark.plans import spatial

    pdf = spark.createDataFrame(rows, "event_id long, x double, y double")
    orig_points = spatial.points
    try:
        spatial.points = lambda *_a, **_k: pdf
        local = spatial.tiled_local_labels(spark, SF_DIR, "view", R)
        pairs = spatial.self_radius_pairs(spark, SF_DIR, "view", R)
        got = _labels(
            cluster.min_label_fixpoint(
                pts, pairs, local_labels=local, seed_complete=True
            )
        )
    finally:
        spatial.points = orig_points
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (99, 99)}


def test_quotient_map_literal_matches_broadcast_join(spark, monkeypatch):
    """The same graph solved with the map-literal mapping (threshold
    high) and the broadcast-join mapping (threshold 0) must agree."""
    from lsd_spark.plans import cluster

    n = 600
    chain = [(i, i + 1) for i in range(n) if i % 5 != 4]
    nodes = spark.createDataFrame([(i,) for i in range(n)], "vec_id long")
    pairs = spark.createDataFrame(chain, "u long, v long").repartition(8)
    got_lit = _labels(cluster.min_label_fixpoint(nodes, pairs))
    assert cluster.LAST_FIXPOINT_PATH["path"] == "quotient"
    monkeypatch.setattr(cluster, "QUOTIENT_MAP_LITERAL_MAX", 0)
    got_join = _labels(cluster.min_label_fixpoint(nodes, pairs))
    assert cluster.LAST_FIXPOINT_PATH["path"] == "quotient"
    want = {(i, i - (i % 5)) for i in range(n)}
    assert got_lit == want
    assert got_join == want


def test_exact_fof_numpy_fold_is_bit_identical_to_hof(spark):
    """Round-13 pin for cluster_fof_exact's numpy kernel: the
    dimension-ordered float64 accumulation must reproduce the JVM
    AGGREGATE(ZIP_WITH(...)) left fold BIT-EXACTLY (doubles compared
    with ==, no tolerance) — dot and norm per pair on the real
    fixture embeddings."""
    import numpy as np

    from lsd_spark.catalog import load
    from lsd_spark.operators.joins import DOT_SPARK, NORM_SPARK

    emb = load(spark, SF_DIR, "embeddings").limit(60)
    a = emb.select(
        F.col("vec_id").alias("u"), F.col("embedding").alias("e_a"),
        F.expr(NORM_SPARK.format(a="embedding")).alias("n_a"),
    )
    b = emb.select(
        F.col("vec_id").alias("v"), F.col("embedding").alias("e_b"),
        F.expr(NORM_SPARK.format(a="embedding")).alias("n_b"),
    )
    jvm = (
        a.join(b, F.col("u") < F.col("v"))
        .select(
            "u", "v",
            F.expr(DOT_SPARK.format(a="e_a", b="e_b")).alias("dot"),
            "n_a", "n_b", "e_a", "e_b",
        )
        .toPandas()
    )
    assert len(jvm) > 0
    for row in jvm.itertuples(index=False):
        ea = np.asarray(row.e_a, dtype=np.float64)
        eb = np.asarray(row.e_b, dtype=np.float64)
        acc = 0.0
        na2 = 0.0
        nb2 = 0.0
        for k in range(len(ea)):
            acc += ea[k] * eb[k]
            na2 += ea[k] * ea[k]
            nb2 += eb[k] * eb[k]
        assert acc == row.dot, (row.u, row.v, acc, row.dot)
        assert np.sqrt(na2) == row.n_a
        assert np.sqrt(nb2) == row.n_b


def test_edges_collect_matches_distributed_paths(spark, monkeypatch):
    """Round-13 edges-collect fast path: the one-collect driver solve
    must label identically to the contraction machinery it bypasses,
    and a truncated collect (cap forced to 0) must fall through to
    that machinery transparently."""
    from lsd_spark.plans import cluster

    n = 500
    chain = [(i, i + 1) for i in range(n) if i % 3 != 2]
    nodes = spark.createDataFrame([(i,) for i in range(n)], "vec_id long")
    pairs = spark.createDataFrame(chain, "u long, v long").repartition(8)
    want = {(i, i - (i % 3)) for i in range(n)}

    got_fast = _labels(
        cluster.min_label_fixpoint(nodes, pairs, edges_bounded=True)
    )
    assert cluster.LAST_FIXPOINT_PATH["path"] == "edges-collect"
    assert got_fast == want

    monkeypatch.setattr(cluster, "EDGE_SINGLE_TASK_MAX", 0)
    got_fb = _labels(
        cluster.min_label_fixpoint(nodes, pairs, edges_bounded=True)
    )
    assert cluster.LAST_FIXPOINT_PATH["path"] in ("quotient", "probe-converged")
    assert got_fb == want


def test_nodes_from_edges_local_solve_matches(spark, monkeypatch):
    """Round-14 nodes_from_edges: when the caller's node set IS the
    edge endpoint set, the edges-collect path must return the
    identical labeling as a LocalRelation (no emb scan), and the
    truncated fallback must still consume emb and agree."""
    from lsd_spark.plans import cluster

    n = 300
    chain = [(i, i + 1) for i in range(n) if i % 3 != 2]
    pairs = spark.createDataFrame(chain, "u long, v long").repartition(4)
    from pyspark.sql import functions as F

    nodes = pairs.select(
        F.explode(F.array("u", "v")).alias("vec_id")
    ).distinct()
    want = _labels(
        cluster.min_label_fixpoint(nodes, pairs, edges_bounded=True)
    )

    got_local = cluster.min_label_fixpoint(
        nodes, pairs, edges_bounded=True, nodes_from_edges=True
    )
    assert cluster.LAST_FIXPOINT_PATH["path"] == "edges-collect-local"
    assert _labels(got_local) == want

    monkeypatch.setattr(cluster, "EDGE_SINGLE_TASK_MAX", 0)
    got_fb = _labels(
        cluster.min_label_fixpoint(
            nodes, pairs, edges_bounded=True, nodes_from_edges=True
        )
    )
    assert cluster.LAST_FIXPOINT_PATH["path"] != "edges-collect-local"
    assert got_fb == want

"""Bit-identity of the collapse-identical-first dedup plans.

embcos_near_pairs and the rewritten llm_dedup_edit exist because
duplicate-heavy corpora blow the in-bucket/in-block pair count up
quadratically in the duplicate multiplicity (the 10x stress dir:
92.7M candidate cosines vs 0.9M over representatives; a 25-minute
single-task levenshtein grind). The optimization is only legal
because it is RESULT-PRESERVING: identical payloads get identical
bucket/block assignments and identical similarities, and the
threshold commutes with the group expansion. These tests pin that
equivalence against the naive reference plans on (a) the plain
fixture, where every group is a singleton, and (b) a 3x-replicated
dir with genuine duplicate groups, where the expansion paths
actually fire."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_SMALL = "/root/testdata/sf0.001"
INFLATED = os.path.join(REPO, ".cache", "eqtest_x3")


@pytest.fixture(scope="module")
def inflated_dir():
    if not os.path.exists(os.path.join(INFLATED, "embeddings.parquet")):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "inflate_sf.py"),
             "--src", "/root/testdata/sf0.001", "--k", "3", "--out", INFLATED],
            check=True, capture_output=True,
        )
    return INFLATED


def _naive_embcos_pairs(spark, sf_dir):
    """The pre-optimization reference plan: bucket join over every
    vector, wide dropDuplicates, threshold after."""
    from lsd_spark.catalog import load
    from lsd_spark.llm.dedup import EMBCOS_NPROBE, EMBCOS_T
    from lsd_spark.llm.simsearch import ivf_assignments
    from lsd_spark.operators.joins import COS_SPARK

    emb = load(spark, sf_dir, "embeddings")
    assign = ivf_assignments(emb, EMBCOS_NPROBE)
    a, b = assign.alias("a"), assign.alias("b")
    sim = F.round(F.expr(COS_SPARK.format(a="e_a", b="e_b")), 6)
    return (
        a.join(
            b,
            (F.col("a.centroid_id") == F.col("b.centroid_id"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.embedding").alias("e_a"),
            F.col("b.embedding").alias("e_b"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
        .select("vec_a", "vec_b", sim.alias("sim"))
        .filter(F.col("sim") >= EMBCOS_T)
    )


def _naive_edit_pairs(spark, sf_dir):
    """The pre-optimization reference plan: block join over every
    document, levenshtein on each candidate pair."""
    from lsd_spark.catalog import load
    from lsd_spark.llm.dedup import EDIT_BLOCK_CHARS, EDIT_REL_T

    docs = load(spark, sf_dir, "documents")
    blk = F.md5(F.substring("text", 1, EDIT_BLOCK_CHARS).cast("binary"))
    d = docs.select("doc_id", "text", blk.alias("blk"))
    a, b = d.alias("a"), d.alias("b")
    dist = F.levenshtein(F.col("a.text"), F.col("b.text"))
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            dist.cast("bigint").alias("dist"),
            F.greatest(F.length("a.text"), F.length("b.text")).alias("mx"),
        )
        .filter(F.col("dist") <= EDIT_REL_T * F.col("mx"))
        .select("doc_a", "doc_b", "dist")
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize("dir_kind", ["plain", "inflated"])
def test_embcos_near_pairs_bit_identical(spark, inflated_dir, dir_kind):
    from lsd_spark.llm.dedup import embcos_near_pairs

    d = SF_SMALL if dir_kind == "plain" else inflated_dir
    ref = _rows(_naive_embcos_pairs(spark, d))
    got = _rows(embcos_near_pairs(spark, d))
    assert got == ref
    if dir_kind == "inflated":
        assert len(got) > 0  # replicas guarantee within-group pairs


@pytest.mark.parametrize("dir_kind", ["plain", "inflated"])
def test_edit_dedup_bit_identical(spark, inflated_dir, dir_kind):
    from lsd_spark.registry import QUERIES, load_all

    load_all()
    d = SF_SMALL if dir_kind == "plain" else inflated_dir
    ref = _rows(_naive_edit_pairs(spark, d))
    got = _rows(QUERIES["llm_dedup_edit"](spark, d))
    assert got == ref
    if dir_kind == "inflated":
        # every original doc's 3 replicas form a dist-0 clique
        assert any(r[2] == 0 for r in got)


def _naive_ngram_pairs(spark, sf_dir):
    """The pre-optimization reference plan: posting join over every
    document, df cap at raw counts."""
    from lsd_spark.catalog import load
    from lsd_spark.llm.dedup import NGRAM_DF_CAP, NGRAM_T, _shingled

    docs = load(spark, sf_dir, "documents")
    tok = _shingled(docs).select("doc_id", F.explode("shingles").alias("s"))
    hot = tok.groupBy("s").agg(F.count("*").alias("df")).filter(F.col("df") > NGRAM_DF_CAP)
    tk = tok.join(F.broadcast(hot.select("s")), "s", "left_anti")
    sz = tk.groupBy("doc_id").agg(F.count("*").alias("c"))
    a, b = tk.alias("a"), tk.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("i"))
    )
    sa = sz.select(F.col("doc_id").alias("doc_a"), F.col("c").alias("ca"))
    sb = sz.select(F.col("doc_id").alias("doc_b"), F.col("c").alias("cb"))
    jac = F.round(F.col("i") / (F.col("ca") + F.col("cb") - F.col("i")), 4)
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= NGRAM_T)
        .select("doc_a", "doc_b", "jaccard")
    )


@pytest.mark.parametrize("dir_kind", ["plain", "inflated"])
def test_ngram_dedup_bit_identical(spark, inflated_dir, dir_kind):
    from lsd_spark.registry import QUERIES, load_all

    load_all()
    d = SF_SMALL if dir_kind == "plain" else inflated_dir
    ref = _rows(_naive_ngram_pairs(spark, d))
    got = _rows(QUERIES["llm_dedup_ngram"](spark, d))
    assert got == ref
    if dir_kind == "inflated":
        assert any(abs(r[2] - 1.0) < 1e-9 for r in got)  # replica cliques


def _naive_semdedup(spark, sf_dir):
    """The pre-optimization member-level SemDedup reference plan:
    assign EVERY vector, pair every within-cluster member pair."""
    from lsd_spark.catalog import load
    from lsd_spark.llm.simsearch import (
        SEMDEDUP_T,
        _nearest_centroids,
        kmeans_centroids,
    )
    from lsd_spark.operators.joins import DOT_SPARK, NORM_SPARK

    emb = load(spark, sf_dir, "embeddings")
    cent = kmeans_centroids(spark, emb)
    assigned = _nearest_centroids(emb, cent, 1).select(
        "vec_id", "embedding", "centroid_id"
    )
    c_sim = F.round(
        F.expr(DOT_SPARK.format(a="embedding", b="c_emb"))
        / (F.expr(NORM_SPARK.format(a="embedding"))
           * F.expr(NORM_SPARK.format(a="c_emb"))),
        6,
    )
    cs = assigned.join(F.broadcast(cent), "centroid_id").select(
        "vec_id", "embedding", "centroid_id",
        c_sim.alias("c_sim"),
        F.expr(NORM_SPARK.format(a="embedding")).alias("n"),
    )
    x, y = cs.alias("x"), cs.alias("y")
    pair_sim = F.round(
        F.expr(DOT_SPARK.format(a="x.embedding", b="y.embedding"))
        / (F.col("x.n") * F.col("y.n")),
        6,
    )
    dropped = (
        x.join(
            y,
            (F.col("x.centroid_id") == F.col("y.centroid_id"))
            & (F.col("x.vec_id") != F.col("y.vec_id")),
        )
        .filter(pair_sim >= SEMDEDUP_T)
        .filter(
            (F.col("y.c_sim") < F.col("x.c_sim"))
            | ((F.col("y.c_sim") == F.col("x.c_sim"))
               & (F.col("y.vec_id") < F.col("x.vec_id")))
        )
        .select(F.col("x.vec_id").alias("vec_id"))
        .distinct()
        .withColumn("_dropped", F.lit(True))
    )
    return cs.join(dropped, "vec_id", "left").select(
        "vec_id",
        F.col("centroid_id").alias("cluster_id"),
        "c_sim",
        F.coalesce(~F.col("_dropped"), F.lit(True)).alias("kept"),
    )


@pytest.mark.parametrize("dir_kind", ["plain", "inflated"])
def test_semdedup_collapse_bit_identical(spark, inflated_dir, dir_kind):
    from lsd_spark.registry import QUERIES, load_all

    load_all()
    d = SF_SMALL if dir_kind == "plain" else inflated_dir
    ref = _rows(_naive_semdedup(spark, d))
    got = _rows(QUERIES["llm_dedup_semantic"](spark, d))
    assert got == ref
    if dir_kind == "inflated":
        # replica groups guarantee within-group drops fired
        dropped = [r for r in got if not r[3]]
        assert len(dropped) >= len(got) // 2


def _naive_containment(spark, sf_dir):
    """The pre-collapse reference plan: postings over every document,
    doc-level df cap, doc-level posting self-join, both directed
    ratios, threshold — quadratic in duplicate multiplicity."""
    from lsd_spark.catalog import load
    from lsd_spark.llm.dedup import CONTAIN_T, NGRAM_DF_CAP, _shingled

    docs = load(spark, sf_dir, "documents")
    tok = _shingled(docs).select("doc_id", F.explode("shingles").alias("s"))
    hot = (
        tok.groupBy("s").agg(F.count("*").alias("df"))
        .filter(F.col("df") > NGRAM_DF_CAP)
    )
    tk = tok.join(F.broadcast(hot.select("s")), "s", "left_anti").select(
        "doc_id", "s"
    )
    sz = tk.groupBy("doc_id").agg(F.count("*").alias("c"))
    a, b = tk.alias("a"), tk.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("u"), F.col("b.doc_id").alias("v"))
        .agg(F.count("*").alias("i"))
    )
    su = sz.select(F.col("doc_id").alias("u"), F.col("c").alias("cu"))
    sv = sz.select(F.col("doc_id").alias("v"), F.col("c").alias("cv"))
    both = inter.join(su, "u").join(sv, "v")
    fwd = both.select(
        F.col("u").alias("doc_a"), F.col("v").alias("doc_b"),
        F.round(F.col("i") / F.col("cu"), 4).alias("containment"),
    )
    rev = both.select(
        F.col("v").alias("doc_a"), F.col("u").alias("doc_b"),
        F.round(F.col("i") / F.col("cv"), 4).alias("containment"),
    )
    return fwd.unionByName(rev).filter(F.col("containment") >= CONTAIN_T)


@pytest.mark.parametrize("dir_kind", ["plain", "inflated"])
def test_containment_collapse_bit_identical(spark, inflated_dir, dir_kind):
    """Round-8 collapse rewrite of llm_dedup_containment: identical
    texts share shingle sets, so rep-level df caps / intersections /
    ratios expand back to the exact naive directed pair set — the
    inflated dir makes the within-group (containment 1.0 both ways)
    and cross-group expansion paths actually fire. The COLLAPSED
    builder is pinned directly: the registered op routes by
    duplicate fraction and would take the naive path on the plain
    dir (making the comparison vacuous there)."""
    from lsd_spark.llm.dedup import _containment_collapsed
    from lsd_spark.registry import clear_plan_cache

    d = SF_SMALL if dir_kind == "plain" else inflated_dir
    clear_plan_cache()
    got = _rows(_containment_collapsed(spark, d))
    ref = _rows(_naive_containment(spark, d))
    assert got == ref
    clear_plan_cache()


def _naive_simhash(spark, sf_dir):
    """The pre-collapse reference plan: per-document signature fold,
    doc-level band self-join, hamming refine."""
    from lsd_spark.catalog import load
    from lsd_spark.llm.dedup import HAM_T, HASH60_SPARK, _simhash_terms

    docs = load(spark, sf_dir, "documents")
    sh = docs.selectExpr(
        "doc_id",
        "transform(array_distinct(split(text, ' ')), t -> "
        + HASH60_SPARK.format(t="t")
        + ") AS hs",
    ).selectExpr("doc_id", f"({_simhash_terms('spark')}) AS simhash")
    bands = sh.selectExpr(
        "doc_id", "simhash", "explode(array(0, 1, 2, 3)) AS j"
    ).selectExpr(
        "doc_id", "simhash", "j", "(shiftright(simhash, 15 * j) & 32767) AS bk"
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.j") == F.col("b.j"))
            & (F.col("a.bk") == F.col("b.bk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.expr("a.simhash ^ b.simhash")).cast("long").alias("hamming"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .filter(F.col("hamming") <= HAM_T)
    )


@pytest.mark.parametrize("dir_kind", ["plain", "inflated"])
def test_simhash_collapse_bit_identical(spark, inflated_dir, dir_kind):
    """Round-8 collapse rewrite of llm_dedup_simhash: identical
    texts share the full signature (hence every band, hence
    hamming 0), so rep-level banding + membership expansion is the
    exact naive pair set — the inflated dir fires the within-group
    (hamming 0) and cross-group expansion paths. Pins the COLLAPSED
    builder directly (the registered op routes by duplicate
    fraction and would take the naive path on the plain dir)."""
    from lsd_spark.llm.dedup import _simhash_collapsed
    from lsd_spark.registry import clear_plan_cache

    d = SF_SMALL if dir_kind == "plain" else inflated_dir
    clear_plan_cache()
    got = _rows(_simhash_collapsed(spark, d))
    ref = _rows(_naive_simhash(spark, d))
    assert got == ref
    clear_plan_cache()


@pytest.mark.parametrize("dir_kind", ["plain", "inflated"])
def test_minhash_hits_collapse_bit_identical(spark, inflated_dir, dir_kind):
    """Round-8 collapse routing for the MinHash/LSH chain: rep-level
    signatures + band join + refine, expanded through the membership
    map, must equal the full-corpus chain — within-group pairs carry
    jaccard = mh_est = 1.0 (identical shingle sets collide in every
    band and score 1.0 in the naive plan)."""
    from lsd_spark.catalog import load
    from lsd_spark.llm.dedup import _minhash_hits_collapsed, _minhash_scored_over
    from lsd_spark.registry import clear_plan_cache

    d = SF_SMALL if dir_kind == "plain" else inflated_dir
    clear_plan_cache()
    got = _rows(_minhash_hits_collapsed(spark, d))
    ref = _rows(
        _minhash_scored_over(spark, d, load(spark, d, "documents"), "minhash_sig")
    )
    assert got == ref
    clear_plan_cache()


@pytest.mark.parametrize("dir_kind", ["plain", "inflated"])
def test_simhash_clusters_collapse_bit_identical(spark, inflated_dir, dir_kind):
    """Round-9 llm_dedup_simhash_clusters: components over the REP
    graph expanded by membership (plus isolated multi-doc groups as
    their own clusters) must equal components over the naive doc-
    level pair set — cluster ids, sizes, AND exact membership
    fingerprints. The inflated dir fires both special paths: the
    within-group expansion and the isolated-rep multi-doc groups."""
    from lsd_spark.llm.dedup import (
        _simhash_clusters_collapsed,
        _simhash_clusters_naive,
    )
    from lsd_spark.registry import clear_plan_cache

    d = SF_SMALL if dir_kind == "plain" else inflated_dir
    clear_plan_cache()
    got = _rows(_simhash_clusters_collapsed(spark, d))
    ref = _rows(_simhash_clusters_naive(spark, d))
    assert got == ref
    clear_plan_cache()


def test_semdedup_pair_kernel_matches_hof_join(spark, inflated_dir):
    """Round-13 pin for llm_dedup_semantic's applyInPandas pair
    kernel: the margin-prefiltered numpy candidates, after the exact
    JVM round(dot/(n_x*n_y), 6) >= T filter, must equal the pair set
    of the old HOF-fold x/y self-join — on the plain fixture and on
    the 3x-replicated dir (where zero-norm/duplicate groups fire)."""
    from lsd_spark.catalog import load
    from lsd_spark.llm.simsearch import (SEMDEDUP_T, _nearest_centroids,
                                         kmeans_centroids)
    from lsd_spark.operators.joins import DOT_SPARK, NORM_SPARK

    for d in (SF_SMALL, inflated_dir):
        emb = load(spark, d, "embeddings")
        cent = kmeans_centroids(spark, emb)
        fp = F.md5(F.col("embedding").cast("string"))
        tagged = emb.select("vec_id", "embedding", fp.alias("fp"))
        groups = tagged.groupBy("fp").agg(
            F.min("vec_id").alias("rvid"), F.first("embedding").alias("r_emb")
        )
        reps = groups.select(
            F.col("rvid").alias("vec_id"), F.col("r_emb").alias("embedding")
        )
        assigned = _nearest_centroids(reps, cent, 1).select(
            "vec_id", "embedding", "centroid_id"
        )
        norm = F.expr(NORM_SPARK.format(a="embedding"))
        cs = assigned.select("vec_id", "embedding", "centroid_id", norm.alias("n"))
        x = cs.alias("x")
        y = cs.alias("y")
        pair_sim = F.round(
            F.expr(DOT_SPARK.format(a="x.embedding", b="y.embedding"))
            / (F.col("x.n") * F.col("y.n")),
            6,
        )
        hof_pairs = sorted(
            map(
                tuple,
                x.join(
                    y,
                    (F.col("x.centroid_id") == F.col("y.centroid_id"))
                    & (F.col("x.vec_id") != F.col("y.vec_id")),
                )
                .filter(pair_sim >= SEMDEDUP_T)
                .select(F.col("x.vec_id"), F.col("y.vec_id"))
                .collect(),
            )
        )
        # drive the new kernel path exactly as the op builds it
        from lsd_spark.llm import simsearch as ss

        near = ss._semdedup_near_pairs(cs.select("vec_id", "embedding", "centroid_id"))
        got = sorted(map(tuple, near.collect()))
        assert got == hof_pairs, (d, len(got), len(hof_pairs))

"""Engine-internal invariants (formerly test_round9_ops.py):
Arrow kernel parity, plan-cache block release and dependent
eviction, overflow guards, routing probes."""


import pytest
from pyspark.sql import functions as F
from tests.conftest import SF_DIR


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_udaf_grouped_agg_matches_declarative(spark):
    """The mapInPandas kernel must equal the pure-SQL var_samp on the
    same quantization grid — the kernel is a demonstration of the
    keyed-reducer surface, not different semantics."""
    from lsd_spark.registry import QUERIES_RAW, load_all

    load_all()
    got = {
        r["o_custkey"]: (r["n_orders"], r["var_price"])
        for r in QUERIES_RAW["udaf_grouped_agg"](spark, SF_DIR).collect()
    }
    want = {
        r["o_custkey"]: (r["n_orders"], r["var_price"])
        for r in spark.sql(
            "SELECT o_custkey, count(*) AS n_orders, "
            "CAST(FLOOR(var_samp(o_totalprice) / 10000.0 + 0.5) AS BIGINT)"
            " AS var_price "
            f"FROM parquet.`{SF_DIR}/orders.parquet` "
            "GROUP BY o_custkey HAVING count(*) >= 2"
        ).collect()
    }
    assert got == want


def test_udaf_grouped_agg_group_straddles_arrow_batches(spark):
    """Groups WITHIN a shuffle partition arrive split across multiple
    Arrow batches when maxRecordsPerBatch is small — the kernel
    concats the partition's batches before the groupby, so results
    must be invariant to the batch size."""
    from lsd_spark.registry import QUERIES_RAW, clear_plan_cache, load_all

    load_all()
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    baseline = sorted(_rows(QUERIES_RAW["udaf_grouped_agg"](spark, SF_DIR)))
    try:
        spark.conf.set(key, "7")  # orders sf0.01 has ~15k rows -> many batches
        clear_plan_cache()
        tiny = sorted(_rows(QUERIES_RAW["udaf_grouped_agg"](spark, SF_DIR)))
    finally:
        spark.conf.set(key, old)
        clear_plan_cache()
    assert tiny == baseline


def test_embcos_exact_parallelized_plan_and_rows(spark):
    """The rewritten all-pairs baseline must (a) not stream the whole
    corpus through one task, (b) keep the exact same output as the
    direct COS_SPARK formulation it replaced."""
    from lsd_spark.catalog import load
    from lsd_spark.operators.joins import COS_SPARK
    from lsd_spark.registry import QUERIES_RAW, load_all
    from lsd_spark.llm.dedup import EMBCOS_T

    load_all()
    df = QUERIES_RAW["llm_dedup_embcos_exact"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    # the streamed side is explicitly repartitioned (round-8 VERDICT #3)
    assert "Exchange RoundRobinPartitioning" in plan

    emb = load(spark, SF_DIR, "embeddings")
    a, b = emb.alias("a"), emb.alias("b")
    sim = F.round(F.expr(COS_SPARK.format(a="a.embedding", b="b.embedding")), 6)
    naive = (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            sim.alias("sim"),
        )
        .filter(F.col("sim") >= EMBCOS_T)
    )
    assert sorted(_rows(df)) == sorted(_rows(naive))


def test_fof_exact_rows_unchanged_by_rewrite(spark):
    """cluster_fof_exact's norm-precompute edge set must label every
    vector identically to the direct per-pair cosine formulation."""
    from lsd_spark.catalog import load
    from lsd_spark.operators.joins import COS_SPARK
    from lsd_spark.plans.cluster import EMBCOS_T, min_label_fixpoint
    from lsd_spark.registry import QUERIES_RAW, load_all

    load_all()
    got = sorted(_rows(QUERIES_RAW["cluster_fof_exact"](spark, SF_DIR)))

    emb = load(spark, SF_DIR, "embeddings")
    a, b = emb.alias("a"), emb.alias("b")
    sim = F.round(F.expr(COS_SPARK.format(a="a.embedding", b="b.embedding")), 6)
    pairs = (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("u"),
            F.col("b.vec_id").alias("v"),
            sim.alias("sim"),
        )
        .filter(F.col("sim") >= EMBCOS_T)
        .select("u", "v")
    )
    want = sorted(_rows(min_label_fixpoint(emb, pairs)))
    assert got == want


def test_gini_overflow_raises_not_null(spark):
    """Spark's non-ANSI decimal(38,0) sum NULLs on overflow while the
    DuckDB HUGEINT oracle raises; the closing expression converts
    that NULL into raise_error so the engines fail the same way.
    Reproduce the exact closing expression over an accumulator
    forced past 1e38."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from lsd_spark.operators.aggregates import GINI_CLOSING_EXPR

    big = "99999999999999999999999999999999999999"  # 38 nines
    df = spark.sql(
        f"SELECT 'x' AS pri, CAST(2 AS BIGINT) AS n, "
        f"SUM(CAST('{big}' AS DECIMAL(38,0))) AS sx, "
        f"SUM(CAST('{big}' AS DECIMAL(38,0))) AS six "
        "FROM VALUES (1), (2) AS t(i)"
    )
    # precondition: the overflow really does yield NULL silently
    row = df.collect()[0]
    assert row["sx"] is None and row["six"] is None
    # round-9 ADVICE #3: exercise the op's ACTUAL closing expression
    # (imported constant), so moving the divisor-side coalesce back
    # to the numerator — the exact bug this test documents — trips
    # here too. The sx guard must live in the DIVISOR:
    # IntegralDivide's codegen evaluates the divisor first and
    # short-circuits to NULL, so a numerator-only coalesce silently
    # never fires (found writing this test).
    guarded = df.select(
        F.expr(GINI_CLOSING_EXPR).alias("gini_x1e4")
    )
    with pytest.raises(SparkRuntimeException, match="overflow"):
        guarded.collect()
    # six-only overflow must also trip (caught in the numerator once
    # the divisor is non-null)
    df2 = spark.sql(
        f"SELECT CAST(2 AS BIGINT) AS n, "
        f"CAST(100 AS DECIMAL(38,0)) AS sx, "
        f"SUM(CAST('{big}' AS DECIMAL(38,0))) AS six "
        "FROM VALUES (1), (2) AS t(i)"
    )
    guarded2 = df2.select(
        F.expr(GINI_CLOSING_EXPR).alias("g")
    )
    with pytest.raises(SparkRuntimeException, match="overflow"):
        guarded2.collect()


def test_gini_no_trip_on_fixture(spark, duck):
    """The guard is a no-op below the ceiling: fixture gini still
    matches the HUGEINT oracle bit-for-bit."""
    from lsd_spark.registry import ORACLES, QUERIES_RAW, load_all

    load_all()
    got = sorted(_rows(QUERIES_RAW["agg_gini"](spark, SF_DIR)))
    want = [tuple(r) for r in duck.sql(ORACLES["agg_gini"]).fetchall()]
    assert got == sorted(want)


def test_dup_fraction_probe_is_exact(spark, duck):
    """corpus_dup_fraction must equal the exact 1 - d/n, not an HLL
    estimate — plan routing near DUP_COLLAPSE_T has to be
    deterministic across sessions."""
    from lsd_spark.llm.dedup import clear_dup_stats, corpus_dup_fraction

    clear_dup_stats()
    got = corpus_dup_fraction(spark, SF_DIR)
    n, d = duck.sql(
        "SELECT count(*), count(DISTINCT md5(text)) FROM documents"
    ).fetchone()
    assert got == max(0.0, 1.0 - d / n)
    clear_dup_stats()


def test_drop_plans_matching_unpersists_ckpt_blocks(spark):
    """Dropping a ckpt_shared frame must free its DISK_ONLY
    localCheckpoint blocks deterministically, not wait for driver GC
    (bench.py drops per timed run)."""
    from lsd_spark.llm.dedup import ckpt_shared
    from lsd_spark.registry import drop_plans_matching

    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    df = ckpt_shared(
        spark, SF_DIR, "r9_unpersist_probe",
        lambda: spark.range(1000).selectExpr("id", "id * 2 AS y"),
    )
    assert df.count() == 1000
    assert jsc.getPersistentRDDs().size() == before + 1
    drop_plans_matching("ckpt:r9_unpersist_probe")
    assert jsc.getPersistentRDDs().size() == before


def test_drop_plans_matching_evicts_dependents(spark):
    """Round-9 ADVICE #1: unpersisting a localCheckpointed RDD
    deletes its only data copy (lineage truncated), so a SURVIVING
    cache entry whose plan references the dropped frame would fail
    at its next execution. drop_plans_matching must therefore evict
    dependents too — and leave unrelated entries alone."""
    from pyspark.sql import functions as F

    from lsd_spark import registry
    from lsd_spark.llm.dedup import ckpt_shared

    ck = ckpt_shared(
        spark, SF_DIR, "r9_dep_probe",
        lambda: spark.range(100).selectExpr("id", "id * 3 AS y"),
    )
    dep = ck.select((F.col("y") + 1).alias("z"))
    dep_key = None
    unrel_key = None
    for sfx, frame in (("dep_on_r9_probe", dep), ("unrelated_r9", spark.range(5))):
        key = registry.cached_plan(spark, SF_DIR, sfx, lambda f=frame: f)
        assert key is frame
    for k in registry._PLAN_CACHE:
        if k[2] == "_plan:dep_on_r9_probe":
            dep_key = k
        if k[2] == "_plan:unrelated_r9":
            unrel_key = k
    assert dep_key and unrel_key
    registry.drop_plans_matching("ckpt:r9_dep_probe")
    assert dep_key not in registry._PLAN_CACHE  # dependent evicted
    assert unrel_key in registry._PLAN_CACHE  # unrelated survives
    registry._PLAN_CACHE.pop(unrel_key, None)

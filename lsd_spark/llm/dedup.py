"""§2.J deduplication — first-class training-data-pipeline operators.

- exact dedup: hash-groupBy on a content fingerprint (md5). At
  100 TB this is a map-side-combined agg on a 16-byte key — the
  cheapest possible shuffle; never group by the raw text.
- near dedup: MinHash + LSH banding, entirely in Catalyst built-ins
  (no Python): token shingles → H minhashes (xxhash64, fixed seeds)
  → B band keys → self-equi-join on (band, band_hash) → exact
  Jaccard refinement. The band key IS the zones technique again
  (SURVEY.md §2.C design note): candidate generation is an equi
  join, never a cross product, so it scales linearly with collision
  count, not quadratically with corpus size.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lsd_spark.catalog import load
from lsd_spark.registry import register

N_HASHES = 16
N_BANDS = 4
ROWS_PER_BAND = N_HASHES // N_BANDS
JACCARD_T = 0.6


@register(
    "llm_dedup_exact",
    oracle=(
        "WITH g AS (SELECT md5(text) AS fp, count(*) AS c FROM documents GROUP BY fp) "
        "SELECT CAST(SUM(c) AS BIGINT) AS n_docs, count(*) AS n_unique, "
        "CAST(COALESCE(SUM(CASE WHEN c > 1 THEN 1 END), 0) AS BIGINT) AS dup_groups, "
        "CAST(COALESCE(SUM(CASE WHEN c > 1 THEN c END), 0) AS BIGINT) AS dup_docs "
        "FROM g"
    ),
)
def llm_dedup_exact(spark, sf_dir):
    """Exact dedup summary over md5 content fingerprints."""
    docs = load(spark, sf_dir, "documents")
    g = docs.groupBy(F.md5(F.col("text").cast("binary")).alias("fp")).agg(
        F.count("*").alias("c")
    )
    return g.agg(
        F.sum("c").cast("long").alias("n_docs"),
        F.count("*").alias("n_unique"),
        F.coalesce(F.sum(F.when(F.col("c") > 1, 1)), F.lit(0)).cast("long").alias("dup_groups"),
        F.coalesce(F.sum(F.when(F.col("c") > 1, F.col("c"))), F.lit(0))
        .cast("long")
        .alias("dup_docs"),
    )


def _shingled(docs):
    """doc_id + distinct 3-token shingle array (word-soup safe)."""
    tok = F.split("text", " ")
    idx = F.sequence(F.lit(1), F.greatest(F.size(tok) - 2, F.lit(1)))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tok, i, 3)))
    return docs.select("doc_id", F.array_distinct(sh).alias("shingles"))


def minhash_signature(shingles_col):
    """H independent minhashes via xxhash64(shingle, seed) — fixed
    seeds 0..H-1, fully deterministic, JVM-side."""
    return F.array(
        *[
            F.array_min(
                F.transform(shingles_col, lambda s, seed=seed: F.xxhash64(s, F.lit(seed)))
            )
            for seed in range(N_HASHES)
        ]
    )


@register("llm_dedup_near", oracle=None)  # rows-only: LSH candidate set is engine-specific
def llm_dedup_near(spark, sf_dir):
    """MinHash/LSH near-duplicate pairs at Jaccard >= 0.6 over
    3-token shingles. Deterministic (fixed hash seeds); rows-only
    because LSH banding (4 bands x 4 rows) admits false negatives no
    portable SQL oracle reproduces."""
    docs = load(spark, sf_dir, "documents")
    sig = _shingled(docs).select(
        "doc_id", "shingles", minhash_signature(F.col("shingles")).alias("mh")
    )
    bands = sig.select(
        "doc_id",
        "shingles",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.element_at("mh", b * ROWS_PER_BAND + r + 1) for r in range(ROWS_PER_BAND)]
                        ).alias("bh"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "shingles", "bk.band", "bk.bh")
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.shingles").alias("sh_a"),
            F.col("b.shingles").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
    return (
        cand.withColumn("jaccard", F.round(jac.cast("double"), 4))
        .filter(F.col("jaccard") >= JACCARD_T)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


@register(
    "llm_fingerprint",
    oracle=(
        "SELECT doc_id, md5(lower(text)) AS fp, "
        "substring(md5(lower(text)), 1, 8) AS fp8 FROM documents"
    ),
)
def llm_fingerprint(spark, sf_dir):
    """Document fingerprinting: canonical content hash (md5 of
    normalized text) — the join key for cross-corpus dedup."""
    docs = load(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.col("text")).cast("binary"))
    return docs.select("doc_id", fp.alias("fp"), F.substring(fp, 1, 8).alias("fp8"))

"""Tiny catalog: table name -> parquet path (SURVEY.md §3.1 stage 2).

LSD's DB object maps table names to on-disk cell directories
[lsd:src/lsd/__init__.py — UNVERIFIED]; here a database is a
directory of Parquet datasets and Catalyst's analyzer does the rest.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def session_key(spark: SparkSession) -> str:
    """Stable identifier for a *live* session.

    ``id(spark)`` is unsafe as a cache key: CPython reuses addresses
    after garbage collection, so a brand-new session can be handed
    cache entries bound to a dead one (stale plans referencing a
    stopped JVM context). Instead stamp a uuid on the session object
    itself — it lives and dies with the session and never collides.
    """
    k = spark.__dict__.get("_lsd_session_key")
    if k is None:
        k = uuid.uuid4().hex
        spark._lsd_session_key = k
    return k

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


_DEFAULTED: set[str] = set()
_DF_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def _ensure_defaults(spark: SparkSession) -> None:
    """Every query path starts with a load(); enforce the parity-
    critical session defaults here so results don't depend on the
    caller's session (the driver builds its own: Spark 4 defaults to
    ANSI on, which changes cast/overflow semantics vs DuckDB)."""
    if getattr(spark, "_lsd_defaults_applied", False):
        return  # get_spark/apply_session_defaults already ran; never
        # re-apply — a lazy re-apply would override confs the caller
        # set after session construction (bench.py's AQE-off, found r12)
    sk = session_key(spark)
    if sk in _DEFAULTED:
        return
    from lsd_spark.session import apply_session_defaults

    apply_session_defaults(spark)
    _DEFAULTED.add(sk)


def normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Fold the event-time column to plain TimestampType (LTZ)
    regardless of how the parquet writer encoded it:

    - int64 (read under legacy.parquet.nanosAsLong from
      TIMESTAMP(NANOS)): truncate ns -> µs, same as DuckDB.
    - TIMESTAMP_NTZ (from TIMESTAMP(MICROS, isAdjustedToUTC=false)):
      cast reinterprets the wall clock in the session tz; with the
      UTC session default this is value-preserving and matches
      DuckDB's naive read.

    Watermarks, unix_micros and window() all require TimestampType,
    so every events read funnels through here.
    """
    dt = df.schema[col].dataType
    if isinstance(dt, T.LongType):
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if isinstance(dt, T.TimestampNTZType):
        return df.withColumn(col, F.col(col).cast(T.TimestampType()))
    return df


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Parquet vectorized reader + Catalyst column
    pruning/filter pushdown replace LSD's per-cell cgroup opens
    (SURVEY.md §2.A scan_projection, §4).

    events.ts has shipped as parquet TIMESTAMP(NANOS) (Spark 4
    refuses it by default — PARQUET_TYPE_ILLEGAL — so it's read as
    raw int64 ns via legacy.parquet.nanosAsLong and truncated to µs,
    matching DuckDB) and as TIMESTAMP(MICROS, isAdjustedToUTC=false)
    (Spark infers TIMESTAMP_NTZ, which unix_micros/watermarks
    reject). `normalize_ts` folds both to a session-tz TimestampType;
    with the UTC session default the wall-clock values are identical
    to what DuckDB reads, so oracles agree either way.
    """
    _ensure_defaults(spark)
    key = (session_key(spark), sf_dir, name)
    cached = _DF_CACHE.get(key)
    if cached is not None:
        return cached
    path = table_path(sf_dir, name)
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = normalize_ts(spark.read.parquet(path))
    else:
        df = spark.read.parquet(path)
    # cache the logical plan (immutable), not the data: repeated load()
    # calls skip footer/schema re-reads; Catalyst still prunes per query
    _DF_CACHE[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views for spark.sql() use."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)

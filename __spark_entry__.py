"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship 5-way-join query on sf0.001 (smoke).
queries()      — every implemented operator from SURVEY.md §2,
                 keyed by query id; callables take (spark, sf_dir).
oracle_sql()   — matching DuckDB SQL for the differential check;
                 rows-only ops (streaming state, LSH, ANN, file IO)
                 are intentionally absent per the contract.

All implementations live in lsd_spark/ (operators/, functions/,
llm/, streaming/, sources/); this module is just the registry shim.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _registry():
    from lsd_spark.registry import ORACLES, QUERIES, load_all

    load_all()
    return QUERIES, ORACLES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from lsd_spark.session import apply_session_defaults

    apply_session_defaults(spark)
    queries_, _ = _registry()
    return queries_["join_multiway"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    queries_, _ = _registry()
    return dict(queries_)


def oracle_sql() -> dict[str, str]:
    _, oracles = _registry()
    return dict(oracles)

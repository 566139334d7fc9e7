"""Operator registry: query id -> (spark, sf_dir) -> DataFrame, plus
the DuckDB oracle SQL for the driver's differential check
(SURVEY.md §2 header: the correctness contract).

Every operator module calls ``@register(name, oracle=...)``; ops that
are genuinely non-SQL-expressible register with ``oracle=None`` and
land in ROWS_ONLY (driver records a weaker rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

QUERIES: dict[str, Callable[[Any, str], Any]] = {}
ORACLES: dict[str, str] = {}
ROWS_ONLY: set[str] = set()

_LOADED = False


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        else:
            ROWS_ONLY.add(name)
        return fn

    return deco


def load_all() -> None:
    """Import every operator module (registration side effects)."""
    global _LOADED
    if _LOADED:
        return
    import lsd_spark.operators.scans  # noqa: F401
    import lsd_spark.operators.filters  # noqa: F401
    import lsd_spark.operators.aggregates  # noqa: F401
    import lsd_spark.operators.joins  # noqa: F401
    import lsd_spark.operators.windows  # noqa: F401
    import lsd_spark.operators.sorts  # noqa: F401
    import lsd_spark.operators.setops  # noqa: F401
    import lsd_spark.functions.scalar  # noqa: F401
    import lsd_spark.operators.udf  # noqa: F401
    import lsd_spark.llm.dedup  # noqa: F401
    import lsd_spark.llm.simsearch  # noqa: F401
    import lsd_spark.llm.textstats  # noqa: F401
    import lsd_spark.llm.multimodal  # noqa: F401
    import lsd_spark.streaming.ops  # noqa: F401
    import lsd_spark.sources.io_ops  # noqa: F401
    import lsd_spark.plans.xmatch  # noqa: F401
    import lsd_spark.plans.cluster  # noqa: F401
    import lsd_spark.plans.skew  # noqa: F401
    import lsd_spark.plans.margin  # noqa: F401
    _LOADED = True

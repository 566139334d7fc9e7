"""lsd_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of mjuric/lsd (Large Survey Database).

Architecture (SURVEY.md §1/§4): DataFrame/SQL + Catalyst over
partitioned Parquet. LSD's cells → Parquet partitions; cgroups →
Parquet columnar pruning; pool2 map/reduce kernels → Arrow-vectorized
pandas UDFs; xmatch nearest-neighbor → zones-technique band join +
window rank. No custom Catalyst rules are needed (SURVEY.md §4).

NOTE on reference citations: /root/reference was EMPTY this round
(SURVEY.md §0), so docstrings cite SURVEY.md sections plus the
UNVERIFIED lsd module names recorded there (e.g.
``[lsd:src/lsd/query_parser.py — UNVERIFIED]``).
"""

from lsd_spark.registry import QUERIES, ORACLES, ROWS_ONLY, load_all  # noqa: F401
from lsd_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"

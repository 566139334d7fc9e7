"""FITS binary-table ingestion — LSD's catalog import path
[lsd:src/lsd/smf.py, sdss.py — UNVERIFIED] without astropy.

LSD ingests survey catalogs (SMF/SDSS) stored as FITS BINTABLE
extensions. No FITS library ships in this container, so this module
implements the minimal subset of the public FITS 4.0 standard
needed for integer/double/character binary tables:

- writer (`write_fits_bintable`): primary HDU (SIMPLE, NAXIS=0) +
  one BINTABLE extension (XTENSION='BINTABLE', NAXIS1/2, TTYPEn /
  TFORMn cards), big-endian packed rows, 2880-byte blocks — enough
  to produce files any standard reader accepts. Used here to build
  the test fixture; a real deployment reads survey-provided files.
- reader (`read_fits`): `spark.read.format("binaryFile")` over a
  directory of FITS files, then an Arrow-batched `mapInPandas`
  kernel parses each file's header cards and `np.frombuffer`s the
  table — one task per file, so a 100 TB catalog laid out as
  one-file-per-sky-cell (exactly LSD's layout) parallelizes across
  the cluster with no coordination. Column pruning happens in the
  kernel (only requested TTYPEs are materialized into Arrow).

Supported TFORM codes: J (int32), K (int64), D (float64), nA (char,
space-padded per the standard — stripped on read).
"""

from __future__ import annotations

import os
import tempfile

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lsd_spark.catalog import load, session_key
from lsd_spark.registry import register

BLOCK = 2880


def _card(keyword: str, value, comment: str = "") -> bytes:
    if isinstance(value, bool):
        v = "T" if value else "F"
        s = f"{keyword:<8}= {v:>20}"
    elif isinstance(value, int):
        s = f"{keyword:<8}= {value:>20}"
    else:  # string
        s = f"{keyword:<8}= '{value:<8}'"
    if comment:
        s += f" / {comment}"
    return s[:80].ljust(80).encode("ascii")


def _pad(b: bytes) -> bytes:
    rem = len(b) % BLOCK
    return b if rem == 0 else b + b"\x00" * (BLOCK - rem)


def _header(cards: list[bytes]) -> bytes:
    h = b"".join(cards) + b"END".ljust(80)
    rem = len(h) % BLOCK
    if rem:
        h += b" " * (BLOCK - rem)
    return h


def write_fits_bintable(path: str, names: list[str], formats: list[str], arrays) -> None:
    """Write one BINTABLE HDU. formats: 'J', 'K', 'D' or 'nA'."""
    np_map = {"J": ">i4", "K": ">i8", "D": ">f8"}
    dtypes = []
    for n, f in zip(names, formats):
        if f.endswith("A"):
            dtypes.append((n, f"S{int(f[:-1])}"))
        else:
            dtypes.append((n, np_map[f]))
    rec = np.zeros(len(arrays[0]), dtype=np.dtype(dtypes))
    for n, f, arr in zip(names, formats, arrays):
        if f.endswith("A"):
            # FITS chars are space-padded; numpy S-type zero-pads, so
            # pad explicitly to the field width
            width = int(f[:-1])
            rec[n] = [str(s).ljust(width).encode("ascii") for s in arr]
        else:
            rec[n] = arr
    primary = _header(
        [
            _card("SIMPLE", True, "conforms to FITS standard"),
            _card("BITPIX", 8),
            _card("NAXIS", 0),
            _card("EXTEND", True),
        ]
    )
    cards = [
        _card("XTENSION", "BINTABLE", "binary table extension"),
        _card("BITPIX", 8),
        _card("NAXIS", 2),
        _card("NAXIS1", rec.dtype.itemsize, "bytes per row"),
        _card("NAXIS2", len(rec), "rows"),
        _card("PCOUNT", 0),
        _card("GCOUNT", 1),
        _card("TFIELDS", len(names)),
    ]
    for i, (n, f) in enumerate(zip(names, formats), start=1):
        cards.append(_card(f"TTYPE{i}", n))
        cards.append(_card(f"TFORM{i}", f))
    with open(path, "wb") as fh:
        fh.write(primary)
        fh.write(_header(cards))
        fh.write(_pad(rec.tobytes()))


def _read_cards(buf: bytes, off: int):
    """Parse one FITS header (80-byte cards, 2880-byte blocks) into a
    dict; returns (cards, offset-past-header)."""
    cards: dict[str, str] = {}
    while True:
        block = buf[off : off + BLOCK]
        for i in range(0, BLOCK, 80):
            card = block[i : i + 80].decode("ascii", "replace")
            key = card[:8].strip()
            if key == "END":
                return cards, off + BLOCK
            if card[8:10] == "= ":
                v = card[10:].split("/")[0].strip()
                cards[key] = v.strip("' ").strip() if v.startswith("'") else v
        off += BLOCK


def read_fits(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    """Distributed FITS BINTABLE read: one parse task per file."""
    files = spark.read.format("binaryFile").load(path)

    cols = columns

    def parse_kernel(batches):
        # Nested => cloudpickle ships by value; numpy-only parsing.
        import numpy as np
        import pandas as pd

        def cards_of(buf, off):
            cards = {}
            while True:
                block = buf[off : off + 2880]
                for i in range(0, 2880, 80):
                    card = block[i : i + 80].decode("ascii", "replace")
                    key = card[:8].strip()
                    if key == "END":
                        return cards, off + 2880
                    if card[8:10] == "= ":
                        v = card[10:].split("/")[0].strip()
                        cards[key] = v.strip("' ").strip() if v.startswith("'") else v
                off += 2880

        def parse_file(content):
            buf = bytes(content)
            hdr, off = cards_of(buf, 0)  # primary: NAXIS=0, no data
            hdr, off = cards_of(buf, off)  # BINTABLE extension
            nrow = int(hdr["NAXIS2"])
            nfields = int(hdr["TFIELDS"])
            np_map = {"J": ">i4", "K": ">i8", "D": ">f8"}
            dtypes, names = [], []
            for i in range(1, nfields + 1):
                name, form = hdr[f"TTYPE{i}"], hdr[f"TFORM{i}"]
                names.append(name)
                dtypes.append(
                    (name, f"S{int(form[:-1])}" if form.endswith("A") else np_map[form])
                )
            rec = np.frombuffer(buf, dtype=np.dtype(dtypes), count=nrow, offset=off)
            out = {}
            for name, dt in dtypes:
                if cols is not None and name not in cols:
                    continue  # column pruning inside the kernel
                if dt.startswith("S"):
                    out[name] = [v.decode("ascii").rstrip(" ") for v in rec[name]]
                elif dt == ">f8":
                    out[name] = rec[name].astype("float64")
                else:
                    out[name] = rec[name].astype("int64")
            return pd.DataFrame(out)

        for pdf in batches:
            for content in pdf["content"]:
                yield parse_file(content)

    # schema discovered driver-side from the first file's headers
    # (a few KB peek, not a data read)
    first = bytes(files.select("content").limit(1).collect()[0]["content"])
    _, off = _read_cards(first, 0)
    hdr, _ = _read_cards(first, off)
    hdr_cols = []
    for i in range(1, int(hdr["TFIELDS"]) + 1):
        name, form = hdr[f"TTYPE{i}"], hdr[f"TFORM{i}"]
        if cols is not None and name not in cols:
            continue
        typ = "string" if form.endswith("A") else ("double" if form == "D" else "bigint")
        hdr_cols.append(f"{name} {typ}")
    return files.select("content").mapInPandas(parse_kernel, schema=", ".join(hdr_cols))


_BUILD_CACHE: dict[tuple[int, str], str] = {}


def _fixture_path(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per session+sf) a FITS file holding the nation
    table + a derived double column, via the writer above."""
    key = (session_key(spark), sf_dir)
    path = _BUILD_CACHE.get(key)
    if path is None:
        rows = (
            load(spark, sf_dir, "nation")
            .select(
                "n_nationkey",
                "n_name",
                "n_regionkey",
                (F.col("n_nationkey").cast("double") / 4.0).alias("w"),
            )
            .orderBy("n_nationkey")
            .collect()
        )
        d = tempfile.mkdtemp(prefix="lsd_fits_")
        path = os.path.join(d, "nation.fits")
        width = max(len(r["n_name"]) for r in rows)
        write_fits_bintable(
            path,
            ["n_nationkey", "n_name", "n_regionkey", "w"],
            ["K", f"{width}A", "K", "D"],
            [
                [r["n_nationkey"] for r in rows],
                [r["n_name"] for r in rows],
                [r["n_regionkey"] for r in rows],
                [r["w"] for r in rows],
            ],
        )
        _BUILD_CACHE[key] = path
    return path


@register(
    "source_fits_import",
    oracle=(
        "SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name, "
        "CAST(n_regionkey AS BIGINT) AS n_regionkey, "
        "CAST(n_nationkey AS DOUBLE) / 4.0 AS w "
        "FROM nation ORDER BY n_nationkey"
    ),
    cacheable=False,
)
def source_fits_import(spark, sf_dir):
    """FITS round trip: nation written as a BINTABLE (once per
    session), read back through the distributed binaryFile +
    mapInPandas parser, hash-compared against the parquet original.
    The 25-row fixture collect is the build side only; the READ path
    is the thing under test and is one-task-per-file parallel."""
    path = _fixture_path(spark, sf_dir)
    return read_fits(spark, os.path.dirname(path)).orderBy("n_nationkey")


# ---------------------------------------------------------------------------
# Spark 4 Python DataSource: spark.read.format("fits") — the
# idiomatic connector form of read_fits(). One InputPartition per
# file; each partition parses independently. The class is built
# inside a factory so cloudpickle ships it BY VALUE: Python data
# sources are instantiated inside Spark's Python workers, which must
# not need lsd_spark importable (same rule as the kernels).
# ---------------------------------------------------------------------------

try:
    from pyspark.sql.datasource import (  # noqa: F401
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    HAVE_DATASOURCE_API = True
except ImportError:  # pragma: no cover - older pyspark
    HAVE_DATASOURCE_API = False


def make_fits_datasource():
    """Return a self-contained FitsDataSource class (no references to
    this module — safe to pickle into Spark's Python workers)."""
    import os as _os

    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    BLOCK_ = 2880

    def read_cards(buf, off):
        cards = {}
        while True:
            block = buf[off : off + BLOCK_]
            for i in range(0, BLOCK_, 80):
                card = block[i : i + 80].decode("ascii", "replace")
                key = card[:8].strip()
                if key == "END":
                    return cards, off + BLOCK_
                if card[8:10] == "= ":
                    v = card[10:].split("/")[0].strip()
                    cards[key] = v.strip("' ").strip() if v.startswith("'") else v
            off += BLOCK_

    def table_dtypes(hdr):
        np_map = {"J": ">i4", "K": ">i8", "D": ">f8"}
        out = []
        for i in range(1, int(hdr["TFIELDS"]) + 1):
            name, form = hdr[f"TTYPE{i}"], hdr[f"TFORM{i}"]
            out.append((name, f"S{int(form[:-1])}" if form.endswith("A") else np_map[form]))
        return out

    class _FitsPartition(InputPartition):
        def __init__(self, path):
            self.path = path

    class FitsDataSourceReader(DataSourceReader):
        def __init__(self, schema, options):
            self._schema = schema
            self._path = options.get("path")

        def partitions(self):
            p = self._path
            if _os.path.isdir(p):
                files = sorted(
                    _os.path.join(p, f) for f in _os.listdir(p) if f.endswith(".fits")
                )
            else:
                files = [p]
            return [_FitsPartition(f) for f in files]

        def read(self, partition):
            import numpy as np

            with open(partition.path, "rb") as fh:
                buf = fh.read()
            _, off = read_cards(buf, 0)
            hdr, data_off = read_cards(buf, off)
            dtypes = table_dtypes(hdr)
            rec = np.frombuffer(
                buf, dtype=np.dtype(dtypes), count=int(hdr["NAXIS2"]), offset=data_off
            )
            wanted = [f.name for f in self._schema.fields]
            for row in rec:
                out = []
                for name, dt in dtypes:
                    if name not in wanted:
                        continue
                    v = row[name]
                    if dt.startswith("S"):
                        out.append(v.decode("ascii").rstrip(" "))
                    elif dt == ">f8":
                        out.append(float(v))
                    else:
                        out.append(int(v))
                yield tuple(out)

    class FitsDataSource(DataSource):
        """`spark.read.format("fits").load(path)`; register with
        `spark.dataSource.register(make_fits_datasource())`."""

        @classmethod
        def name(cls):
            return "fits"

        def schema(self):
            path = self.options.get("path")
            if _os.path.isdir(path):
                files = sorted(
                    _os.path.join(path, f) for f in _os.listdir(path) if f.endswith(".fits")
                )
            else:
                files = [path]
            with open(files[0], "rb") as fh:
                head = fh.read(6 * BLOCK_)
            _, off = read_cards(head, 0)
            hdr, _ = read_cards(head, off)
            cols = []
            for name, dt in table_dtypes(hdr):
                typ = "string" if dt.startswith("S") else ("double" if dt == ">f8" else "bigint")
                cols.append(f"{name} {typ}")
            return ", ".join(cols)

        def reader(self, schema):
            return FitsDataSourceReader(schema, self.options)

    return FitsDataSource


@register("source_fits_datasource", oracle=(
    "SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name, "
    "CAST(n_regionkey AS BIGINT) AS n_regionkey, "
    "CAST(n_nationkey AS DOUBLE) / 4.0 AS w "
    "FROM nation ORDER BY n_nationkey"
), cacheable=False)
def source_fits_datasource(spark, sf_dir):
    """The same FITS round trip through the Spark 4 PYTHON DATA
    SOURCE API (`spark.read.format("fits")`): one InputPartition per
    file, executor-side stdlib parse — the connector form of
    read_fits(), sharing its oracle."""
    if not HAVE_DATASOURCE_API:
        return read_fits(spark, os.path.dirname(_fixture_path(spark, sf_dir))).orderBy(
            "n_nationkey"
        )
    path = _fixture_path(spark, sf_dir)
    try:
        spark.dataSource.register(make_fits_datasource())
    except Exception:
        pass  # already registered in this session
    return spark.read.format("fits").load(path).orderBy("n_nationkey")

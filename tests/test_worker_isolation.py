"""Pin kernel-by-value shipping (VERDICT r02 next-round #8).

The external driver may launch from ANY cwd, and Spark's Python
workers inherit neither the driver's ``sys.path`` manipulations nor
its working directory guarantees. Every Pandas-UDF / mapInPandas /
applyInPandas(WithState) kernel therefore has to be shipped BY VALUE
(cloudpickle of a self-contained closure) — a kernel that does
``import lsd_spark`` inside the worker only works by accident when
the driver happens to run from /root/repo.

scripts/driver_sim.py caught a real instance of this out-of-band; this
test makes the property un-regressable from inside pytest: it spawns a
fresh interpreter whose cwd is an empty temp dir and whose
``lsd_spark`` is importable ONLY via a driver-side sys.path insert
(deliberately NOT via PYTHONPATH, which worker processes would
inherit), then runs one op from each Python-kernel family end-to-end.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# One representative per kernel family:
#   pandas_udf            -> udf_scalar_vectorized
#   grouped-agg pandas_udf-> udaf_grouped_agg
#   mapInPandas           -> udtf_flatmap, mm_decode (real PNG codec)
#   applyInPandasWithState-> stream_custom_state
#   mapPartitions (FITS)  -> source_fits_import
KERNEL_OPS = [
    "udf_scalar_vectorized",
    "udaf_grouped_agg",
    "udtf_flatmap",
    "mm_decode",
    "stream_custom_state",
    "source_fits_import",
    "sink_fits",  # per-partition FITS writer kernel
]

DRIVER_SCRIPT = """
import os, sys, tempfile
os.chdir(tempfile.mkdtemp(prefix="lsd_neutral_cwd_"))
sys.path.insert(0, {repo!r})  # driver-side only: workers never see this
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[4]")
    .appName("worker-isolation")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()
)
import __spark_entry__ as entrymod
qs = entrymod.queries()
sf = "/root/testdata/sf0.001"
for name in {ops!r}:
    n = len(qs[name](spark, sf).collect())
    print(f"RAN {{name}} rows={{n}}", flush=True)
print("ALL_KERNELS_OK", flush=True)
"""


def test_kernels_ship_by_value_from_neutral_cwd():
    env = {
        k: v
        for k, v in os.environ.items()
        # strip anything that could make lsd_spark importable in the
        # worker by environment inheritance rather than by value
        if k not in ("PYTHONPATH",)
    }
    script = DRIVER_SCRIPT.format(repo=REPO, ops=KERNEL_OPS)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        cwd=tempfile.mkdtemp(prefix="lsd_spawn_cwd_"),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (
        f"kernel-by-value regression:\n--- stdout ---\n{proc.stdout[-4000:]}"
        f"\n--- stderr ---\n{proc.stderr[-4000:]}"
    )
    assert "ALL_KERNELS_OK" in proc.stdout
    for name in KERNEL_OPS:
        assert f"RAN {name} " in proc.stdout

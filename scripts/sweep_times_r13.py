"""Round-13 full-registry timing sweep: run every registered op once
(cold plan build + execute) then re-run warm, at $SPARK_GRAFT_SF_DIR
under bench-like session settings, and print per-op seconds sorted
descending. Finds optimization targets; not part of the driver
contract.

Usage: python scripts/sweep_times_r13.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    os.environ.setdefault("LSD_SHUFFLE_PARTITIONS", "8")
    from lsd_spark import catalog
    from lsd_spark.registry import QUERIES, load_all
    from lsd_spark.session import get_spark

    load_all()
    spark = get_spark(app_name="lsd-sweep-r13", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8m")
    for t in catalog.TABLES:
        try:
            df = catalog.load(spark, SF_DIR, t)
            df.persist()
            df.count()
        except Exception:
            pass

    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    err: dict[str, str] = {}
    for name in sorted(QUERIES):
        try:
            t0 = time.perf_counter()
            QUERIES[name](spark, SF_DIR).toPandas()
            cold[name] = round(time.perf_counter() - t0, 4)
            t0 = time.perf_counter()
            QUERIES[name](spark, SF_DIR).toPandas()
            warm[name] = round(time.perf_counter() - t0, 4)
        except Exception as e:  # noqa: BLE001
            err[name] = f"{type(e).__name__}: {e}"[:200]
        print(f"{name}: cold {cold.get(name)} warm {warm.get(name)}"
              + (f" ERR {err.get(name)}" if name in err else ""),
              flush=True)

    out = {"sf_dir": SF_DIR, "cold": cold, "warm": warm, "err": err}
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sweep_r13.json"
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print("\nslowest (warm):")
    for k in sorted(warm, key=warm.get, reverse=True)[:30]:
        print(f"  {k:40s} warm {warm[k]:8.3f} cold {cold[k]:8.3f}")
    if err:
        print("errors:", err)


if __name__ == "__main__":
    main()

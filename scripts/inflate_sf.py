"""Synthetic scale-up of the driver fixtures (VERDICT r03 item 9).

No sf1 fixture exists under /root/testdata, so the one-notch scale
stress builds its own: each fact table is replicated K times (default
10) with per-replica KEY OFFSETS, writing /root/repo/.cache/sf<X>/.

Key offsets, not naive duplication: every key domain (custkey,
orderkey, partkey, suppkey, event_id, user_id, doc_id, vec_id) gets
`key + i * stride` with a shared stride across the tables that
reference it, so each replica is a disjoint, referentially-intact
universe — uniqueness-sensitive ops (merge_upsert, keep_first
tiebreaks, asof nearest) see realistic data instead of a
manufactured tie storm, while dedup ops correctly see K exact
copies of every document/embedding payload.

Dimension tables (region, nation) are NOT replicated — replicas
share them, exactly like a real scale-up (nationkey references stay
in 0..24).

pyarrow end to end: the original parquet schemas are preserved
bit-for-bit (notably events.ts stays TIMESTAMP(NANOS), the encoding
catalog.normalize_ts special-cases), so the inflated directory
behaves exactly like driver data to both Spark and DuckDB.

Usage: python scripts/inflate_sf.py [--src /root/testdata/sf0.1]
                                    [--k 10] [--out .cache/sf1]
                                    [--tables events,orders]

--tables (round-10, spatial stress tier): replicate ONLY the named
fact tables at k; every other fact table is copied through at 1x.
The 100x spatial tier inflates just `events` this way — the sphere /
plane coordinates are md5-derived from event_id, so a 100x events
dir is a genuinely 100x-denser synthetic sky without paying for
100x documents/lineitem that the spatial family never reads.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# key column -> stride domain; tables sharing a domain share a stride
KEY_DOMAINS = {
    "c_custkey": "custkey",
    "o_custkey": "custkey",
    "o_orderkey": "orderkey",
    "l_orderkey": "orderkey",
    "p_partkey": "partkey",
    "l_partkey": "partkey",
    "ps_partkey": "partkey",
    "s_suppkey": "suppkey",
    "l_suppkey": "suppkey",
    "ps_suppkey": "suppkey",
    "event_id": "event_id",
    "user_id": "user_id",
    "doc_id": "doc_id",
    "vec_id": "vec_id",
}

REPLICATED = [
    "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
]
DIMS = ["region", "nation"]


def main() -> None:
    src = "/root/testdata/sf0.1"
    out = os.path.join(REPO, ".cache", "sf1")
    k = 10
    if "--src" in sys.argv:
        src = sys.argv[sys.argv.index("--src") + 1]
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
    if "--k" in sys.argv:
        k = int(sys.argv[sys.argv.index("--k") + 1])
    replicated = list(REPLICATED)
    passthrough: list[str] = []
    if "--tables" in sys.argv:
        keep = set(sys.argv[sys.argv.index("--tables") + 1].split(","))
        unknown = keep - set(REPLICATED)
        if unknown:
            raise SystemExit(f"--tables: not fact tables: {sorted(unknown)}")
        passthrough = [t for t in replicated if t not in keep]
        replicated = [t for t in replicated if t in keep]
    os.makedirs(out, exist_ok=True)

    tables = {t: pq.read_table(f"{src}/{t}.parquet") for t in replicated}

    # one stride per key DOMAIN: max over every column in the domain,
    # rounded up to the next power of 10 (keys stay human-readable)
    dom_max: dict[str, int] = {}
    for t, tab in tables.items():
        for col in tab.column_names:
            dom = KEY_DOMAINS.get(col)
            if dom is not None:
                m = pc.max(tab.column(col)).as_py()
                dom_max[dom] = max(dom_max.get(dom, 0), int(m))
    stride = {d: 10 ** len(str(m)) for d, m in dom_max.items()}
    print("strides:", stride)

    for t in DIMS + passthrough:
        tab = pq.read_table(f"{src}/{t}.parquet")
        pq.write_table(tab, f"{out}/{t}.parquet")
        print(f"{t}: {tab.num_rows} rows (1x passthrough)")

    for t, tab in tables.items():
        parts = []
        for i in range(k):
            cols = []
            for col in tab.column_names:
                arr = tab.column(col)
                dom = KEY_DOMAINS.get(col)
                if dom is not None and i > 0:
                    off = pa.scalar(i * stride[dom], type=arr.type)
                    arr = pc.add_checked(arr, off)
                cols.append(arr)
            parts.append(pa.table(cols, schema=tab.schema))
        big = pa.concat_tables(parts)
        pq.write_table(big, f"{out}/{t}.parquet")
        print(f"{t}: {tab.num_rows} -> {big.num_rows} rows")


if __name__ == "__main__":
    main()

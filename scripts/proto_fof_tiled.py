"""Prototype: tile-partitioned FoF (single payload shuffle, fused
pairing+union-find Arrow kernel, seed covers all points). Validates
bit-identical labels vs the current cluster_fof_2d and times it.

Usage: python scripts/proto_fof_tiled.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
RUNS = 5
TILE_CELLS = 16  # tile edge, in units of the linking length


def main() -> None:
    os.environ.setdefault("LSD_SHUFFLE_PARTITIONS", "8")
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    from lsd_spark import catalog
    from lsd_spark.registry import QUERIES, load_all
    from lsd_spark.session import get_spark

    load_all()
    spark = get_spark(app_name="lsd-proto-tiled", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8m")

    ev = catalog.load(spark, SF_DIR, "events")
    ev.persist()
    ev.count()

    from lsd_spark.plans.spatial import FOF2D_R, points

    R = FOF2D_R

    def tiled_local_labels():
        pts = points(spark, SF_DIR, "view")
        cell = lambda c: F.floor(F.col(c) / F.lit(R))  # noqa: E731
        # every tile covering the point's 3x3 cell neighborhood
        # (home + halo): pairs span adjacent cells, so both endpoints
        # of any within-R pair meet in at least one tile
        tiles = F.array_distinct(
            F.array(*[
                F.struct(
                    F.floor((cell("x") + dx) / TILE_CELLS).alias("tx"),
                    F.floor((cell("y") + dy) / TILE_CELLS).alias("ty"),
                )
                for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            ])
        )
        tagged = (
            pts.select(
                "event_id", "x", "y",
                cell("x").alias("cx"), cell("y").alias("cy"),
                F.explode(tiles).alias("t"),
            )
            .select(
                "event_id", "x", "y", "cx", "cy",
                F.col("t.tx").alias("tx"), F.col("t.ty").alias("ty"),
            )
            .repartition(F.col("tx"), F.col("ty"))
        )

        def kernel(batches):
            import numpy as np
            import pandas as pd

            dfs = list(batches)
            if not dfs:
                return
            df = pd.concat(dfs, ignore_index=True)
            # vectorized 5-direction forward probe within each tile
            home = df[["tx", "ty", "cx", "cy"]].copy()
            home["idx"] = np.arange(len(df))
            probes = []
            for dx, dy, is_home in ((0, 0, True), (0, 1, False),
                                    (1, -1, False), (1, 0, False),
                                    (1, 1, False)):
                p = df[["tx", "ty"]].copy()
                p["cx"] = df["cx"] + dx
                p["cy"] = df["cy"] + dy
                p["pidx"] = np.arange(len(df))
                p["home"] = is_home
                probes.append(p)
            probe = pd.concat(probes, ignore_index=True)
            cand = probe.merge(home, on=["tx", "ty", "cx", "cy"])
            ui = cand["pidx"].to_numpy()
            vi = cand["idx"].to_numpy()
            uh = cand["home"].to_numpy()
            uid = df["event_id"].to_numpy()
            x = df["x"].to_numpy()
            y = df["y"].to_numpy()
            u, v = uid[ui], uid[vi]
            keep = np.where(uh, u < v, u != v)
            dx_ = x[ui] - x[vi]
            dy_ = y[ui] - y[vi]
            keep &= (dx_ * dx_ + dy_ * dy_) <= R * R
            u, v = u[keep], v[keep]
            # union-find over edges + every point (isolated included)
            parent: dict[int, int] = {}

            def find(a: int) -> int:
                while parent[a] != a:
                    parent[a] = parent[parent[a]]
                    a = parent[a]
                return a

            for n in uid:
                n = int(n)
                if n not in parent:
                    parent[n] = n
            for a, b in zip(u, v):
                a, b = int(a), int(b)
                ra, rb = find(a), find(b)
                if ra != rb:
                    if rb < ra:
                        ra, rb = rb, ra
                    parent[rb] = ra
            nodes = list(parent)
            yield pd.DataFrame(
                {"vec_id": nodes, "lmin": [find(n) for n in nodes]}
            )

        return tagged.mapInPandas(kernel, "vec_id bigint, lmin bigint")

    def run_tiled():
        local_agg = (
            tiled_local_labels()
            .groupBy("vec_id")
            .agg(F.min("lmin").alias("lmin"),
                 F.collect_set("lmin").alias("labels"))
            .persist(StorageLevel.DISK_ONLY)
        )
        old_lim = spark.conf.get("spark.sql.limit.initialNumPartitions", "1")
        spark.conf.set("spark.sql.limit.initialNumPartitions", "100000")
        try:
            q_pd = (
                local_agg.filter(F.size("labels") > 1)
                .select(F.col("lmin").alias("u"), F.explode("labels").alias("v"))
                .filter(F.col("u") != F.col("v"))
                .limit(1_000_001)
                .toPandas()
            )
        finally:
            spark.conf.set("spark.sql.limit.initialNumPartitions", old_lim)
        import pandas as pd

        from lsd_spark.plans.cluster import _uf_roots

        seed = local_agg.select("vec_id", F.col("lmin").alias("object_id"))
        if len(q_pd) == 0:
            out = seed.orderBy("vec_id").toPandas()
        else:
            roots = _uf_roots(zip(q_pd["u"].to_numpy(), q_pd["v"].to_numpy()))
            mapping = spark.createDataFrame(
                pd.DataFrame({"q_label": list(roots.keys()),
                              "q_root": list(roots.values())}).astype("int64"))
            out = (seed.join(F.broadcast(mapping),
                             seed["object_id"] == mapping["q_label"], "left")
                   .select("vec_id",
                           F.coalesce("q_root", "object_id").alias("object_id"))
                   .orderBy("vec_id").toPandas())
        local_agg.unpersist()
        print("  quotient rows:", len(q_pd))
        return out

    # correctness: exact match vs current op
    cur = QUERIES["cluster_fof_2d"](spark, SF_DIR).toPandas()
    new = run_tiled()
    import pandas as pd

    cur2 = cur.rename(columns={"point_id": "vec_id"}).sort_values("vec_id").reset_index(drop=True)
    new2 = new.sort_values("vec_id").reset_index(drop=True)
    assert len(cur2) == len(new2), (len(cur2), len(new2))
    pd.testing.assert_frame_equal(cur2.astype("int64"), new2.astype("int64"))
    print("EXACT MATCH:", len(new2), "labels")

    def timed(label, fn, runs=RUNS):
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn()
            samples.append(time.perf_counter() - t0)
        print(f"{label}: median {statistics.median(samples):.3f}s "
              f"min {min(samples):.3f}s all={[round(s,3) for s in samples]}")

    timed("tiled full", run_tiled)
    timed("current full", lambda: QUERIES["cluster_fof_2d"](spark, SF_DIR).toPandas())


if __name__ == "__main__":
    main()

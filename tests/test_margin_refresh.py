"""Incremental margin refresh (round-5 VERDICT #7): appending a day
of rows must (a) leave every untouched zone dir's files byte-for-byte
alone — same file names, sizes, and mtimes — and (b) produce a layout
whose row set is identical to a full rebuild over the complete data.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lsd_spark.catalog import load
from lsd_spark.plans.margin import (
    HOUR_US,
    ZONE_US,
    build_margin_table,
    refresh_margin_table,
)

SF = "/root/testdata/sf0.001"


def _zone_files(path: str) -> dict[str, list[tuple[str, int, float]]]:
    out = {}
    for d in sorted(os.listdir(path)):
        if not d.startswith("zone="):
            continue
        full = os.path.join(path, d)
        out[d] = sorted(
            (f, os.path.getsize(os.path.join(full, f)),
             os.path.getmtime(os.path.join(full, f)))
            for f in os.listdir(full) if f.endswith(".parquet")
        )
    return out


def _rows(spark, path):
    return sorted(
        map(tuple, spark.read.parquet(path)
            .select("user_id", "ts", "event_id", "_cached", "zone").collect())
    )


@pytest.fixture(scope="module")
def refreshed(spark, tmp_path_factory):
    clicks = load(spark, SF, "events").filter(
        F.col("event_type") == "click"
    ).select("user_id", "ts", "event_id")
    cutoff = clicks.agg(F.date_trunc("DAY", F.max("ts")).alias("d")).collect()[0]["d"]
    base = str(tmp_path_factory.mktemp("margin") / "m")
    build_margin_table(
        spark, clicks.filter(F.col("ts") < F.lit(cutoff)), ts="ts",
        zone_width_us=ZONE_US, out_path=base, margin_us=HOUR_US,
    )
    before = _zone_files(base)
    delta = clicks.filter(F.col("ts") >= F.lit(cutoff))
    refresh_margin_table(spark, delta, base, ts="ts",
                         zone_width_us=ZONE_US, margin_us=HOUR_US)
    after = _zone_files(base)
    # zones the delta touches: home zone of each row + zone+1 margin
    zs = {
        int(r[0]) for r in delta.select(
            F.floor(F.unix_micros("ts") / F.lit(ZONE_US))
        ).distinct().collect()
    }
    touched = {f"zone={z}" for z in zs} | {f"zone={z + 1}" for z in zs}
    return clicks, cutoff, base, before, after, touched


def test_untouched_zone_dirs_are_not_rewritten(refreshed):
    _, _, _, before, after, touched = refreshed
    untouched = set(before) - touched
    assert untouched, "fixture degenerate: every zone touched by the delta"
    for z in untouched:
        assert after[z] == before[z], f"{z} was rewritten by the refresh"


def test_touched_zones_only_gain_files(refreshed):
    _, _, _, before, after, touched = refreshed
    for z, files in before.items():
        # append never deletes or rewrites existing files anywhere
        assert set(files) <= set(after[z]), f"{z} lost or rewrote files"
    grew = [z for z in after if set(after[z]) - set(before.get(z, []))]
    assert grew and set(grew) <= touched


def test_refreshed_layout_equals_full_rebuild(spark, refreshed, tmp_path_factory):
    clicks, _, base, _, _, _ = refreshed
    full = str(tmp_path_factory.mktemp("margin_full") / "m")
    build_margin_table(spark, clicks, ts="ts", zone_width_us=ZONE_US,
                       out_path=full, margin_us=HOUR_US)
    assert _rows(spark, base) == _rows(spark, full)

"""Semantic pins for the round-6b operators beyond the shared oracle
harness (test_oracle.py covers the differential gate; these tests pin
the properties the oracle can't see from one fixture draw):

- half-plane self-pair generation == brute force (the 5-probe
  rewrite's pair-once guarantee, on TWO radii so cross-cell
  directions are exercised);
- tracklet pairs link strictly consecutive days;
- substring dedup finds a crafted shared run, respects the K
  threshold, and drops df-capped boilerplate grams;
- resample spine is dense/arithmetic and gaps are genuine zeros;
- adaptive density map refines exactly the over-threshold parents
  and conserves the event count.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from lsd_spark.registry import QUERIES, load_all
from tests.conftest import SF_DIR

load_all()


@pytest.mark.parametrize("radius", [0.3, 1.0, 5.0])
def test_half_plane_pairs_equal_brute(spark, radius):
    from lsd_spark.plans.spatial import points, self_radius_pairs

    got = {
        (r.u, r.v)
        for r in self_radius_pairs(spark, SF_DIR, "view", radius).collect()
    }
    pts = points(spark, SF_DIR, "view").toPandas()
    merged = pts.merge(pts, how="cross", suffixes=("_a", "_b"))
    merged = merged[merged.event_id_a < merged.event_id_b]
    d2 = (merged.x_a - merged.x_b) ** 2 + (merged.y_a - merged.y_b) ** 2
    want = {
        (int(a), int(b))
        for a, b in merged.loc[
            d2 <= radius * radius, ["event_id_a", "event_id_b"]
        ].itertuples(index=False)
    }
    assert got == want


def test_tracklet_links_consecutive_days_only(spark, duck):
    pairs = QUERIES["join_tracklet_link"](spark, SF_DIR).toPandas()
    assert len(pairs) > 0
    days = duck.sql(
        "SELECT event_id, datediff('day', DATE '2024-01-01', "
        "CAST(ts AS DATE)) AS day FROM events WHERE event_type = 'error'"
    ).df()
    day_of = dict(zip(days.event_id, days.day))
    for r in pairs.itertuples(index=False):
        assert day_of[r.det_b] == day_of[r.det_a] + 1
        assert r.day_a == day_of[r.det_a]


def test_substring_dedup_crafted(spark, tmp_path):
    from lsd_spark.llm.dedup import SUBSTR_DF_CAP, SUBSTR_K

    run = " ".join(f"tok{i}" for i in range(SUBSTR_K))  # exactly K tokens
    run_minus_1 = " ".join(f"tok{i}" for i in range(SUBSTR_K - 1))
    hot = " ".join(f"hot{i}" for i in range(SUBSTR_K))
    rows = [
        (0, f"alpha beta {run} gamma"),   # shares the K-run with doc 1
        (1, f"delta {run} epsilon zeta"),
        (2, f"eta {run_minus_1} theta"),  # only K-1 shared -> no pair
        (3, f"iota {run_minus_1} kappa"),
    ]
    # df-capped boilerplate: the same K-gram in > SUBSTR_DF_CAP docs
    rows += [(100 + i, f"pad{i} {hot}") for i in range(SUBSTR_DF_CAP + 5)]
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
        os.path.join(tmp_path, "documents.parquet")
    )
    out = QUERIES["llm_dedup_substring"](spark, str(tmp_path)).toPandas()
    got = {(r.doc_a, r.doc_b) for r in out.itertuples(index=False)}
    assert (0, 1) in got
    assert all(a < 100 and b < 100 for a, b in got), (
        f"df-capped boilerplate gram leaked pairs: {sorted(got)[:5]}"
    )
    assert (2, 3) not in got
    n = out.set_index(["doc_a", "doc_b"]).loc[(0, 1), "n_shared_grams"]
    assert n == 1  # exactly the one crafted K-run


def test_resample_gapfill_dense_spine(spark):
    from lsd_spark.operators.aggregates import RESAMPLE_SEC

    out = QUERIES["agg_resample_gapfill"](spark, SF_DIR).toPandas()
    assert (out.n_events == 0).any(), "fixture produced no gaps"
    assert ((out.n_events == 0) <= (out.sum_value == 0.0)).all()
    for _, g in out.groupby("event_type"):
        bins = g.bin_start_sec.sort_values().to_numpy()
        assert (bins[1:] - bins[:-1] == RESAMPLE_SEC).all()
    # every type shares the one global spine
    assert out.groupby("event_type").bin_start_sec.count().nunique() == 1


def test_adaptive_density_split_semantics(spark, duck):
    from lsd_spark.plans.sphere import ADAPTIVE_SPLIT_T

    out = QUERIES["agg_density_adaptive"](spark, SF_DIR).toPandas()
    coarse = set(out.loc[out.nside == 8, "cell"])
    fine_parents = set(out.loc[out.nside == 16, "cell"] // 4)
    assert fine_parents, "fixture produced no refined cells"
    assert not (coarse & fine_parents), "a parent emitted both levels"
    assert (out.loc[out.nside == 8, "n"] <= ADAPTIVE_SPLIT_T).all()
    total = duck.sql("SELECT count(*) FROM events").fetchone()[0]
    assert out.n.sum() == total


def test_incremental_dedup_crafted(spark, tmp_path):
    # doc 5 is a token-permutation of corpus doc 1 -> dup_corpus;
    # docs 10 and 15 are bag-equal to each other but new to the
    # corpus -> keep-first (10 fresh, 15 dup_batch); doc 20 is fresh.
    rows = [
        (1, "red green blue"),          # corpus
        (2, "one two three"),           # corpus
        (5, "blue red green"),          # batch: permutation of 1
        (10, "four five six"),          # batch: first of the twin pair
        (15, "six five four"),          # batch: bag-equal to 10
        (20, "seven eight nine"),       # batch: fresh
    ]
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
        os.path.join(tmp_path, "documents.parquet")
    )
    out = QUERIES["llm_dedup_incremental"](spark, str(tmp_path)).toPandas()
    got = dict(zip(out.doc_id, out.status))
    assert got == {5: "dup_corpus", 10: "fresh", 15: "dup_batch", 20: "fresh"}

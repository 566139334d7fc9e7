"""Generative equivalence test for the zones technique (hypothesis):
the zone-bucketed as-of candidate join + rank must equal the naive
quadratic definition on arbitrary inputs — boundary timestamps (zone
edges, exact 1h deltas, ties) included by construction.
"""

from __future__ import annotations

import datetime

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lsd_spark.plans.zones import rank_nearest, zoned_asof_candidates

HOUR_US = 3_600_000_000
BASE = datetime.datetime(2024, 1, 1)


def naive_asof(purchases, clicks):
    """Quadratic reference: latest prior click <= 1h, per purchase,
    ties broken by event_id desc."""
    out = {}
    for uid, pts, pid in purchases:
        best = None
        for cuid, cts, cid in clicks:
            if cuid != uid or not (cts < pts):
                continue
            if (pts - cts) > datetime.timedelta(hours=1):
                continue
            k = (cts, cid)
            if best is None or k > best:
                best = k
        if best is not None:
            out[pid] = best[1]
    return out


events = st.lists(
    st.tuples(
        st.integers(0, 3),  # user_id: few users -> many collisions
        st.integers(0, 3 * 3600).map(lambda s: BASE + datetime.timedelta(seconds=s)),
    ),
    min_size=0,
    max_size=25,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(p=events, c=events)
def test_zoned_asof_equals_naive(spark, p, c):
    purchases = [(uid, ts, 1000 + i) for i, (uid, ts) in enumerate(p)]
    clicks = [(uid, ts, 2000 + i) for i, (uid, ts) in enumerate(c)]
    schema = "user_id long, ts timestamp, event_id long"
    pdf = spark.createDataFrame(
        pd.DataFrame(purchases, columns=["user_id", "ts", "event_id"])
        if purchases
        else pd.DataFrame({"user_id": [], "ts": [], "event_id": []}),
        schema=schema,
    )
    cdf = spark.createDataFrame(
        pd.DataFrame(clicks, columns=["user_id", "ts", "event_id"])
        if clicks
        else pd.DataFrame({"user_id": [], "ts": [], "event_id": []}),
        schema=schema,
    )
    cands = zoned_asof_candidates(pdf, cdf, key="user_id", ts="ts", max_delta_us=HOUR_US)
    best = rank_nearest(
        cands,
        partition_cols=["l_event_id"],
        order_cols=[__import__("pyspark").sql.functions.col("r_ts").desc(),
                    __import__("pyspark").sql.functions.col("r_event_id").desc()],
        nmax=1,
    )
    got = {r.l_event_id: r.r_event_id for r in best.collect()}
    assert got == naive_asof(purchases, clicks)

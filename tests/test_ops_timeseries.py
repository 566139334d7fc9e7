"""Time-series / window operator semantics vs pandas/numpy
recomputation (consolidated from the round-4..7 files in round
10): sessionization, resampling, rolling statistics, drift."""


from __future__ import annotations


import numpy as np
import pandas as pd
from tests.conftest import SF_DIR
import os
import pytest
from lsd_spark.registry import QUERIES, load_all
import hashlib
import math
from collections import Counter


load_all()


SF_SMALL = "/root/testdata/sf0.001"


def _events_pdf(spark, sf_dir):
    from lsd_spark.catalog import load

    pdf = load(spark, sf_dir, "events").toPandas()
    pdf["t_us"] = pdf.ts.values.astype("datetime64[us]").astype("int64")
    return pdf.sort_values(["user_id", "ts", "event_id"])


def _events() -> pd.DataFrame:
    ev = pd.read_parquet(os.path.join(SF_DIR, "events.parquet"))
    # events.parquet is TIMESTAMP(NANOS); mirror catalog.load's
    # microsecond truncation (robust to pandas reading ns OR us units)
    ev["t_us"] = ev.ts.astype("datetime64[us]").astype("int64")
    return ev


def test_sessionize_matches_pandas_reconstruction(spark):
    from lsd_spark.operators.windows import SESSION_GAP_US
    from lsd_spark.registry import QUERIES, load_all

    load_all()
    got = QUERIES["win_sessionize"](spark, SF_SMALL).toPandas()
    pdf = _events_pdf(spark, SF_SMALL)
    gap = pdf.groupby("user_id").t_us.diff()
    pdf["session_id"] = (
        gap.isna() | (gap > SESSION_GAP_US)
    ).astype("int64").groupby(pdf.user_id).cumsum()
    exp = (
        pdf.groupby(["user_id", "session_id"])
        .agg(n_events=("t_us", "size"), start_us=("t_us", "min"), end_us=("t_us", "max"))
        .reset_index()
    )
    merged = got.merge(exp, on=["user_id", "session_id"], suffixes=("", "_exp"))
    assert len(merged) == len(got) == len(exp)
    assert (merged.n_events == merged.n_events_exp).all()
    assert (merged.start_us == merged.start_us_exp).all()
    assert (merged.end_us == merged.end_us_exp).all()
    assert (merged.duration_us == merged.end_us - merged.start_us).all()


def test_variability_eta_near_two_for_iid_noise(spark):
    from lsd_spark.registry import QUERIES, load_all

    load_all()
    got = QUERIES["agg_variability_eta"](spark, SF_DIR).toPandas()
    eta = got.eta_q.to_numpy() / 1000.0
    # per-object values scatter; the population mean of the von
    # Neumann ratio for iid observations is 2n/(n-1) ~ 2.03 at n~67
    assert 1.8 < eta.mean() < 2.25
    assert (eta > 0).all()


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


def test_interpolate_linear_semantics(spark):
    from lsd_spark.operators.windows import INTERP_MASK_MOD

    out = QUERIES["win_interpolate_linear"](spark, SF_DIR).toPandas()
    ev = pd.read_parquet(os.path.join(SF_DIR, "events.parquet"))
    assert len(out) == len(ev)
    assert (out.was_masked == (out.event_id % INTERP_MASK_MOD == 0)).all()
    val = dict(zip(ev.event_id, ev.value))
    # unmasked rows pass through (rounded)
    um = out[~out.was_masked]
    for r in um.head(200).itertuples(index=False):
        assert math.isclose(r.value_filled, round(val[r.event_id], 4), abs_tol=1e-9)
    # masked rows: recompute the lerp in pandas per user
    ev = ev.assign(t_us=ev.ts.astype("int64") // 1000)
    ev = ev.sort_values(["user_id", "t_us", "event_id"])
    checked = 0
    for _, g in ev.groupby("user_id"):
        ids = g.event_id.to_numpy()
        ts = g.t_us.to_numpy()
        vs = g.value.to_numpy()
        masked = ids % INTERP_MASK_MOD == 0
        for i in np.nonzero(masked)[0]:
            prev = [j for j in range(i) if not masked[j]]
            nxt = [j for j in range(i + 1, len(ids)) if not masked[j]]
            if prev and nxt:
                p, n = prev[-1], nxt[0]
                want = vs[p] + (vs[n] - vs[p]) * (ts[i] - ts[p]) / (ts[n] - ts[p])
            elif prev:
                want = vs[prev[-1]]
            elif nxt:
                want = vs[nxt[0]]
            else:
                continue
            got = out.loc[out.event_id == ids[i], "value_filled"].iloc[0]
            assert math.isclose(got, round(want, 4), abs_tol=1e-9)
            checked += 1
        if checked > 50:
            break
    assert checked > 0


def test_win_ewma_recomputes_in_pandas(spark):
    from lsd_spark.operators.windows import EWMA_ALPHA, EWMA_W

    out = QUERIES["win_ewma"](spark, SF_DIR).toPandas()
    ev = pd.read_parquet(os.path.join(SF_DIR, "events.parquet"))
    assert len(out) == len(ev)
    ev = ev.assign(t_us=ev.ts.astype("int64") // 1000)
    got = dict(zip(out.event_id, out.ewma))
    checked = 0
    for _, g in ev.groupby("user_id"):
        g = g.sort_values(["t_us", "event_id"])
        vals = g.value.to_numpy()
        ids = g.event_id.to_numpy()
        for i in range(len(vals)):
            lo = max(0, i - EWMA_W + 1)
            window = vals[lo : i + 1][::-1]  # most recent first
            ws = [EWMA_ALPHA**k for k in range(len(window))]
            want = round(sum(w * v for w, v in zip(ws, window)) / sum(ws), 4)
            assert math.isclose(got[ids[i]], want, abs_tol=1e-9), (ids[i], got[ids[i]], want)
            checked += 1
        if checked > 300:
            break
    assert checked > 0


def test_sigma_clip_matches_pandas(spark):
    out = (
        QUERIES["agg_sigma_clip"](spark, SF_DIR)
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    ev = pd.read_parquet(os.path.join(SF_DIR, "events.parquet"))
    ev = ev[ev.value.notna()][["user_id", "value"]]
    rows = {}
    for uid, g in ev.groupby("user_id"):
        v = g.value.values
        if len(v) < 3:
            continue
        m0 = round(float(np.mean(v)), 6)
        sd0 = round(float(np.std(v, ddof=1)), 6)
        kept = v[np.abs(v - m0) <= 2 * sd0]
        rows[uid] = (len(v), len(kept), int(np.floor(np.mean(kept) * 1000 + 0.5)))
    assert set(out.index) == set(rows)
    for uid, (n_raw, n_kept, mean_milli) in rows.items():
        r = out.loc[uid]
        assert (int(r.n_raw), int(r.n_kept), int(r.clip_mean_milli)) == (
            n_raw,
            n_kept,
            mean_milli,
        ), uid


def test_structure_function_matches_pandas(spark):
    out = QUERIES["agg_structure_function"](spark, SF_DIR).toPandas()
    ev = pd.read_parquet(os.path.join(SF_DIR, "events.parquet"))
    ev = ev[ev.value.notna()].copy()
    ev["us"] = ev.ts.values.astype("datetime64[us]").astype("int64")
    rows = {}
    for (et, _uid), g in ev.groupby(["event_type", "user_id"]):
        us = g.us.values
        v = g.value.values
        order = np.argsort(us, kind="stable")
        us, v = us[order], v[order]
        for i in range(len(us)):
            for j in range(i + 1, len(us)):
                if us[i] == us[j]:
                    continue
                lo, hi = (i, j) if us[i] < us[j] else (j, i)
                b = min(abs(us[hi] - us[lo]) // (7 * 86_400_000_000), 7)
                rows.setdefault((et, b), []).append(abs(v[hi] - v[lo]))
    for (et, b), dvs in rows.items():
        r = out[(out.event_type == et) & (out.lag_bin == b)]
        assert len(r) == 1, (et, b)
        assert int(r.n_pairs.iloc[0]) == len(dvs)
        assert int(r.sf_milli.iloc[0]) == int(np.floor(np.mean(dvs) * 1000 + 0.5))


def test_zscore_anomaly_matches_pandas_rolling(spark):
    out = (
        QUERIES["win_zscore_anomaly"](spark, SF_DIR)
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )
    ev = _events().sort_values(["user_id", "t_us", "event_id"]).copy()
    ev["v_m"] = np.floor(ev.value * 1000 + 0.5).astype("int64")
    ev["v2"] = ev.v_m * ev.v_m
    g = ev.groupby("user_id")
    s1 = g["v_m"].rolling(16, min_periods=1).sum().reset_index(0, drop=True)
    s2 = g["v2"].rolling(16, min_periods=1).sum().reset_index(0, drop=True)
    n = g["v_m"].rolling(16, min_periods=1).count().reset_index(0, drop=True)
    s1, s2, n = (
        s1.astype("int64").values,
        s2.astype("int64").values,
        n.astype("int64").values,
    )
    dv = ev.v_m.values * n - s1
    dev = np.floor(dv / n.astype(float) + 0.5).astype("int64")
    flag = ((n >= 8) & (dv * dv * (n - 1) > 9 * n * (n * s2 - s1 * s1))).astype(
        int
    )
    exp = pd.DataFrame(
        {"dev": dev, "flag": flag}, index=ev.event_id.values
    ).sort_index()
    assert (out.dev_milli.values == exp.dev.values).all()
    assert (out.is_anomaly.values == exp.flag.values).all()
    assert out.is_anomaly.sum() > 0


def test_cusum_drift_exact_integers_and_zero_terminal(spark):
    out = (
        QUERIES["win_cusum_drift"](spark, SF_DIR)
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )
    ev = _events().sort_values(["user_id", "t_us", "event_id"]).copy()
    ev["v_m"] = np.floor(ev.value * 1000 + 0.5).astype("int64")
    g = ev.groupby("user_id")["v_m"]
    run = g.cumsum()
    rn = g.cumcount() + 1
    tot = g.transform("sum")
    n = g.transform("count")
    cus = np.floor((run * n - rn * tot) / n.astype(float) + 0.5).astype("int64")
    exp = pd.Series(cus.values, index=ev.event_id.values).sort_index()
    assert (out.cusum_milli.values == exp.values).all()
    # the CUSUM of a full series is identically zero at its last row
    last_ids = ev.groupby("user_id").event_id.last()
    assert (out.loc[last_ids.values].cusum_milli == 0).all()


def test_autocorr_matches_pandas(spark):
    out = QUERIES["agg_autocorr"](spark, SF_DIR).toPandas()
    ev = _events().sort_values(["user_id", "event_type", "t_us", "event_id"])
    for lag in (1, 2, 3):
        lagged = ev.groupby(["user_id", "event_type"])["value"].shift(lag)
        ok = lagged.notna()
        for etype, sub in ev[ok].groupby("event_type"):
            r = np.corrcoef(sub.value, lagged[ok][sub.index])[0, 1]
            row = out[(out.event_type == etype) & (out.lag == lag)]
            assert len(row) == 1
            assert row.acf_x1e4.iloc[0] == math.floor(r * 10000 + 0.5)
            assert row.n_pairs.iloc[0] == len(sub)


def test_theilsen_matches_numpy_median(spark):
    out = QUERIES["agg_theilsen_slope"](spark, SF_DIR).toPandas()
    ev = _events().sort_values(["user_id", "t_us", "event_id"])
    ev = ev[ev.value.notna()]
    for uid, sub in ev.groupby("user_id"):
        t = sub.t_us.values.astype(float)
        v = sub.value.values
        eid = sub.event_id.values
        slopes = []
        for i in range(len(t)):
            for j in range(len(t)):
                if t[i] < t[j]:
                    slopes.append(
                        (
                            (v[j] - v[i]) * 86_400_000_000.0 / (t[j] - t[i]),
                            eid[i],
                            eid[j],
                        )
                    )
        slopes.sort()
        med = slopes[(len(slopes) + 1) // 2 - 1][0]
        row = out[out.user_id == uid]
        assert row.n_pairs.iloc[0] == len(slopes)
        assert row.slope_milli_per_day.iloc[0] == math.floor(med * 1000 + 0.5)


def test_pct_change_exact_division(spark):
    out = (
        QUERIES["win_pct_change"](spark, SF_DIR)
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )
    ev = _events().sort_values(["user_id", "t_us", "event_id"]).copy()
    ev["v_m"] = np.floor(ev.value * 1000 + 0.5).astype("int64")
    pv = ev.groupby("user_id")["v_m"].shift(1)
    exp = np.floor((ev.v_m - pv) * 10000.0 / pv + 0.5)
    exp = pd.Series(exp.values, index=ev.event_id.values).sort_index()
    got = out.pct_x1e4
    assert (got.isna() == exp.isna()).all()
    m = ~exp.isna()
    assert (got[m].astype("int64").values == exp[m].astype("int64").values).all()


def test_heatmap_hour_dow_integer_arithmetic(spark):
    out = QUERIES["agg_heatmap_hour_dow"](spark, SF_DIR).toPandas()
    ev = _events()
    dow = (ev.t_us // 86_400_000_000 + 4) % 7
    hour = ev.t_us % 86_400_000_000 // 3_600_000_000
    exp = Counter(zip(dow.tolist(), hour.tolist()))
    got = {(r.dow, r.hour): r.cnt for _, r in out.iterrows()}
    assert got == dict(exp)
    assert out.cnt.sum() == len(ev)
    # cross-check the integer dow against pandas' calendar
    cal = pd.to_datetime(ev.t_us, unit="us").dt.dayofweek  # 0=Mon
    assert Counter(((cal + 1) % 7).tolist()) == Counter(dow.tolist())


def test_arg_extrema_matches_idxmax(spark):
    out = QUERIES["fn_arg_extrema"](spark, SF_DIR).toPandas()
    od = pd.read_parquet(os.path.join(SF_DIR, "orders.parquet"))
    for pri, sub in od.groupby("o_orderpriority"):
        row = out[out.pri == pri]
        assert row.key_of_max.iloc[0] == sub.loc[
            sub.o_totalprice.idxmax()
        ].o_orderkey
        assert row.key_of_min.iloc[0] == sub.loc[
            sub.o_totalprice.idxmin()
        ].o_orderkey


def test_arg_extrema_tie_pins_smallest_key(spark, tmp_path_factory):
    """The 10x stress dir manufactures exact totalprice ties
    (replicated rows under offset keys) — the case the eager
    first draft of fn_arg_extrema failed. Crafted fixture: two keys
    share the max and two share the min; the smallest key must win
    BOTH extremes."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("argmax_tie")
    tbl = pa.table(
        {
            "o_orderkey": pa.array([7, 3, 5, 11, 2], pa.int64()),
            "o_orderpriority": pa.array(["1-URGENT"] * 5),
            "o_totalprice": pa.array([90.0, 90.0, 50.0, 10.0, 10.0]),
        }
    )
    pq.write_table(tbl, str(d / "orders.parquet"))
    out = QUERIES["fn_arg_extrema"](spark, str(d)).toPandas()
    assert out.key_of_max.iloc[0] == 3  # min key among the 90.0 tie
    assert out.key_of_min.iloc[0] == 2

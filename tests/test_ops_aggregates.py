"""Aggregate / sketch semantics vs closed forms and exact
recomputation (consolidated from the round-6..7 files in round
10): quantile sketch, HLL, count-min, gini, weighted median."""


from __future__ import annotations


import os
import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from lsd_spark.registry import ORACLES, QUERIES, load_all
import hashlib
import math
from collections import Counter
from lsd_spark.registry import QUERIES, load_all
from tests.conftest import SF_DIR


load_all()


def _events() -> pd.DataFrame:
    ev = pd.read_parquet(os.path.join(SF_DIR, "events.parquet"))
    # events.parquet is TIMESTAMP(NANOS); mirror catalog.load's
    # microsecond truncation (robust to pandas reading ns OR us units)
    ev["t_us"] = ev.ts.astype("datetime64[us]").astype("int64")
    return ev


def _md5int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_quantile_sketch_within_one_bin_of_exact(spark):
    """The sketch's stated error bound is the bin width (1.0):
    every estimate must be the floor of a value at-or-below the
    exact quantile's bin neighborhood, independently recomputed
    with numpy's inverted_cdf (the same rank definition)."""
    from tests.conftest import SF_DIR

    out = QUERIES["agg_quantile_sketch"](spark, SF_DIR).toPandas()
    ev = pd.read_parquet(os.path.join(SF_DIR, "events.parquet"))
    ev = ev[ev.value.notna()]
    for r in out.itertuples(index=False):
        vals = np.sort(ev[ev.event_type == r.event_type].value.values)
        assert r.n == len(vals)
        for pct, got in ((50, r.p50_est), (95, r.p95_est), (99, r.p99_est)):
            exact = vals[int(np.ceil(pct / 100 * len(vals))) - 1]
            assert abs(got - np.floor(exact)) <= 1, (r.event_type, pct, got, exact)


def test_weighted_median_crossing(spark):
    out = QUERIES["agg_weighted_median"](spark, SF_DIR).toPandas()
    li = pd.read_parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    for flag, sub in li.groupby("l_returnflag"):
        s = sub.sort_values("l_extendedprice")
        cw = s.l_quantity.astype("int64").cumsum()
        tw = int(s.l_quantity.astype("int64").sum())
        v = s.l_extendedprice[2 * cw >= tw].iloc[0]
        got = out[out.flag == flag].wmedian_cents.iloc[0]
        assert got == math.floor(v * 100 + 0.5)


def test_gini_matches_closed_form_and_bounds(spark):
    out = QUERIES["agg_gini"](spark, SF_DIR).toPandas()
    od = pd.read_parquet(os.path.join(SF_DIR, "orders.parquet"))
    cents = np.floor(od.o_totalprice * 100 + 0.5).astype("int64")
    for pri, sub in pd.DataFrame(
        {"pri": od.o_orderpriority, "c": cents}
    ).groupby("pri"):
        x = np.sort(sub.c.values)
        n = len(x)
        i = np.arange(1, n + 1)
        g = 2.0 * (i * x).sum() / (n * x.sum()) - (n + 1.0) / n
        row = out[out.pri == pri]
        assert row.gini_x1e4.iloc[0] == math.floor(g * 10000 + 0.5)
        assert 0 <= row.gini_x1e4.iloc[0] < 10000
        assert row.n.iloc[0] == n


def test_benford_shares_and_expectations(spark):
    out = QUERIES["agg_benford"](spark, SF_DIR).toPandas()
    od = pd.read_parquet(os.path.join(SF_DIR, "orders.parquet"))
    assert out.n.sum() == (od.o_totalprice > 0).sum()
    assert set(out.digit) <= set(range(1, 10))
    for _, r in out.iterrows():
        assert r.benford_x1e4 == math.floor(
            math.log10(1 + 1 / r.digit) * 1e4 + 0.5
        )


def test_hll_portable_exact_sketch_recompute(spark):
    out = QUERIES["agg_approx_distinct_portable"](spark, SF_DIR).toPandas()
    li = pd.read_parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    keys = li.l_orderkey.unique()
    regs = [0] * 256
    for k in keys:
        h = _md5int(str(k))
        b, w = h % 256, h // 256
        rho = 53 if w == 0 else 53 - w.bit_length()
        regs[b] = max(regs[b], rho)
    s = sum(2 ** (40 - min(r, 40)) for r in regs)
    e_raw = 5.175699493294551e16 / s
    v = sum(1 for r in regs if r == 0)
    est = 256 * math.log(256.0 / v) if (e_raw <= 640.0 and v > 0) else e_raw
    assert out.est_distinct.iloc[0] == math.floor(est + 0.5)
    assert out.exact_distinct.iloc[0] == len(keys)
    # achieved accuracy within ~2 standard errors of the m=256 sketch
    assert out.err_ppm.iloc[0] < 130_000


def test_hll_linear_counting_branch(spark, tmp_path_factory):
    """The stock fixture's ~15k distinct keys keep the HLL in the
    raw-estimate regime; a 60-key table forces E_raw <= 2.5m with
    empty registers, exercising the guarded linear-counting branch
    the driver oracle never reaches — and the estimate must still
    land within a few percent (LC is near-exact at tiny loads)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("hll_small")
    keys = [k for k in range(200) if k % 10 < 3]  # 60 distinct keys
    tbl = pa.table({"l_orderkey": pa.array(keys * 3, pa.int64())})
    pq.write_table(tbl, str(d / "lineitem.parquet"))
    out = QUERIES["agg_approx_distinct_portable"](spark, str(d)).toPandas()
    # python recompute of the SAME sketch confirms the branch taken
    regs = [0] * 256
    for k in set(keys):
        h = _md5int(str(k))
        b, w = h % 256, h // 256
        regs[b] = max(regs[b], 53 if w == 0 else 53 - w.bit_length())
    s = sum(2 ** (40 - min(r, 40)) for r in regs)
    e_raw = 5.175699493294551e16 / s
    v = sum(1 for r in regs if r == 0)
    assert e_raw <= 640.0 and v > 0  # the LC branch IS the one taken
    est = 256 * math.log(256.0 / v)
    assert out.est_distinct.iloc[0] == math.floor(est + 0.5)
    assert out.exact_distinct.iloc[0] == 60
    assert out.err_ppm.iloc[0] < 100_000


def test_count_min_overestimates_never_under(spark):
    out = QUERIES["agg_count_min_sketch"](spark, SF_DIR).toPandas()
    od = pd.read_parquet(os.path.join(SF_DIR, "orders.parquet"))
    true = od.o_custkey.value_counts()
    # the one-sided guarantee: est >= true for EVERY queried key
    assert (out.est_cnt >= out.true_cnt).all()
    for _, r in out.iterrows():
        assert r.true_cnt == true[r.k]
    # python recompute of the sketch pins the exact estimates
    regs = {}
    for k, n in true.items():
        for i in range(4):
            col = _md5int(f"{k}cm{i}") % 256
            regs[(i, col)] = regs.get((i, col), 0) + n
    for _, r in out.iterrows():
        est = min(regs[(i, _md5int(f"{r.k}cm{i}") % 256)] for i in range(4))
        assert r.est_cnt == est


def test_rollup_subtotals_consistent(spark):
    out = QUERIES["agg_rollup"](spark, SF_DIR).toPandas()
    nation_rows = out[out.gid == 0]
    region_rows = out[out.gid == 1]
    grand = out[out.gid == 3]
    assert len(grand) == 1
    assert grand.n_cust.iloc[0] == nation_rows.n_cust.sum()
    for _, r in region_rows.iterrows():
        sub = nation_rows[nation_rows.r_name == r.r_name]
        assert r.n_cust == sub.n_cust.sum()
        assert r.bal_cents == sub.bal_cents.sum()
        assert pd.isna(r.n_name)


def test_mad_matches_numpy_lower_median(spark):
    out = QUERIES["win_mad_robust"](spark, SF_DIR).toPandas()
    ev = _events()
    ev["v_m"] = np.floor(ev.value * 1000 + 0.5).astype("int64")
    for uid, sub in ev.groupby("user_id"):
        v = np.sort(sub.v_m.values)
        med = v[(len(v) + 1) // 2 - 1]
        dev = np.sort(np.abs(sub.v_m.values - med))
        mad = dev[(len(dev) + 1) // 2 - 1]
        assert out[out.user_id == uid].mad_milli.iloc[0] == mad


def test_variant_matches_json_recompute(spark):
    out = QUERIES["fn_variant"](spark, SF_DIR).toPandas()
    import json as _json

    ev = _events()
    ks = ev.props.map(lambda p: _json.loads(p)["k"])
    ks = ks[ks >= 20]
    exp = ks.groupby(ks % 10).agg(["size", "min"])
    for _, r in out.iterrows():
        assert r.cnt == exp.loc[r.k_mod, "size"]
        assert r.min_k == exp.loc[r.k_mod, "min"]


def test_mode_deterministic_tiebreak(spark):
    out = QUERIES["agg_mode_deterministic"](spark, SF_DIR).toPandas()
    li = pd.read_parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    for flag, sub in li.groupby("l_returnflag"):
        c = sub.l_quantity.astype("int64").value_counts()
        top = c[c == c.max()].index.min()  # max count, smallest value
        row = out[out.flag == flag]
        assert row.mode_qty.iloc[0] == top
        assert row.n_occurrences.iloc[0] == c.max()


def test_symmetric_diff_sets(spark):
    out = QUERIES["set_symmetric_diff"](spark, SF_DIR).toPandas()
    od = pd.read_parquet(os.path.join(SF_DIR, "orders.parquet"))
    yr = pd.to_datetime(od.o_orderdate).dt.year
    a = set(od[yr == 1994].o_custkey)
    b = set(od[yr == 1995].o_custkey)
    assert set(out[out.side == "a_only"].k) == a - b
    assert set(out[out.side == "b_only"].k) == b - a

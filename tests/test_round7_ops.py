"""Semantic pins for the round-7 operators — independent
recomputation in numpy/pandas, not just the DuckDB-oracle
differential (the oracle proves cross-engine agreement; these prove
the agreed-on answer is the RIGHT answer):

- the time-series family (zscore/cusum/autocorr) against pandas
  rolling/expanding recomputation;
- the distribution family (weighted median / gini / benford)
  against closed-form recomputation;
- the LLM family (filter rules / importance sampling / BPE pairs /
  embed stats) against hashlib + Counter ground truth;
- the astronomy family (pm-epoch xmatch / hess / dipole / galactic
  profile) against numpy brute force on the md5-derived sky;
- set_symmetric_diff and stream_topk_windowed against pandas set /
  groupby recomputation.
"""

from __future__ import annotations

import hashlib
import math
import os
from collections import Counter

import numpy as np
import pandas as pd

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


# --- time-series family -----------------------------------------------------


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
    assert out.is_anomaly.sum() > 0  # the detector actually fires


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


# --- distribution family ----------------------------------------------------


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


# --- LLM family --------------------------------------------------------------


def _docs() -> pd.DataFrame:
    return pd.read_parquet(os.path.join(SF_DIR, "documents.parquet"))


def test_filter_rules_recompute_and_nondegenerate(spark):
    out = QUERIES["llm_filter_rules"](spark, SF_DIR).toPandas()
    docs = _docs()
    reasons = []
    for _, d in docs.iterrows():
        words = d.text.split(" ")
        nw, nt = len(words), len(set(words))
        nl = len(d.text.replace(" ", ""))
        if d.n_chars < 150:
            reasons.append("too_short")
        elif nw < 30:
            reasons.append("too_few_words")
        elif nt * 100 < nw * 35:
            reasons.append("low_diversity")
        elif nl * 10 > nw * 120:
            reasons.append("words_too_long")
        elif nl * 10 < nw * 20:
            reasons.append("words_too_short")
        else:
            reasons.append("ok")
    exp = pd.Series(reasons, index=docs.doc_id.values)
    got = out.set_index("doc_id").reason.sort_index()
    assert (got.values == exp.sort_index().values).all()
    assert (out.kept == (out.reason == "ok")).all()
    assert 0 < out.kept.sum() < len(out)  # both classes non-empty


def test_importance_sampling_membership(spark):
    out = QUERIES["llm_sample_importance"](spark, SF_DIR).toPandas()
    docs = _docs()
    kept = set()
    for _, d in docs.iterrows():
        ntok = len(d.text.split(" "))
        score = min(d.n_chars / 400.0, 1.0) * 0.5 + min(ntok / 80.0, 1.0) * 0.5
        p_u = math.floor(score * 1_000_000)
        u = _md5int(f"{d.doc_id}imp") % 1_000_000
        if u < p_u:
            kept.add(d.doc_id)
    assert set(out.doc_id) == kept
    assert 0 < len(kept) < len(docs)


def test_bpe_pairs_match_counter(spark):
    out = QUERIES["llm_bpe_pairs"](spark, SF_DIR).toPandas()
    c: Counter = Counter()
    for text in _docs().text:
        for w in text.split(" "):
            for i in range(len(w) - 1):
                c[w[i : i + 2]] += 1
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    assert list(zip(out.pair, out.cnt)) == top


def test_embed_stats_matches_numpy(spark):
    out = QUERIES["llm_embed_stats"](spark, SF_DIR).toPandas()
    emb = pd.read_parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    for label, sub in emb.groupby("label"):
        norms = np.array(
            [
                math.sqrt(sum(float(x) * float(x) for x in v))
                for v in sub.embedding
            ]
        )
        row = out[out.label == label]
        assert row.n.iloc[0] == len(sub)
        assert row.avg_norm_milli.iloc[0] == math.floor(
            norms.mean() * 1000 + 0.5
        )
        assert row.n_low.iloc[0] == (norms < 0.5).sum()
        assert row.n_high.iloc[0] == (norms > 2.0).sum()


# --- astronomy family ---------------------------------------------------------


def _sky(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    ra = np.array([(_md5int(f"{i}r") % 360000) / 1000.0 for i in ids])
    dec = np.array([(_md5int(f"{i}d") % 180000) / 1000.0 - 90.0 for i in ids])
    return ra, dec


def test_pm_epoch_xmatch_brute_force_and_propagation_matters(spark):
    out = QUERIES["join_xmatch_pm_epoch"](spark, SF_DIR).toPandas()
    ev = _events()
    p_ids = ev[ev.event_type == "purchase"].event_id.values
    c_ids = ev[ev.event_type == "click"].event_id.values
    pra, pdec = _sky(p_ids)
    dra = np.array([_md5int(f"{i}p") % 101 - 50 for i in p_ids]) / 1000.0
    ddec = np.array([_md5int(f"{i}q") % 101 - 50 for i in p_ids]) / 1000.0
    pra2 = (pra + dra + 360.0) % 360.0
    pdec2 = np.clip(pdec + ddec, -90.0, 89.999)
    cra, cdec = _sky(c_ids)
    phi1, phi2 = np.radians(pdec2)[:, None], np.radians(cdec)[None, :]
    lam1, lam2 = np.radians(pra2)[:, None], np.radians(cra)[None, :]
    a = (
        np.sin((phi2 - phi1) / 2) ** 2
        + np.cos(phi1) * np.cos(phi2) * np.sin((lam2 - lam1) / 2) ** 2
    )
    dist = np.degrees(2 * np.arcsin(np.minimum(1.0, np.sqrt(a))))
    li, ri = np.where(dist <= 1.0)
    exp = set(zip(p_ids[li], c_ids[ri]))
    assert set(zip(out.l_id, out.r_id)) == exp
    # propagation must CHANGE the answer vs the plain xmatch
    plain = QUERIES["join_xmatch_sphere"](spark, SF_DIR).toPandas()
    assert set(zip(out.l_id, out.r_id)) != set(zip(plain.l_id, plain.r_id))


def test_hess_diagram_integer_bins(spark):
    out = QUERIES["agg_hess_diagram"](spark, SF_DIR).toPandas()
    ev = _events()
    gm = np.array([_md5int(f"{i}bg") % 10000 for i in ev.event_id])
    rm = np.array([_md5int(f"{i}br") % 10000 for i in ev.event_id])
    cb = (gm - rm + 10000) // 1000
    mb = gm // 1000
    exp = Counter(zip(cb.tolist(), mb.tolist()))
    got = {(r.color_bin, r.mag_bin): r.cnt for _, r in out.iterrows()}
    assert got == dict(exp)
    assert out.cnt.sum() == len(ev)


def test_dipole_exact_integer_recompute(spark):
    out = QUERIES["agg_dipole_sky"](spark, SF_DIR).toPandas()
    ev = _events()
    ra, dec = _sky(ev.event_id.values)
    lam, phi = np.radians(ra), np.radians(dec)
    x = np.floor(np.cos(phi) * np.cos(lam) * 1e6 + 0.5).astype("int64")
    y = np.floor(np.cos(phi) * np.sin(lam) * 1e6 + 0.5).astype("int64")
    z = np.floor(np.sin(phi) * 1e6 + 0.5).astype("int64")
    n = len(ev)
    sx, sy, sz = int(x.sum()), int(y.sum()), int(z.sum())
    assert out.n.iloc[0] == n
    assert out.x_x1e4.iloc[0] == math.floor(sx / (100.0 * n) + 0.5)
    assert out.y_x1e4.iloc[0] == math.floor(sy / (100.0 * n) + 0.5)
    assert out.z_x1e4.iloc[0] == math.floor(sz / (100.0 * n) + 0.5)
    amp = math.sqrt(float(sx) ** 2 + float(sy) ** 2 + float(sz) ** 2)
    assert out.amp_x1e4.iloc[0] == math.floor(amp / (100.0 * n) + 0.5)
    # a synthetic-uniform sky must NOT show a strong dipole
    assert out.amp_x1e4.iloc[0] < 2000


def test_galactic_profile_totals_and_rotation(spark):
    out = QUERIES["agg_galactic_profile"](spark, SF_DIR).toPandas()
    ev = _events()
    assert out.cnt.sum() == len(ev)
    ra, dec = _sky(ev.event_id.values)
    sd, cd = np.sin(np.radians(dec)), np.cos(np.radians(dec))
    sdg, cdg = math.sin(math.radians(27.12825)), math.cos(
        math.radians(27.12825)
    )
    dra = np.radians(ra - 192.85948)
    sinb = np.clip(sd * sdg + cd * cdg * np.cos(dra), -1.0, 1.0)
    b = np.round(np.degrees(np.arcsin(sinb)), 6)
    bins = np.minimum(np.floor(np.abs(b) / 7.5), 11).astype(int)
    exp = Counter(bins.tolist())
    got = {r.b_bin: r.cnt for _, r in out.iterrows()}
    assert got == dict(exp)


# --- relational / streaming ---------------------------------------------------


def test_symmetric_diff_sets(spark):
    out = QUERIES["set_symmetric_diff"](spark, SF_DIR).toPandas()
    od = pd.read_parquet(os.path.join(SF_DIR, "orders.parquet"))
    yr = pd.to_datetime(od.o_orderdate).dt.year
    a = set(od[yr == 1994].o_custkey)
    b = set(od[yr == 1995].o_custkey)
    assert set(out[out.side == "a_only"].k) == a - b
    assert set(out[out.side == "b_only"].k) == b - a


def test_stream_topk_matches_batch_rank(spark):
    out = QUERIES["stream_topk_windowed"](spark, SF_DIR).toPandas()
    out["win_start"] = pd.to_datetime(out.win_start).astype("datetime64[ns]")
    ev = _events()
    win = pd.to_datetime(ev.t_us, unit="us").dt.floor("h")
    cnt = (
        pd.DataFrame({"w": win, "t": ev.event_type})
        .groupby(["w", "t"])
        .size()
        .reset_index(name="cnt")
    )
    for w, sub in cnt.groupby("w"):
        top = sub.sort_values(["cnt", "t"], ascending=[False, True]).head(3)
        got = out[out.win_start == w].sort_values("rk")
        assert list(got.event_type) == list(top.t)
        assert list(got.cnt) == list(top.cnt)
        assert list(got.rk) == list(range(1, len(top) + 1))


# --- batch 2: self-NN / heatmap / theil-sen -----------------------------------


def test_self_nearest_matches_numpy(spark):
    out = QUERIES["join_self_nearest_sphere"](spark, SF_DIR).toPandas()
    ev = _events()
    ids = ev[ev.event_type == "purchase"].event_id.values
    ra, dec = _sky(ids)
    phi, lam = np.radians(dec), np.radians(ra)
    a = (
        np.sin((phi[None, :] - phi[:, None]) / 2) ** 2
        + np.cos(phi)[:, None]
        * np.cos(phi)[None, :]
        * np.sin((lam[None, :] - lam[:, None]) / 2) ** 2
    )
    dist = np.round(
        np.degrees(2 * np.arcsin(np.minimum(1.0, np.sqrt(a)))), 9
    )
    np.fill_diagonal(dist, np.inf)
    exp = {}
    for i, lid in enumerate(ids):
        j = np.where(dist[i] <= 1.0)[0]
        if len(j):
            # rank by (dist, neighbor id) — the op's tiebreak
            k = j[np.lexsort((ids[j], dist[i][j]))][0]
            exp[lid] = (ids[k], dist[i][k])
    got = {r.l_id: (r.nn_id, r.dist_deg) for _, r in out.iterrows()}
    assert set(got) == set(exp)
    for lid in exp:
        assert got[lid][0] == exp[lid][0]
        assert abs(got[lid][1] - exp[lid][1]) < 1e-9


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


# --- batch 2: novelty / source overlap -----------------------------------------


def _doc_shingles(text: str) -> set:
    t = text.split(" ")
    n = max(len(t) - 2, 1)
    return {" ".join(t[i : i + 3]) for i in range(n)}


def test_ngram_novelty_first_doc_attribution(spark):
    out = QUERIES["llm_ngram_novelty"](spark, SF_DIR).toPandas()
    docs = _docs().sort_values("doc_id")
    first = {}
    for _, d in docs.iterrows():
        for s in _doc_shingles(d.text):
            first.setdefault(s, d.doc_id)
    for _, d in docs.iterrows():
        sh = _doc_shingles(d.text)
        novel = sum(1 for s in sh if first[s] == d.doc_id)
        row = out[out.doc_id == d.doc_id]
        assert row.n_shingles.iloc[0] == len(sh)
        assert row.n_novel.iloc[0] == novel
    # the first document is 100% novel by construction
    d0 = out[out.doc_id == docs.doc_id.iloc[0]]
    assert d0.novelty_x1e4.iloc[0] == 10000


def test_source_overlap_sets(spark):
    out = QUERIES["llm_source_overlap"](spark, SF_DIR).toPandas()
    docs = _docs()
    vocab = {
        s: set(w for t in sub.text for w in t.split(" "))
        for s, sub in docs.groupby("source")
    }
    srcs = sorted(vocab)
    assert len(out) == len(srcs) * (len(srcs) - 1) // 2
    for _, r in out.iterrows():
        inter = len(vocab[r.src_a] & vocab[r.src_b])
        union = len(vocab[r.src_a] | vocab[r.src_b])
        assert r.n_common == inter
        assert r.jaccard_x1e4 == math.floor(inter * 10000.0 / union + 0.5)


# --- batch 2: CDC apply / dynamic partition overwrite ---------------------------


def test_cdc_apply_delete_wins_over_update(spark):
    out = QUERIES["merge_cdc_apply"](spark, SF_DIR).toPandas()
    cust = pd.read_parquet(os.path.join(SF_DIR, "customer.parquet"))
    keys = set(cust.c_custkey)
    got = set(out.c_custkey)
    # terminal deletes remove the key — INCLUDING keys updated at seq 1
    deleted = {k for k in keys if k % 15 == 0}
    assert not (got & deleted)
    assert any(k % 30 == 0 for k in deleted)  # the update-then-delete case
    # inserts present, updates applied, untouched rows intact
    inserted = {k + 2000000 for k in keys if k % 23 == 0}
    assert inserted <= got
    bal = dict(zip(out.c_custkey, out.acctbal_cents))
    for _, c in cust.iterrows():
        k = c.c_custkey
        if k % 15 == 0:
            continue
        expect = c.c_acctbal + 50 if k % 10 == 0 else c.c_acctbal
        assert bal[k] == math.floor(expect * 100 + 0.5)
    for k in inserted:
        assert bal[k] == 0


def test_partition_overwrite_replaces_only_target(spark):
    out = QUERIES["sink_partition_overwrite"](spark, SF_DIR).toPandas()
    ev = _events()
    base = ev.groupby("event_type").size()
    for _, r in out.iterrows():
        if r.event_type == "click":
            assert r.cnt == 2 * base["click"]
        else:
            assert r.cnt == base[r.event_type]


# --- batch 3: portable HLL / rollup / ORC / manifest ----------------------------


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


def test_orc_roundtrip_fingerprint(spark):
    out = QUERIES["source_orc_roundtrip"](spark, SF_DIR).toPandas()
    cust = pd.read_parquet(os.path.join(SF_DIR, "customer.parquet"))
    assert out.n_rows.iloc[0] == len(cust)
    assert out.n_keys.iloc[0] == cust.c_custkey.nunique()
    chain = "".join(
        hashlib.md5(n.encode()).hexdigest()
        for n in cust.sort_values("c_custkey").c_name
    )
    assert out.name_fp.iloc[0] == hashlib.md5(chain.encode()).hexdigest()


def test_file_manifest_disjoint_and_total(spark):
    out = QUERIES["sink_file_manifest"](spark, SF_DIR).toPandas()
    od = pd.read_parquet(os.path.join(SF_DIR, "orders.parquet"))
    assert out.n_rows.sum() == len(od)
    prev_max = -1
    for _, r in out.sort_values("bucket").iterrows():
        assert r.bucket * 4096 <= r.min_key <= r.max_key < (r.bucket + 1) * 4096
        assert r.min_key > prev_max  # file ranges disjoint => skippable
        prev_max = r.max_key


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


def test_stream_parquet_sink_equals_batch(spark):
    out = QUERIES["stream_parquet_sink"](spark, SF_DIR).toPandas()
    ev = _events()
    ev["v_m"] = np.floor(ev.value * 1000 + 0.5).astype("int64")
    exp = ev.groupby("event_type").agg(cnt=("event_id", "size"), s=("v_m", "sum"))
    for _, r in out.iterrows():
        assert r.cnt == exp.loc[r.event_type, "cnt"]
        assert r.sum_milli == exp.loc[r.event_type, "s"]
    assert out.cnt.sum() == len(ev)


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


def test_udtf_chunks_cover_every_token(spark):
    out = QUERIES["udtf_lateral_native"](spark, SF_DIR).toPandas()
    docs = _docs()
    ntok = docs.set_index("doc_id").text.str.split(" ").str.len()
    per_doc = out.groupby("doc_id").n_tokens.sum()
    assert (per_doc == ntok[per_doc.index]).all()
    # every chunk but the last is full-width
    for did, sub in out.groupby("doc_id"):
        s = sub.sort_values("chunk_idx")
        assert (s.n_tokens.iloc[:-1] == 40).all()
        assert list(s.chunk_idx) == list(range(len(s)))


def test_lateral_topn_equals_window_rank(spark):
    out = QUERIES["join_lateral_topn"](spark, SF_DIR).toPandas()
    cust = pd.read_parquet(os.path.join(SF_DIR, "customer.parquet"))
    nat = pd.read_parquet(os.path.join(SF_DIR, "nation.parquet"))
    j = cust.merge(nat, left_on="c_nationkey", right_on="n_nationkey")
    for n_name, sub in j.groupby("n_name"):
        top = sub.sort_values(
            ["c_acctbal", "c_name"], ascending=[False, True]
        ).head(2)
        got = out[out.n_name == n_name]
        assert set(got.c_name) == set(top.c_name)


# --- crafted fixture: HLL linear-counting branch --------------------------------


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


def test_mode_deterministic_tiebreak(spark):
    out = QUERIES["agg_mode_deterministic"](spark, SF_DIR).toPandas()
    li = pd.read_parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    for flag, sub in li.groupby("l_returnflag"):
        c = sub.l_quantity.astype("int64").value_counts()
        top = c[c == c.max()].index.min()  # max count, smallest value
        row = out[out.flag == flag]
        assert row.mode_qty.iloc[0] == top
        assert row.n_occurrences.iloc[0] == c.max()


def test_csv_malformed_quarantine_split(spark):
    out = QUERIES["source_csv_malformed"](spark, SF_DIR).toPandas()
    docs = _docs()
    corrupt = docs.doc_id % 13 == 0
    exp = docs.groupby("lang").apply(
        lambda s: pd.Series(
            {
                "g": int((s.doc_id % 13 != 0).sum()),
                "b": int((s.doc_id % 13 == 0).sum()),
                "ch": int(s[s.doc_id % 13 != 0].n_chars.sum()),
            }
        ),
        include_groups=False,
    )
    for _, r in out.iterrows():
        assert r.n_good == exp.loc[r.lang, "g"]
        assert r.n_corrupt == exp.loc[r.lang, "b"]
        assert r.chars_good == exp.loc[r.lang, "ch"]
    assert out.n_corrupt.sum() == int(corrupt.sum())
    assert out.n_corrupt.sum() > 0  # the corruption actually happened


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
    assert out.key_of_min.iloc[0] == 2  # min key among the 10.0 tie

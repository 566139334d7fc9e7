"""Semantic pins for the round-6e operators (independent
recomputation, not just the DuckDB-oracle differential):

- agg_angular_corr: the binned pair counts must total exactly the
  numpy brute-force count of unordered within-radius self-pairs, the
  per-bin counts must match the numpy histogram, and the ppm
  fractions must sum to ~1e6;
- agg_sigma_clip: pandas recomputation of the one-pass kappa-sigma
  clip (same ROUND(,6) thresholds) must reproduce n_kept and the
  quantized clipped mean;
- fn_mjd_convert: every row round-trips (MJD microseconds ->
  timestamp == source), and mjd_day/frac agree with exact integer
  recomputation from epoch microseconds;
- join_bloom_prune: NO false negatives (every build key passes the
  filter — the Bloom guarantee), every in_build=1 row is genuinely
  in the build set, and the false-positive rate is within the m/k/n
  design envelope.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd

from lsd_spark.registry import QUERIES, load_all
from tests.conftest import SF_DIR

load_all()


def _sphere_coords(event_ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """The md5-derived synthetic (ra, dec) — mirrors sphere_points."""
    ra = np.empty(len(event_ids))
    dec = np.empty(len(event_ids))
    for j, eid in enumerate(event_ids):
        hr = int(hashlib.md5(f"{eid}r".encode()).hexdigest()[:15], 16)
        hd = int(hashlib.md5(f"{eid}d".encode()).hexdigest()[:15], 16)
        ra[j] = (hr % 360000) / 1000.0
        dec[j] = (hd % 180000) / 1000.0 - 90.0
    return ra, dec


def test_angular_corr_matches_numpy_brute_force(spark):
    out = QUERIES["agg_angular_corr"](spark, SF_DIR).toPandas()
    ev = pd.read_parquet(os.path.join(SF_DIR, "events.parquet"))
    ids = ev[ev.event_type == "purchase"].event_id.values
    ra, dec = _sphere_coords(ids)
    lam, phi = np.radians(ra), np.radians(dec)
    # haversine separation matrix in degrees (n ~ 2k: fine dense)
    dphi = phi[:, None] - phi[None, :]
    dlam = lam[:, None] - lam[None, :]
    a = (
        np.sin(dphi / 2) ** 2
        + np.cos(phi)[:, None] * np.cos(phi)[None, :] * np.sin(dlam / 2) ** 2
    )
    dist = np.degrees(2 * np.arcsin(np.minimum(1.0, np.sqrt(a))))
    iu = np.triu_indices(len(ids), k=1)
    d = np.round(dist[iu], 9)
    d = d[d <= 1.0]
    bins = np.minimum(np.floor(d * 8).astype(int), 7)
    expect = np.bincount(bins, minlength=8)
    got = out.set_index("bin").dd_pairs
    assert int(got.sum()) == len(d)
    for b in range(8):
        assert int(got.get(b, 0)) == int(expect[b]), b
    assert abs(int(out.frac_ppm.sum()) - 1_000_000) <= 8


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


def test_mjd_convert_roundtrip_and_integer_identity(spark):
    out = QUERIES["fn_mjd_convert"](spark, SF_DIR).toPandas()
    assert (out.roundtrip_ok == 1).all()
    ev = pd.read_parquet(os.path.join(SF_DIR, "events.parquet"))
    ev = ev[ev.event_type == "click"].set_index("event_id")
    us = pd.Series(
        ev.ts.values.astype("datetime64[us]").astype("int64"), index=ev.index
    )
    mjd_us = us + 40587 * 86_400_000_000
    expect_day = mjd_us // 86_400_000_000
    expect_frac = mjd_us % 86_400_000_000
    got = out.set_index("event_id")
    assert (got.mjd_day == expect_day.reindex(got.index)).all()
    assert (got.mjd_frac_us == expect_frac.reindex(got.index)).all()


def test_bloom_prune_no_false_negatives_and_bounded_fp(spark):
    out = QUERIES["join_bloom_prune"](spark, SF_DIR).toPandas()
    orders = pd.read_parquet(os.path.join(SF_DIR, "orders.parquet"))
    cust = pd.read_parquet(os.path.join(SF_DIR, "customer.parquet"))
    build = set(orders[orders.o_totalprice > 490_000.0].o_custkey)
    passed = set(out.c_custkey)
    # Bloom guarantee: zero false negatives
    assert build <= passed
    # in_build labeling is the exact membership truth
    assert set(out[out.in_build == 1].c_custkey) == build
    fp = out[out.in_build == 0]
    non_members = len(set(cust.c_custkey) - build)
    # design envelope: (1 - e^(-k n / m))^k with k=3, m=4096, padded 4x
    n, m, k = len(build), 4096, 3
    fpp = (1 - np.exp(-k * n / m)) ** k
    assert len(fp) <= max(8, 4 * fpp * non_members)


def test_jsonl_roundtrip_counts(spark):
    out = QUERIES["source_jsonl_import"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet(os.path.join(SF_DIR, "documents.parquet"))
    by_src = docs.groupby("source").agg(cnt=("doc_id", "size"), tc=("n_chars", "sum"))
    got = out.set_index("source")
    assert (got.cnt == by_src.cnt.reindex(got.index)).all()
    assert (got.total_chars == by_src.tc.reindex(got.index)).all()
    fp = docs.assign(
        h=[int(hashlib.md5(t.encode()).hexdigest()[:8], 16) for t in docs.text]
    ).groupby("source").h.sum()
    assert (got.text_fp == fp.reindex(got.index)).all()


def test_bayes_match_prefers_photometric_twin(spark):
    """The posterior winner is NOT always the nearest neighbor: on
    the fixture there must exist at least one left object whose
    Bayes winner differs from its pure-nearest winner (else the
    magnitude prior is dead weight), and every winner must satisfy
    the ln B > 0 posterior cut."""
    from lsd_spark.plans.sphere import (
        R_SPHERE,
        sphere_points,
        sphere_xmatch,
    )

    bayes = QUERIES["join_xmatch_bayes"](spark, SF_DIR).toPandas()
    assert (bayes.lnb > 0).all()
    cand = sphere_xmatch(
        sphere_points(spark, SF_DIR, "purchase"),
        sphere_points(spark, SF_DIR, "click"),
        R_SPHERE,
    ).toPandas()
    nearest = (
        cand.sort_values(["l_id", "dist", "r_id"]).groupby("l_id").first().r_id
    )
    merged = bayes.set_index("l_id").join(nearest.rename("nn_id"), how="inner")
    assert (merged.r_id != merged.nn_id).any()


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


def test_mutual_xmatch_is_one_to_one_subset(spark):
    """One-to-one property: no l_id or r_id appears twice; and the
    mutual set is exactly the intersection of the two one-sided
    nearest assignments recomputed from the raw candidates."""
    from lsd_spark.plans.sphere import R_SPHERE, sphere_points, sphere_xmatch

    out = QUERIES["join_xmatch_mutual"](spark, SF_DIR).toPandas()
    assert out.l_id.is_unique and out.r_id.is_unique
    cand = sphere_xmatch(
        sphere_points(spark, SF_DIR, "purchase"),
        sphere_points(spark, SF_DIR, "click"),
        R_SPHERE,
    ).toPandas()
    cand["dist"] = cand.dist.round(9)
    nl = cand.sort_values(["l_id", "dist", "r_id"]).groupby("l_id").first()
    nr = cand.sort_values(["r_id", "dist", "l_id"]).groupby("r_id").first()
    expect = {
        (lid, row.r_id)
        for lid, row in nl.iterrows()
        if nr.loc[row.r_id].l_id == lid
    }
    assert set(zip(out.l_id, out.r_id)) == expect


def test_completeness_totals_and_fraction(spark):
    """Bin totals must partition the left catalog; matched counts
    must equal the distinct-matched recomputation from the raw
    candidate set; the quantized fraction must be arithmetically
    consistent with (n_matched, n_objects)."""
    from lsd_spark.plans.sphere import R_SPHERE, sphere_points, sphere_xmatch

    out = QUERIES["agg_completeness_mag"](spark, SF_DIR).toPandas()
    ev = pd.read_parquet(os.path.join(SF_DIR, "events.parquet"))
    n_purchase = int((ev.event_type == "purchase").sum())
    assert int(out.n_objects.sum()) == n_purchase
    cand = sphere_xmatch(
        sphere_points(spark, SF_DIR, "purchase"),
        sphere_points(spark, SF_DIR, "click"),
        R_SPHERE,
    ).toPandas()
    ids = ev[ev.event_type == "purchase"].event_id.values
    mags = np.array(
        [
            (int(hashlib.md5(f"{i}m".encode()).hexdigest()[:15], 16) % 10000) / 1000.0
            for i in ids
        ]
    )
    bins = np.minimum(np.floor(mags).astype(int), 9)
    matched_ids = set(cand.l_id)
    for b in sorted(set(bins)):
        sel = bins == b
        nm = sum(1 for i, s in zip(ids, sel) if s and i in matched_ids)
        r = out[out.mag_bin == b]
        assert int(r.n_objects.iloc[0]) == int(sel.sum())
        assert int(r.n_matched.iloc[0]) == nm
        assert int(r.completeness_x1e4.iloc[0]) == int(
            np.floor(nm * 10000.0 / sel.sum() + 0.5)
        )


def test_stream_xmatch_equals_batch(spark):
    """The union of per-micro-batch match results must equal the
    batch cross-match row-for-row (same ids, same rounded dists)."""
    stream = QUERIES["stream_xmatch_sphere"](spark, SF_DIR).toPandas()
    batch = QUERIES["join_xmatch_sphere"](spark, SF_DIR).toPandas()
    s = set(zip(stream.l_id, stream.r_id, stream.dist_deg))
    b = set(zip(batch.l_id, batch.r_id, batch.dist_deg))
    assert s == b


def test_referential_audit_detects_orphans(spark, tmp_path):
    """On the pristine fixture all orphan counts are 0; on a crafted
    copy with a deleted parent and a NULL fk the audit must report
    exactly the injected damage."""
    out = QUERIES["agg_referential_audit"](spark, SF_DIR).toPandas()
    assert (out.n_orphan == 0).all()
    import shutil

    d = tmp_path / "broken"
    d.mkdir()
    for t in (
        "lineitem orders customer nation region supplier part events "
        "documents embeddings".split()
    ):
        shutil.copy(os.path.join(SF_DIR, f"{t}.parquet"), d / f"{t}.parquet")
    nat = pd.read_parquet(d / "nation.parquet")
    dropped = nat.n_nationkey.iloc[0]
    nat[nat.n_nationkey != dropped].to_parquet(d / "nation.parquet", index=False)
    cust = pd.read_parquet(d / "customer.parquet")
    n_orph_cust = int((cust.c_nationkey == dropped).sum())
    cust.loc[cust.index[:3], "c_nationkey"] = None
    n_orph_cust -= int(
        (pd.read_parquet(os.path.join(SF_DIR, "customer.parquet"))
         .c_nationkey.iloc[:3] == dropped).sum()
    )
    cust.to_parquet(d / "customer.parquet", index=False)
    from lsd_spark.registry import clear_plan_cache

    clear_plan_cache()
    try:
        broken = QUERIES["agg_referential_audit"](spark, str(d)).toPandas()
    finally:
        clear_plan_cache()
    row = broken[broken.fk_edge == "customer.c_nationkey"].iloc[0]
    assert int(row.n_null) == 3
    assert int(row.n_orphan) == n_orph_cust
    assert int(row.n_orphan) > 0

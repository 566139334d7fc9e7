"""Spatial / astronomy operator semantics vs independent numpy
reconstruction (consolidated from the round-4..7 files in round
10): polygon regions, proper motion, cross-matches, tracklets,
sky statistics. The DuckDB hash oracle is the driver's job;
these catch wrong-but-self-consistent math."""


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


def _events() -> pd.DataFrame:
    ev = pd.read_parquet(os.path.join(SF_DIR, "events.parquet"))
    # events.parquet is TIMESTAMP(NANOS); mirror catalog.load's
    # microsecond truncation (robust to pandas reading ns OR us units)
    ev["t_us"] = ev.ts.astype("datetime64[us]").astype("int64")
    return ev


def _md5int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _sky(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    ra = np.array([(_md5int(f"{i}r") % 360000) / 1000.0 for i in ids])
    dec = np.array([(_md5int(f"{i}d") % 180000) / 1000.0 - 90.0 for i in ids])
    return ra, dec


def test_quad_polygons_convex_ccw_and_away_from_wrap():
    from lsd_spark.plans.region import _BAND_DEG, QUAD_POLYGONS, _quad_band_rows

    for pid, vs in QUAD_POLYGONS.items():
        assert len(vs) == 4
        for i in range(4):
            x1, y1 = vs[i]
            x2, y2 = vs[(i + 1) % 4]
            x3, y3 = vs[(i + 2) % 4]
            cross = (x2 - x1) * (y3 - y2) - (y2 - y1) * (x3 - x2)
            assert cross > 0, f"poly {pid} not strictly convex CCW at vertex {i}"
        ras = [x for x, _ in vs]
        assert min(ras) > 5 and max(ras) < 355, f"poly {pid} near RA wrap"
    # band rows cover each polygon's full dec extent
    rows = _quad_band_rows()
    for pid, vs in QUAD_POLYGONS.items():
        bands = {r[1] for r in rows if r[0] == pid}
        lo = int((min(y for _, y in vs) + 90.0) // _BAND_DEG)
        hi = int((max(y for _, y in vs) + 90.0) // _BAND_DEG)
        assert bands == set(range(lo, hi + 1))


def test_point_in_polygon_matches_numpy_half_planes(spark):
    from lsd_spark.plans.region import QUAD_POLYGONS
    from lsd_spark.plans.sphere import sphere_points
    from lsd_spark.registry import QUERIES, load_all

    load_all()
    got = QUERIES["join_point_in_polygon"](spark, SF_SMALL).toPandas()
    pts = sphere_points(spark, SF_SMALL, None).toPandas()
    expected = set()
    for pid, vs in QUAD_POLYGONS.items():
        inside = np.ones(len(pts), dtype=bool)
        for i in range(4):
            x1, y1 = vs[i]
            x2, y2 = vs[(i + 1) % 4]
            inside &= (x2 - x1) * (pts.dec - y1) - (y2 - y1) * (
                pts.ra - x1
            ) >= 0.0
        expected |= {(int(e), pid) for e in pts.event_id[inside.to_numpy()]}
    assert set(zip(got.event_id, got.poly_id)) == expected


def test_region_time_bounds_are_the_conjunction(spark):
    from lsd_spark.plans.region import CONE, T_HI_US, T_LO_US
    from lsd_spark.registry import QUERIES, load_all

    load_all()
    got = QUERIES["filter_region_time"](spark, SF_SMALL).toPandas()
    assert (got.t_us >= T_LO_US).all() and (got.t_us < T_HI_US).all()
    # every kept point satisfies the exact cone refine (numpy haversine)
    ra0, dec0, r = np.radians([CONE.ra0, CONE.dec0, CONE.radius])
    ra, dec = np.radians(got.ra), np.radians(got.dec)
    hav = np.sin((dec - dec0) / 2) ** 2 + np.cos(dec) * np.cos(dec0) * np.sin(
        (ra - ra0) / 2
    ) ** 2
    assert (2 * np.arcsin(np.sqrt(hav)) <= r + 1e-9).all()


def test_proper_motion_matches_numpy_polyfit(spark):
    from lsd_spark.functions.astro import T0_US
    from lsd_spark.plans.sphere import sphere_points
    from lsd_spark.registry import QUERIES, load_all

    load_all()
    got = (
        QUERIES["agg_proper_motion"](spark, SF_SMALL).toPandas().set_index("user_id")
    )
    pts = sphere_points(spark, SF_SMALL, None, cols=("ts", "user_id")).toPandas()
    pts["t_day"] = (
        pts.ts.values.astype("datetime64[us]").astype("int64") - T0_US
    ) / 86400e6
    for uid, g in pts.groupby("user_id"):
        if len(g) < 3:
            assert uid not in got.index
            continue
        slope_ra = np.polyfit(g.t_day, g.ra, 1)[0]
        assert got.loc[uid].pm_ra_q == np.floor(slope_ra * 1000 + 0.5)
        assert got.loc[uid].n_det == len(g)


def test_sexagesimal_round_trips(spark):
    from lsd_spark.plans.sphere import sphere_points
    from lsd_spark.registry import QUERIES, load_all

    load_all()
    got = QUERIES["fn_sexagesimal"](spark, SF_SMALL).toPandas()
    pts = sphere_points(spark, SF_SMALL, None).toPandas().set_index("event_id")
    for row in got.itertuples():
        h, m, s = row.ra_hms.split(":")
        ra_back = (int(h) + int(m) / 60 + float(s) / 3600) * 15.0
        assert abs(ra_back - pts.loc[row.event_id].ra) < 1.5 / 240000
        sign = -1.0 if row.dec_dms[0] == "-" else 1.0
        d, m2, s2 = row.dec_dms[1:].split(":")
        dec_back = sign * (int(d) + int(m2) / 60 + float(s2) / 3600)
        assert abs(dec_back - pts.loc[row.event_id].dec) < 1.5 / 360000 + 0.005 / 3600


def test_sky_coverage_consistency(spark):
    from lsd_spark.functions.astro import _NPIX
    from lsd_spark.registry import QUERIES, load_all

    load_all()
    row = QUERIES["agg_sky_coverage"](spark, SF_DIR).toPandas().iloc[0]
    assert 0 < row.npix_hit <= _NPIX == row.npix_total
    assert row.coverage_ppm == int(np.floor(row.npix_hit * 1e6 / _NPIX + 0.5))
    # 10k uniform points over 3072 pixels: occupancy ~ 1 - e^-3.25
    assert 0.9 < row.npix_hit / _NPIX <= 1.0


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

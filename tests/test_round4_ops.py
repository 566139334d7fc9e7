"""Semantic property tests for the round-4 tier-2 operators:
proper motion, sexagesimal, sky coverage, variability eta,
sessionize, SCD2 history, space×time bounds, point-in-polygon join,
temperature mixing. Each pins the operator's SEMANTICS against an
independent numpy/pandas reconstruction (the DuckDB hash oracle is
the driver's job; these catch wrong-but-self-consistent math)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from tests.conftest import SF_DIR

SF_SMALL = "/root/testdata/sf0.001"


# --- polygon constants: the literal geometry must be sane ----------------


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


# --- space x time bounds --------------------------------------------------


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


# --- sessionize / SCD2: reconstruct from the raw event log ----------------


def _events_pdf(spark, sf_dir):
    from lsd_spark.catalog import load

    pdf = load(spark, sf_dir, "events").toPandas()
    pdf["t_us"] = pdf.ts.values.astype("datetime64[us]").astype("int64")
    return pdf.sort_values(["user_id", "ts", "event_id"])


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


def test_scd2_intervals_partition_each_users_timeline(spark):
    from lsd_spark.registry import QUERIES, load_all

    load_all()
    got = QUERIES["merge_scd2"](spark, SF_SMALL).toPandas()
    for uid, g in got.groupby("user_id"):
        g = g.sort_values("version")
        assert list(g.version) == list(range(1, len(g) + 1))
        assert g.is_current.sum() == 1 and g.iloc[-1].is_current == 1
        # contiguous validity: each row's valid_to is the next valid_from
        assert (
            g.valid_to_us.iloc[:-1].to_numpy() == g.valid_from_us.iloc[1:].to_numpy()
        ).all()
        assert pd.isna(g.valid_to_us.iloc[-1])
        # change records: no two consecutive versions share a type
        types = list(g.event_type)
        assert all(a != b for a, b in zip(types, types[1:]))


# --- proper motion: regr_slope == numpy polyfit ---------------------------


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


# --- sexagesimal: strings parse back to the input coordinates -------------


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


# --- sky coverage: internal consistency + bounds --------------------------


def test_sky_coverage_consistency(spark):
    from lsd_spark.functions.astro import _NPIX
    from lsd_spark.registry import QUERIES, load_all

    load_all()
    row = QUERIES["agg_sky_coverage"](spark, SF_DIR).toPandas().iloc[0]
    assert 0 < row.npix_hit <= _NPIX == row.npix_total
    assert row.coverage_ppm == int(np.floor(row.npix_hit * 1e6 / _NPIX + 0.5))
    # 10k uniform points over 3072 pixels: occupancy ~ 1 - e^-3.25
    assert 0.9 < row.npix_hit / _NPIX <= 1.0


# --- variability eta: iid noise sits near 2 -------------------------------


def test_variability_eta_near_two_for_iid_noise(spark):
    from lsd_spark.registry import QUERIES, load_all

    load_all()
    got = QUERIES["agg_variability_eta"](spark, SF_DIR).toPandas()
    eta = got.eta_q.to_numpy() / 1000.0
    # per-object values scatter; the population mean of the von
    # Neumann ratio for iid observations is 2n/(n-1) ~ 2.03 at n~67
    assert 1.8 < eta.mean() < 2.25
    assert (eta > 0).all()


# --- temperature mixing: alpha < 1 flattens the distribution --------------


def test_mix_temperature_weights_flatten(spark):
    from lsd_spark.registry import QUERIES, load_all

    load_all()
    got = QUERIES["llm_mix_temperature"](spark, SF_DIR).toPandas()
    assert abs(got.weight_ppm.sum() - 1_000_000) <= len(got)
    shares = got.toks / got.toks.sum()
    weights = got.weight_ppm / 1e6
    # alpha<1: sources below the mean token share gain weight,
    # sources above lose (monotone flattening)
    gain = weights.to_numpy() / shares.to_numpy()
    order = np.argsort(got.toks.to_numpy())
    assert (np.diff(gain[order]) <= 1e-9).all()
    # epochs_mil = weight / share (x1000): bigger for smaller sources
    assert got.epochs_mil.to_numpy()[order[0]] >= got.epochs_mil.to_numpy()[order[-1]]

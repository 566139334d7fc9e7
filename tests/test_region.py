"""Region algebra geometry: the candidate cell set must be a true
SUPERSET of each footprint (a dropped cell is a silently missing
sky row — the one failure the oracle diff also catches, checked here
directly against numpy so the property holds beyond the fixture
sky), plus known-value checks for the equgal rotation."""

from __future__ import annotations

import math

import numpy as np

from lsd_spark.functions.astro import equgal_sql
from lsd_spark.plans.region import _CID, _NB, GRID, Cone, Poly, Rect


def _cell_of(ra: float, dec: float) -> tuple[int, int]:
    z = min(int(math.floor((dec + 90.0) / GRID)), len(_NB) - 1)
    b = int(math.floor(ra * _NB[z] / 360.0))
    return z, b


def _sep(ra1, dec1, ra2, dec2):
    r1, d1, r2, d2 = map(np.radians, (ra1, dec1, ra2, dec2))
    h = (
        np.sin((d1 - d2) / 2) ** 2
        + np.cos(d1) * np.cos(d2) * np.sin((r1 - r2) / 2) ** 2
    )
    return np.degrees(2 * np.arcsin(np.minimum(1.0, np.sqrt(h))))


def test_cone_cells_cover_every_member_point():
    rng = np.random.default_rng(11)
    for ra0, dec0, r in [(40.0, 10.0, 8.0), (1.0, 0.0, 3.0), (359.5, 88.0, 2.5),
                         (180.0, -89.0, 1.5), (10.0, 60.0, 5.0)]:
        cells = Cone(ra0, dec0, r).cells()
        ra = rng.uniform(0, 360, 4000)
        dec = rng.uniform(-90, 90, 4000)
        inside = _sep(ra, dec, ra0, dec0) <= r
        for x, y in zip(ra[inside], dec[inside]):
            assert _cell_of(x, y) in cells, (x, y, ra0, dec0, r)


def test_cone_cells_prune_most_of_the_sky():
    cells = Cone(40.0, 10.0, 8.0).cells()
    total = sum(_NB)
    assert len(cells) < total / 50  # 8 deg cone ~ 0.5% of the sky


def test_rect_wraparound_cells_and_refine():
    r = Rect(350.0, 10.0, -5.0, 5.0)  # wraps the 0/360 seam
    cells = r.cells()
    assert _cell_of(355.0, 0.0) in cells
    assert _cell_of(5.0, 0.0) in cells
    assert _cell_of(180.0, 0.0) not in cells
    sql = r.refine_sql("ra", "dec")
    assert " OR " in sql  # wrap compiles to a disjunction


def test_poly_refine_matches_numpy_ray_casting():
    verts = [(192.0005, -22.0005), (207.0005, -25.0005), (212.0005, -36.0005),
             (200.0005, -44.0005), (188.0005, -33.0005)]
    p = Poly(verts)
    rng = np.random.default_rng(12)
    ra = rng.uniform(180, 220, 2000)
    dec = rng.uniform(-50, -15, 2000)

    def inside(x, y):
        n, c = len(verts), False
        for i in range(n):
            x1, y1 = verts[i]
            x2, y2 = verts[(i + 1) % n]
            if (y1 > y) != (y2 > y) and x < (y - y1) * (x2 - x1) / (y2 - y1) + x1:
                c = not c
        return c

    # evaluate the SQL text with python eval (engine-neutral subset:
    # comparisons + arithmetic + CASE folded to int())
    import duckdb

    con = duckdb.connect()
    got = con.sql(
        "SELECT " + p.refine_sql("ra", "dec") + " FROM (SELECT UNNEST(?) AS ra, UNNEST(?) AS dec)",
        params=[list(map(float, ra)), list(map(float, dec))],
    ).fetchall()
    for (g,), x, y in zip(got, ra, dec):
        assert bool(g) == inside(x, y), (x, y)
    # and every inside point is covered by the candidate cells
    cells = p.cells()
    for x, y in zip(ra, dec):
        if inside(x, y):
            assert _cell_of(x, y) in cells


def test_algebra_cells_compose_setwise():
    a, b = Cone(320.0, 45.0, 10.0), Rect(300.0, 340.0, 30.0, 50.0)
    inner = Cone(320.0, 45.0, 4.0)
    assert (a | b).cells() == a.cells() | b.cells()
    assert (a & b).cells() == a.cells() & b.cells()
    assert (a - inner).cells() == a.cells()  # difference keeps left


def test_equgal_known_values():
    import duckdb

    con = duckdb.connect()

    def lb(ra, dec):
        l_sql, b_sql = equgal_sql(repr(ra), repr(dec))
        return con.sql(f"SELECT {l_sql}, {b_sql}").fetchone()

    # north galactic pole -> b = +90
    _, b = lb(192.85948, 27.12825)
    assert abs(b - 90.0) < 1e-9
    # galactic center (Sgr A*, J2000): l ~ 359.944, b ~ -0.046
    l, b = lb(266.41684, -29.00781)
    assert abs(b) < 0.1 and min(l, 360.0 - l) < 0.1
    # north celestial pole -> l = L_NCP, b = DEC_NGP
    l, b = lb(0.0, 90.0)
    assert abs(l - 122.93192) < 1e-6 and abs(b - 27.12825) < 1e-6


def test_galequ_inverts_equgal():
    """Analytic inverse property over a random sky sample:
    galequ(equgal(ra, dec)) == (ra, dec) to well under 1e-6 deg."""
    import duckdb

    from lsd_spark.functions.astro import galequ_sql

    con = duckdb.connect()
    rng = np.random.default_rng(7)
    ra = rng.uniform(0, 360, 500)
    dec = rng.uniform(-89.9, 89.9, 500)
    con.sql("CREATE TABLE pts (ra DOUBLE, dec DOUBLE)")
    con.executemany("INSERT INTO pts VALUES (?, ?)", list(zip(ra, dec)))
    l_sql, b_sql = equgal_sql("ra", "dec")
    ra2_sql, dec2_sql = galequ_sql(f"({l_sql})", f"({b_sql})")
    got = np.array(con.sql(f"SELECT {ra2_sql}, {dec2_sql} FROM pts").fetchall())
    dra = np.minimum(np.abs(got[:, 0] - ra), 360.0 - np.abs(got[:, 0] - ra))
    assert np.max(dra * np.cos(np.radians(dec))) < 1e-8
    assert np.max(np.abs(got[:, 1] - dec)) < 1e-8


def test_healpix_center_bound_lemma():
    """The covering-superset lemma behind filter_region_healpix:
    every sky point lies within HPX_BOUND_DEG of its OWN pixel's
    center, where pixel assignment is the engine-neutral ang2pix
    text (evaluated here through DuckDB) and centers come from the
    driver-side pix2ang inverse. With this, center-within
    (radius + bound) is a true cone covering by the triangle
    inequality."""
    import duckdb

    from lsd_spark.plans.region import HPX_BOUND_DEG, HPX_NSIDE, hpx_ring_centers
    from lsd_spark.plans.sphere import healpix_ring_sql

    cra, cdec = hpx_ring_centers(HPX_NSIDE)
    assert len(cra) == 12 * HPX_NSIDE * HPX_NSIDE
    rng = np.random.default_rng(3)
    n = 100_000
    ra = rng.uniform(0, 360, n)
    dec = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))  # area-uniform
    con = duckdb.connect()
    con.sql("CREATE TABLE pts (ra DOUBLE, dec DOUBLE)")
    con.executemany("INSERT INTO pts VALUES (?, ?)", list(zip(ra, dec)))
    pix = np.array(
        con.sql(
            f"SELECT {healpix_ring_sql('ra', 'dec', HPX_NSIDE)} FROM pts"
        ).fetchall()
    ).ravel().astype(int)
    assert pix.min() >= 0 and pix.max() < len(cra)
    sep = _sep(ra, dec, cra[pix], cdec[pix])
    assert sep.max() < HPX_BOUND_DEG, sep.max()


def test_healpix_cone_pixels_cover_every_member_point():
    from lsd_spark.plans.region import HPX_NSIDE, cone_healpix_pixels
    from lsd_spark.plans.sphere import healpix_ring_sql

    import duckdb

    con = duckdb.connect()
    for ra0, dec0, r in [(205.0, -35.0, 6.0), (0.5, 0.0, 3.0), (180.0, 87.0, 2.0)]:
        cover = set(cone_healpix_pixels(ra0, dec0, r, HPX_NSIDE))
        rng = np.random.default_rng(int(ra0))
        ra = rng.uniform(0, 360, 30_000)
        dec = np.degrees(np.arcsin(rng.uniform(-1, 1, 30_000)))
        inside = _sep(ra, dec, ra0, dec0) <= r
        con.sql("CREATE OR REPLACE TABLE pts (ra DOUBLE, dec DOUBLE)")
        con.executemany(
            "INSERT INTO pts VALUES (?, ?)",
            list(zip(ra[inside], dec[inside])),
        )
        pix = np.array(
            con.sql(
                f"SELECT {healpix_ring_sql('ra', 'dec', HPX_NSIDE)} FROM pts"
            ).fetchall()
        ).ravel().astype(int)
        assert set(pix) <= cover, (ra0, dec0, r)


def test_cell_id_encoding_is_injective():
    assert max(_NB) < _CID

"""Spherical cross-match edge cases the synthetic sky may not hit:
RA wraparound at 0/360, pole caps, and a seeded random superset
check against a numpy haversine brute force."""

from __future__ import annotations

import numpy as np

from lsd_spark.plans.sphere import R_SPHERE, sphere_xmatch, zone_counts


def _df(spark, rows):
    return spark.createDataFrame(rows, "event_id bigint, ra double, dec double")


def _pairs(spark, l_rows, r_rows, radius=R_SPHERE):
    out = sphere_xmatch(_df(spark, l_rows), _df(spark, r_rows), radius)
    return {(r.l_id, r.r_id) for r in out.collect()}


def test_zone_counts_shape():
    nb = zone_counts(1.0)
    assert len(nb) == 180
    # pole caps collapse to one bucket; equator is finest
    assert nb[0] == 1 and nb[179] == 1
    assert nb[90] == max(nb)
    # symmetric in dec
    assert nb == nb[::-1]


def test_ra_wraparound_matches_across_zero(spark):
    # 0.3 deg apart across the 0/360 seam
    got = _pairs(spark, [(1, 0.2, 10.0)], [(2, 359.9, 10.0)])
    assert got == {(1, 2)}


def test_pole_cap_matches_wild_ra_difference(spark):
    # at dec ~89.5 the ra coordinate nearly degenerates: points with
    # ra 10 vs 200 are under a degree of great-circle apart
    got = _pairs(spark, [(1, 10.0, 89.5)], [(2, 200.0, 89.55)])
    assert got == {(1, 2)}
    # and the south pole
    got = _pairs(spark, [(3, 0.0, -89.6)], [(4, 180.0, -89.6)])
    assert got == {(3, 4)}


def test_far_pairs_do_not_match(spark):
    got = _pairs(
        spark,
        [(1, 0.2, 10.0), (2, 180.0, 45.0)],
        [(3, 0.2, 12.0), (4, 182.0, 45.0)],
    )
    assert got == set()


def test_no_false_negatives_vs_numpy_brute_force(spark):
    rng = np.random.default_rng(7)
    n = 400
    lra = rng.uniform(0, 360, n)
    ldec = rng.uniform(-90, 90, n).clip(-89.999, 89.999)
    rra = rng.uniform(0, 360, n)
    rdec = rng.uniform(-90, 90, n).clip(-89.999, 89.999)
    l_rows = [(i, float(lra[i]), float(ldec[i])) for i in range(n)]
    r_rows = [(1000 + i, float(rra[i]), float(rdec[i])) for i in range(n)]
    got = _pairs(spark, l_rows, r_rows)

    def hav(d1, d2, a1, a2):
        p1, p2 = np.radians(d1), np.radians(d2)
        h = (
            np.sin((p1 - p2) / 2) ** 2
            + np.cos(p1) * np.cos(p2) * np.sin(np.radians(a1 - a2) / 2) ** 2
        )
        return np.degrees(2 * np.arcsin(np.minimum(1.0, np.sqrt(h))))

    d = hav(ldec[:, None], rdec[None, :], lra[:, None], rra[None, :])
    exp = {(int(i), int(1000 + j)) for i, j in zip(*np.where(d <= R_SPHERE))}
    assert got == exp


def test_sphere_xmatch_sf01_vs_numpy(spark):
    """Full sf0.1 cross-check (purchase x click, ~20k x ~34k points):
    the DuckDB brute-force oracle is O(680M) haversine evals there,
    so the third opinion is a grid-bucketed numpy brute force over
    the same md5-derived sky."""
    import hashlib
    from collections import defaultdict

    import pandas as pd

    from lsd_spark.registry import QUERIES, load_all

    load_all()
    sf_dir = "/root/testdata/sf0.1"
    got = {
        (r.l_id, r.r_id)
        for r in QUERIES["join_xmatch_sphere"](spark, sf_dir).collect()
    }

    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "event_type"])

    def sky(ids):
        ra = np.array(
            [int(hashlib.md5(f"{e}r".encode()).hexdigest()[:15], 16) % 360000 for e in ids]
        ) / 1000.0
        dec = np.array(
            [int(hashlib.md5(f"{e}d".encode()).hexdigest()[:15], 16) % 180000 for e in ids]
        ) / 1000.0 - 90.0
        return ra, dec

    p_ids = ev[ev.event_type == "purchase"]["event_id"].to_numpy()
    c_ids = ev[ev.event_type == "click"]["event_id"].to_numpy()
    pra, pdec = sky(p_ids)
    cra, cdec = sky(c_ids)

    def hav(d1, d2, a1, a2):
        p1, p2 = np.radians(d1), np.radians(d2)
        h = (
            np.sin((p1 - p2) / 2) ** 2
            + np.cos(p1) * np.cos(p2) * np.sin(np.radians(a1 - a2) / 2) ** 2
        )
        return np.degrees(2 * np.arcsin(np.minimum(1.0, np.sqrt(h))))

    # bucket the click side on a 3-degree grid. A +-1-cell probe
    # covers |dra| <= 3 deg, which bounds a 1-deg match only while
    # (pi/2)*1/cos(dec+1) <= 3, i.e. |dec| <= 57: above that the
    # probe falls back to a brute-force scan of all high-dec clicks
    # (|cdec| > 55, a 2-deg margin below the probe cutoff).
    buckets = defaultdict(list)
    for j in range(len(c_ids)):
        buckets[(int(cra[j] // 3.0), int(cdec[j] // 3.0))].append(j)
    polar = [j for j in range(len(c_ids)) if abs(cdec[j]) > 55.0]
    exp = set()
    for i in range(len(p_ids)):
        cand = list(polar) if abs(pdec[i]) > 57.0 else []
        bx, by = int(pra[i] // 3.0), int(pdec[i] // 3.0)
        seen = set(cand)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                # ra wraps: 120 buckets of 3 deg
                key = ((bx + dx) % 120, by + dy)
                for j in buckets.get(key, []):
                    if j not in seen:
                        cand.append(j)
                        seen.add(j)
        if not cand:
            continue
        ca = np.array(cand)
        d = hav(pdec[i], cdec[ca], pra[i], cra[ca])
        for j in ca[d <= R_SPHERE]:
            exp.add((int(p_ids[i]), int(c_ids[int(j)])))
    assert got == exp

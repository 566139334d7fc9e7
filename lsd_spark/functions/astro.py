"""Coordinate transforms — LSD's registered astro helpers usable
inside query expressions (``equgal`` and friends)
[lsd:src/lsd/query_parser.py function namespace — UNVERIFIED,
SURVEY.md §2.H].

Equatorial (ra, dec, J2000) -> galactic (l, b) is the standard
rotation through the north galactic pole (public IAU constants:
NGP at ra 192.85948°, dec 27.12825°; galactic longitude of the
north celestial pole 122.93192°):

    sin b = sin δ sin δ_G + cos δ cos δ_G cos(α − α_G)
    l = l_NCP − atan2(cos δ sin(α − α_G),
                      sin δ cos δ_G − cos δ sin δ_G cos(α − α_G))

Emitted as ONE engine-neutral SQL text (the fn_healpix trick): the
identical expression runs through Spark's F.expr and DuckDB, so both
engines execute the same IEEE sequence; outputs are rounded to 1e-6
deg (3.6 mas), far above any 1-ulp libm divergence, which is what
lets a trig-heavy scalar function keep a full hash-match oracle.

Map-only at any scale: a narrow projection, no shuffle, whole-stage
codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lsd_spark.plans.sphere import _sphere_points_sql, sphere_points
from lsd_spark.registry import register

RA_NGP = 192.85948
DEC_NGP = 27.12825
L_NCP = 122.93192


def equgal_sql(ra: str, dec: str) -> tuple[str, str]:
    """(l_expr, b_expr) in degrees, engine-neutral SQL text."""
    sd, cd = f"sin(radians({dec}))", f"cos(radians({dec}))"
    sdg, cdg = f"sin(radians({DEC_NGP!r}))", f"cos(radians({DEC_NGP!r}))"
    dra = f"radians(({ra}) - {RA_NGP!r})"
    sinb = f"({sd} * {sdg} + {cd} * {cdg} * cos({dra}))"
    b = f"degrees(asin(greatest(-1.0, least(1.0, {sinb}))))"
    l = (
        f"(({L_NCP!r} - degrees(atan2({cd} * sin({dra}), "
        f"{sd} * {cdg} - {cd} * {sdg} * cos({dra})))) % 360.0 + 360.0) % 360.0"
    )
    return l, b


def galequ_sql(l: str, b: str) -> tuple[str, str]:
    """(ra_expr, dec_expr) in degrees — the inverse rotation
    (galactic -> equatorial, same public IAU constants):

        sin δ = sin b sin δ_G + cos b cos δ_G cos(l_NCP − l)
        α = α_G + atan2(cos b sin(l_NCP − l),
                        sin b cos δ_G − cos b sin δ_G cos(l_NCP − l))
    """
    sb, cb = f"sin(radians({b}))", f"cos(radians({b}))"
    sdg, cdg = f"sin(radians({DEC_NGP!r}))", f"cos(radians({DEC_NGP!r}))"
    dl = f"radians({L_NCP!r} - ({l}))"
    sind = f"({sb} * {sdg} + {cb} * {cdg} * cos({dl}))"
    dec = f"degrees(asin(greatest(-1.0, least(1.0, {sind}))))"
    ra = (
        f"(({RA_NGP!r} + degrees(atan2({cb} * sin({dl}), "
        f"{sb} * {cdg} - {cb} * {sdg} * cos({dl})))) % 360.0 + 360.0) % 360.0"
    )
    return ra, dec


_L_SQL, _B_SQL = equgal_sql("ra", "dec")
_RA_EQ_SQL, _DEC_EQ_SQL = galequ_sql("ra", "dec")  # events (ra,dec) read as (l,b)


@register(
    "fn_equgal",
    oracle=(
        f"WITH p AS ({_sphere_points_sql(None)}) "
        f"SELECT event_id, ROUND({_L_SQL}, 6) AS gal_l, "
        f"ROUND({_B_SQL}, 6) AS gal_b "
        "FROM p ORDER BY event_id"
    ),
)
def fn_equgal(spark, sf_dir):
    """equgal(ra, dec) -> (l, b) over every event's sky position —
    LSD registers this transform in its query function namespace so
    users write `SELECT equgal(ra, dec) FROM catalog` directly
    [lsd:src/lsd/query_parser.py — UNVERIFIED]. Identical expression
    text runs in the DuckDB oracle; rounded to 1e-6 deg."""
    pts = sphere_points(spark, sf_dir, None)
    return pts.select(
        "event_id",
        F.round(F.expr(_L_SQL), 6).alias("gal_l"),
        F.round(F.expr(_B_SQL), 6).alias("gal_b"),
    ).orderBy("event_id")


@register(
    "fn_galequ",
    oracle=(
        f"WITH p AS ({_sphere_points_sql(None)}) "
        f"SELECT event_id, ROUND({_RA_EQ_SQL}, 6) AS eq_ra, "
        f"ROUND({_DEC_EQ_SQL}, 6) AS eq_dec "
        "FROM p ORDER BY event_id"
    ),
)
def fn_galequ(spark, sf_dir):
    """galequ(l, b) -> (ra, dec): the inverse of fn_equgal, also in
    LSD's query function namespace [lsd:src/lsd/query_parser.py —
    UNVERIFIED]. The events sky positions are read as galactic input
    here (any (lon, lat) pair is a valid domain point for the
    rotation); tests/test_region.py pins the analytic inverse
    property galequ(equgal(ra, dec)) == (ra, dec) to 1e-6 deg.
    Identical expression text runs in the DuckDB oracle; map-only,
    whole-stage codegen, no shuffle beyond the presentation sort."""
    pts = sphere_points(spark, sf_dir, None)
    return pts.select(
        "event_id",
        F.round(F.expr(_RA_EQ_SQL), 6).alias("eq_ra"),
        F.round(F.expr(_DEC_EQ_SQL), 6).alias("eq_dec"),
    ).orderBy("event_id")

"""LSD's user-facing bounds vocabulary
[lsd:src/lsd/bounds.py — UNVERIFIED, SURVEY.md §1.1/§2.G]:
``beam(ra, dec, radius)``, ``rectangle(...)``, ``polygon(...)``,
composable with ``|`` / ``&`` / ``-`` — thin constructors over the
footprint/region compiler in plans/region.py (candidate-cell
pruning + engine-neutral exact refine).

Usage through the query API::

    from lsd_spark import bounds
    db.query("SELECT event_id, ra, dec FROM sky").fetch(
        bounds=bounds.beam(40.0, 10.0, 8.0) | bounds.rectangle(0, 10, -5, 5)
    )
"""

from __future__ import annotations

from lsd_spark.plans.region import Cone, Poly, Rect, Region, region_select

__all__ = ["beam", "rectangle", "polygon", "Region", "region_select"]


def beam(ra: float, dec: float, radius: float) -> Region:
    """Cone footprint: all points within `radius` degrees of
    (ra, dec) — LSD's ``bounds.beam``."""
    return Cone(ra, dec, radius)


def rectangle(ra_lo: float, ra_hi: float, dec_lo: float, dec_hi: float) -> Region:
    """RA/Dec box, inclusive; ra_lo > ra_hi wraps the 0/360 seam —
    LSD's ``bounds.rectangle``."""
    return Rect(ra_lo, ra_hi, dec_lo, dec_hi)


def polygon(vertices: list[tuple[float, float]]) -> Region:
    """Polygon footprint from (ra, dec) vertices (cylindrical-plane
    edges, no 0/360 seam crossing) — LSD's footprint polygons."""
    return Poly(vertices)

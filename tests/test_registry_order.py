"""Pin the CORRECTNESS-ledger tier ordering (round-3 VERDICT #1):
the driver records at most ~50 rows per round in REGISTRATION ORDER,
so the registry must lead with ops that have no GREEN driver row
yet, then ops new this round, then the already-recorded ids. A
refactor that silently breaks this ordering would waste a whole
round of ledger coverage."""

from __future__ import annotations

from lsd_spark.registry import (
    _R1_LEDGER,
    _R2_LEDGER,
    _R3_LEDGER,
    _R4_PENDING,
    QUERIES,
    load_all,
)

load_all()


def test_tier1_pending_ops_lead_registration_order():
    names = list(QUERIES)
    assert names[: len(_R4_PENDING)] == _R4_PENDING


def test_tier2_is_new_ops_then_tier3_recorded():
    names = list(QUERIES)
    recorded = set(_R1_LEDGER) | set(_R2_LEDGER) | set(_R3_LEDGER)
    tail = names[len(_R4_PENDING):]
    # tier2 = not yet driver-recorded, tier3 = recorded; no interleave
    seen_recorded = False
    for n in tail:
        if n in recorded:
            seen_recorded = True
        else:
            assert not seen_recorded, f"unrecorded op {n} after recorded ops"


def test_pending_plus_new_fit_driver_cap():
    """Everything that needs a fresh driver row this round — the 30
    tier-1 pending ops plus every tier-2 new op — must fit inside
    the driver's observed 50-row per-round cap, or the overflow
    silently waits another full round."""
    names = list(QUERIES)
    recorded = set(_R1_LEDGER) | set(_R2_LEDGER) | set(_R3_LEDGER)
    needs_row = [n for n in names if n not in recorded]
    assert len(needs_row) <= 50, (
        f"{len(needs_row)} ops need a driver row but only 50 fit: "
        f"{needs_row}"
    )


def test_every_query_has_oracle_or_documented_reason():
    from lsd_spark.registry import ORACLES

    rows_only = set(QUERIES) - set(ORACLES)
    # the only two ops allowed to stay rows-only, each with an
    # irreducible reason (approximate HLL; engine-specific xxhash64)
    assert rows_only == {"agg_approx_distinct", "llm_dedup_near"}

"""Adversarial-disorder streaming rehearsal (round-6 judge task 8): the
state-scale stream replayed out of order — within watermark tolerance
nothing may drop and the closed-session set is order-invariant; beyond
tolerance the dropped-late count must be EXACT (the constructed window's
event count), and the state bound holds in every case.

Scaled down for pytest; the full-width run is
``scripts/streaming_state_scale.py --disorder`` (BENCH/CEILING.md)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from streaming_state_scale import run_disorder_sweep  # noqa: E402

N_USERS, N_EVENTS, N_SLOTS = 800, 6_400, 8


def test_disorder_sweep_checks(spark):
    out = run_disorder_sweep(spark, N_USERS, N_EVENTS, N_SLOTS)
    assert out["checks"]["swap_zero_drops"], out["adjacent_swaps"]
    assert out["checks"]["swap_sessions_equal"], (
        out["in_order"]["closed_sessions"],
        out["adjacent_swaps"]["closed_sessions"])
    assert out["checks"]["deep_late_drops_exact"], (
        out["deep_late"]["dropped_by_watermark"],
        out["expected_deep_late_drops"])
    assert out["checks"]["swap_state_bound_holds"]
    assert out["checks"]["deep_late_state_bound_holds"]
    # progress capture saw every batch (the recentProgress cap fix):
    # n_slots input files + possibly trailing no-data batches
    assert out["in_order"]["n_progress_batches"] >= N_SLOTS

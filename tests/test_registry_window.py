"""Registry-rotation guard: the external driver hard-checks the FIRST 50
registry entries in insertion order, so the window composition is
load-bearing — an accidental import-order change or a new registration
slipping in front of the priority list would silently rotate a query
out of (or into) the hard correctness gate.

Per ADVICE r4, the POLICY is enforced mechanically, not a hand-pinned
list: never-driver-checked queries and queries whose LAST driver verdict
failed must always outrank green ones, derived fresh from the
CORRECTNESS_r*.json artifacts at repo root.  Since round 7 the window
itself is COMPUTED from the same artifacts (registry.py::
_compute_driver_window) — these tests stay as the independent check
that the computation (plus its hand-pinned tier-1 entries) actually
satisfies the invariants, so a bug in the rotation code or an
over-long pin list still fails loudly.  COVERAGE.md documents the
per-round rotation for human audit.
"""

from __future__ import annotations

from magshield_data_pipeline_spark.plans.registry import (
    _DRIVER_WINDOW_PRIORITY,
    QUERY_REGISTRY,
    driver_history as _driver_history,
)

DRIVER_WINDOW = 50


def test_priority_list_is_the_window_prefix():
    names = list(QUERY_REGISTRY)
    assert names[: len(_DRIVER_WINDOW_PRIORITY)] == _DRIVER_WINDOW_PRIORITY
    assert len(_DRIVER_WINDOW_PRIORITY) == DRIVER_WINDOW


def test_never_checked_and_last_failing_always_outrank_green():
    """The rotation-policy invariant (registry.py tiers 1-2), enforced
    from the artifacts: any registered query with no driver row, or whose
    LATEST driver verdict is a failure, must sit inside the window."""
    hist = _driver_history()
    must_be_in_window = set()
    for name in QUERY_REGISTRY:
        rounds = hist.get(name)
        if not rounds:
            must_be_in_window.add(name)  # never driver-checked
        elif not rounds[max(rounds)]:
            must_be_in_window.add(name)  # latest verdict failed
    window = set(list(QUERY_REGISTRY)[:DRIVER_WINDOW])
    missing = must_be_in_window - window
    assert not missing, f"unproven queries outside the driver window: {missing}"


def test_window_freshness_bound():
    """No query's last driver green should age more than two rounds
    beyond the latest artifact without rotating back into the window."""
    hist = _driver_history()
    if not hist:
        return
    latest_round = max(r for rounds in hist.values() for r in rounds)
    window = set(list(QUERY_REGISTRY)[:DRIVER_WINDOW])
    stale = []
    for name in QUERY_REGISTRY:
        if name in window:
            continue  # being re-proven this round
        rounds = hist.get(name)
        if not rounds:
            continue  # caught by the invariant test above
        last_green = max((r for r, g in rounds.items() if g), default=0)
        if last_green and latest_round - last_green >= 2:
            stale.append((name, last_green))
    assert not stale, f"stale-green queries left outside the window: {stale}"


def test_every_query_has_oracle_sql_or_is_documented_rows_only():
    rows_only = [n for n, s in QUERY_REGISTRY.items() if s.sql is None]
    # current registry is fully oracle-backed; additions must be
    # deliberate (the driver records a weaker rows-only check for them)
    assert rows_only == [], f"rows-only queries appeared: {rows_only}"

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
    _WINDOW_PINS,
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
    """Freshness is PRIORITY-correct under finite capacity: a green
    verdict aged >= 2 rounds beyond the latest artifact may sit outside
    the window ONLY when the window is completely full of higher-or-
    equal-priority work (pins / failures / never-checked / staler-or-
    equal greens).  The absolute form of this bound ("no green ages >= 2
    rounds outside, ever") is unsatisfiable the moment tiers 1-3 plus
    the stale set exceed the 50 driver slots — e.g. late-r7 added 10 new
    queries (all tier-3, mandatory) while 34 r4-greens were due back in;
    the 10 stalest-displaced greens then age one extra round BY POLICY,
    not by rotation bug.  What must never happen: a stale green outside
    while a FRESHER green occupies a slot."""
    hist = _driver_history()
    if not hist:
        return
    latest_round = max(r for rounds in hist.values() for r in rounds)
    window = set(list(QUERY_REGISTRY)[:DRIVER_WINDOW])

    def last_green(name: str) -> int:
        return max((r for r, g in hist.get(name, {}).items() if g), default=0)

    stale = [
        (n, last_green(n))
        for n in QUERY_REGISTRY
        if n not in window
        and hist.get(n)
        and last_green(n)
        and latest_round - last_green(n) >= 2
    ]
    if not stale:
        return
    # capacity exception: every displaced-stale green must be older-or-
    # equal to every IN-window green (pins and never-checked/failing
    # entries outrank greens by policy and are exempt)
    assert len(window) == DRIVER_WINDOW, "window not full yet greens are stale"
    freshest_displaced = max(g for _, g in stale)
    offenders = [
        (n, last_green(n))
        for n in window
        if hist.get(n) and last_green(n) > freshest_displaced
        # a green can sit in-window above a staler outsider only as a
        # tier-1 pin or a latest-verdict failure
        and hist[n][max(hist[n])]
        and not any(n == p and last_green(n) < rnd for p, rnd in _WINDOW_PINS)
    ]
    assert not offenders, (
        f"fresher greens hold window slots while staler greens wait "
        f"outside: in-window {offenders} vs displaced {stale}"
    )


def test_every_query_has_oracle_sql_or_is_documented_rows_only():
    rows_only = [n for n, s in QUERY_REGISTRY.items() if s.sql is None]
    # current registry is fully oracle-backed; additions must be
    # deliberate (the driver records a weaker rows-only check for them)
    assert rows_only == [], f"rows-only queries appeared: {rows_only}"

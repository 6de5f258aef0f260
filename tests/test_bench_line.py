"""The bench stdout contract: ONE JSON line, and when the registry
outgrows the ~1.9 KB tail-capture cap the truncated line must be
SELF-DESCRIBING (VERDICT r12 item 3: the r12 PERF comparator misread
22 sub-second queries as dropped because the printed line carried only
the slowest entries with no way to reconcile the remainder)."""

from __future__ import annotations

import json


def test_compact_line_small_registry_untruncated():
    from bench import _compact_line

    line = _compact_line(1.5, "idle", {"abc": 1.0, "defg": 0.5}, 0.1)
    d = json.loads(line)
    assert d["queries"] == {"abc": 1.0, "defg": 0.5}
    assert d["value"] == 1.5
    assert "queries_omitted" not in d  # nothing truncated, nothing to say


def test_compact_line_truncation_reconciles_to_total():
    from bench import _compact_line

    compact = {f"qry{i}": round(0.5 + i * 0.01, 2) for i in range(300)}
    total = round(sum(compact.values()), 2)
    line = _compact_line(total, "idle", compact, 0.1)
    assert len(line) < 1900
    d = json.loads(line)
    assert d["queries_total"] == 300
    assert d["queries_omitted"] == 300 - len(d["queries"])
    assert d["queries_truncated_to_slowest"] == len(d["queries"])
    # printed + omitted reconstructs the total (to rounding)
    assert abs(d["omitted_sum_sec"] + sum(d["queries"].values())
               - total) < 0.01 * len(compact)
    # slowest-first: every printed entry >= every omitted one
    omitted = [v for k, v in compact.items() if k not in d["queries"]]
    assert min(d["queries"].values()) >= max(omitted)

"""Audit the driver-verdict ledger against the verification window.

The driver only re-verdicts the FIRST 50 entries of
``__spark_entry__._PRIORITY`` per round, so a query that failed in some
round and then rotated out of the window keeps its red verdict forever
(this is exactly what happened to ``agg_cube``: r1 hash mismatch, never
re-windowed through r6 — the only red in the cumulative r1–r6 union).

This test makes the rotation policy enforceable: every query whose
LATEST committed driver verdict is red MUST sit inside the current
window until a later green verdict lands.
"""

from __future__ import annotations

import glob
import json
import os
import re

import __spark_entry__ as entry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def _is_green(v: dict) -> bool:
    return bool(
        v.get("rows_match")
        and v.get("schema_match")
        # rows-only verdicts (no oracle) have hash_match == None; a red
        # is an explicit False or an err.
        and v.get("hash_match") is not False
        and not v.get("err")
    )


def _latest_verdicts() -> dict[str, tuple[int, dict]]:
    latest: dict[str, tuple[int, dict]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            doc = json.load(open(path))
        except (json.JSONDecodeError, OSError):
            continue
        for name, verdict in doc.items():
            if isinstance(verdict, dict):
                prev = latest.get(name)
                if prev is None or rnd >= prev[0]:
                    latest[name] = (rnd, verdict)
    return latest


def test_every_standing_red_is_in_the_current_window():
    """A red latest-verdict may only exist for queries the driver will
    re-check next round (i.e. inside _PRIORITY[:50]).  This is the audit
    that would have caught agg_cube five rounds earlier."""
    window = set(entry._PRIORITY[:WINDOW])
    reds = {
        name
        for name, (_, verdict) in _latest_verdicts().items()
        if not _is_green(verdict)
    }
    # Queries removed from the registry entirely are out of scope.
    reds &= set(entry.queries())
    stranded = sorted(reds - window)
    assert not stranded, (
        f"queries with a standing RED driver verdict are outside the "
        f"current 50-slot window and will never be re-checked: {stranded}"
    )


def test_window_is_at_least_fifty_registered_oracled_queries():
    """The driver checks exactly the first 50 registry entries; keep the
    window full (anything less wastes verdict slots) and fully oracled
    (rows-only entries waste a slot on a weaker check)."""
    names = entry._PRIORITY[:WINDOW]
    assert len(names) == WINDOW
    assert len(set(names)) == WINDOW, "duplicate window entries waste slots"
    q = entry.queries()
    o = entry.oracle_sql()
    missing = [n for n in names if n not in q]
    assert not missing, f"window names missing from queries(): {missing}"
    unoracled = [n for n in names if n not in o]
    assert not unoracled, f"window entries without an oracle: {unoracled}"


def test_no_query_is_forever_unverdicted():
    """Every registered query must either already have SOME driver
    verdict (any round) or sit in the current window so it gets one next
    round — catches the round-1 failure mode where queries registered
    past slot 50 shipped without a CORRECTNESS verdict forever."""
    seen = set(_latest_verdicts())
    window = set(entry._PRIORITY[:WINDOW])
    never = sorted(set(entry.queries()) - seen - window)
    assert not never, (
        f"queries with no driver verdict ever and no slot in the current "
        f"window: {never}"
    )

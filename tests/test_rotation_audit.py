"""Self-audit of the driver-correctness window rotation.

The driver hash-checks the FIRST 50 registry queries per round
(plans/registry.py _PRIORITY). These tests make the rotation
self-enforcing instead of per-round judge review: they read the committed
CORRECTNESS_r*.json records and fail if the current registration order
would let any query's newest driver-green row go stale, or if the window
is mis-ordered (a fresher query windowed ahead of a staler one).

With N registered queries and a 50-query window, a full refresh cycle
takes ceil(N / 50) rounds — that is the tightest staleness guarantee the
rotation can give, and the bound these tests enforce.
"""
from __future__ import annotations

import json
import math
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
WINDOW = 50
NEVER = -1


def _newest_green() -> dict[str, int]:
    newest: dict[str, int] = {}
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(f.stem.split("_r")[1])
        for q in json.loads(f.read_text()):
            newest[q] = max(newest.get(q, NEVER), rnd)
    return newest


def _registry():
    from beymani_spark.plans.registry import QUERIES

    return [n for n, q in QUERIES.items() if q.oracle is not None]


def test_correctness_records_exist():
    assert list(REPO.glob("CORRECTNESS_r*.json")), "no driver records committed"


def test_window_holds_the_stalest_queries():
    """The first-50 prefix must be (a set of) the queries whose newest
    driver-green row is oldest — never-checked first, then stalest. A
    fresher query inside the window while a staler one waits outside means
    the rotation edit was missed or mis-ordered."""
    names = _registry()
    newest = _newest_green()
    last = {q: newest.get(q, NEVER) for q in names}
    window, outside = names[:WINDOW], names[WINDOW:]
    worst_in = max(last[q] for q in window)
    best_out = min(last[q] for q in outside)
    assert worst_in <= best_out, (
        f"window is mis-rotated: query with newest green row r{worst_in} is "
        f"windowed while one with r{best_out} waits outside; stalest-first "
        f"ordering violated"
    )


def test_no_query_exceeds_the_cycle_staleness_bound():
    """Every registered query must either have a driver-green row newer
    than one full rotation cycle, or be in the CURRENT window (about to be
    re-checked this round). Fails exactly when a round's rotation edit is
    forgotten: the stale query sits outside the window with an
    out-of-cycle newest row. Never-checked queries are governed by the
    ordering test below instead — more of them than the window holds is a
    legitimate one-round overflow, provided they lead the next window."""
    names = _registry()
    newest = _newest_green()
    upcoming = max(newest.values()) + 1  # the round now in progress
    cycle = math.ceil(len(names) / WINDOW)
    window = set(names[:WINDOW])
    stale = [
        q
        for q in names
        if q in newest and newest[q] < upcoming - cycle and q not in window
    ]
    assert not stale, (
        f"queries stale beyond one {cycle}-round cycle and NOT in the "
        f"current window (rotate them to the head): {stale}"
    )


def test_never_checked_queries_are_queued_before_checked_ones():
    """A query with no driver row ever may only sit behind queries that
    also have none — never behind a certified one. Guarantees displaced
    never-checked queries (window overflow) lead the next round's window."""
    names = _registry()
    newest = _newest_green()
    seen_checked = None
    for q in names:
        if q in newest and seen_checked is None:
            seen_checked = q
        if q not in newest and seen_checked is not None:
            raise AssertionError(
                f"never-driver-checked query {q!r} is registered after "
                f"certified query {seen_checked!r} — it would wait an extra "
                f"cycle for its first row"
            )


def test_priority_list_is_exact_and_duplicate_free():
    from beymani_spark.plans.registry import QUERIES, _PRIORITY

    assert len(set(_PRIORITY)) == len(_PRIORITY), "duplicate in _PRIORITY"
    assert set(_PRIORITY) == set(QUERIES), (
        "priority list and registry diverge: "
        f"{set(_PRIORITY) ^ set(QUERIES)}"
    )

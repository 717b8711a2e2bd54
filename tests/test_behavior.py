"""Unit tests for operators/behavior.py: strict funnel ordering, cohort
retention arithmetic, exact rolling active-user windows, and the plan
shapes that make them scale (keyed joins, bounded explode, broadcast
bounds)."""
from __future__ import annotations

import datetime as dt

from beymani_spark.operators.behavior import (
    cohort_retention,
    funnel_steps,
    rolling_active_users,
)


def _ts(day: int, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour)


def _events(spark, rows):
    return spark.createDataFrame(rows, ["user_id", "ts", "event_type"])


def test_funnel_strict_ordering(spark):
    rows = [
        # u1 completes the whole funnel in order
        (1, _ts(1, 0), "view"), (1, _ts(1, 1), "click"), (1, _ts(1, 2), "purchase"),
        # u2 clicked BEFORE their first view — click must not count
        (2, _ts(1, 1), "click"), (2, _ts(1, 2), "view"),
        # u3 viewed only
        (3, _ts(1, 0), "view"),
        # u4 purchase before click — stops at click
        (4, _ts(1, 0), "view"), (4, _ts(1, 2), "click"), (4, _ts(1, 1), "purchase"),
        # u5 never viewed — never enters the funnel
        (5, _ts(1, 0), "purchase"),
    ]
    out = funnel_steps(_events(spark, rows), ["view", "click", "purchase"])
    got = {r["step"]: (r["n_users"], r["conversion"]) for r in out.collect()}
    assert got == {
        "view": (4, 1.0),
        "click": (2, 0.5),
        "purchase": (1, 0.25),
    }


def test_funnel_equal_timestamp_not_counted(spark):
    # strictly-after semantics: click at the exact same instant as the first
    # view does not advance the funnel
    rows = [(1, _ts(1, 0), "view"), (1, _ts(1, 0), "click")]
    out = funnel_steps(_events(spark, rows), ["view", "click"])
    got = {r["step"]: r["n_users"] for r in out.collect()}
    assert got == {"view": 1, "click": 0}


def test_cohort_retention_cells(spark):
    rows = [
        # cohort day 1: u1 active days 1,3; u2 active day 1 only
        (1, _ts(1), "view"), (1, _ts(3), "view"),
        (2, _ts(1, 5), "click"),
        # cohort day 2: u3 active days 2,3
        (3, _ts(2), "view"), (3, _ts(3), "view"),
    ]
    out = cohort_retention(_events(spark, rows))
    got = {
        (r["cohort_day"].day, r["day_offset"]): (r["n_active"], r["retention"])
        for r in out.collect()
    }
    assert got == {
        (1, 0): (2, 1.0),
        (1, 2): (1, 0.5),
        (2, 0): (1, 1.0),
        (2, 1): (1, 1.0),
    }


def test_rolling_active_users_exact_window(spark):
    rows = [
        (1, _ts(1), "view"),
        (2, _ts(1), "view"),
        (1, _ts(5), "view"),
        (3, _ts(9), "view"),
    ]
    out = rolling_active_users(_events(spark, rows), window_days=7)
    got = {r["d"].day: (r["n_active_1d"], r["n_active_wd"]) for r in out.collect()}
    # day 1: u1,u2 active that day; trailing 7d = {1,2}
    assert got[1] == (2, 2)
    # day 5: u1 active; trailing window [day -1..5] covers day1+day5 = {1,2}
    assert got[5] == (1, 2)
    # day 7: nobody active that day, trailing covers days 1..7 = {1,2}
    assert got[7] == (0, 2)
    # day 8: day-1 pairs aged out; only day-5 remains = {1}
    assert got[8] == (0, 1)
    # day 9: u3 plus day-5 u1
    assert got[9] == (1, 2)
    # cover days beyond the last observed day are dropped
    assert max(got) == 9
    # every observed day from 1..9 has a row (covered by some trailing window)
    assert sorted(got) == list(range(1, 10))


def test_rolling_window_one_day_is_dau(spark):
    rows = [(1, _ts(1), "view"), (2, _ts(1), "view"), (1, _ts(2), "view")]
    out = rolling_active_users(_events(spark, rows), window_days=1)
    got = {r["d"].day: (r["n_active_1d"], r["n_active_wd"]) for r in out.collect()}
    assert got == {1: (2, 2), 2: (1, 1)}


def test_behavior_plan_shapes(spark, sf_dir):
    """rolling_active_users: the only join is the broadcast 1-row bounds
    frame (no cartesian on data); funnel joins stay keyed equi-joins."""
    from beymani_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    plan = rolling_active_users(ev)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan

    fplan = (
        funnel_steps(ev, ["view", "click", "purchase"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in fplan


def test_event_gaps_basic(spark):
    import datetime as dt

    from beymani_spark.operators.behavior import event_gaps

    t0 = dt.datetime(2025, 1, 1)
    rows = [
        # user 1: 2h gap, then 30h gap
        (1, 1, t0), (2, 1, t0 + dt.timedelta(hours=2)),
        (3, 1, t0 + dt.timedelta(hours=32)),
        # user 2: single event -> no gap rows
        (4, 2, t0),
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts"])
    out = event_gaps(df, min_gap_hours=24.0)
    got = [(r.user_id, r.gap_hours) for r in out.collect()]
    assert got == [(1, 30.0)]
    r = out.first()
    assert r.gap_start == t0 + dt.timedelta(hours=2)
    assert r.gap_end == t0 + dt.timedelta(hours=32)


def test_linear_attribution_books_balance(spark):
    import datetime as dt

    from beymani_spark.operators.behavior import linear_attribution

    t0 = dt.datetime(2025, 1, 1)
    rows = [
        # user 1: view+click -> purchase(10) split 5/5; then view -> purchase(4)
        (1, 1, t0, "view", 0.0),
        (2, 1, t0 + dt.timedelta(hours=1), "click", 0.0),
        (3, 1, t0 + dt.timedelta(hours=2), "purchase", 10.0),
        (4, 1, t0 + dt.timedelta(hours=3), "view", 0.0),
        (5, 1, t0 + dt.timedelta(hours=4), "purchase", 4.0),
        # user 2: untouched purchase stays under 'none'
        (6, 2, t0, "purchase", 7.0),
        # user 3: trailing touch after the last purchase earns nothing
        (7, 3, t0, "purchase", 1.0),
        (8, 3, t0 + dt.timedelta(hours=1), "view", 0.0),
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "event_type", "value"])
    got = {r.touch_type: (r.n_touches, r.total_credit) for r in linear_attribution(df).collect()}
    assert got == {"view": (2, 9.0), "click": (1, 5.0), "none": (0, 8.0)}
    # credit conservation: total credit == total conversion value
    assert sum(v for _, v in got.values()) == 22.0

"""asof_join semantics: inclusivity, pre-history nulls, tolerance, ties."""
from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from beymani_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _fixture(spark):
    left = spark.createDataFrame(
        [
            (1, "a", _ts("2026-01-01 00:30")),   # before any snapshot
            (2, "a", _ts("2026-01-01 01:00")),   # exactly at snapshot -> inclusive
            (3, "a", _ts("2026-01-01 02:30")),   # between snapshots
            (4, "a", _ts("2026-01-01 09:00")),   # long after last snapshot
            (5, "b", _ts("2026-01-01 05:00")),   # key with no snapshots
        ],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("a", _ts("2026-01-01 01:00"), 10.0),
            ("a", _ts("2026-01-01 02:00"), 20.0),
        ],
        "k string, rts timestamp, v double",
    )
    return left, right


def test_asof_join_basic_semantics(spark):
    left, right = _fixture(spark)
    out = {r["id"]: r for r in asof_join(left, right, ["k"], "ts", "rts", ["v"]).collect()}
    assert out[1]["v"] is None and out[1]["matched_ts"] is None
    assert out[2]["v"] == 10.0  # ts == rts matches (inclusive)
    assert out[3]["v"] == 20.0  # latest snapshot before ts
    assert out[4]["v"] == 20.0  # carried arbitrarily far without tolerance
    assert out[5]["v"] is None  # key never had a snapshot
    assert len(out) == left.count()  # left-join: every left row survives


def test_asof_join_tolerance_nulls_stale_matches(spark):
    left, right = _fixture(spark)
    out = {
        r["id"]: r
        for r in asof_join(
            left, right, ["k"], "ts", "rts", ["v"], tolerance="2 hours"
        ).collect()
    }
    assert out[3]["v"] == 20.0        # 30 min old: inside tolerance
    assert out[4]["v"] is None        # 7 h old: stale, nulled
    assert out[4]["matched_ts"] is None


def test_asof_join_single_exchange_no_range_join(spark):
    left, right = _fixture(spark)
    plan = (
        asof_join(left, right, ["k"], "ts", "rts", ["v"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan, "must not degrade to a range join"
    assert "CartesianProduct" not in plan


def test_asof_join_matches_pandas_merge_asof(spark):
    """Randomized cross-check against pandas merge_asof (direction=
    'backward', by=key) — the de-facto reference semantics."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(7)
    left = pd.DataFrame(
        {
            "id": np.arange(300),
            "k": rng.choice(["a", "b", "c"], 300),
            "ts": pd.to_datetime("2026-01-01")
            + pd.to_timedelta(rng.randint(0, 10_000, 300), unit="s"),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c", "d"], 60),
            "rts": pd.to_datetime("2026-01-01")
            + pd.to_timedelta(rng.randint(0, 10_000, 60), unit="s"),
            "v": rng.randn(60).round(6),
        }
    ).drop_duplicates(["k", "rts"])

    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            ["k"],
            "ts",
            "rts",
            ["v"],
        )
        .select("id", "v")
        .toPandas()
        .sort_values("id", ignore_index=True)
    )
    expected = (
        pd.merge_asof(
            left.sort_values("ts", kind="mergesort"),
            right.sort_values("rts", kind="mergesort"),
            left_on="ts",
            right_on="rts",
            by="k",
            direction="backward",
        )[["id", "v"]]
        .sort_values("id", ignore_index=True)
    )
    pd.testing.assert_series_equal(
        got["v"].astype(float), expected["v"].astype(float), check_names=False
    )


def test_asof_join_rejects_name_collisions(spark):
    import pytest

    left, right = _fixture(spark)
    with pytest.raises(ValueError, match="already exist on the left"):
        asof_join(left, right.withColumnRenamed("v", "k"), ["k"], "ts", "rts", ["k"])
    with pytest.raises(ValueError, match="internal namespace"):
        asof_join(
            left.withColumn("matched_ts", F.lit(None).cast("timestamp")),
            right,
            ["k"],
            "ts",
            "rts",
            ["v"],
        )
    with pytest.raises(ValueError, match="internal namespace"):
        asof_join(
            left.withColumn("_r_v", F.lit(1)), right, ["k"], "ts", "rts", ["v"]
        )


def test_interval_join_matches_brute_force_and_bucket_edges(spark):
    """Bucketized interval join == the naive range-predicate join on a
    fixture spanning bucket boundaries (pairs in adjacent and same
    buckets, inclusive tolerance edge, cross-key exclusion)."""
    from pyspark.sql import functions as F

    from beymani_spark.operators.asof import interval_join

    rows = [
        ("u1", 1, "2026-01-01 00:00:00"),
        ("u1", 2, "2026-01-01 00:04:59"),   # 299 s from #1: in
        ("u1", 3, "2026-01-01 00:05:00"),   # exactly 300 s from #1: in (<=)
        ("u1", 4, "2026-01-01 00:10:01"),   # 301 s from #3: out
        ("u2", 5, "2026-01-01 00:00:30"),   # other key: never pairs with u1
    ]
    ev = spark.createDataFrame(rows, "user_id string, event_id long, ts string").select(
        "user_id", "event_id", F.col("ts").cast("timestamp").alias("ts")
    )
    l = ev.select("user_id", F.col("event_id").alias("left_id"), F.col("ts").alias("lts"))
    r = ev.select("user_id", F.col("event_id").alias("right_id"), F.col("ts").alias("rts"))
    got = {
        (x.left_id, x.right_id)
        for x in interval_join(
            l, r, ["user_id"], "lts", "rts", 300, "left_id", "right_id"
        ).filter("left_id != right_id").collect()
    }
    brute = {
        (a.event_id, b.event_id)
        for a in ev.collect()
        for b in ev.collect()
        if a.user_id == b.user_id
        and a.event_id != b.event_id
        and abs((b.ts - a.ts).total_seconds()) <= 300
    }
    assert got == brute
    assert (1, 3) in got and (3, 1) in got      # inclusive edge, both orders
    assert (3, 4) not in got                     # 301 s: out
    assert not any(5 in p and (1 in p or 2 in p) for p in got)

    # plan: a pure equi-join — never a nested-loop range join
    plan = interval_join(
        l, r, ["user_id"], "lts", "rts", 300, "left_id", "right_id"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan

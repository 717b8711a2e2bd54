"""User-behavior analytics over event streams: ordered funnels, cohort
retention, and rolling active-user counts.

These are the product/event-analytics workloads a large-scale pipeline runs
next to the anomaly operators (the reference stops at sessionization —
`OutlierAggregator` rollups; see SURVEY §2.6 "no behavioral analytics").
All three are expressed as shrinking keyed aggregations — no windows over the
raw fact table, no cartesian products — so they hold at 100 TB:

- funnel_steps: per-step frames only ever SHRINK (each step is a groupBy on
  the user key over a type-filtered scan joined to the survivors of the
  previous step); the final union is |steps| one-row aggregates.
- cohort_retention: two partial-aggregated shuffles on the user key (first
  touch + distinct activity days), then a groupBy to |cohorts|x|offsets| rows.
- rolling_active_users: the user-day frame (already deduplicated) explodes by
  the window length W — a bounded W-fold blow-up — then one distinct-count
  per cover day. Exact rolling distinct counts without a range self-join.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def funnel_steps(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Strict ordered funnel: a user is at step i iff they performed
    ``steps[i]`` strictly AFTER their first qualifying time for step i-1.

    Returns one row per step: (step_idx, step, n_users, conversion) where
    conversion is the round-6 share of step-1 users still present (int/int
    division — engine-exact).
    """
    if not steps:
        raise ValueError("funnel_steps requires at least one step")
    counts: list[DataFrame] = []
    prev: DataFrame | None = None
    for i, step in enumerate(steps):
        ev = df.filter(F.col(type_col) == step).select(
            F.col(user_col).alias("_u"), F.col(ts_col).alias("_ts")
        )
        if prev is None:
            cur = ev.groupBy("_u").agg(F.min("_ts").alias("_t"))
        else:
            cur = (
                ev.join(prev.select("_u", F.col("_t").alias("_pt")), "_u")
                .filter(F.col("_ts") > F.col("_pt"))
                .groupBy("_u")
                .agg(F.min("_ts").alias("_t"))
            )
        counts.append(
            cur.agg(F.count("*").alias("n_users")).select(
                F.lit(i + 1).alias("step_idx"), F.lit(step).alias("step"), "n_users"
            )
        )
        prev = cur
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    # |steps| rows total — the single-partition window is bounded by design
    w = Window.orderBy("step_idx").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return out.withColumn(
        "conversion", F.round(F.col("n_users") / F.first("n_users").over(w), 6)
    )


def cohort_retention(
    df: DataFrame, user_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """Day-cohort retention matrix: cohort_day = the day of a user's first
    event; one row per (cohort_day, day_offset) with the distinct users from
    that cohort active at that offset and their share of the cohort
    (retention, round-6; offset 0 is the cohort size by construction).
    """
    first = df.groupBy(F.col(user_col).alias("_u")).agg(
        F.date_trunc("day", F.min(ts_col)).alias("cohort_day")
    )
    activity = (
        df.select(F.col(user_col).alias("_u"), F.date_trunc("day", ts_col).alias("_d"))
        .distinct()
    )
    cells = (
        activity.join(first, "_u")
        .groupBy("cohort_day", F.datediff("_d", "cohort_day").alias("day_offset"))
        .agg(F.count("*").alias("n_active"))
    )
    # per-cohort size = the offset-0 cell; |cohorts| x |offsets| frame is tiny
    w = Window.partitionBy("cohort_day")
    return cells.withColumn(
        "retention",
        F.round(
            F.col("n_active")
            / F.max(F.when(F.col("day_offset") == 0, F.col("n_active"))).over(w),
            6,
        ),
    )


def rolling_active_users(
    df: DataFrame,
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Exact trailing-``window_days`` active-user counts per day (DAU + WAU
    in one pass): each distinct (user, day) pair contributes to the cover
    days [day, day + W-1], so a distinct-count per cover day IS the trailing
    window — a bounded W-fold explode instead of a per-day range self-join.
    Cover days past the last observed day are dropped (partial future
    windows).  Returns (d, n_active_1d, n_active_wd).
    """
    if window_days < 1:
        raise ValueError("window_days must be >= 1")
    ud = (
        df.select(F.col(user_col).alias("_u"), F.date_trunc("day", ts_col).alias("_d"))
        .distinct()
    )
    step = F.expr("INTERVAL 1 DAY")
    cover = ud.select(
        "_u",
        "_d",
        F.explode(
            F.sequence(
                F.col("_d"),
                F.col("_d") + F.expr(f"INTERVAL {window_days - 1} DAY"),
                step,
            )
        ).alias("d"),
    )
    bounds = ud.agg(F.max("_d").alias("_maxd"))
    return (
        cover.join(F.broadcast(bounds))
        .filter(F.col("d") <= F.col("_maxd"))
        .groupBy("d")
        .agg(
            F.countDistinct(F.when(F.col("d") == F.col("_d"), F.col("_u"))).alias(
                "n_active_1d"
            ),
            F.countDistinct("_u").alias("n_active_wd"),
        )
    )

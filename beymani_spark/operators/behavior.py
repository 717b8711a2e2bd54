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
    max_gap_hours: int | None = None,
) -> DataFrame:
    """Strict ordered funnel: a user is at step i iff they performed
    ``steps[i]`` strictly AFTER their first qualifying time for step i-1
    (and, when ``max_gap_hours`` is set, no later than that many hours
    after it — the conversion-window variant product analytics uses).

    Returns one row per step: (step_idx, step, n_users, conversion) where
    conversion is the round-6 share of step-1 users still present (int/int
    division — engine-exact).
    """
    if not steps:
        raise ValueError("funnel_steps requires at least one step")
    # Single-pass window-chain form. The original per-step join chain
    # re-executed every prior step's aggregate lineage, scanning the fact
    # table s*(s+1)/2 times for s steps (measured: 6 scans, 8 Exchanges
    # for the 3-step funnel). Here each step's first-qualifying time is a
    # conditional min over the SAME user partition — one fact scan, one
    # hash exchange on the user key, consecutive windows share the
    # partitioning, and the per-user reduction reuses it too (no second
    # exchange). Semantics are unchanged: _t[i] = min ts of a step-i
    # event strictly after _t[i-1] (and within the gap when set); a null
    # _t[i-1] nulls the comparison, so users never skip steps.
    cur = df.select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_ts"),
        F.col(type_col).alias("_type"),
    )
    for i, step in enumerate(steps):
        cond = F.col("_type") == step
        if i > 0:
            cond = cond & (F.col("_ts") > F.col(f"_t{i - 1}"))
            if max_gap_hours is not None:
                cond = cond & (
                    F.col("_ts")
                    <= F.col(f"_t{i - 1}")
                    + F.expr(f"INTERVAL {max_gap_hours} HOUR")
                )
        cur = cur.withColumn(
            f"_t{i}", F.min(F.when(cond, F.col("_ts"))).over(Window.partitionBy("_u"))
        )
    per_user = cur.groupBy("_u").agg(
        *[F.max(f"_t{i}").alias(f"_t{i}") for i in range(len(steps))]
    )
    counts_row = per_user.agg(
        *[F.count(f"_t{i}").alias(f"_n{i}") for i in range(len(steps))]
    )
    pairs = ", ".join(
        f"{i + 1}, '{step}', `_n{i}`" for i, step in enumerate(steps)
    )
    out = counts_row.select(
        F.expr(
            f"stack({len(steps)}, {pairs}) as (step_idx, step, n_users)"
        )
    )
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


def last_touch_attribution(
    df: DataFrame,
    conversion_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Last-touch attribution: each conversion event's value is credited to
    the user's most recent PRECEDING non-conversion event type (``'none'``
    when the conversion is the user's first event).  One user-keyed window
    over per-user event sequences (bounded partitions — a user's history,
    never the whole table), then a groupBy to |event types| rows:
    (touch_type, n_conversions, total_value round-6, value_share round-6).

    Ordering is (ts, id_col) on both engines so same-instant events
    attribute deterministically.
    """
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touched = df.withColumn(
        "_touch",
        F.last(
            F.when(F.col(type_col) != conversion_type, F.col(type_col)),
            ignorenulls=True,
        ).over(w),
    )
    conv = (
        touched.filter(F.col(type_col) == conversion_type)
        .groupBy(F.coalesce(F.col("_touch"), F.lit("none")).alias("touch_type"))
        .agg(
            F.count("*").alias("n_conversions"),
            F.round(F.sum(value_col), 6).alias("total_value"),
        )
    )
    # |event types| rows — the single-partition share window is bounded
    wt = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return conv.withColumn(
        "value_share", F.round(F.col("total_value") / F.sum("total_value").over(wt), 6)
    )


def event_gaps(
    df: DataFrame,
    min_gap_hours: float = 24.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key activity-gap (outage) detection: every pair of CONSECUTIVE
    events for a key separated by at least ``min_gap_hours`` becomes one
    row (key, gap_start, gap_end, gap_hours) — the "which sensors went
    dark, when, for how long" report, and the inverse of sessionize()
    (rollup.py:184): sessionize groups the activity between gaps, this
    returns the gaps themselves.

    Timestamps are compared in integer epoch SECONDS (the repo's
    engine-parity convention — rollup.py:203) and gap_hours is the round-6
    quotient by 3600, so both engines agree bit-for-bit. Ordering within a
    key is (ts, id) so same-instant events pair deterministically.

    Scale shape: one hash exchange on the key + a per-key ordered window —
    partitions are one key's history, bounded by per-key event counts,
    never the whole table; the filter drops non-gap rows before anything
    downstream."""
    # NTZ fixture timestamps: cast via session-UTC timestamp to epoch longs
    # (rollup.py:203 convention)
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev = F.lag(epoch).over(w)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    return (
        df.select(
            F.col(user_col),
            F.col(ts_col),
            F.col(id_col),
            (epoch - prev).alias("_gap_s"),
            prev_ts.alias("gap_start"),
        )
        .filter(F.col("_gap_s") >= int(min_gap_hours * 3600))
        .select(
            F.col(user_col),
            "gap_start",
            F.col(ts_col).alias("gap_end"),
            F.round(F.col("_gap_s") / 3600.0, 6).alias("gap_hours"),
        )
    )


def linear_attribution(
    df: DataFrame,
    conversion_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Linear multi-touch attribution: each conversion's value splits
    EQUALLY across every preceding touch (non-conversion event) of the
    same user since the previous conversion — the equal-credit companion
    of last_touch_attribution. Touches after a user's final conversion
    earn nothing; conversions with no preceding touch keep their full
    value under 'none' (so total credit always equals total conversion
    value — the books balance).

    Mechanics (two user-keyed windows + one aggregation, no pair join):
    events get a per-user row_number over the (ts, id) order; each TOUCH
    finds its next conversion's row_number via a min() over the
    strictly-following frame restricted to conversions; touches grouped
    by that conversion share its value / touch-count. The row_number is
    the conversion key on both engines — a plain int, no struct ordering
    semantics to match.

    Scale shape: one hash exchange on the user key feeding both windows,
    then a groupBy to (conversion) and a groupBy to |event types| rows —
    partitions are one user's history, bounded."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    wf = w.rowsBetween(1, Window.unboundedFollowing)
    is_conv = F.col(type_col) == conversion_type
    marked = df.select(
        F.col(user_col).alias("_u"),
        F.col(type_col),
        F.col(value_col),
        is_conv.alias("_is_conv"),
        F.row_number().over(w).alias("_rn"),
        F.min(F.when(is_conv, F.row_number().over(w))).over(wf).alias("_next_conv"),
    )
    touches = marked.filter(~F.col("_is_conv") & F.col("_next_conv").isNotNull())
    conversions = marked.filter(F.col("_is_conv")).select(
        "_u",
        F.col("_rn").alias("_ck"),
        F.col(value_col).alias("_cv"),
    )
    grouped = (
        touches.groupBy(
            "_u", F.col("_next_conv").alias("_ck"), F.col(type_col).alias("touch_type")
        )
        .agg(F.count("*").alias("_n_type"))
        .withColumn(
            "_n_tot",
            F.sum("_n_type").over(Window.partitionBy("_u", "_ck")),
        )
    )
    # ONE left join from conversions replaces the inner join + the
    # anti-join 'none' branch (which re-derived the touch set a second
    # time and paid its own distinct + join shuffles): a conversion with
    # no touch group arrives with a null touch_type and keeps its full
    # value under 'none' — same rows, one pass.
    credit_rows = conversions.join(grouped, ["_u", "_ck"], "left").select(
        F.coalesce(F.col("touch_type"), F.lit("none")).alias("touch_type"),
        F.when(F.col("touch_type").isNull(), F.col("_cv"))
        .otherwise(F.col("_cv") * F.col("_n_type") / F.col("_n_tot"))
        .alias("_credit"),
        F.coalesce(F.col("_n_type"), F.lit(0).cast("long")).alias("_n_touches"),
    )
    per_type = credit_rows.groupBy("touch_type").agg(
        F.sum("_n_touches").alias("n_touches"),
        F.round(F.sum("_credit"), 6).alias("total_credit"),
    )
    wt = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return per_type.withColumn(
        "credit_share", F.round(F.col("total_credit") / F.sum("total_credit").over(wt), 6)
    )


def u_shaped_attribution(
    df: DataFrame,
    conversion_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
    edge_weight: float = 0.4,
) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution: within each
    conversion's touch group the FIRST and LAST touch each earn
    ``edge_weight`` (default 40%) of the conversion value and the middle
    touches share the remainder equally; a single touch earns 100%, two
    touches split 50/50. Conversions with no preceding touch keep their
    value under 'none' — total credit equals total conversion value, same
    conservation law as linear_attribution.

    Same plan shape as linear_attribution (one user-keyed exchange feeding
    the windows, then tiny aggregations): touches find their next
    conversion's row_number; min/max row_number over the (user, conversion)
    partition mark the U's edges; per-touch weight is a CASE on position.
    The weights are exact binary-representable-or-shared literals on both
    engines, so the oracle hash-verifies after round-6."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    wf = w.rowsBetween(1, Window.unboundedFollowing)
    is_conv = F.col(type_col) == conversion_type
    marked = df.select(
        F.col(user_col).alias("_u"),
        F.col(type_col),
        F.col(value_col),
        is_conv.alias("_is_conv"),
        F.row_number().over(w).alias("_rn"),
        F.min(F.when(is_conv, F.row_number().over(w))).over(wf).alias("_next_conv"),
    )
    touches = marked.filter(~F.col("_is_conv") & F.col("_next_conv").isNotNull())
    conversions = marked.filter(F.col("_is_conv")).select(
        "_u", F.col("_rn").alias("_ck"), F.col(value_col).alias("_cv")
    )
    grp = Window.partitionBy("_u", "_next_conv")
    pos = (
        touches.withColumn("_n_tot", F.count("*").over(grp))
        .withColumn("_first", F.min("_rn").over(grp))
        .withColumn("_last", F.max("_rn").over(grp))
    )
    ew = float(edge_weight)
    weight = (
        F.when(F.col("_n_tot") == 1, F.lit(1.0))
        .when(F.col("_n_tot") == 2, F.lit(0.5))
        .when(F.col("_rn") == F.col("_first"), F.lit(ew))
        .when(F.col("_rn") == F.col("_last"), F.lit(ew))
        .otherwise(F.lit(1.0 - 2 * ew) / (F.col("_n_tot") - 2))
    )
    # name-based join (linear_attribution convention): both sides cut
    # from the same lineage, so an expression join would trip Spark's
    # ambiguous-self-join resolution. ONE left join from conversions
    # replaces inner join + anti-join 'none' branch (the linear form's
    # rewrite): an untouched conversion arrives with a null touch row and
    # keeps its full value under 'none'.
    weighted = pos.withColumn("_w", weight).withColumnRenamed("_next_conv", "_ck")
    credit_rows = conversions.join(
        weighted.select("_u", "_ck", F.col(type_col).alias("_tt"), "_w"),
        ["_u", "_ck"],
        "left",
    ).select(
        F.coalesce(F.col("_tt"), F.lit("none")).alias("touch_type"),
        F.when(F.col("_tt").isNull(), F.col("_cv"))
        .otherwise(F.col("_cv") * F.col("_w"))
        .alias("_credit"),
        F.when(F.col("_tt").isNull(), F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("_n_touches"),
    )
    per_type = credit_rows.groupBy("touch_type").agg(
        F.sum("_n_touches").alias("n_touches"),
        F.round(F.sum("_credit"), 6).alias("total_credit"),
    )
    wt = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return per_type.withColumn(
        "credit_share", F.round(F.col("total_credit") / F.sum("total_credit").over(wt), 6)
    )

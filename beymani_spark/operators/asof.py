"""As-of (time-travel) join — a custom operator Spark's DataFrame API lacks.

Joins each left row to the LATEST right row with right_ts <= left_ts per
key (the "most recent model snapshot / price / threshold at event time"
pattern). The reference has no as-of operator; this is north-star surface
for scoring against time-versioned models.

Implementation is union + windowed last-value, NOT a range join: tag both
sides, sort the union per key on (ts, side) with the right side first on
ties (inclusive <=), and carry the right columns forward with
last(ignorenulls). One hash exchange + one sort-spill window — shuffle
volume is |L| + |R| rows, where a naive range join is |L| x |R| per key and
Spark's own range-join plan degrades to broadcast-nested-loop. Skewed keys
sort-spill rather than OOM.
"""
from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    tolerance: str | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus ``right_cols`` from the latest
    right row at or before its timestamp (null when none exists yet).

    ``tolerance`` (e.g. ``"2 hours"``): matches older than the tolerance
    are nulled out — the pandas ``merge_asof(tolerance=...)`` contract.

    Raises ValueError on name collisions that would silently produce
    duplicate/clobbered output columns: a right_cols name already present
    on the left, or a left column using the output/internal namespace
    (``matched_ts``, ``_side``, ``_ats``, ``_rts``, ``_m_ts``,
    ``_r_<col>``)."""
    left_cols = left.columns
    reserved = {"matched_ts", "_side", "_ats", "_rts", "_m_ts"} | {
        f"_r_{c}" for c in right_cols
    }
    clobbered = [c for c in left_cols if c in reserved]
    if clobbered:
        raise ValueError(
            f"asof_join: left columns {clobbered} collide with the output/"
            "internal namespace (matched_ts, _side, _ats, _rts, _m_ts, _r_*)"
        )
    dup_out = [c for c in right_cols if c in left_cols]
    if dup_out:
        raise ValueError(
            f"asof_join: right_cols {dup_out} already exist on the left — "
            "alias them on the right frame before joining"
        )
    l = left.withColumn("_side", F.lit(1)).withColumn("_ats", F.col(left_ts))
    r = right.select(
        *keys,
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        F.col(right_ts).alias("_rts"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    for c in left_cols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    l = l.withColumn("_rts", F.lit(None).cast(dict(r.dtypes)["_rts"]))
    for c in right_cols:
        l = l.withColumn(f"_r_{c}", F.lit(None).cast(dict(r.dtypes)[f"_r_{c}"]))
    unioned = l.unionByName(r.select(*l.columns))

    # right rows sort before left rows at equal _ats -> inclusive (<=) match
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ats").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *left_cols,
        "_side",
        "_ats",
        F.last("_rts", ignorenulls=True).over(w).alias("_m_ts"),
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(c)
            for c in right_cols
        ],
    ).filter(F.col("_side") == 1)
    if tolerance is not None:
        in_tol = F.col("_m_ts") >= F.col("_ats") - F.expr(f"INTERVAL {tolerance}")
        carried = carried.select(
            *left_cols,
            F.when(in_tol, F.col("_m_ts")).alias("_m_ts"),
            *[F.when(in_tol, F.col(c)).alias(c) for c in right_cols],
        )
    return carried.select(
        *left_cols, F.col("_m_ts").alias("matched_ts"), *right_cols
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    tolerance_seconds: float,
    left_id: str = "left_id",
    right_id: str = "right_id",
) -> DataFrame:
    """Time-proximity join — every (left, right) pair on the same key whose
    timestamps lie within ``tolerance_seconds`` of each other (the
    correlation/CEP primitive: "which B events happened around each A
    event"). Spark has no interval-join primitive and a naive
    |left_ts - right_ts| <= t predicate joins as a per-key nested loop.

    Implementation is time-BUCKETIZED: both sides bucket by
    floor(epoch / tolerance); a qualifying pair's buckets can differ by at
    most 1, so the left side explodes to its bucket and both neighbors
    (3 rows) and the join is a pure (keys, bucket) EQUI-join with the
    exact |Δt| <= t filter applied to the candidates. Shuffle volume is
    3|L| + |R| rows; per-task pair work is bounded by events-per-key-per-
    2·tolerance — the join degrades only if a single key packs huge
    event counts into one tolerance window, which is the output's own
    size lower bound (the join cannot beat its result cardinality).

    Output: key cols + (left_id, left ts, right_id, right ts,
    delta_seconds = right - left, signed). Self-pairs are NOT excluded —
    filter on ids downstream if left and right are the same table.
    """
    t = float(tolerance_seconds)
    lb = F.floor(F.col(left_ts).cast("timestamp").cast("double") / F.lit(t))
    rb = F.floor(F.col(right_ts).cast("timestamp").cast("double") / F.lit(t))
    l = left.select(
        *keys,
        F.col(left_id),
        F.col(left_ts).alias("_lts"),
        F.explode(F.array(lb - 1, lb, lb + 1)).alias("_bk"),
    )
    r = right.select(
        *keys,
        F.col(right_id),
        F.col(right_ts).alias("_rts"),
        rb.alias("_bk"),
    )
    delta = (
        F.col("_rts").cast("timestamp").cast("double")
        - F.col("_lts").cast("timestamp").cast("double")
    )
    return (
        l.join(r, [*keys, "_bk"])
        .withColumn("delta_seconds", delta)
        .filter(F.abs(F.col("delta_seconds")) <= F.lit(t))
        .select(
            *keys,
            left_id,
            F.col("_lts").alias(left_ts),
            right_id,
            F.col("_rts").alias(right_ts),
            "delta_seconds",
        )
    )

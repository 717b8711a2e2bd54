"""In-range / out-of-range predictors (SURVEY.md §2.1 #10/#11).

Reference semantics (/root/reference/spark/src/main/scala/org/beymani/spark/
misc/OutRangeBasedPredictor.scala:100-117, InRangeBasedPredictor.scala:80-116):
  delta = value > mid ? value - hi : lo - value   (positive when outside)
  out_range score = logistic(k * delta)            — anomaly outside [lo,hi]
  in_range  score = 1 - logistic(k * delta)        — anomaly *inside* the band
                                                     (e.g. quarantine violation)
Ranges come per (key, attr) as a model DataFrame (lo, hi, mid), broadcast-joined
— replaces the reference's driver-side range files. Pure column expressions.
"""
from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scaling import logistic_scale
from ..functions.scores import aggregate_scores, tag_label


def range_model_from_quantiles(
    df: DataFrame,
    keys: Sequence[str],
    values: Sequence[str],
    lo_q: float = 0.05,
    hi_q: float = 0.95,
) -> DataFrame:
    """Build a (keys..., attr, lo, hi, mid) range model from exact quantiles."""
    from .profile import _explode_attrs

    long = _explode_attrs(df, keys, values)
    group = [c for c in long.columns if c not in ("attr", "value")] + ["attr"]
    return (
        long.groupBy(*group)
        .agg(
            F.percentile("value", F.lit(lo_q)).alias("lo"),
            F.percentile("value", F.lit(hi_q)).alias("hi"),
        )
        .withColumn("mid", (F.col("lo") + F.col("hi")) / 2.0)
    )


def _range_scored(
    df: DataFrame,
    ranges: DataFrame,
    keys: Sequence[str],
    values: Sequence[str],
    exp_const: float,
    inside: bool,
    weights: Sequence[float] | None,
    strategy: str,
    threshold: float,
) -> DataFrame:
    out = df
    per_attr = []
    for v in values:
        sub = ranges.filter(F.col("attr") == v).select(
            *keys,
            F.col("lo").alias(f"_lo_{v}"),
            F.col("hi").alias(f"_hi_{v}"),
            F.col("mid").alias(f"_mid_{v}"),
        )
        out = out.join(F.broadcast(sub), list(keys), "left")
        delta = F.when(
            F.col(v) > F.col(f"_mid_{v}"), F.col(v) - F.col(f"_hi_{v}")
        ).otherwise(F.col(f"_lo_{v}") - F.col(v))
        s = logistic_scale(exp_const, delta)
        if inside:
            s = F.lit(1.0) - s
        per_attr.append(F.when(F.col(f"_lo_{v}").isNotNull(), s))
    score = aggregate_scores(per_attr, weights, strategy)
    out = out.withColumn("score", score).withColumn(
        "label", tag_label(F.col("score"), threshold)
    )
    drop = [f"_{c}_{v}" for v in values for c in ("lo", "hi", "mid")]
    return out.drop(*drop)


def out_range_score(
    df: DataFrame,
    ranges: DataFrame,
    keys: Sequence[str],
    values: Sequence[str],
    exp_const: float = 1.0,
    weights: Sequence[float] | None = None,
    strategy: str = "average",
    threshold: float = 0.7,
) -> DataFrame:
    return _range_scored(df, ranges, keys, values, exp_const, False, weights, strategy, threshold)


def in_range_score(
    df: DataFrame,
    ranges: DataFrame,
    keys: Sequence[str],
    values: Sequence[str],
    exp_const: float = 1.0,
    weights: Sequence[float] | None = None,
    strategy: str = "average",
    threshold: float = 0.7,
) -> DataFrame:
    return _range_scored(df, ranges, keys, values, exp_const, True, weights, strategy, threshold)

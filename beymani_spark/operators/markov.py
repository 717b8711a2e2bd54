"""Markov-chain sequence family (SURVEY.md §2.1 #3, §2.4 transition builder).

transition_model ≙ avenir MarkovStateTransitionModel (pipeline usage
/root/reference/resource/real_time_fraud_prediction_tutorial.txt:44-56): lag
pairs per entity -> (prev,cur) counts -> row-normalized probabilities. One
window pass + one aggregation; the model is tiny (|states|²) and broadcast.

markov_score ≙ MarkovChainPredictor (/root/reference/spark/src/main/scala/org/
beymani/spark/seq/MarkovChainPredictor.scala:90-135) with the four metrics of
MarkovModelPredictor.java:
  conditionalProbability  -ln p(cur|prev)                      (:471-482)
  missProbability         Σ_{j≠cur} p(j|prev) = 1 - p(cur|prev) (:399-417)
  missRate                1 if cur != argmax_j p(j|prev)        (:424-431)
  entropyReduction        H(prev without cur) / H(prev)         (:437-462)
averaged over a trailing window of transitions per key — the reference's
hand-rolled groupByKey+sort+scan becomes Window.partitionBy(keys).orderBy(ts)
.rowsBetween(-(w-1), 0), which sorts/spills instead of materializing key groups.

The reference tags the whole window 'O' when the windowed metric crosses the
threshold (:124-131); we expose the per-row windowed score plus label.
"""
from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scores import tag_label

METRICS = ("conditionalProbability", "missProbability", "missRate", "entropyReduction")

# score assigned to a transition absent from the model (-log prob cap); shared
# semantics with the streaming scorer's unseen-transition cap
UNSEEN_NEG_LOG_PROB = 20.0


def transition_model(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    state: str,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Row-stochastic transition matrix pooled over all keys:
    (prev_state, cur_state, cnt, prob)."""
    w = Window.partitionBy(*keys).orderBy(ts, *order_cols)
    pairs = (
        df.select(*keys, F.col(state).alias("cur_state"), F.lag(state).over(w).alias("prev_state"))
        .filter(F.col("prev_state").isNotNull())
    )
    cnt = pairs.groupBy("prev_state", "cur_state").agg(F.count("*").alias("cnt"))
    wp = Window.partitionBy("prev_state")
    return cnt.withColumn("prob", F.col("cnt") / F.sum("cnt").over(wp))


def enrich_model(model: DataFrame) -> DataFrame:
    """Add per-row argmax flag and per-prev-state entropy to a transition model."""
    wp = Window.partitionBy("prev_state")
    wr = wp.orderBy(F.col("prob").desc(), F.col("cur_state").asc())
    return (
        model.withColumn("is_max", (F.row_number().over(wr) == 1).cast("int"))
        .withColumn("row_entropy", F.sum(-F.col("prob") * F.log("prob")).over(wp))
    )


def markov_score(
    df: DataFrame,
    model: DataFrame,
    keys: Sequence[str],
    ts: str,
    state: str,
    metric: str = "conditionalProbability",
    window: int | None = 5,
    threshold: float = 2.0,
    order_cols: Sequence[str] = (),
    spread_label: bool = False,
) -> DataFrame:
    """Per-row windowed Markov anomaly score over keyed state sequences.

    Rows without a previous state (first per key) are dropped, matching the
    reference's window scan which emits from the second element on.

    ``window=None`` selects the reference's GLOBAL accumulation mode
    (MarkovModelPredictor.java:286-346, getGlobalMetric :379-395 — the
    non-local branch of the real-time predictor): the score is the
    EXPANDING mean of the per-transition metric since the key's first
    transition (globParams left/right accumulate num/den forever), not a
    trailing window. The reference defines it for the missProbability /
    missRate / entropyReduction metrics; conditionalProbability is
    accepted here as the natural extension (expanding mean of -ln p).
    ``spread_label`` is a windowed notion and is rejected with None."""
    if metric not in METRICS:
        raise ValueError(f"unknown metric: {metric}")
    if window is None and spread_label:
        raise ValueError("spread_label needs a finite window")
    wseq = Window.partitionBy(*keys).orderBy(ts, *order_cols)
    seq = (
        df.withColumn("prev_state", F.lag(state).over(wseq))
        .filter(F.col("prev_state").isNotNull())
        .withColumnRenamed(state, "cur_state")
    )
    m = enrich_model(model)
    joined = seq.join(
        F.broadcast(m.select("prev_state", "cur_state", "prob", "is_max", "row_entropy")),
        ["prev_state", "cur_state"],
        "left",
    )
    # Unseen (prev,cur) transitions — null after the left model join — are the
    # MOST anomalous case and must contribute the metric's worst value, not
    # drop out of the trailing average; the caps match the streaming
    # counterpart (streaming/jobs.py apply_stream_markov: -log(p) capped 20.0).
    if metric == "conditionalProbability":
        t = F.when(F.col("prob") > 0, -F.log("prob")).otherwise(F.lit(UNSEEN_NEG_LOG_PROB))
    elif metric == "missProbability":
        t = F.lit(1.0) - F.coalesce(F.col("prob"), F.lit(0.0))
    elif metric == "missRate":
        # null is_max falls through to the otherwise-branch: unseen = miss
        t = F.when(F.col("is_max") == 1, F.lit(0.0)).otherwise(F.lit(1.0))
    else:  # entropyReduction — unseen transition = full entropy reduction;
        # a seen transition out of a deterministic prev-state (row_entropy 0,
        # i.e. prob 1) reduces nothing
        t = (
            F.when(
                F.col("row_entropy") > 0,
                (F.col("row_entropy") + F.col("prob") * F.log("prob"))
                / F.col("row_entropy"),
            )
            .when(F.col("prob").isNotNull(), F.lit(0.0))
            .otherwise(F.lit(1.0))
        )
    wtrail = Window.partitionBy(*keys).orderBy(ts, *order_cols).rowsBetween(
        Window.unboundedPreceding if window is None else -(window - 1), 0
    )
    out = joined.withColumn("_t", t).withColumn("score", F.avg("_t").over(wtrail))
    out = out.withColumn("label", tag_label(F.col("score"), threshold))
    if spread_label:
        # reference tag spread (MarkovChainPredictor.scala:124-131): when the
        # windowed metric crosses the threshold, every row of that window is
        # tagged 'O' — a forward-looking window max over the outlier flag
        wfwd = Window.partitionBy(*keys).orderBy(ts, *order_cols).rowsBetween(0, window - 1)
        flag = F.when(F.col("label") == "O", 1).otherwise(0)
        out = out.withColumn(
            "label",
            F.when(F.col("label") == "I", F.lit("I"))
            .when(F.max(flag).over(wfwd) == 1, F.lit("O"))
            .otherwise(F.lit("N")),
        )
    return out.drop("_t", "prob", "is_max", "row_entropy")

"""Registry entries: Markov-chain sequence family on events — per-user
event_type sequences, pooled global transition model."""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import markov
from ..sources import load_table
from .queries_stats import _round
from .registry import register

_SEQ_CTE = """
WITH seq AS (
  SELECT user_id, event_id, ts, event_type AS cur_state,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_state
  FROM events
), pairs AS (
  SELECT prev_state, cur_state FROM seq WHERE prev_state IS NOT NULL
), tcnt AS (
  SELECT prev_state, cur_state, count(*) AS cnt FROM pairs GROUP BY prev_state, cur_state
), model AS (
  SELECT prev_state, cur_state, cnt,
         cnt * 1.0 / sum(cnt) OVER (PARTITION BY prev_state) AS prob
  FROM tcnt
)
"""

_TRANSITION_ORACLE = _SEQ_CTE + """
SELECT prev_state, cur_state, cnt, round(prob, 6) AS prob FROM model
"""


@register("markov_transition", _TRANSITION_ORACLE)
def q_markov_transition(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = markov.transition_model(ev, ["user_id"], "ts", "event_type", order_cols=["event_id"])
    return _round(out, ["prob"])


def _markov_scoring_oracle(metric_expr: str, extra_cte: str, threshold: float) -> str:
    return _SEQ_CTE + extra_cte + f"""
, scored AS (
  SELECT s.user_id, s.event_id, s.ts, s.prev_state, s.cur_state,
         {metric_expr} AS t
  FROM seq s {_JOIN}
), win AS (
  SELECT user_id, event_id, prev_state, cur_state,
         avg(t) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS score
  FROM scored
)
SELECT user_id, event_id, prev_state, cur_state, round(score, 6) AS score,
       CASE WHEN score IS NULL THEN 'I' WHEN score > {threshold} THEN 'O' ELSE 'N' END AS label
FROM win
"""


# LEFT join: unseen (prev,cur) transitions stay in the sequence and score the
# metric's worst value (mirrors markov_score's fallbacks / streaming cap)
_JOIN = (
    "LEFT JOIN model m ON s.prev_state = m.prev_state AND s.cur_state = m.cur_state "
    "WHERE s.prev_state IS NOT NULL"
)

_COND_PROB_ORACLE = _markov_scoring_oracle("CASE WHEN m.prob > 0 THEN -ln(m.prob) ELSE 20.0 END", "", 2.0)


@register("markov_cond_prob", _COND_PROB_ORACLE)
def q_markov_cond_prob(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    model = markov.transition_model(ev, ["user_id"], "ts", "event_type", order_cols=["event_id"])
    out = markov.markov_score(
        ev, model, ["user_id"], "ts", "event_type",
        metric="conditionalProbability", window=5, threshold=2.0, order_cols=["event_id"],
    )
    return _round(
        out.select("user_id", "event_id", "prev_state", "cur_state", "score", "label"),
        ["score"],
    )


_COND_PROB_SPREAD_ORACLE = _SEQ_CTE + """
, scored AS (
  SELECT s.user_id, s.event_id, s.ts, s.prev_state, s.cur_state,
         CASE WHEN m.prob > 0 THEN -ln(m.prob) ELSE 20.0 END AS t
  FROM seq s LEFT JOIN model m ON s.prev_state = m.prev_state AND s.cur_state = m.cur_state
  WHERE s.prev_state IS NOT NULL
), win AS (
  SELECT user_id, event_id, ts, prev_state, cur_state,
         avg(t) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS score
  FROM scored
), lab AS (
  SELECT *, CASE WHEN score > 1.65 THEN 1 ELSE 0 END AS hit FROM win
)
SELECT user_id, event_id, prev_state, cur_state, round(score, 6) AS score,
       CASE WHEN max(hit) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) = 1
            THEN 'O' ELSE 'N' END AS label
FROM lab
"""


@register("markov_cond_prob_spread", _COND_PROB_SPREAD_ORACLE)
def q_markov_cond_prob_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    model = markov.transition_model(ev, ["user_id"], "ts", "event_type", order_cols=["event_id"])
    out = markov.markov_score(
        ev, model, ["user_id"], "ts", "event_type",
        metric="conditionalProbability", window=5, threshold=1.65,
        order_cols=["event_id"], spread_label=True,
    )
    return _round(
        out.select("user_id", "event_id", "prev_state", "cur_state", "score", "label"),
        ["score"],
    )


_MISS_PROB_ORACLE = _markov_scoring_oracle("1.0 - coalesce(m.prob, 0.0)", "", 0.85)


@register("markov_miss_prob", _MISS_PROB_ORACLE)
def q_markov_miss_prob(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    model = markov.transition_model(ev, ["user_id"], "ts", "event_type", order_cols=["event_id"])
    out = markov.markov_score(
        ev, model, ["user_id"], "ts", "event_type",
        metric="missProbability", window=5, threshold=0.85, order_cols=["event_id"],
    )
    return _round(
        out.select("user_id", "event_id", "prev_state", "cur_state", "score", "label"),
        ["score"],
    )


_MISS_RATE_CTE = """
, enriched AS (
  SELECT prev_state, cur_state, prob,
         CASE WHEN row_number() OVER (PARTITION BY prev_state ORDER BY prob DESC, cur_state ASC) = 1
              THEN 1 ELSE 0 END AS is_max
  FROM model
)
"""

_MISS_RATE_ORACLE = _SEQ_CTE + _MISS_RATE_CTE + """
, scored AS (
  SELECT s.user_id, s.event_id, s.ts, s.prev_state, s.cur_state,
         CASE WHEN m.is_max = 1 THEN 0.0 ELSE 1.0 END AS t
  FROM seq s LEFT JOIN enriched m ON s.prev_state = m.prev_state AND s.cur_state = m.cur_state
  WHERE s.prev_state IS NOT NULL
), win AS (
  SELECT user_id, event_id, prev_state, cur_state,
         avg(t) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS score
  FROM scored
)
SELECT user_id, event_id, prev_state, cur_state, round(score, 6) AS score,
       CASE WHEN score IS NULL THEN 'I' WHEN score > 0.9 THEN 'O' ELSE 'N' END AS label
FROM win
"""


@register("markov_miss_rate", _MISS_RATE_ORACLE)
def q_markov_miss_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    model = markov.transition_model(ev, ["user_id"], "ts", "event_type", order_cols=["event_id"])
    out = markov.markov_score(
        ev, model, ["user_id"], "ts", "event_type",
        metric="missRate", window=5, threshold=0.9, order_cols=["event_id"],
    )
    return _round(
        out.select("user_id", "event_id", "prev_state", "cur_state", "score", "label"),
        ["score"],
    )


_ENTROPY_RED_CTE = """
, enriched AS (
  SELECT prev_state, cur_state, prob,
         sum(-prob * ln(prob)) OVER (PARTITION BY prev_state) AS row_entropy
  FROM model
)
"""

_ENTROPY_RED_ORACLE = _SEQ_CTE + _ENTROPY_RED_CTE + """
, scored AS (
  SELECT s.user_id, s.event_id, s.ts, s.prev_state, s.cur_state,
         CASE WHEN m.row_entropy > 0
              THEN (m.row_entropy + m.prob * ln(m.prob)) / m.row_entropy
              WHEN m.prob IS NOT NULL THEN 0.0
              ELSE 1.0 END AS t
  FROM seq s LEFT JOIN enriched m ON s.prev_state = m.prev_state AND s.cur_state = m.cur_state
  WHERE s.prev_state IS NOT NULL
), win AS (
  SELECT user_id, event_id, prev_state, cur_state,
         avg(t) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS score
  FROM scored
)
SELECT user_id, event_id, prev_state, cur_state, round(score, 6) AS score,
       CASE WHEN score IS NULL THEN 'I' WHEN score > 0.9 THEN 'O' ELSE 'N' END AS label
FROM win
"""


@register("markov_entropy_reduction", _ENTROPY_RED_ORACLE)
def q_markov_entropy_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    model = markov.transition_model(ev, ["user_id"], "ts", "event_type", order_cols=["event_id"])
    out = markov.markov_score(
        ev, model, ["user_id"], "ts", "event_type",
        metric="entropyReduction", window=5, threshold=0.9, order_cols=["event_id"],
    )
    return _round(
        out.select("user_id", "event_id", "prev_state", "cur_state", "score", "label"),
        ["score"],
    )


_GLOBAL_ORACLE = _SEQ_CTE + """
, scored AS (
  SELECT s.user_id, s.event_id, s.ts, s.prev_state, s.cur_state,
         1.0 - coalesce(m.prob, 0.0) AS t
  FROM seq s LEFT JOIN model m ON s.prev_state = m.prev_state AND s.cur_state = m.cur_state
  WHERE s.prev_state IS NOT NULL
), win AS (
  SELECT user_id, event_id, prev_state, cur_state,
         avg(t) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS score
  FROM scored
)
SELECT user_id, event_id, prev_state, cur_state, round(score, 6) AS score,
       CASE WHEN score IS NULL THEN 'I' WHEN score > 0.85 THEN 'O' ELSE 'N' END AS label
FROM win
"""


@register("markov_global", _GLOBAL_ORACLE)
def q_markov_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference global accumulation mode (MarkovModelPredictor.java
    :379-395, the non-local branch): the score is the EXPANDING mean of
    the per-transition missProbability since the key's first transition —
    markov.markov_score(window=None). Same plan shape as the windowed
    family: broadcast model join + one keyed window pass."""
    ev = load_table(spark, sf_dir, "events")
    model = markov.transition_model(ev, ["user_id"], "ts", "event_type", order_cols=["event_id"])
    out = markov.markov_score(
        ev, model, ["user_id"], "ts", "event_type",
        metric="missProbability", window=None, threshold=0.85, order_cols=["event_id"],
    )
    return _round(
        out.select("user_id", "event_id", "prev_state", "cur_state", "score", "label"),
        ["score"],
    )

"""Registry entries: histogram / estimated-probability family (K4-K7, #2,
M2/M3) and range predictors (#10/#11)."""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import histogram, ranges
from ..sources import load_table
from .queries_stats import _round
from .registry import register

# events histogram: key=event_type, value bucketed at width 10
_HIST_CTE = """
WITH b AS (
  SELECT event_type, 'value' AS attr, CAST(floor(value / 10.0) AS BIGINT) AS bucket
  FROM events
), hcnt AS (
  SELECT event_type, attr, bucket, count(*) AS cnt FROM b GROUP BY event_type, attr, bucket
), hist AS (
  SELECT event_type, attr, bucket, cnt,
         cnt * 1.0 / sum(cnt) OVER (PARTITION BY event_type, attr) AS prob
  FROM hcnt
)
"""

_ATTR_HIST_ORACLE = _HIST_CTE + """
SELECT event_type, attr, bucket, cnt, round(prob, 6) AS prob FROM hist
"""


@register("attr_histogram", _ATTR_HIST_ORACLE)
def q_attr_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = histogram.attr_histogram(ev, ["event_type"], ["value"], [10.0])
    return _round(out, ["prob"])


_EST_ATTR_PROB_ORACLE = _HIST_CTE + """
SELECT e.event_id, e.event_type, e.value,
       round(1.0 - coalesce(h.prob, 0.0), 6) AS score,
       CASE WHEN 1.0 - coalesce(h.prob, 0.0) > 0.99 THEN 'O' ELSE 'N' END AS label
FROM events e LEFT JOIN hist h
  ON e.event_type = h.event_type AND CAST(floor(e.value / 10.0) AS BIGINT) = h.bucket
"""


@register("est_attr_prob", _EST_ATTR_PROB_ORACLE)
def q_est_attr_prob(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hist = histogram.attr_histogram(ev, ["event_type"], ["value"], [10.0])
    out = histogram.est_attr_prob_score(
        ev, hist, ["event_type"], ["value"], [10.0], strategy="inverse", threshold=0.99
    )
    return _round(out.select("event_id", "event_type", "value", "score", "label"), ["score"])


_EST_META_PROB_ORACLE = _HIST_CTE + """
, meta AS (
  SELECT event_type, attr, bucket,
         sum(prob) OVER (PARTITION BY event_type, attr ORDER BY prob
                         RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS meta_prob
  FROM hist
)
SELECT e.event_id, e.event_type, e.value,
       round(1.0 - coalesce(m.meta_prob, 0.0), 6) AS score,
       CASE WHEN 1.0 - coalesce(m.meta_prob, 0.0) > 0.95 THEN 'O' ELSE 'N' END AS label
FROM events e LEFT JOIN meta m
  ON e.event_type = m.event_type AND CAST(floor(e.value / 10.0) AS BIGINT) = m.bucket
"""


@register("est_meta_prob", _EST_META_PROB_ORACLE)
def q_est_meta_prob(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hist = histogram.attr_histogram(ev, ["event_type"], ["value"], [10.0])
    out = histogram.est_meta_prob_score(
        ev, hist, ["event_type"], ["value"], [10.0], strategy="inverse", threshold=0.95
    )
    return _round(out.select("event_id", "event_type", "value", "score", "label"), ["score"])


_EST_CUM_PROB_ORACLE = _HIST_CTE + """
, cum AS (
  SELECT event_type, attr, bucket,
         sum(prob) OVER (PARTITION BY event_type, attr ORDER BY bucket
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_prob
  FROM hist
)
SELECT e.event_id, e.event_type, e.value,
       round(CASE WHEN c.cum_prob < 0.5 THEN 1.0 - c.cum_prob ELSE c.cum_prob END, 6) AS score,
       CASE WHEN (CASE WHEN c.cum_prob < 0.5 THEN 1.0 - c.cum_prob ELSE c.cum_prob END) > 0.95
            THEN 'O' ELSE 'N' END AS label
FROM events e LEFT JOIN cum c
  ON e.event_type = c.event_type AND CAST(floor(e.value / 10.0) AS BIGINT) = c.bucket
"""


@register("est_cum_prob", _EST_CUM_PROB_ORACLE)
def q_est_cum_prob(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hist = histogram.attr_histogram(ev, ["event_type"], ["value"], [10.0])
    out = histogram.est_cum_prob_score(
        ev, hist, ["event_type"], ["value"], [10.0], threshold=0.95
    )
    return _round(out.select("event_id", "event_type", "value", "score", "label"), ["score"])


# multivariate histogram + K4 on lineitem
_MV_SPEC_SQL = "concat_ws(':', l_linestatus, CAST(CAST(floor(l_quantity / 10.0) AS BIGINT) AS VARCHAR), CAST(CAST(floor(l_extendedprice / 10000.0) AS BIGINT) AS VARCHAR))"

_MV_HIST_CTE = f"""
WITH b AS (
  SELECT l_returnflag, {_MV_SPEC_SQL} AS bucket FROM lineitem
), hcnt AS (
  SELECT l_returnflag, bucket, count(*) AS cnt FROM b GROUP BY l_returnflag, bucket
), hist AS (
  SELECT l_returnflag, bucket, cnt,
         cnt * 1.0 / sum(cnt) OVER (PARTITION BY l_returnflag) AS rel_freq
  FROM hcnt
)
"""

_MV_HIST_ORACLE = _MV_HIST_CTE + """
SELECT l_returnflag, bucket, cnt, round(rel_freq, 6) AS rel_freq FROM hist
"""

_MV_SPEC = [("l_linestatus", None), ("l_quantity", 10.0), ("l_extendedprice", 10000.0)]


@register("multivariate_histogram", _MV_HIST_ORACLE)
def q_multivariate_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    out = histogram.multivariate_histogram(li, ["l_returnflag"], _MV_SPEC)
    return _round(out, ["rel_freq"])


_MV_MEMBERS_ORACLE = f"""
WITH b AS (
  SELECT l_returnflag, {_MV_SPEC_SQL} AS bucket,
         concat_ws('-', CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR),
                   CAST(l_partkey AS VARCHAR), CAST(l_suppkey AS VARCHAR)) AS rid
  FROM lineitem
), hcnt AS (
  SELECT l_returnflag, bucket, count(*) AS cnt,
         string_agg(rid, ',' ORDER BY rid) AS member_ids
  FROM b GROUP BY l_returnflag, bucket
)
SELECT l_returnflag, bucket, cnt, member_ids,
       round(cnt * 1.0 / sum(cnt) OVER (PARTITION BY l_returnflag), 6) AS rel_freq
FROM hcnt
"""


@register("multivariate_histogram_members", _MV_MEMBERS_ORACLE)
def q_multivariate_histogram_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MR MultiVariateDistribution id-list output mode (the reference's
    member-emitting branch): each bucket also carries its sorted record-id
    list. The record id is the unique composite
    orderkey-linenumber-partkey-suppkey ((orderkey, linenumber) alone is
    not unique in the synthetic fixture)."""
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "_rid",
        F.concat_ws(
            "-", "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
        ),
    )
    out = histogram.multivariate_histogram(
        li, ["l_returnflag"], _MV_SPEC, member_id="_rid"
    )
    return _round(
        out.select("l_returnflag", "bucket", "cnt", "member_ids", "rel_freq"),
        ["rel_freq"],
    )


_EST_PROB_ORACLE = _MV_HIST_CTE + f"""
SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
       round(1.0 - coalesce(h.rel_freq, 0.0), 6) AS score,
       CASE WHEN 1.0 - coalesce(h.rel_freq, 0.0) > 0.999 THEN 'O' ELSE 'N' END AS label
FROM lineitem l LEFT JOIN hist h
  ON l.l_returnflag = h.l_returnflag AND {_MV_SPEC_SQL} = h.bucket
"""


@register("est_prob", _EST_PROB_ORACLE)
def q_est_prob(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    hist = histogram.multivariate_histogram(li, ["l_returnflag"], _MV_SPEC)
    out = histogram.est_prob_score(li, hist, ["l_returnflag"], _MV_SPEC, threshold=0.999)
    return _round(
        out.select("l_orderkey", "l_linenumber", "l_returnflag", "score", "label"),
        ["score"],
    )


_DIST_SORTER_ORACLE = _HIST_CTE + """
, ranked AS (
  SELECT event_type, attr, bucket, cnt,
         row_number() OVER (PARTITION BY event_type, attr ORDER BY cnt DESC, bucket ASC) AS rank
  FROM hist
)
SELECT event_type, attr, bucket, cnt, rank FROM ranked WHERE rank <= 10
"""


@register("distribution_sorter", _DIST_SORTER_ORACLE)
def q_distribution_sorter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hist = histogram.attr_histogram(ev, ["event_type"], ["value"], [10.0])
    out = histogram.sort_by_count(hist, ["event_type"], ascending=False, limit=10)
    return out.select("event_type", "attr", "bucket", "cnt", "rank")


_ENTROPY_SORTER_ORACLE = _HIST_CTE + """
SELECT event_type, attr, bucket, cnt, round(-prob * ln(prob), 6) AS entropy FROM hist
"""


@register("entropy_sorter", _ENTROPY_SORTER_ORACLE)
def q_entropy_sorter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hist = histogram.attr_histogram(ev, ["event_type"], ["value"], [10.0])
    out = histogram.entropy_sorted(hist, ["event_type"]).drop("rank", "prob")
    return _round(out, ["entropy"])


# ---------------------------------------------------------------- ranges

_RANGE_CTE = """
WITH r AS (
  SELECT event_type, quantile_cont(value, 0.05) AS lo, quantile_cont(value, 0.95) AS hi
  FROM events GROUP BY event_type
), d AS (
  SELECT e.event_id, e.event_type, e.value,
         CASE WHEN e.value > (r.lo + r.hi) / 2.0 THEN e.value - r.hi
              ELSE r.lo - e.value END AS delta
  FROM events e LEFT JOIN r USING (event_type)
)
"""

_OUT_RANGE_ORACLE = _RANGE_CTE + """
SELECT event_id, event_type, value,
       round(1.0 / (1.0 + exp(-0.1 * delta)), 6) AS score,
       CASE WHEN delta IS NULL THEN 'I'
            WHEN 1.0 / (1.0 + exp(-0.1 * delta)) > 0.7 THEN 'O' ELSE 'N' END AS label
FROM d
"""


@register("out_range", _OUT_RANGE_ORACLE)
def q_out_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    model = ranges.range_model_from_quantiles(ev, ["event_type"], ["value"], 0.05, 0.95)
    out = ranges.out_range_score(ev, model, ["event_type"], ["value"], exp_const=0.1, threshold=0.7)
    return _round(out.select("event_id", "event_type", "value", "score", "label"), ["score"])


_IN_RANGE_ORACLE = _RANGE_CTE + """
SELECT event_id, event_type, value,
       round(1.0 - 1.0 / (1.0 + exp(-0.1 * delta)), 6) AS score,
       CASE WHEN delta IS NULL THEN 'I'
            WHEN 1.0 - 1.0 / (1.0 + exp(-0.1 * delta)) > 0.9 THEN 'O' ELSE 'N' END AS label
FROM d
"""


@register("in_range", _IN_RANGE_ORACLE)
def q_in_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    model = ranges.range_model_from_quantiles(ev, ["event_type"], ["value"], 0.05, 0.95)
    out = ranges.in_range_score(ev, model, ["event_type"], ["value"], exp_const=0.1, threshold=0.9)
    return _round(out.select("event_id", "event_type", "value", "score", "label"), ["score"])


# multigram multivariate distribution: trigrams of composite bucket
# symbols over each user's event sequence
_MULTIGRAM_ORACLE = """
WITH b AS (
  SELECT user_id, ts, event_id,
         concat_ws(':', event_type,
                   CAST(CAST(floor(value / 5.0) AS BIGINT) AS VARCHAR)) AS sym
  FROM events
), s AS (
  SELECT user_id,
         lag(sym, 2) OVER w AS s0,
         lag(sym, 1) OVER w AS s1,
         sym AS s2
  FROM b WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), g AS (
  SELECT concat_ws('|', s0, s1, s2) AS gram FROM s WHERE s0 IS NOT NULL
)
SELECT gram, CAST(count(*) AS BIGINT) AS cnt,
       round(count(*) * 1.0 / sum(count(*)) OVER (), 6) AS rel_freq
FROM g GROUP BY gram
"""


@register("multigram_multivariate", _MULTIGRAM_ORACLE)
def q_multigram_multivariate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MR MultigramMultiVariateDistribution analogue: per-user event
    sequences (ordered by ts with event_id as the total-order tiebreak)
    bucketize each row to a composite (event_type, floor(value/5))
    symbol; every 3 consecutive symbols form one gram; output is the
    corpus-wide gram distribution (cnt + rel_freq). The last reference
    operator without an analogue — dead code there (nothing invokes
    it), registered here for inventory completeness."""
    ev = load_table(spark, sf_dir, "events")
    out = histogram.multigram_multivariate(
        ev,
        id_col="user_id",
        order_col="ts",
        spec=[("event_type", None), ("value", 5.0)],
        seq_len=3,
        order_cols=["event_id"],
    )
    return _round(out, ["rel_freq"])

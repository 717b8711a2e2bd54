"""Registry entries: multivariate + numpy sequence families. Mahalanobis is
fully oracle-verified (closed-form 2x2 inverse); the SVD/k-means/forest/FFT
operators are deterministic (seeded) but not SQL-expressible -> rows-only."""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import multivariate, sequence
from ..sources import load_table
from .queries_stats import _round
from .registry import register

_MAHAL_ORACLE = """
WITH m AS (
  SELECT l_returnflag,
         avg(l_quantity) AS mq, avg(l_extendedprice) AS mp,
         covar_samp(l_quantity, l_quantity) AS a,
         covar_samp(l_extendedprice, l_extendedprice) AS b,
         covar_samp(l_quantity, l_extendedprice) AS c
  FROM lineitem GROUP BY l_returnflag
), s AS (
  SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
         (l.l_quantity - m.mq) AS dx, (l.l_extendedprice - m.mp) AS dy,
         m.a, m.b, m.c, (m.a * m.b - m.c * m.c) AS det
  FROM lineitem l LEFT JOIN m USING (l_returnflag)
)
SELECT l_orderkey, l_linenumber, l_returnflag,
       round(CASE WHEN abs(det) > 0
                  THEN (b * dx * dx - 2 * c * dx * dy + a * dy * dy) / det END, 6) AS score,
       CASE WHEN det IS NULL OR abs(det) <= 0 THEN 'I'
            WHEN (b * dx * dx - 2 * c * dx * dy + a * dy * dy) / det > 9.0 THEN 'O'
            ELSE 'N' END AS label
FROM s
"""


@register("mahalanobis", _MAHAL_ORACLE)
def q_mahalanobis(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    model = multivariate.mahalanobis_model(
        li, ["l_returnflag"], ["l_quantity", "l_extendedprice"]
    )
    out = multivariate.mahalanobis_score(
        li, model, ["l_returnflag"], ["l_quantity", "l_extendedprice"], threshold=9.0
    )
    return _round(
        out.select("l_orderkey", "l_linenumber", "l_returnflag", "score", "label"),
        ["score"],
    )


@register("pca_reconstruction", None)
def q_pca_reconstruction(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    model = multivariate.pca_model(
        li, ["l_returnflag"], ["l_quantity", "l_extendedprice", "l_discount"],
        n_components=1,
    )
    out = multivariate.pca_score(
        li, model, ["l_returnflag"], ["l_quantity", "l_extendedprice", "l_discount"],
        n_components=1, threshold=3.0,
    )
    return _round(
        out.select("l_orderkey", "l_linenumber", "l_returnflag", "score", "label"),
        ["score"],
    )


@register("kmeans_cluster_score", None)
def q_kmeans_cluster_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity", "l_extendedprice"
    )
    model = multivariate.kmeans_model(
        li, ["l_returnflag"], ["l_quantity", "l_extendedprice"], n_clusters=4, seed=42
    )
    out = multivariate.kmeans_score(
        li, model, ["l_returnflag"], ["l_quantity", "l_extendedprice"], threshold=10000.0
    )
    return _round(
        out.select("l_orderkey", "l_linenumber", "l_returnflag", "score", "label"),
        ["score"],
    )


@register("isolation_forest", None)
def q_isolation_forest(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    values = ["l_quantity", "l_extendedprice", "l_discount"]
    model = multivariate.isolation_forest_fit(
        li, ["l_returnflag"], values, num_trees=50, subsample=128, seed=42
    )
    out = multivariate.isolation_forest_score(
        li, model, ["l_returnflag"], values, threshold=0.6
    )
    return _round(
        out.select("l_orderkey", "l_linenumber", "l_returnflag", "score", "label"),
        ["score"],
    )


@register("spectral_residual", None)
def q_spectral_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = sequence.spectral_residual(ev, ["event_type"], "ts", "value", threshold=3.0)
    return _round(out.select("event_id", "event_type", "sr_score", "label"), ["sr_score"])


@register("one_step_ahead", None)
def q_one_step_ahead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = sequence.one_step_ahead(
        ev, ["event_type"], "ts", "value", window=8, method="average", threshold=3.0
    )
    return _round(
        out.select("event_id", "event_type", "predicted", "osa_score", "label"),
        ["predicted", "osa_score"],
    )


@register("subsequence_distance", None)
def q_subsequence_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = sequence.subsequence_distance(
        ev, ["event_type"], "ts", "value", window=16, parallelism=8
    )
    return _round(
        out.select("event_type", "offset", "discord_score"), ["discord_score"]
    )


@register("change_point", None)
def q_change_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = sequence.change_point(
        ev, ["event_type"], "ts", "value", window=64, step=8, stat="ks"
    )
    return _round(
        out.select("event_type", F.unix_timestamp("center_ts").alias("center_epoch"), "stat"),
        ["stat"],
    )

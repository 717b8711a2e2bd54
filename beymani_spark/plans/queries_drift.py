"""Registry entries: drift detectors, neighbor density, multimodal plumbing.

Drift input: per-event_type 0/1 error stream derived deterministically from
events (error = value above the key's exact p90). The detectors are
sequential-stateful scans -> rows-only checks; neighbor_density is
oracle-verified."""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import knn, multimodal
from ..sources import load_table
from ..streaming import drift as drift_mod
from .queries_knn import _pairs
from .queries_stats import _round
from .registry import register


def _error_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    thr = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.9)).alias("_p90")
    )
    return ev.join(F.broadcast(thr), "event_type").select(
        "event_type",
        "event_id",
        "ts",
        (F.col("value") > F.col("_p90")).cast("int").alias("is_error"),
    )


def _drift_query(detector: str, **params):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        errs = _error_stream(spark, sf_dir)
        out = drift_mod.drift_detect(
            errs, ["event_type"], "ts", "is_error", detector, **params
        )
        diag = {"ddm": ["pr", "sd"], "eddm": ["cur"], "fhddm": ["acc"], "ecdd": ["z"]}[
            detector
        ]
        out = _round(
            out.select("event_type", "event_id", "is_error", *diag, "drift"), diag
        )
        # numpy kernels emit NaN for pre-warmup rows; normalize to NULL so the
        # value hash matches SQL oracles
        for c in diag:
            out = out.withColumn(
                c, F.when(F.isnan(F.col(c)), F.lit(None)).otherwise(F.col(c))
            )
        return out

    return q


_DDM_ORACLE = """
WITH thr AS (
  SELECT event_type, quantile_cont(value, 0.9) AS p90 FROM events GROUP BY event_type
), err AS (
  SELECT e.event_type, e.event_id, e.ts,
         CASE WHEN e.value > t.p90 THEN 1 ELSE 0 END AS is_error
  FROM events e JOIN thr t USING (event_type)
), c AS (
  SELECT *,
         sum(is_error) OVER (PARTITION BY event_type ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ec,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn
  FROM err
), p AS (
  SELECT *, ec * 1.0 / rn AS pr,
         sqrt((ec * 1.0 / rn) * (1 - ec * 1.0 / rn) / rn) AS sd
  FROM c
), m AS (
  SELECT *,
         arg_min(struct_pack(pr := pr, sd := sd),
                 CASE WHEN rn >= 50 THEN pr + sd END)
           OVER (PARTITION BY event_type ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mn
  FROM p
)
SELECT event_type, event_id, is_error,
       round(CASE WHEN rn > 50 THEN pr END, 6) AS pr,
       round(CASE WHEN rn > 50 THEN sd END, 6) AS sd,
       CASE WHEN rn > 50 AND (pr + sd) > (mn.pr + 3.0 * mn.sd) THEN 1 ELSE 0 END AS drift
FROM m
"""

register("drift_ddm", _DDM_ORACLE)(_drift_query("ddm", threshold=3.0, warmup=50))
register("drift_eddm", None)(_drift_query("eddm", threshold=0.7, warmup=50))
register("drift_fhddm", None)(_drift_query("fhddm", conf_level=1e-6, win_size=100))
register("drift_ecdd", None)(_drift_query("ecdd", threshold=4.0, expf=0.1, warmup=50))


_NEIGHBOR_DENSITY_ORACLE = """
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
), pairs AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         sqrt(list_sum(list_transform(list_zip(a.vec, b.vec),
                                      p -> (p[1] - p[2]) * (p[1] - p[2])))) AS dist
  FROM v a JOIN v b ON a.vec_id <> b.vec_id
), nn AS (
  SELECT src, dst, dist,
         row_number() OVER (PARTITION BY src ORDER BY dist ASC, dst ASC) AS nn_rank
  FROM pairs
), topk AS (
  SELECT src, dst, dist FROM nn WHERE nn_rank <= 5
), dens AS (
  SELECT src AS dst, 1000.0 / avg(dist) AS dst_density FROM topk GROUP BY src
)
SELECT t.src, t.dst, round(d.dst_density, 6) AS dst_density
FROM topk t JOIN dens d USING (dst)
"""


@register("neighbor_density", _NEIGHBOR_DENSITY_ORACLE)
def q_neighbor_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = knn.neighbor_density(_pairs(spark, sf_dir), k=5, scale=1000.0)
    return _round(out, ["dst_density"])


@register("media_features", None)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing over driver data: documents' text bytes stand in
    for opaque media payloads; stubbed deterministic decode."""
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.col("text").cast("binary").alias("payload"),
    )
    out = multimodal.decode_features(media, decode="fake", n_features=16)
    return out.select(
        "media_id", "n_bytes", F.round(F.element_at("features", 1), 6).alias("f0"),
        F.round(F.element_at("features", 8), 6).alias("f7"),
    )

"""Similarity search over an embedding column (north-star surface):
brute-force cosine top-k as the exact/oracle baseline, LSH-bucketed ANN as
the scale path.

Scale posture: brute force is O(Q·N) with Q small query sets — fine when Q is
bounded; the ann_lsh_topk path buckets by random-hyperplane signature so each
query only scans its bucket (plus optionally neighboring buckets via reduced
signature width). Both keep all arithmetic in JVM array expressions.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def with_norm(df: DataFrame, vec_col: str) -> DataFrame:
    v = _as_double(F.col(vec_col))
    return df.withColumn("_vec", v).withColumn("_norm", F.sqrt(_dot(F.col("_vec"), F.col("_vec"))))


def cosine_topk(
    df: DataFrame,
    query_df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector: (query_id,
    neighbor_id, cosine, knn_rank). Excludes self-matches; ties broken by
    neighbor id."""
    base = with_norm(df, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("_vec").alias("_vb"), F.col("_norm").alias("_nb")
    )
    q = with_norm(query_df, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("_vec").alias("_vq"), F.col("_norm").alias("_nq")
    )
    joined = F.broadcast(q).crossJoin(base).filter(F.col("query_id") != F.col("neighbor_id"))
    cos = _dot(F.col("_vq"), F.col("_vb")) / (F.col("_nq") * F.col("_nb"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        joined.withColumn("cosine", cos)
        .withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "knn_rank")
    )


def cosine_dup_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.9
) -> DataFrame:
    """All pairs with cosine >= threshold (embedding near-dup).

    Vectorized like knn.pair_distances_np: reference matrix broadcast, each
    partition computes its rows against it with numpy; only the (sparse)
    above-threshold pairs are emitted."""
    import numpy as np
    import pandas as pd

    df = df.select(id_col, vec_col)  # prune before mapInPandas reads full rows
    ref = df.toPandas()
    ref_ids = ref[id_col].to_numpy()
    ref_mat = np.array([np.asarray(v, dtype=float) for v in ref[vec_col]])
    bc = df.sparkSession.sparkContext.broadcast((ref_ids, ref_mat))

    def gen(batches):
        ids, mat = bc.value
        norms = np.sqrt((mat**2).sum(axis=1))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            src_ids = pdf[id_col].to_numpy()
            src = np.array([np.asarray(v, dtype=float) for v in pdf[vec_col]])
            for i in range(len(src)):
                # mirror the SQL formula term-for-term: dot / (norm_a * norm_b)
                dots = (src[i] * mat).sum(axis=1)
                na = np.sqrt((src[i] ** 2).sum())
                cos = dots / (na * norms)
                mask = (ids > src_ids[i]) & (cos >= threshold)
                if mask.any():
                    yield pd.DataFrame(
                        {"src": src_ids[i], "dst": ids[mask], "cosine": cos[mask]}
                    )

    return df.mapInPandas(gen, "src long, dst long, cosine double")


def ann_lsh_topk(
    df: DataFrame,
    query_df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_planes: int = 6,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: random-hyperplane signature buckets; each query is
    compared only against vectors sharing its bucket. Recall < 1 by design;
    raise recall by lowering n_planes or probing neighboring buckets."""
    import random

    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    rng = random.Random(seed)
    planes = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_planes)]

    def sig(vec: Column) -> Column:
        return F.concat_ws(
            "",
            *[
                F.when(
                    F.aggregate(
                        F.zip_with(
                            vec,
                            F.array(*[F.lit(w) for w in p]),
                            lambda x, w: x.cast("double") * w,
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )
                    >= 0,
                    F.lit("1"),
                ).otherwise(F.lit("0"))
                for p in planes
            ],
        )

    base = with_norm(df, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("_vec").alias("_vb"),
        F.col("_norm").alias("_nb"),
        sig(F.col(vec_col)).alias("_bucket"),
    )
    q = with_norm(query_df, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("_vec").alias("_vq"),
        F.col("_norm").alias("_nq"),
        sig(F.col(vec_col)).alias("_bucket"),
    )
    joined = q.join(base, "_bucket").filter(F.col("query_id") != F.col("neighbor_id"))
    cos = _dot(F.col("_vq"), F.col("_vb")) / (F.col("_nq") * F.col("_nb"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        joined.withColumn("cosine", cos)
        .withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "knn_rank")
    )

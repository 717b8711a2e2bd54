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


def add_lsh_bucket(
    df: DataFrame,
    vec_col: str,
    planes: list[list[float]],
    out_col: str = "_bucket",
) -> DataFrame:
    """Random-hyperplane signature as a numpy mapInPandas matmul: one
    (batch x dim) @ (dim x planes) product per Arrow batch instead of
    n_planes interpreted zip_with/aggregate folds per row (BASELINE.md
    measured the fold path ~6x slower). Output = input + bit-string
    ``out_col``."""
    import numpy as np
    from pyspark.sql.types import StructType

    p_t = [list(col) for col in zip(*planes)]  # (dim, n_planes)
    schema = StructType(list(df.schema.fields)).add(out_col, "string")

    def gen(batches):
        import numpy as np  # re-import for the serialized closure

        p = np.asarray(p_t, dtype=np.float64)

        def run(pdf):
            if not len(pdf):
                out = pdf.copy()
                out[out_col] = []
                return out
            v = np.stack([np.asarray(x, dtype=np.float64) for x in pdf[vec_col]])
            bits = np.where(v @ p >= 0, "1", "0")
            out = pdf.copy()
            out[out_col] = ["".join(r) for r in bits]
            return out

        for pdf in batches:
            yield run(pdf)

    return df.mapInPandas(gen, schema)


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
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    tiles: int | None = None,
    target_block: int = 4096,
) -> DataFrame:
    """All pairs with cosine >= threshold (embedding near-dup).

    Runs on knn.blocked_vec_pairs — tiled cogroup blocks, numpy per block, no
    driver collect, bounded task memory — emitting only the (sparse)
    above-threshold upper-triangle pairs."""
    import numpy as np
    import pandas as pd

    from .knn import blocked_vec_pairs

    def kernel(src_ids, src_mat, ref_ids, ref_mat):
        norms = np.sqrt((ref_mat**2).sum(axis=1))
        frames = []
        for i in range(len(src_mat)):
            # mirror the SQL formula term-for-term: dot / (norm_a * norm_b)
            dots = (src_mat[i] * ref_mat).sum(axis=1)
            na = np.sqrt((src_mat[i] ** 2).sum())
            cos = dots / (na * norms)
            mask = (ref_ids > src_ids[i]) & (cos >= threshold)
            if mask.any():
                frames.append(
                    pd.DataFrame(
                        {"src": src_ids[i], "dst": ref_ids[mask], "cosine": cos[mask]}
                    )
                )
        if not frames:
            return pd.DataFrame({"src": [], "dst": [], "cosine": []})
        return pd.concat(frames, ignore_index=True)

    return blocked_vec_pairs(
        df, id_col, vec_col, kernel, "src long, dst long, cosine double",
        tiles=tiles, target_block=target_block,
    )


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

    base = add_lsh_bucket(with_norm(df, vec_col), vec_col, planes).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("_vec").alias("_vb"),
        F.col("_norm").alias("_nb"),
        "_bucket",
    )
    q = add_lsh_bucket(with_norm(query_df, vec_col), vec_col, planes).select(
        F.col(id_col).alias("query_id"),
        F.col("_vec").alias("_vq"),
        F.col("_norm").alias("_nq"),
        "_bucket",
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

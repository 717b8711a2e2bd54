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
    hamming: int = 0,
) -> DataFrame:
    """Random-hyperplane signature as a numpy mapInPandas matmul: one
    (batch x dim) @ (dim x planes) product per Arrow batch instead of
    n_planes interpreted zip_with/aggregate folds per row (BASELINE.md
    measured the fold path ~6x slower).

    ``hamming=0``: output = input + bit-string ``out_col``.
    ``hamming=1``: ``out_col`` is instead an array of the signature plus its
    n_planes one-bit flips — the multi-probe set. Explode it on the smaller
    side of a bucket join to pair every row whose true signatures differ by
    at most one bit (each qualifying pair matches exactly one probe, so the
    join stays duplicate-free)."""
    import numpy as np
    from pyspark.sql.types import ArrayType, StringType, StructType

    p_t = [list(col) for col in zip(*planes)]  # (dim, n_planes)
    n_planes = len(planes)
    typ = StringType() if hamming == 0 else ArrayType(StringType())
    schema = StructType(list(df.schema.fields)).add(out_col, typ)

    def gen(batches):
        import numpy as np  # re-import for the serialized closure

        p = np.asarray(p_t, dtype=np.float64)

        def run(pdf):
            out = pdf.copy()
            if not len(pdf):
                out[out_col] = []
                return out
            v = np.stack([np.asarray(x, dtype=np.float64) for x in pdf[vec_col]])
            bits = np.where(v @ p >= 0, "1", "0")
            sigs = ["".join(r) for r in bits]
            if hamming == 0:
                out[out_col] = sigs
            else:
                out[out_col] = [
                    [s] + [s[:i] + ("0" if s[i] == "1" else "1") + s[i + 1 :]
                           for i in range(n_planes)]
                    for s in sigs
                ]
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
    probe: int = 1,
) -> DataFrame:
    """Approximate top-k: random-hyperplane signature buckets; each query is
    compared only against vectors in its probed buckets. Recall < 1 by
    design. ``probe=1`` (default) multi-probes the query's bucket plus all
    one-bit-flip neighbors — measured recall@5 on the sf0.001 embeddings
    fixture (near-uniform vectors, the adversarial case for hyperplane
    LSH): single-probe 0.03 at 6 planes; Hamming-1 multi-probe 0.27 at 6
    planes, 0.59 at 4, 0.82 at 2 — (n_planes+1)x the candidate volume,
    fewer planes trade bucket size for recall (probed continuously in
    tests/test_lsh_recall.py). ``probe=0`` is the single-probe scale
    path."""
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
    q = add_lsh_bucket(
        with_norm(query_df, vec_col), vec_col, planes,
        out_col="_probes", hamming=min(int(probe), 1),
    )
    if probe:
        q = q.withColumn("_bucket", F.explode("_probes"))
    else:
        q = q.withColumn("_bucket", F.col("_probes"))
    q = q.select(
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

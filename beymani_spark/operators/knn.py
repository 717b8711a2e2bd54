"""Proximity / density family (SURVEY.md §2.1 #15, §2.3 M4-M6): pair
distances, kNN, average-distance, LOF — entirely as DataFrame joins + windows.

Reference semantics sources:
  pair distances  — upstream of the reference's proximity jobs (produced by
      sifarish SameTypeSimilarity, see resource/proximity_tutorial.txt:11-21);
      here a blocked self-join over a vector column.
  average_distance ≙ AverageDistance (/root/reference/src/main/java/org/
      beymani/proximity/AverageDistance.java:40-170): secondary-sorted top-k
      per entity -> avg distance and density (scale/avg)
  relative_density ≙ RelativeDensity (/root/reference/src/main/java/org/
      beymani/proximity/RelativeDensity.java:60-120): density(entity)*scale /
      Σ density(neighbors)
  lof ≙ LocalDensityBasedPredictor (/root/reference/spark/src/main/scala/org/
      beymani/spark/knn/LocalDensityBasedPredictor.scala:41-251): kNN :101-106,
      reachability distance :116-139, lrd :144-156, LOF :183-214

Scale posture: the brute-force pair builder is O(N²/key) and is the
*correctness* path (cap N per key); the scale path is lsh_pair_distances,
which buckets vectors with random hyperplane signatures so the self-join only
compares within buckets. kNN/kdist/lrd/LOF are window + broadcast-join stages
over the (much smaller) pair set — ~5 narrow shuffles, matching the
reference's stage count but spillable and AQE-planned.
"""
from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def euclidean(a, b):
    """Euclidean distance between two array<double> columns."""
    return F.sqrt(_sq_dist(a, b))


def pair_distances(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    keys: Sequence[str] = (),
    directed: bool = True,
) -> DataFrame:
    """All-pairs distances per key: (keys..., src, dst, dist), src != dst.

    Brute force — O(N²) per key; use lsh_pair_distances at scale.
    """
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = df.select(*keys, F.col(id_col).alias("_id"), vec_d.alias("_v"))
    a = base.select(*keys, F.col("_id").alias("src"), F.col("_v").alias("_va"))
    b = base.select(*keys, F.col("_id").alias("dst"), F.col("_v").alias("_vb"))
    cond = F.col("src") != F.col("dst") if directed else F.col("src") < F.col("dst")
    joined = a.join(b, list(keys)) if keys else a.crossJoin(b)
    return (
        joined.filter(cond)
        .withColumn("dist", euclidean(F.col("_va"), F.col("_vb")))
        .drop("_va", "_vb")
    )


def pair_distances_np(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int | None = None,
) -> DataFrame:
    """Vectorized pair distances: the (bounded) reference set is broadcast as
    a numpy matrix and each partition computes its rows' distances against it
    with vectorized arithmetic (mapInPandas). ~10-100x faster than the
    interpreted higher-order-function expression path for dense vectors;
    identical semantics. For unbounded reference sets use lsh_pair_distances.

    With ``k`` set, only each src's k nearest pairs are emitted (ties broken
    by dst, the same (dist, dst) order as ``knn``'s row_number window) — the
    downstream exchange shrinks from O(N^2) to O(N*k) rows, which is the
    difference between shuffling 25M and 25k rows at 5k vectors. The
    per-pair arithmetic is unchanged, so selected distances are bit-identical
    to the full-pair path.
    """
    import numpy as np
    import pandas as pd

    df = df.select(id_col, vec_col)  # prune before mapInPandas reads full rows
    ref = df.toPandas()
    ref_ids = ref[id_col].to_numpy()
    ref_mat = np.array([np.asarray(v, dtype=float) for v in ref[vec_col]])
    bc = df.sparkSession.sparkContext.broadcast((ref_ids, ref_mat))

    def gen(batches):
        ids, mat = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            src_ids = pdf[id_col].to_numpy()
            src = np.array([np.asarray(v, dtype=float) for v in pdf[vec_col]])
            srcs, dsts, dists = [], [], []
            for i in range(len(src)):
                d = np.sqrt(((src[i] - mat) ** 2).sum(axis=1))
                mask = ids != src_ids[i]
                dm, im = d[mask], ids[mask]
                if k is not None:
                    sel = np.lexsort((im, dm))[:k]
                    dm, im = dm[sel], im[sel]
                srcs.append(np.full(len(im), src_ids[i]))
                dsts.append(im)
                dists.append(dm)
            yield pd.DataFrame(
                {
                    "src": np.concatenate(srcs),
                    "dst": np.concatenate(dsts),
                    "dist": np.concatenate(dists),
                }
            )

    return df.mapInPandas(gen, "src long, dst long, dist double")


def lsh_pair_distances(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    keys: Sequence[str] = (),
    n_planes: int = 8,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Scale path: random-hyperplane LSH bucketing, exact distances within
    buckets only. Recall is approximate (neighbors split across buckets are
    missed); raise n_planes for smaller buckets, lower for higher recall.
    """
    import random

    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    rng = random.Random(seed)
    planes = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_planes)]
    sig = F.concat_ws(
        "",
        *[
            F.when(
                F.aggregate(
                    F.zip_with(
                        F.col(vec_col),
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
    bucketed = df.withColumn("_bucket", sig)
    return pair_distances(bucketed, id_col, vec_col, [*keys, "_bucket"]).drop("_bucket")


def knn(
    pairs: DataFrame, k: int, keys: Sequence[str] = ()
) -> DataFrame:
    """Top-k nearest neighbors per src (ties broken by dst for determinism)."""
    w = Window.partitionBy(*keys, "src").orderBy(F.col("dist").asc(), F.col("dst").asc())
    return pairs.withColumn("nn_rank", F.row_number().over(w)).filter(
        F.col("nn_rank") <= k
    )


def average_distance(
    pairs: DataFrame, k: int, keys: Sequence[str] = (), scale: float = 1000.0
) -> DataFrame:
    """M4: per-entity avg distance to its k nearest + density = scale/avg."""
    nn = knn(pairs, k, keys)
    out = nn.groupBy(*keys, "src").agg(F.avg("dist").alias("avg_dist"))
    return out.withColumn("density", F.lit(float(scale)) / F.col("avg_dist"))


def relative_density(
    pairs: DataFrame, k: int, keys: Sequence[str] = (), scale: float = 1000.0
) -> DataFrame:
    """M6: density(entity) * scale / Σ density(its k neighbors)."""
    dens = average_distance(pairs, k, keys, scale)
    nn = knn(pairs, k, keys).select(*keys, "src", "dst")
    nbr = nn.join(
        dens.select(*keys, F.col("src").alias("dst"), F.col("density").alias("_nd")),
        [*keys, "dst"],
    )
    nbr_sum = nbr.groupBy(*keys, "src").agg(F.sum("_nd").alias("_nbr_density"))
    return (
        dens.join(nbr_sum, [*keys, "src"])
        .withColumn(
            "rel_density", F.col("density") * F.lit(float(scale)) / F.col("_nbr_density")
        )
        .drop("_nbr_density")
    )


def neighbor_density(
    pairs: DataFrame, k: int, keys: Sequence[str] = (), scale: float = 1000.0
) -> DataFrame:
    """M5 NeighborDensity (/root/reference/src/main/java/org/beymani/
    proximity/NeighborDensity.java:40-130): each entity's density joined onto
    its neighbor-group membership rows -> (keys..., src, dst, dst_density).
    The reference does this with a map-side file tag + secondary sort; here a
    plain equi-join."""
    dens = average_distance(pairs, k, keys, scale).select(
        *keys, F.col("src").alias("dst"), F.col("density").alias("dst_density")
    )
    nn = knn(pairs, k, keys).select(*keys, "src", "dst")
    return nn.join(dens, [*keys, "dst"])


def lof(pairs: DataFrame, k: int, keys: Sequence[str] = ()) -> DataFrame:
    """Local Outlier Factor from a pair-distance set.

    kNN -> k-distance -> reach-dist(p,o) = max(dist(p,o), kdist(o)) ->
    lrd(p) = k / Σ reach-dist -> LOF(p) = avg(lrd(o)) / lrd(p).
    """
    nn = knn(pairs, k, keys).select(*keys, "src", "dst", "dist")
    kdist = nn.groupBy(*keys, "src").agg(F.max("dist").alias("kdist"))
    reach = nn.join(
        kdist.select(*keys, F.col("src").alias("dst"), F.col("kdist").alias("_kdist_o")),
        [*keys, "dst"],
    ).withColumn("reach_dist", F.greatest(F.col("dist"), F.col("_kdist_o")))
    lrd = reach.groupBy(*keys, "src").agg(
        (F.lit(float(k)) / F.sum("reach_dist")).alias("lrd")
    )
    nbr_lrd = nn.join(
        lrd.select(*keys, F.col("src").alias("dst"), F.col("lrd").alias("_lrd_o")),
        [*keys, "dst"],
    ).groupBy(*keys, "src").agg(F.avg("_lrd_o").alias("_avg_nbr_lrd"))
    return (
        lrd.join(nbr_lrd, [*keys, "src"])
        .withColumn("lof", F.col("_avg_nbr_lrd") / F.col("lrd"))
        .select(*keys, "src", "lrd", "lof")
    )

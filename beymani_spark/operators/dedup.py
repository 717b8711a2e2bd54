"""Deduplication operators for training-data pipelines (north-star surface):
exact hash dedup, n-gram Jaccard near-dup, MinHash+LSH, SimHash.

Scale posture:
- exact_duplicates: one groupBy on md5(text) — the canonical 100 TB dedup.
- jaccard_pairs: *exact* near-dup within token-length bands — the
  correctness/oracle path. O(B²) per band; band width bounds the blow-up.
- minhash_lsh_pairs: the scale path — shingle -> k minhashes -> banded
  signatures -> candidates via equi-join on (band, signature) -> exact
  Jaccard verification on candidates only. All joins are shuffle-hash on
  small keys; no cross join anywhere.
- simhash: 16-bit sign-summed token-hash sketch per doc; near-dup candidates
  share the sketch (hamming-0) or a rotated band.

MinHash/SimHash use Spark's xxhash64, which DuckDB cannot reproduce, so those
two are registered without oracle SQL (rows-only correctness check); the
banded-Jaccard and exact paths are fully oracle-verified.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens


def exact_duplicates(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Per-doc content hash + size of its duplicate group."""
    hashed = df.select(id_col, F.md5(F.col(text_col)).alias("content_hash"))
    counts = hashed.groupBy("content_hash").agg(F.count("*").alias("dup_count"))
    return hashed.join(counts, "content_hash").select(id_col, "content_hash", "dup_count")


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column."""
    t = tokens(text)
    size = F.size(t)
    grams = F.when(
        size >= n,
        F.transform(
            F.sequence(F.lit(1), size - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(t, (i + j).cast("int")) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    band_width: int = 20,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for doc pairs in the same token-length
    band: (src, dst, jaccard). Blocking: floor(n_tokens/band_width) equality —
    near-dups have near-equal lengths, so recall loss is at band boundaries
    only (documented approximation, identical on the oracle side)."""
    base = df.select(
        F.col(id_col).alias("_id"),
        shingles(F.col(text_col), n).alias("_sh"),
        (F.size(tokens(F.col(text_col))) / F.lit(band_width)).cast("long").alias("_band"),
    )
    a = base.select(
        F.col("_id").alias("src"), F.col("_sh").alias("_sa"), F.col("_band").alias("_band")
    )
    b = base.select(
        F.col("_id").alias("dst"), F.col("_sh").alias("_sb"), F.col("_band").alias("_band")
    )
    pairs = a.join(b, "_band").filter(F.col("src") < F.col("dst"))
    inter = F.size(F.array_intersect("_sa", "_sb"))
    union = F.size(F.array_distinct(F.concat("_sa", "_sb")))
    out = pairs.withColumn("jaccard", inter / union).filter(
        F.col("jaccard") >= min_jaccard
    )
    return out.select("src", "dst", "jaccard")


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 16,
    n: int = 3,
) -> DataFrame:
    """k minhashes per doc: minhash_i = min over shingles of xxhash64(sh, i)."""
    sh = shingles(F.col(text_col), n)

    def _mh(seed):
        return lambda s: F.xxhash64(s, F.lit(seed))

    cols = [
        F.array_min(F.transform(sh, _mh(i))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return df.select(F.col(id_col).alias("_id"), *cols)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """Scale-path near-dup: banded minhash candidates, verified with exact
    Jaccard. Output (src, dst, jaccard) with jaccard >= min_jaccard."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, n)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.hash(
                    *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
                ).alias("sig"),
            )
            for b in range(bands)
        ]
    )
    exploded = sigs.select("_id", F.explode(band_structs).alias("bs")).select(
        "_id", "bs.band", "bs.sig"
    )
    cand = (
        exploded.alias("a")
        .join(exploded.alias("b"), ["band", "sig"])
        .filter(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("src"), F.col("b._id").alias("dst"))
        .distinct()
    )
    sh = df.select(
        F.col(id_col).alias("_id"), shingles(F.col(text_col), n).alias("_sh")
    )
    verified = (
        cand.join(sh.select(F.col("_id").alias("src"), F.col("_sh").alias("_sa")), "src")
        .join(sh.select(F.col("_id").alias("dst"), F.col("_sh").alias("_sb")), "dst")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("_sa", "_sb"))
            / F.size(F.array_distinct(F.concat("_sa", "_sb"))),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )
    return verified.select("src", "dst", "jaccard")


def simhash(df: DataFrame, id_col: str, text_col: str = "text", bits: int = 16) -> DataFrame:
    """SimHash sketch: bit b of the sketch is the sign of Σ_tokens ±1 where
    the sign is bit b of xxhash64(token)."""
    t = F.array_distinct(tokens(F.col(text_col)))
    hashes = F.transform(t, lambda x: F.xxhash64(x))
    def _bit_sum(b):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bit_sums = [F.aggregate(hashes, F.lit(0), _bit_sum(b)) for b in range(bits)]
    sketch = None
    for b, s in enumerate(bit_sums):
        term = F.when(s > 0, F.lit(2**b)).otherwise(F.lit(0))
        sketch = term if sketch is None else sketch + term
    return df.select(F.col(id_col), sketch.cast("long").alias("simhash"))


def simhash_dup_pairs(
    df: DataFrame, id_col: str, text_col: str = "text", bits: int = 16, max_hamming: int = 2
) -> DataFrame:
    """Near-dup candidates by SimHash: join on identical sketch halves
    (any pair within max_hamming<=bits/2 shares at least one half), then
    filter by true hamming distance via bit_count(xor)."""
    sk = simhash(df, id_col, text_col, bits)
    half = bits // 2
    keyed = sk.select(
        F.col(id_col).alias("_id"),
        "simhash",
        (F.col("simhash") % F.lit(2**half)).alias("lo"),
        (F.col("simhash") / F.lit(2**half)).cast("long").alias("hi"),
    )
    cands = None
    for part in ("lo", "hi"):
        c = (
            keyed.alias("a")
            .join(keyed.alias("b"), part)
            .filter(F.col("a._id") < F.col("b._id"))
            .select(
                F.col("a._id").alias("src"),
                F.col("b._id").alias("dst"),
                F.col("a.simhash").alias("sh_a"),
                F.col("b.simhash").alias("sh_b"),
            )
        )
        cands = c if cands is None else cands.unionByName(c)
    return (
        cands.distinct()
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("src", "dst", "hamming")
    )

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

Hashing: both sketch families take ``hash_fn``:
- ``"md5"`` (registry default): hashes derive from Spark's md5() hex string,
  which DuckDB computes identically, so MinHash-LSH and SimHash are fully
  DuckDB-oracle-verifiable (hash parity, not just rows). MinHash takes the
  lexicographic min over md5 hex strings; SimHash extracts 32 bits from the
  md5 prefix. md5 is a JVM codegen built-in, so the scale posture is
  unchanged (one digest per shingle/token occurrence).
- ``"xxhash64"``: cheaper digests for petabyte-scale runs where oracle
  reproducibility is not needed.
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
    only (documented approximation, identical on the oracle side).

    Count-based explode-join: |A∩B| from an equi-join on (band, shingle) with
    partial-aggregated counts; join volume is Σ_shingle freq². Everything is
    row-based and codegen (see exploded_shingles); the shingle table is
    persisted because three plan branches consume it."""
    sh = exploded_shingles(df, id_col, text_col, n)
    bands = df.repartition(F.col(id_col)).select(
        F.col(id_col).alias("_id"),
        (F.size(tokens(F.col(text_col))) / F.lit(band_width)).cast("long").alias("_band"),
    )
    ex = sh.join(bands, "_id").persist()
    sizes = ex.groupBy("_id", "_band").agg(F.count("*").alias("_n"))
    inter = (
        ex.alias("a")
        .join(
            ex.alias("b"),
            (F.col("a._band") == F.col("b._band"))
            & (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .groupBy(F.col("a._id").alias("src"), F.col("b._id").alias("dst"))
        .agg(F.count("*").alias("_inter"))
    )
    return (
        inter.join(
            sizes.select(F.col("_id").alias("src"), F.col("_n").alias("_na")), "src"
        )
        .join(
            sizes.select(F.col("_id").alias("dst"), F.col("_n").alias("_nb")), "dst"
        )
        .withColumn(
            "jaccard",
            F.col("_inter") / (F.col("_na") + F.col("_nb") - F.col("_inter")),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("src", "dst", "jaccard")
    )


def exploded_shingles(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(_id, sh) — one row per distinct shingle per doc.

    Row-based n-gram assembly: posexplode the tokens once (the generator
    evaluates the split a single time per row, unlike array expressions whose
    token subexpression gets re-inlined into every element access), then
    stitch n-grams with lead() windows — every step whole-stage codegen.
    The repartition spreads work when the source has few input splits and
    doubles as the window's partitioning exchange."""
    from pyspark.sql import Window

    tok = df.repartition(F.col(id_col)).select(
        F.col(id_col).alias("_id"),
        F.posexplode(tokens(F.col(text_col))).alias("_pos", "_tok"),
    )
    w = Window.partitionBy("_id").orderBy("_pos")
    parts = [F.col("_tok")] + [F.lead("_tok", i).over(w) for i in range(1, n)]
    sh = tok.select(
        "_id",
        F.concat_ws(" ", *parts).alias("sh"),
        F.lead("_tok", n - 1).over(w).isNotNull().alias("_full"),
    )
    return sh.filter("_full").drop("_full").distinct()


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 16,
    n: int = 3,
    hash_fn: str = "md5",
) -> DataFrame:
    """k minhashes per doc: minhash_i = min over shingles of hash_i(sh),
    where hash_i is md5(f"{i}:{sh}") (hex string, lexicographic min — DuckDB
    reproducible) or xxhash64(sh, i) (bigint min).

    One explode + one partial-aggregated groupBy — k codegen'd hash/min
    aggregates in a single pass."""
    ex = exploded_shingles(df, id_col, text_col, n)
    if hash_fn == "md5":
        hashes = [
            F.md5(F.concat_ws(":", F.lit(str(i)), F.col("sh"))) for i in range(num_hashes)
        ]
    else:
        hashes = [F.xxhash64("sh", F.lit(i)) for i in range(num_hashes)]
    return ex.groupBy("_id").agg(
        *[F.min(h).alias(f"mh_{i}") for i, h in enumerate(hashes)]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    min_jaccard: float = 0.5,
    hash_fn: str = "md5",
) -> DataFrame:
    """Scale-path near-dup: banded minhash candidates, verified with exact
    Jaccard. Output (src, dst, jaccard) with jaccard >= min_jaccard.

    The shingle explode is deliberately computed twice (signature aggregation
    + verification) rather than persisted: it is a fully-codegen pipeline
    with partial aggregation, and caching the exploded shingle rows measured
    ~15% SLOWER end-to-end at sf0.1 (cache write + lost pipelining outweigh
    the recompute; at scale the cache also costs executor memory the
    verification join wants)."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, n, hash_fn)

    def band_sig(b: int) -> Column:
        cols = [F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        if hash_fn == "md5":
            return F.md5(F.concat_ws("|", *cols))
        return F.hash(*cols).cast("string")

    band_structs = F.array(
        *[
            F.struct(F.lit(b).alias("band"), band_sig(b).alias("sig"))
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
    sh = exploded_shingles(df, id_col, text_col, n).persist()
    sizes = sh.groupBy("_id").agg(F.count("*").alias("_n"))
    inter = (
        cand.join(sh.select(F.col("_id").alias("src"), "sh"), "src")
        .join(sh.select(F.col("_id").alias("dst"), "sh"), ["dst", "sh"])
        .groupBy("src", "dst")
        .agg(F.count("*").alias("_inter"))
    )
    verified = (
        cand.join(inter, ["src", "dst"], "left")
        .join(sizes.select(F.col("_id").alias("src"), F.col("_n").alias("_na")), "src")
        .join(sizes.select(F.col("_id").alias("dst"), F.col("_n").alias("_nb")), "dst")
        .withColumn(
            "jaccard",
            F.coalesce(F.col("_inter"), F.lit(0))
            / (F.col("_na") + F.col("_nb") - F.coalesce(F.col("_inter"), F.lit(0))),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )
    return verified.select("src", "dst", "jaccard")


def dedup_clusters(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Group near-dup pairs into connected components and assign every doc a
    canonical representative: (id_col, cluster_rep, cluster_size), where
    cluster_rep is the minimum id reachable through the pair graph (docs in
    no pair are singletons representing themselves).

    Distributed min-label propagation with pointer jumping: each round every
    node takes min(own label, neighbor labels) and then compresses one level
    through the label mapping, so chains collapse in O(log diameter) rounds
    instead of O(diameter). Each round costs one shuffle on |E| (neighbor
    min) plus one on |V| (jump) — no driver-side graph state, so it holds at
    100 TB where |E| is the (sparse) LSH-verified pair set. Near-dup
    clusters are near-cliques, so 1-2 rounds typically converge; max_iter
    bounds adversarial chains. Convergence is checked with a changed-label
    count per round (one action each, on the small labels frame)."""
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    labels = edges.select("a").distinct().select("a", F.col("a").alias("lbl")).persist()
    labels.count()  # materialize before the loop rewrites the plan
    for _ in range(max_iter):
        nbr = (
            edges.join(
                labels.select(F.col("a").alias("b"), F.col("lbl").alias("_nlbl")), "b"
            )
            .groupBy("a")
            .agg(F.min("_nlbl").alias("_nmin"))
        )
        cand = labels.join(nbr, "a", "left").select(
            "a", F.least("lbl", F.coalesce("_nmin", "lbl")).alias("lbl")
        )
        mapping = labels.select(F.col("a").alias("_mfrom"), F.col("lbl").alias("_mto"))
        new = (
            cand.join(mapping, cand["lbl"] == mapping["_mfrom"], "left")
            .select("a", F.least(cand["lbl"], F.coalesce("_mto", cand["lbl"])).alias("lbl"))
            .persist()
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "a")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        labels.unpersist()
        labels = new
        if changed == 0:
            break
    from pyspark.sql import Window

    comp = labels.select(F.col("a").alias("_cid"), F.col("lbl").alias("_rep"))
    out = (
        df.select(F.col(id_col))
        .join(comp, F.col(id_col) == F.col("_cid"), "left")
        .select(
            id_col, F.coalesce(F.col("_rep"), F.col(id_col)).alias("cluster_rep")
        )
        .withColumn(
            "cluster_size", F.count("*").over(Window.partitionBy("cluster_rep"))
        )
    )
    edges.unpersist()
    return out


def dedup_corpus(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Keep-one-per-cluster corpus: the input rows whose id is its cluster's
    representative (min id). The anti-join complement of dedup_clusters —
    this is the operator a training pipeline runs to materialize the deduped
    dataset."""
    clusters = dedup_clusters(df, id_col, pairs, src, dst)
    keep = clusters.filter(F.col(id_col) == F.col("cluster_rep")).select(id_col)
    return df.join(keep, id_col)


def simhash(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    bits: int = 16,
    hash_fn: str = "md5",
) -> DataFrame:
    """SimHash sketch: bit b of the sketch is the sign of Σ_tokens ±1 where
    the sign is bit b of hash(token). ``hash_fn="md5"`` takes the token hash
    from the first 8 hex chars of md5 (a 32-bit value DuckDB reproduces
    bit-for-bit; requires bits <= 32); ``"xxhash64"`` is the cheap-digest
    path."""
    if hash_fn == "md5":
        if bits > 32:
            raise ValueError("md5-mode simhash supports at most 32 bits")
        token_hash = F.conv(F.substring(F.md5("_tok"), 1, 8), 16, 10).cast("long")
    else:
        token_hash = F.xxhash64("_tok")
    ex = df.select(
        F.col(id_col).alias("_sid"),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("_tok"),
    ).withColumn("_h", token_hash)
    bit_aggs = [
        F.sum(
            F.when(F.shiftright(F.col("_h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"_bit_{b}")
        for b in range(bits)
    ]
    sums = ex.groupBy("_sid").agg(*bit_aggs)
    sketch = None
    for b in range(bits):
        term = F.when(F.col(f"_bit_{b}") > 0, F.lit(2**b)).otherwise(F.lit(0))
        sketch = term if sketch is None else sketch + term
    return sums.select(F.col("_sid").alias(id_col), sketch.cast("long").alias("simhash"))


def simhash_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    bits: int = 16,
    max_hamming: int = 2,
    hash_fn: str = "md5",
) -> DataFrame:
    """Near-dup pairs by SimHash with exact Hamming-LSH banding: the sketch
    is split into max_hamming+1 bands, so a pair within max_hamming differing
    bits leaves at least one band identical (pigeonhole) — the
    (band_idx, band_value) equi-join has FULL recall, and bit_count(xor)
    verifies the true hamming distance. One exploded self-join replaces a
    per-band join union; the N-row sketch is persisted so the token explode
    + bit aggregation runs once, not once per join side."""
    n_bands = max_hamming + 1
    band_w = max(1, bits // n_bands)
    sk = simhash(df, id_col, text_col, bits, hash_fn).persist()
    bands = []
    for i in range(n_bands):
        shifted = F.shiftright(F.col("simhash"), i * band_w)
        if i < n_bands - 1:
            shifted = shifted.bitwiseAND(F.lit(2**band_w - 1))
        bands.append(shifted.cast("long"))
    keyed = sk.select(
        F.col(id_col).alias("_id"),
        "simhash",
        F.posexplode(F.array(*bands)),  # -> pos (band idx), col (band value)
    )
    return (
        keyed.alias("a")
        .join(keyed.alias("b"), ["pos", "col"])
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("src"),
            F.col("b._id").alias("dst"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("src", "dst", "hamming")
    )

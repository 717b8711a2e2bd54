"""Fuzzy entity linkage: edit-distance name matching without a cross join.

The record-linkage primitive a catalog/MDM pipeline needs ("which part
names are typos of each other", "which vendor strings are the same
entity"). The reference's distance machinery is record-level
(``similarity/RecordSimilarity`` in its ETL sibling); here the design is
dictionary-first, which is what survives 100 TB: names repeat enormously
(a billion rows, tens of thousands of DISTINCT names), so matching runs on
the distinct-name dictionary and row volume never enters the pair space.

Candidate generation is the deletion-neighborhood scheme (SymSpell): if
``ed(a, b) <= d`` then deleting at most ``d`` characters from each reaches
a common variant, so exploding every distinct name into its
C(len, <=d) deletion variants and equi-joining on the variant hash is a
LOSSLESS blocker for Levenshtein distance d — no length-band or q-gram
threshold edge cases. Candidates then verify with one exact
``levenshtein()`` call. Variant counts are combinatorial in d (len+1 for
d=1, +C(len,2) for d=2), so d is capped at 2 — beyond that, edit-distance
linkage stops meaning "typo" anyway.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _deletion_variants(col: F.Column, max_dist: int) -> F.Column:
    """Array of all strings reachable from ``col`` by deleting 0..max_dist
    characters (duplicates removed). Pure higher-order functions — stays
    in codegen, no UDF."""
    s = col

    def _del_each(v: F.Column) -> F.Column:
        return F.transform(
            F.sequence(F.lit(1), F.length(v)),
            lambda i: F.concat(v.substr(F.lit(1), i - 1), v.substr(i + 1, F.length(v))),
        )

    del1 = _del_each(s)
    variants = F.concat(F.array(s), del1)
    if max_dist >= 2:
        variants = F.concat(variants, F.flatten(F.transform(del1, _del_each)))
    return F.array_distinct(variants)


def fuzzy_name_match(
    df: DataFrame,
    name_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """Self-match a frame's name dictionary: one row per unordered pair of
    DISTINCT values of ``name_col`` within Levenshtein distance
    ``max_dist`` — (name_a < name_b, dist, n_a, n_b) where n_* are the
    names' row occurrence counts (so downstream can rank "typo clusters"
    by mass).

    Scale shape: one partial-agg groupBy collapses rows to the distinct
    dictionary with counts; variants explode only the DICTIONARY
    (|names| x ~len^d rows); candidates come from one equi-join on the
    xxhash64 of the variant (hashed-key convention — no wide-string
    shuffle); exact levenshtein verifies candidates only. Row count never
    enters the pair space, and there is no cross join at any stage."""
    if max_dist not in (1, 2):
        raise ValueError("max_dist must be 1 or 2")
    names = (
        df.filter(F.col(name_col).isNotNull() & (F.length(name_col) > 0))
        .groupBy(F.col(name_col).alias("_name"))
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    ex = names.select(
        "_name",
        "_n",
        F.explode(_deletion_variants(F.col("_name"), max_dist)).alias("_v"),
    ).select("_name", "_n", F.xxhash64("_v").alias("_h"))
    a = ex.select(
        F.col("_name").alias("name_a"), F.col("_n").alias("n_a"), "_h"
    )
    b = ex.select(
        F.col("_name").alias("name_b"), F.col("_n").alias("n_b"), "_h"
    )
    cand = (
        a.join(b, "_h")
        .filter(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b", "n_a", "n_b")
        .distinct()
    )
    return cand.select(
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").alias("dist"),
        "n_a",
        "n_b",
    ).filter(F.col("dist") <= max_dist)

"""sparkhash must replicate F.xxhash64 bit-for-bit — the model-baked
oracles rebuild hash_presample fit pools from it."""
from __future__ import annotations

from pyspark.sql import functions as F

from beymani_spark.functions.sparkhash import pmod, spark_xxhash64


def test_xxhash64_double_chain_matches_spark(spark):
    rows = [
        (1.5, -2.25, 0.0),
        (3.14159, 1e-9, -0.0),
        (1e300, -7.5, 42.0),
        (0.1, 0.2, 0.3),
    ]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    got = [r[0] for r in df.select(F.xxhash64("a", "b", "c", F.lit(42))).collect()]
    exp = [
        spark_xxhash64([("double", a), ("double", b), ("double", c), ("int", 42)])
        for a, b, c in rows
    ]
    assert got == exp


def test_xxhash64_string_and_float_array_match_spark(spark):
    texts = [
        "hello",
        "",
        "a longer string spanning more than thirty-two bytes for the long path",
        "ünïcödé ⚡",
    ]
    sdf = spark.createDataFrame([(t,) for t in texts], "s string")
    got = [r[0] for r in sdf.select(F.xxhash64("s")).collect()]
    assert got == [spark_xxhash64([("string", t)]) for t in texts]

    vec = [1.5, -2.25, 0.125, 0.0]
    fdf = spark.createDataFrame([(vec,)], "v array<float>")
    got_f = fdf.select(F.xxhash64("v", F.lit(7))).first()[0]
    assert got_f == spark_xxhash64([("float_array", vec), ("int", 7)])


def test_pmod_matches_spark(spark):
    df = spark.createDataFrame([(x,) for x in (-7, -1, 0, 5, -1000003)], "h long")
    got = [r[0] for r in df.select(F.pmod(F.col("h"), F.lit(1000000))).collect()]
    assert got == [pmod(x, 1000000) for x in (-7, -1, 0, 5, -1000003)]


def test_presample_predicate_matches_hash_presample(spark):
    """End-to-end: the Python replica of hash_presample selects exactly the
    rows Spark's hash_presample keeps."""
    from beymani_spark.operators.multivariate import hash_presample
    from beymani_spark.sources import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity", "l_extendedprice"
    )
    values = ["l_quantity", "l_extendedprice"]
    target = 300  # below per-key count so the filter actually bites
    kept = hash_presample(li, ["l_returnflag"], values, target, seed=42)
    got = {
        (r.l_orderkey, r.l_linenumber, r.l_returnflag) for r in kept.collect()
    }

    rows = li.collect()
    from collections import Counter

    n_by_key = Counter(r.l_returnflag for r in rows)
    exp = set()
    for r in rows:
        h = spark_xxhash64(
            [("double", r.l_quantity), ("double", r.l_extendedprice), ("int", 42)]
        )
        if pmod(h, 1_000_000) * n_by_key[r.l_returnflag] < target * 1_000_000:
            exp.add((r.l_orderkey, r.l_linenumber, r.l_returnflag))
    assert got == exp and len(exp) > 0

"""Fuzzy entity linkage (operators/linkage.py): deletion-neighborhood
blocking must be LOSSLESS vs a brute-force quadratic scan, and the
data-quality constraint audit (operators/constraints.py) must match
hand-computed metrics."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beymani_spark.operators.constraints import constraint_audit, referential_audit
from beymani_spark.operators.linkage import fuzzy_name_match


NAMES = [
    "red widget", "red widgets", "rad widget", "blue bolt", "blu bolt",
    "bluebolt", "green gear", "green gea", "x", "xy", "ab", "cd",
    "small ring", "small rings", "smallring", "peru powder",
]


@pytest.fixture(scope="module")
def names_df(spark):
    rows = [(n,) for n in NAMES for _ in range(2)] + [(None,), ("",)]
    return spark.createDataFrame(rows, ["name"])


def _brute_pairs(max_dist):
    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    out = set()
    for i, a in enumerate(NAMES):
        for b in NAMES[i + 1:]:
            if lev(a, b) <= max_dist:
                out.add((min(a, b), max(a, b)))
    return out


@pytest.mark.parametrize("d", [1, 2])
def test_fuzzy_match_lossless_vs_bruteforce(names_df, d):
    got = {
        (r.name_a, r.name_b)
        for r in fuzzy_name_match(names_df, "name", max_dist=d).collect()
    }
    assert got == _brute_pairs(d)


def test_fuzzy_match_counts_and_short_strings(names_df):
    rows = {
        (r.name_a, r.name_b): (r.n_a, r.n_b, r.dist)
        for r in fuzzy_name_match(names_df, "name", max_dist=2).collect()
    }
    # every name occurs twice
    assert rows[("x", "xy")][:2] == (2, 2)
    # fully-disjoint short strings: ed("ab","cd") = 2 via two substitutions,
    # and the blocker still finds them — both reach "" at deletion depth 2
    assert rows[("ab", "cd")][2] == 2


def test_fuzzy_match_rejects_bad_dist(names_df):
    with pytest.raises(ValueError):
        fuzzy_name_match(names_df, "name", max_dist=3)


def test_constraint_audit_metrics(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", None), (3, "a", 15.0), (3, "c", 7.0)],
        ["id", "cat", "v"],
    )
    out = {
        r.constraint: (r.metric, r.passed)
        for r in constraint_audit(
            df,
            [
                {"kind": "completeness", "column": "v", "threshold": 0.7},
                {"kind": "uniqueness", "column": "id", "threshold": 1.0},
                {
                    "kind": "accepted_values",
                    "column": "cat",
                    "values": ["a", "b"],
                    "threshold": 0.5,
                },
                {"kind": "bounds", "column": "v", "lo": 0, "hi": 10, "threshold": 0.6},
            ],
        ).collect()
    }
    assert out["completeness(v)"] == (0.75, True)
    assert out["uniqueness(id)"] == (0.75, False)
    assert out["accepted_values(cat)"] == (0.75, True)
    assert out["bounds(v)"] == (0.5, False)


def test_constraint_audit_requires_constraints(spark):
    df = spark.createDataFrame([(1,)], ["id"])
    with pytest.raises(ValueError):
        constraint_audit(df, [])
    with pytest.raises(ValueError):
        constraint_audit(df, [{"kind": "nope", "column": "id", "threshold": 1}])


def test_referential_audit(spark):
    child = spark.createDataFrame([(1,), (1,), (2,), (9,), (None,)], ["k"])
    parent = spark.createDataFrame([(1,), (2,), (3,)], ["p"])
    row = referential_audit(child, "k", parent, "p").first()
    # 9 and NULL are orphans (2 of 5 rows)
    assert (row.n_child, row.n_orphans, row.passed) == (5, 2, False)
    assert row.metric == 0.6


def test_constraint_audit_empty_frame_fails_not_passes(spark):
    """0/0 double division is NaN and Spark sorts NaN above everything —
    an unguarded empty batch would silently PASS its gate. It must fail
    with a NULL metric instead."""
    df = spark.createDataFrame([], "id INT, v DOUBLE")
    rows = constraint_audit(
        df, [{"kind": "completeness", "column": "v", "threshold": 0.9}]
    ).collect()
    assert len(rows) == 1
    assert rows[0].metric is None
    assert rows[0].passed is False

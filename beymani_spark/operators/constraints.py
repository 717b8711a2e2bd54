"""Declarative data-quality constraint audit (Deequ-style).

A warehouse-scale pipeline gates every ingest batch on a constraint suite:
completeness, uniqueness, accepted values, numeric bounds, referential
containment. The reference validates records one rule at a time inside its
ETL helpers (e.g. the range predicates of ``RangeBasedPredictor``); here the
whole suite is declared as data and evaluated in ONE aggregation pass —
every row-level check is a conditional aggregate over the same scan, so a
10-constraint audit of a 100 TB table costs one scan + one 1-row reduce,
not 10 jobs.

Constraint dicts (``kind`` selects the check; every check yields a round-6
``metric`` in [0, 1] compared against ``threshold``, pass iff
``metric >= threshold``):

- ``{"kind": "completeness", "column": c, "threshold": t}`` — non-null share.
- ``{"kind": "uniqueness", "column": c, "threshold": t}`` — distinct/total.
- ``{"kind": "accepted_values", "column": c, "values": [...], "threshold": t}``
  — share of rows whose value is in the set (NULL counts as violating).
- ``{"kind": "bounds", "column": c, "lo": a, "hi": b, "threshold": t}`` —
  share of rows inside [lo, hi] (NULL violates; either bound optional).
"""
from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _metric(c: Mapping) -> F.Column:
    col = F.col(c["column"])
    n = F.count(F.lit(1))
    if c["kind"] == "completeness":
        return F.count(col) / n
    if c["kind"] == "uniqueness":
        return F.count_distinct(col) / n
    if c["kind"] == "accepted_values":
        ok = col.isin(list(c["values"]))
        return F.sum(F.when(ok, 1).otherwise(0)) / n
    if c["kind"] == "bounds":
        ok = F.lit(True)
        if c.get("lo") is not None:
            ok = ok & (col >= F.lit(c["lo"]))
        if c.get("hi") is not None:
            ok = ok & (col <= F.lit(c["hi"]))
        return F.sum(F.when(ok, 1).otherwise(0)) / n
    raise ValueError(f"unknown constraint kind: {c['kind']!r}")


def constraint_audit(df: DataFrame, constraints: Sequence[Mapping]) -> DataFrame:
    """Evaluate the suite in one pass: returns one row per constraint —
    (constraint, col_name, metric, threshold, passed), metric round-6.

    Scale shape: a single groupBy-less aggregate; row-level checks are
    partial-aggregated conditional sums (map-side combine, a handful of
    longs per partition). ``uniqueness`` constraints add count_distinct
    aggregates — Spark plans multiple distincts via one Expand (rows x
    #distinct-columns), still one shuffle of partial states; keep distinct
    checks to key-like columns. The result is |constraints| rows unpivoted
    from the 1-row aggregate on the driver-free stack() path."""
    if not constraints:
        raise ValueError("constraint_audit requires at least one constraint")
    # Guard the empty-frame edge: 0/0 double division is NaN, and Spark
    # orders NaN ABOVE every value, so an unguarded empty batch would PASS
    # every constraint. An empty batch reports metric NULL and fails.
    n = F.count(F.lit(1))
    aggs = [
        F.when(n > 0, F.round(_metric(c), 6)).alias(f"_m{i}")
        for i, c in enumerate(constraints)
    ]
    one = df.agg(*aggs)
    # unpivot the 1-row aggregate to (constraint, column, metric, threshold)
    parts = []
    for i, c in enumerate(constraints):
        name = c.get("name", f"{c['kind']}({c['column']})")
        parts.append(
            f"'{name}', '{c['column']}', _m{i}, CAST({float(c['threshold'])} AS DOUBLE)"
        )
    stacked = one.select(
        F.expr(
            f"stack({len(constraints)}, {', '.join(parts)}) "
            "AS (constraint, col_name, metric, threshold)"
        )
    )
    return stacked.select(
        "constraint",
        "col_name",
        "metric",
        "threshold",
        F.coalesce(F.col("metric") >= F.col("threshold"), F.lit(False)).alias(
            "passed"
        ),
    )


def referential_audit(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
) -> DataFrame:
    """Referential-integrity check: one row (n_child, n_orphans, metric,
    passed) where metric is the round-6 share of child rows whose key
    exists in the parent (NULL keys are orphans) and passed iff no orphans.

    Scale shape: the child is reduced to distinct keys BEFORE the
    anti-join probe (a 100 TB fact table has bounded key cardinality), the
    orphan keys then broadcast back against a per-key count — the fact
    table is scanned once and never shuffled on the key."""
    per_key = child.groupBy(F.col(child_col).alias("_k")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    orphans = per_key.join(
        parent.select(F.col(parent_col).alias("_k")).distinct(), "_k", "left_anti"
    )
    totals = per_key.agg(F.sum("_n").alias("n_child")).crossJoin(
        orphans.agg(F.coalesce(F.sum("_n"), F.lit(0)).alias("n_orphans"))
    )
    return totals.select(
        "n_child",
        "n_orphans",
        F.round((F.col("n_child") - F.col("n_orphans")) / F.col("n_child"), 6).alias(
            "metric"
        ),
        (F.col("n_orphans") == 0).alias("passed"),
    )

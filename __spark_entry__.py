"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship z-score E2E pipeline (SURVEY.md §7.1) at sf0.001.
queries()     — one (spark, sf_dir) -> DataFrame per implemented operator.
oracle_sql()  — matching DuckDB SQL for the deterministic operators.

All real logic lives in beymani_spark/; the registry
(beymani_spark/plans/registry.py) keeps builder + oracle side-by-side.
"""
from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from beymani_spark.plans import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: seasonal z-score scoring + outlier counts on events."""
    from beymani_spark.operators import post, profile, zscore
    from beymani_spark.sources import load_table

    sf_dir = "/root/testdata/sf0.001"
    ev = load_table(spark, sf_dir, "events")
    stats = profile.numerical_stats(
        ev, ["event_type"], ["value"], cycle="weekDayOrWeekendOfWeek", ts="ts"
    )
    scored = zscore.zscore(
        ev, stats, ["event_type"], ["value"], threshold=3.0,
        cycle="weekDayOrWeekendOfWeek", ts="ts",
    )
    return post.outlier_counts(scored, ["event_type"])


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.builder for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """Callable oracles (model-baked fits) are resolved at the driver's
    correctness sf (sf0.01) — the fit inside runs off-Spark in seconds."""
    return {
        name: q.oracle_sql() for name, q in QUERIES.items() if q.oracle is not None
    }

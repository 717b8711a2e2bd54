"""Every registry entry with an oracle must hash-match DuckDB (driver t2 mirror)."""
from __future__ import annotations

import pytest

from beymani_spark.plans import QUERIES

from .oracle import compare, duck_run

ORACLE_QUERIES = [name for name, q in QUERIES.items() if q.oracle is not None]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_dir, name):
    q = QUERIES[name]
    spark_df = q.builder(spark, sf_dir)
    duck_df = duck_run(sf_dir, q.oracle_sql(sf_dir))
    errs = compare(spark_df, duck_df)
    assert not errs, f"{name}: " + "; ".join(errs)


@pytest.mark.slow  # multi-minute sweep: excluded from the default run (see pyproject)
def test_all_queries_return_rows(spark, sf_dir):
    for name, q in QUERIES.items():
        n = q.builder(spark, sf_dir).count()
        assert n >= 0, name


@pytest.mark.parametrize("name", ORACLE_QUERIES)
@pytest.mark.slow  # multi-minute sweep: excluded from the default run (see pyproject)
def test_oracle_parity_altseed(spark, alt_sf_dir, name):
    """Second-draw sweep: the same parity contract against the
    alternate-seed / alternate-skew fixture build (tests/altseed.py) —
    skewed keys, NULL injections, empty/single-token docs, duplicate
    texts/vectors, orphan FKs, timestamp ties. Catches data-dependent
    bugs the single fixed draw structurally cannot."""
    q = QUERIES[name]
    spark_df = q.builder(spark, alt_sf_dir)
    duck_df = duck_run(alt_sf_dir, q.oracle_sql(alt_sf_dir))
    errs = compare(spark_df, duck_df)
    assert not errs, f"{name}[altseed]: " + "; ".join(errs)

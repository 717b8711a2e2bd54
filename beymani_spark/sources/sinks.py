"""Sinks designed for partition pruning at 100 TB.

The reference writes flat text part-files that every downstream job rescans
in full (saveAsTextFile + driver-side `cat` merges, resource/and_spark.sh:
55-66). Here outputs are parquet tables partitioned by the entity/date
columns the queries filter on, so scans hit only matching partitions
(PartitionFilters in the plan), and optionally bucketed by join key so
co-located joins skip the shuffle.
"""
from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str],
    mode: str = "overwrite",
) -> None:
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: Sequence[str],
    num_buckets: int = 32,
    sort_by: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: joins/aggregations on the bucket columns avoid
    the shuffle entirely (both sides pre-partitioned on disk)."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)


def read_pruned(spark: SparkSession, path: str) -> DataFrame:
    """Partition-discovering read; combine with a filter on the partition
    column and check PartitionFilters in .explain to confirm pruning."""
    return spark.read.parquet(path)

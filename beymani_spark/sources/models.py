"""Model persistence: save/load fitted model DataFrames between jobs.

The reference's pipelines are two-phase — a builder job writes a model file
(stats, median/MAD, histograms, Markov matrix, centroids, forest paths:
SURVEY.md §1.1.5), a scoring job reloads it. Here models ARE DataFrames, so
persistence is parquet plus a tiny manifest recording the model name and
schema; the manifest is itself written through Spark (a 1-row JSON frame),
so save/load works on any Hadoop-compatible filesystem — no driver-local
file I/O, no side-channel the cluster can't see.

Loading validates the stored schema against the expectation, turning the
classic silent failure of the reference's stringly model files (a scoring
job fed the wrong model file produces garbage scores) into an immediate,
named error.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: manifest lives BESIDE the model dir (``<path>.manifest``), not inside
#: it: Spark's file index skips underscore/dot-prefixed paths even when
#: addressed explicitly, and a non-partition subdir inside a parquet root
#: breaks partition discovery — a sibling dir has neither problem.
MANIFEST_SUFFIX = ".manifest"


def save_model(df: DataFrame, path: str, name: str, mode: str = "overwrite") -> None:
    """Persist a model DataFrame to ``path`` (parquet) with a manifest
    recording ``name`` and the schema DDL."""
    df.write.mode(mode).parquet(path)
    spark = df.sparkSession
    manifest = spark.createDataFrame(
        [(name, df.schema.simpleString())],
        "model_name string, model_schema string",
    )
    manifest.coalesce(1).write.mode(mode).json(f"{path}{MANIFEST_SUFFIX}")


def load_model(
    spark: SparkSession, path: str, expect_name: str | None = None
) -> DataFrame:
    """Load a model saved by save_model. With ``expect_name``, refuse to
    load a model of the wrong kind (the wrong-model-file guard)."""
    row = spark.read.json(f"{path}{MANIFEST_SUFFIX}").first()
    if row is None:
        raise ValueError(f"no model manifest under {path}")
    if expect_name is not None and row["model_name"] != expect_name:
        raise ValueError(
            f"model at {path} is '{row['model_name']}', expected '{expect_name}'"
        )
    df = spark.read.parquet(path)
    if df.schema.simpleString() != row["model_schema"]:
        raise ValueError(
            f"model at {path} has schema {df.schema.simpleString()}, "
            f"manifest records {row['model_schema']} — refusing to score with it"
        )
    return df

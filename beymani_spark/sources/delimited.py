"""Delimited-text compatibility layer.

The reference's universal storage is headerless delimited text with
ordinal-addressed fields (``field.delim.in``, ``id.fieldOrdinals`` — see
/root/reference/spark/src/main/scala/org/beymani/spark/dist/
StatsBasedOutlierPredictor.scala:202-210) and its universal output is the
input line plus ",score,label" with the score formatted at fixed precision
(BasicUtils.formatDouble, :278). These helpers let a reference user point
their existing files at this engine and write byte-compatible tagged output,
while everything in between runs on typed DataFrames.
"""
from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_delimited(
    spark: SparkSession,
    path: str,
    delim: str = ",",
    names: Sequence[str] | None = None,
    schema: str | None = None,
) -> DataFrame:
    """Read headerless delimited text. Without ``names``/``schema`` columns
    are ``c0..cN`` strings (the reference's stringly ordinal model);
    numeric parsing is then explicit, as in the reference."""
    reader = spark.read.option("header", "false").option("delimiter", delim)
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.csv(path)
    if schema is None:
        df = df.toDF(*(names if names is not None else [f"c{i}" for i in range(len(df.columns))]))
    elif names is not None:
        df = df.toDF(*names)
    return df


def write_tagged(
    scored: DataFrame,
    path: str,
    delim: str = ",",
    precision: int = 3,
    score_col: str = "score",
    label_col: str = "label",
    mode: str = "overwrite",
) -> None:
    """Write the reference-compatible tagged output: every original column in
    order, then the score formatted at fixed precision, then the label."""
    cols = [c for c in scored.columns if c not in (score_col, label_col)]
    line = F.concat_ws(
        delim,
        *[F.col(c).cast("string") for c in cols],
        # format_string, not format_number: the latter inserts locale grouping
        # separators (1234.568 -> "1,234.568"), corrupting the delimited line
        F.format_string(f"%.{precision}f", F.col(score_col)).alias("_s"),
        F.col(label_col),
    )
    scored.select(line.alias("value")).write.mode(mode).text(path)

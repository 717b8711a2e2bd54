"""Detector protocol — the engine's user-facing extension point.

The reference's extension point is the ModelBasedPredictor Java class
hierarchy (/root/reference/src/main/java/org/beymani/predictor/
ModelBasedPredictor.java:32); ours is a small Python protocol over
DataFrames:

    class Detector(Protocol):
        def fit(self, df) -> DataFrame        # model as a DataFrame
        def score(self, df, model) -> DataFrame  # df + score + label

Models are ordinary DataFrames: persist them with ``model.write.parquet``
and reload for scoring — replacing the reference's text side-files. Each
built-in detector below wraps the functional operators; user detectors just
implement the same two methods.
"""
from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field
from typing import Protocol, runtime_checkable

from pyspark.sql import DataFrame

from ..operators import histogram, multivariate, profile, zscore


@runtime_checkable
class Detector(Protocol):
    def fit(self, df: DataFrame) -> DataFrame: ...

    def score(self, df: DataFrame, model: DataFrame) -> DataFrame: ...


@dataclass
class ZScoreDetector:
    keys: Sequence[str]
    values: Sequence[str]
    threshold: float = 3.0
    exp_const: float = 0.0
    cycle: str | None = None
    ts: str | None = None
    weights: Sequence[float] | None = None
    strategy: str = "average"

    def fit(self, df: DataFrame) -> DataFrame:
        return profile.numerical_stats(df, self.keys, self.values, self.cycle, self.ts)

    def score(self, df: DataFrame, model: DataFrame) -> DataFrame:
        return zscore.zscore(
            df, model, self.keys, self.values, self.weights, self.strategy,
            self.threshold, self.exp_const, self.cycle, self.ts,
        )


@dataclass
class RobustZScoreDetector:
    keys: Sequence[str]
    values: Sequence[str]
    threshold: float = 3.5
    cycle: str | None = None
    ts: str | None = None

    def fit(self, df: DataFrame) -> DataFrame:
        return profile.median_mad(df, self.keys, self.values, self.cycle, self.ts)

    def score(self, df: DataFrame, model: DataFrame) -> DataFrame:
        return zscore.robust_zscore(
            df, model, self.keys, self.values, threshold=self.threshold,
            cycle=self.cycle, ts=self.ts,
        )


@dataclass
class EstimatedProbabilityDetector:
    keys: Sequence[str]
    spec: Sequence[tuple[str, float | None]]
    threshold: float = 0.99

    def fit(self, df: DataFrame) -> DataFrame:
        return histogram.multivariate_histogram(df, self.keys, self.spec)

    def score(self, df: DataFrame, model: DataFrame) -> DataFrame:
        return histogram.est_prob_score(df, model, self.keys, self.spec, self.threshold)


@dataclass
class IsolationForestDetector:
    keys: Sequence[str]
    values: Sequence[str]
    num_trees: int = 100
    subsample: int = 256
    seed: int = 42
    threshold: float = 0.6

    def fit(self, df: DataFrame) -> DataFrame:
        return multivariate.isolation_forest_fit(
            df, self.keys, self.values, self.num_trees, self.subsample, self.seed
        )

    def score(self, df: DataFrame, model: DataFrame) -> DataFrame:
        return multivariate.isolation_forest_score(
            df, model, self.keys, self.values, self.threshold
        )


@dataclass
class MahalanobisDetector:
    keys: Sequence[str]
    values: Sequence[str]
    threshold: float = 9.0

    def fit(self, df: DataFrame) -> DataFrame:
        return multivariate.mahalanobis_model(df, self.keys, self.values)

    def score(self, df: DataFrame, model: DataFrame) -> DataFrame:
        return multivariate.mahalanobis_score(
            df, model, self.keys, self.values, self.threshold
        )

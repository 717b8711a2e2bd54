"""Score normalization to (0,1).

The reference normalizes raw scores with chombo ``BasicUtils.expScale`` (call
sites e.g. /root/reference/src/main/java/org/beymani/predictor/
ZscorePredictor.java:195-197) and ``MathUtils.logisticScale``
(/root/reference/spark/src/main/scala/org/beymani/spark/misc/
InRangeBasedPredictor.scala:94). chombo is not vendored, so we define the
normalizations precisely here (both map [0,inf) -> [0,1), monotone):

  exp_scale(k, x)      = 1 - exp(-k*x)          (x >= 0 -> [0,1))
  logistic_scale(k, x) = 1 / (1 + exp(-k*x))    (sigmoid over R -> (0,1);
                          the range predictors rely on negative deltas
                          mapping below 0.5, see OutRangeBasedPredictor.scala
                          delta/logisticScale usage at :110-117)
"""
from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def exp_scale(k: float, score: Column) -> Column:
    return F.lit(1.0) - F.exp(-F.lit(float(k)) * score)


def logistic_scale(k: float, score: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-F.lit(float(k)) * score))


# DuckDB-side templates (same formulas) for oracle parity.
EXP_SCALE_SQL = "(1.0 - exp(-({k}) * ({x})))"
LOGISTIC_SCALE_SQL = "(1.0 / (1.0 + exp(-({k}) * ({x}))))"

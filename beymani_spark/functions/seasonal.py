"""Seasonal cycle-index helpers.

The reference appends a (cycleType, cycleIndex) pair to the composite key via
chombo's SeasonalAnalyzer (call site /root/reference/spark/src/main/scala/org/
beymani/spark/dist/StatsBasedOutlierPredictor.scala:212-246; configs like
``seasonal.cycle.type = weekDayOrWeekendOfWeek`` in resource/and.conf:6-9).
Here each cycle type is a plain column expression, so seasonal keying is just
one more grouping column and stays inside whole-stage codegen.

Index conventions (ours, documented for oracle parity):
  hourOfDay              0..23
  dayOfWeek              0=Sunday .. 6=Saturday
  weekDayOrWeekendOfWeek 0=weekday, 1=weekend (Sat/Sun)
  hourOfWeek             dayOfWeek*24 + hourOfDay (0..167)
  halfDayOfDay           0=[0,12), 1=[12,24)
  nightDayHourOfDay      0=night hour ([22,24) or [0,6)), 1=day ([6,22))
                         — the cycle type salean.conf:18/37/76 names
                         (the chombo analyzer's source is an external
                         dependency, so the band edges are OUR documented
                         convention, parallel to weekDayOrWeekendOfWeek's
                         binary split of the week)
  monthOfYear            0=January .. 11=December
  dayOfMonth             0..30 (dayofmonth - 1)
"""
from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def cycle_index(ts: str | Column, cycle_type: str) -> Column:
    c = _c(ts)
    if cycle_type == "hourOfDay":
        return F.hour(c)
    if cycle_type == "dayOfWeek":
        return F.dayofweek(c) - F.lit(1)
    if cycle_type == "weekDayOrWeekendOfWeek":
        return F.when(F.dayofweek(c).isin(1, 7), F.lit(1)).otherwise(F.lit(0))
    if cycle_type == "hourOfWeek":
        return (F.dayofweek(c) - F.lit(1)) * F.lit(24) + F.hour(c)
    if cycle_type == "halfDayOfDay":
        return F.when(F.hour(c) < 12, F.lit(0)).otherwise(F.lit(1))
    if cycle_type == "nightDayHourOfDay":
        return F.when(
            (F.hour(c) >= 6) & (F.hour(c) < 22), F.lit(1)
        ).otherwise(F.lit(0))
    if cycle_type == "monthOfYear":
        return F.month(c) - F.lit(1)
    if cycle_type == "dayOfMonth":
        return F.dayofmonth(c) - F.lit(1)
    raise ValueError(f"unknown cycle type: {cycle_type}")


def register_sql_udfs(spark) -> None:
    """Register ``cycle_<type>(ts)`` SQL functions (SURVEY.md §4.3.3) so
    spark.sql parity queries can key seasonally. Arrow-vectorized pandas UDFs
    mirroring the column expressions above (dayofweek: 1=Sunday in Spark)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _dow(s: pd.Series) -> pd.Series:
        # pandas dayofweek: 0=Monday..6=Sunday -> ours: 0=Sunday..6=Saturday
        return (s.dt.dayofweek + 1) % 7

    impls = {
        "hourOfDay": lambda s: s.dt.hour,
        "dayOfWeek": _dow,
        "weekDayOrWeekendOfWeek": lambda s: _dow(s).isin([0, 6]).astype("int32"),
        "hourOfWeek": lambda s: _dow(s) * 24 + s.dt.hour,
        "halfDayOfDay": lambda s: (s.dt.hour >= 12).astype("int32"),
        "nightDayHourOfDay": lambda s: (
            (s.dt.hour >= 6) & (s.dt.hour < 22)
        ).astype("int32"),
        "monthOfYear": lambda s: s.dt.month - 1,
        "dayOfMonth": lambda s: s.dt.day - 1,
    }
    for ct, fn in impls.items():
        def make(fn=fn):
            def f(ts):
                return fn(ts).astype("int32")
            # explicit returnType form: string annotations from
            # `from __future__ import annotations` break hint inference
            return pandas_udf(f, "int")
        spark.udf.register(f"cycle_{ct}", make())


#: DuckDB SQL templates for each cycle type ({ts} is the timestamp column);
#: used by oracle queries so both engines key identically.
CYCLE_TYPES = {
    "hourOfDay": "hour({ts})",
    "dayOfWeek": "dayofweek({ts})",
    "weekDayOrWeekendOfWeek": "(CASE WHEN dayofweek({ts}) IN (0, 6) THEN 1 ELSE 0 END)",
    "hourOfWeek": "(dayofweek({ts}) * 24 + hour({ts}))",
    "halfDayOfDay": "(CASE WHEN hour({ts}) < 12 THEN 0 ELSE 1 END)",
    "nightDayHourOfDay": (
        "(CASE WHEN hour({ts}) >= 6 AND hour({ts}) < 22 THEN 1 ELSE 0 END)"
    ),
    "monthOfYear": "(month({ts}) - 1)",
    "dayOfMonth": "(dayofmonth({ts}) - 1)",
}

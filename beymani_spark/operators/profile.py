"""Model/profile builders: the chombo model-builder jobs every reference
pipeline depends on (SURVEY.md §2.4), rebuilt as single groupBy aggregations.

- numerical_stats  ≙ org.chombo.spark.explore.NumericalAttrStats
  (invoked by resource/and_spark.sh:45; consumers read mean/stddev from the
  stats file, /root/reference/src/main/java/org/beymani/predictor/
  ZscorePredictor.java:95-98)
- median_mad       ≙ NumericalAttrMedian op med/mad (resource/ecomm.sh:28-37)
- temporal_aggregate ≙ TemporalAggregator (resource/and.conf:61-74)
- auto_correlation ≙ AutoCorrelation (resource/and.conf:76-88)

All builders emit LONG format: one row per (keys..., [cycle_index], attr) so a
single model DataFrame covers many attributes and broadcast-joins back onto
scoring input — replacing the reference's driver-side model files.

Scale notes: one shuffle each (groupBy with map-side partial aggregation);
median/MAD uses exact ``percentile`` (two passes) for oracle parity — swap to
``percentile_approx`` at very high key cardinality if needed.
"""
from __future__ import annotations

import math

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import caching
from ..functions.seasonal import cycle_index


def _explode_attrs(
    df: DataFrame,
    keys: Sequence[str],
    values: Sequence[str],
    cycle: str | None = None,
    ts: str | None = None,
    extra: Sequence[str] = (),
) -> DataFrame:
    """(keys..., [cycle_index], attr, value) long form for multi-attr builders."""
    cols = [F.col(k) for k in keys]
    names = list(keys)
    if cycle is not None:
        if ts is None:
            raise ValueError("cycle requires ts column")
        cols.append(cycle_index(ts, cycle).alias("cycle_index"))
        names.append("cycle_index")
    pairs = F.array(
        *[
            F.struct(F.lit(v).alias("attr"), F.col(v).cast("double").alias("value"))
            for v in values
        ]
    )
    sel = cols + [F.col(e) for e in extra] + [F.explode(pairs).alias("p")]
    return df.select(*sel).select(*names, *extra, "p.attr", "p.value")


def numerical_stats(
    df: DataFrame,
    keys: Sequence[str],
    values: Sequence[str],
    cycle: str | None = None,
    ts: str | None = None,
) -> DataFrame:
    """Per (keys,[cycle],attr): count/sum/sumSq/mean/stddev(sample)/min/max."""
    long = _explode_attrs(df, keys, values, cycle, ts)
    group = [c for c in long.columns if c not in ("attr", "value")] + ["attr"]
    return long.groupBy(*group).agg(
        F.count("value").alias("cnt"),
        F.sum("value").alias("sum"),
        F.sum(F.col("value") * F.col("value")).alias("sum_sq"),
        F.avg("value").alias("mean"),
        F.stddev_samp("value").alias("std"),
        F.min("value").alias("min"),
        F.max("value").alias("max"),
    )


def stats_and_quartiles(
    df: DataFrame,
    keys: Sequence[str],
    values: Sequence[str],
    cycle: str | None = None,
    ts: str | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """:func:`numerical_stats` + ``zscore.quartiles`` from ONE groupBy pass.

    A consumer needing both models over the same (keys, values) grouping
    (anomaly_score_fuse: the z-score and IQR kernels standardize against
    per-key stats AND quartiles) otherwise scans and shuffles the fact
    table twice to build two model frames over the identical grouping.
    The aggregate expressions are exactly those of the two separate
    builders, so the derived frames are value-identical.

    Returns ``(stats, quartiles, combined)``. ``combined`` is persisted —
    the two model selects are separate plan branches and would each
    re-run the aggregation otherwise; it is |keys|x|values| rows
    (model-sized at any scale). Cache ownership passes to the caller
    (``caching.pin`` the result, ``caching.release`` after the final
    action)."""
    long = _explode_attrs(df, keys, values, cycle, ts)
    group = [c for c in long.columns if c not in ("attr", "value")] + ["attr"]
    combined = (
        long.groupBy(*group)
        .agg(
            F.count("value").alias("cnt"),
            F.sum("value").alias("sum"),
            F.sum(F.col("value") * F.col("value")).alias("sum_sq"),
            F.avg("value").alias("mean"),
            F.stddev_samp("value").alias("std"),
            F.min("value").alias("min"),
            F.max("value").alias("max"),
            F.percentile("value", F.lit(0.25)).alias("q1"),
            F.percentile("value", F.lit(0.75)).alias("q3"),
            (
                F.percentile("value", F.lit(0.75))
                - F.percentile("value", F.lit(0.25))
            ).alias("iqr"),
        )
        .persist()
    )
    stats = combined.select(
        *group, "cnt", "sum", "sum_sq", "mean", "std", "min", "max"
    )
    quartiles = combined.select(*group, "q1", "q3", "iqr")
    return stats, quartiles, combined


def median_mad(
    df: DataFrame,
    keys: Sequence[str],
    values: Sequence[str],
    cycle: str | None = None,
    ts: str | None = None,
    approx_accuracy: int | None = None,
) -> DataFrame:
    """Per (keys,[cycle],attr): median and MAD (median of |x - median|).

    Exact by default (the oracle/correctness path — `percentile` fully sorts
    each group). ``approx_accuracy`` switches both quantiles to
    `percentile_approx` (Greenwald-Khanna, relative rank error 1/accuracy):
    the 100 TB path — a mergeable sketch of bounded size per group instead of
    a full sort, at a documented approximation (accuracy=10000 ->
    rank error <= 0.01%)."""
    long = _explode_attrs(df, keys, values, cycle, ts)
    group = [c for c in long.columns if c not in ("attr", "value")] + ["attr"]
    if approx_accuracy:
        p50 = lambda c: F.percentile_approx(c, 0.5, int(approx_accuracy))  # noqa: E731
    else:
        p50 = lambda c: F.percentile(c, F.lit(0.5))  # noqa: E731
    med = long.groupBy(*group).agg(p50("value").alias("median"))
    return (
        long.join(med, group)
        .withColumn("absdev", F.abs(F.col("value") - F.col("median")))
        .groupBy(*group, "median")
        .agg(p50("absdev").alias("mad"))
    )


def discretize(
    df: DataFrame,
    value: str,
    out_col: str = "state",
    width: float | None = None,
    quantiles: int | None = None,
    keys: Sequence[str] = (),
    labels: Sequence[str] | None = None,
) -> DataFrame:
    """≙ chombo DataTransformer discretizer (pipeline usage resource/bsm.sh,
    resource/bsm.json:20-22 — Markov state extraction). Equal-width
    (floor(v/width)) or per-key equal-probability (exact quantile bounds)
    bins; ``labels`` maps bin index -> state symbol."""
    if (width is None) == (quantiles is None):
        raise ValueError("exactly one of width/quantiles required")
    if width is not None:
        idx = F.floor(F.col(value) / F.lit(float(width))).cast("int")
        out = df.withColumn("_bin", idx)
    else:
        probs = [i / quantiles for i in range(1, quantiles)]
        bounds = df.groupBy(*keys).agg(
            *[
                F.percentile(value, F.lit(p)).alias(f"_q{i}")
                for i, p in enumerate(probs)
            ]
        )
        out = df.join(F.broadcast(bounds), list(keys)) if keys else df.crossJoin(
            F.broadcast(bounds)
        )
        idx = F.lit(0)
        for i in range(len(probs)):
            idx = idx + F.when(F.col(value) > F.col(f"_q{i}"), 1).otherwise(0)
        out = out.withColumn("_bin", idx.cast("int")).drop(
            *[f"_q{i}" for i in range(len(probs))]
        )
    if labels is not None:
        mapping = F.array(*[F.lit(str(lab)) for lab in labels])
        out = out.withColumn(out_col, F.get(mapping, F.col("_bin")))
    else:
        out = out.withColumn(out_col, F.col("_bin").cast("string"))
    return out.drop("_bin")


def temporal_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    value: str,
    window: str = "1 hour",
    agg: str = "avg",
) -> DataFrame:
    """Tumbling-window aggregate of a metric per key (≙ TemporalAggregator)."""
    agg_fn = {"avg": F.avg, "sum": F.sum, "min": F.min, "max": F.max, "count": F.count}[agg]
    w = F.window(F.col(ts), window)
    return (
        df.groupBy(*keys, w.alias("w"))
        .agg(agg_fn(F.col(value)).alias(f"{agg}_{value}"))
        .select(*keys, F.col("w.start").alias("window_start"), f"{agg}_{value}")
    )


def resample(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    value: str,
    step_sec: int = 3600,
    fill: str = "ffill",
) -> DataFrame:
    """Regularize a keyed series to a fixed cadence: bucket to step_sec
    epochs, average within buckets, generate the full per-key grid between
    each key's min/max bucket, and fill gaps (ffill = previous value,
    'zero' = 0, 'null' = leave null). Gives the sequence detectors the
    regular cadence the reference's generators assume. One aggregation + one
    per-key grid explode + one window."""
    bucket = (F.floor(F.unix_timestamp(F.col(ts)) / step_sec) * step_sec).cast("long")
    agg = (
        df.withColumn("_b", bucket)
        .groupBy(*keys, "_b")
        .agg(F.avg(value).alias("_v"))
    )
    span = agg.groupBy(*keys).agg(F.min("_b").alias("_lo"), F.max("_b").alias("_hi"))
    grid = span.select(
        *keys,
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"), F.lit(step_sec))).alias("_b"),
    )
    joined = grid.join(agg, [*keys, "_b"], "left")
    if fill == "ffill":
        w = (
            Window.partitionBy(*keys)
            .orderBy("_b")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = F.last("_v", ignorenulls=True).over(w)
    elif fill == "zero":
        filled = F.coalesce(F.col("_v"), F.lit(0.0))
    elif fill == "null":
        filled = F.col("_v")
    else:
        raise ValueError(f"unknown fill: {fill}")
    return joined.select(
        *keys,
        F.col("_b").alias("bucket_epoch"),
        filled.alias(f"{value}_resampled"),
        F.col("_v").isNull().alias("gap_filled"),
    )


def auto_correlation(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    value: str,
    lags: Sequence[int] = (1,),
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-key autocorrelation at configured lags (≙ chombo AutoCorrelation).

    corr(x_t, x_{t-L}) over the seq-ordered series; one window pass builds all
    lag columns, one aggregation computes all correlations.
    """
    w = Window.partitionBy(*keys).orderBy(ts, *order_cols)
    cols = [F.lag(value, lag).over(w).alias(f"_lag{lag}") for lag in lags]
    lagged = df.select(*keys, F.col(value), *cols)
    aggs = [F.corr(F.col(value), F.col(f"_lag{lag}")).alias(f"acf_{lag}") for lag in lags]
    return lagged.groupBy(*keys).agg(*aggs)


def ks_two_sample(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    round_decimals: int = 6,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic between the ``col``
    distributions of two frames, fully distributed: one row
    (ks_stat, n_a, n_b) — or one row per ``keys`` group, ``(*keys,
    ks_stat, n_a, n_b)``, for the per-domain form ("did today's crawl
    quality shift, PER LANGUAGE?"). The day-over-day governance check —
    the batch companion of streaming/drift.py's detectors.

    Values are quantized to ``round_decimals`` first (the repo-wide
    round-6 parity convention; KS on the quantized values equals KS of
    the raw ones up to the quantization step, and the statistic is
    engine-exact — integer cumulative counts, one fixed division order).
    Nulls are excluded (they carry no position in an empirical CDF); a
    key present in only one frame reports ks_stat NULL (try_divide of
    the zero count — DuckDB's divide-by-zero NULL, and ANSI-safe) with
    the other side's count 0.

    Scale shape: one partial-agg groupBy per distinct (keys, quantized
    value), then a DISTRIBUTED prefix sum over the grouped value frame —
    range partition by (keys, value), per-(keys, partition) ROWS cumsum,
    broadcast per-(keys, partition) base offsets (the pack_sequences
    pattern, packing.py). There is NO single-partition stage over a
    data-sized or key-sized frame, so wide domains (raw token counts,
    epoch timestamps, high-cardinality doubles) are as safe as [0,1]-like
    ones — per key too: a key's distinct values span partitions and each
    slice cumsums independently. The broadcast base/total frame is
    O(|keys| x |partitions|) rows of longs — fine for governance-gate key
    cardinalities (domains, languages); for millions of keys swap the
    broadcast for a plain hash join on (*keys, _pid)."""
    r = int(round_decimals)
    ks = [F.col(k) for k in keys]
    a = df_a.filter(F.col(col).isNotNull()).select(
        *ks, F.round(F.col(col), r).alias("_v"), F.lit(1).alias("_ia"), F.lit(0).alias("_ib")
    )
    b = df_b.filter(F.col(col).isNotNull()).select(
        *ks, F.round(F.col(col), r).alias("_v"), F.lit(0).alias("_ia"), F.lit(1).alias("_ib")
    )
    g = (
        a.unionByName(b)
        .groupBy(*keys, "_v")
        .agg(F.sum("_ia").alias("_ca"), F.sum("_ib").alias("_cb"))
    )
    parts = df_a.sparkSession.sparkContext.defaultParallelism
    # persist AFTER the range exchange: the cumsum window and the per-slice
    # totals must observe the SAME physical range boundaries or the base
    # offsets misalign (RangePartitioner samples with an RDD-id-derived
    # seed, so two materializations of the exchange can draw different
    # boundaries — without a cache the consistency rides entirely on
    # exchange reuse, which a session can disable). Also saves each branch
    # re-running the scans + melt + aggregation. Pinned to the result.
    ranged = (
        g.repartitionByRange(int(parts), *ks, F.col("_v"))
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    wloc = Window.partitionBy(*keys, "_pid").orderBy("_v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local = ranged.select(
        *keys,
        "_pid",
        F.sum("_ca").over(wloc).alias("_la"),
        F.sum("_cb").over(wloc).alias("_lb"),
    )
    # per-(keys, partition) totals -> cumulative bases + per-key grand
    # totals: an O(|keys| x |partitions|)-row frame, broadcast back (range
    # partitions are ordered by construction and (keys, _v) sorts keys
    # first, so within a key, partition p's base is the sum of that key's
    # totals in partitions < p)
    totals = ranged.groupBy(*keys, "_pid").agg(
        F.sum("_ca").alias("_ta"), F.sum("_cb").alias("_tb")
    )
    wbase = Window.partitionBy(*keys).orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wtot = Window.partitionBy(*keys)
    base = totals.select(
        *keys,
        "_pid",
        F.coalesce(F.sum("_ta").over(wbase), F.lit(0)).alias("_ba"),
        F.coalesce(F.sum("_tb").over(wbase), F.lit(0)).alias("_bb"),
        F.sum("_ta").over(wtot).alias("_na"),
        F.sum("_tb").over(wtot).alias("_nb"),
    )
    c = local.join(F.broadcast(base), [*keys, "_pid"]).select(
        *keys,
        (F.col("_ba") + F.col("_la")).alias("_fa"),
        (F.col("_bb") + F.col("_lb")).alias("_fb"),
        "_na",
        "_nb",
    )
    # try_divide: a key present in only ONE frame has a zero count on the
    # other side — ANSI long/long division would fail the whole job on
    # that key; NULL matches DuckDB's divide-by-zero result, so the
    # one-sided key surfaces as (ks_stat NULL, n=0) in both engines
    aggs = [
        F.round(
            F.max(
                F.abs(
                    F.try_divide(F.col("_fa"), F.col("_na"))
                    - F.try_divide(F.col("_fb"), F.col("_nb"))
                )
            ),
            6,
        ).alias("ks_stat"),
        F.max("_na").alias("n_a"),
        F.max("_nb").alias("n_b"),
    ]
    out = c.groupBy(*keys).agg(*aggs) if keys else c.agg(*aggs)
    return caching.pin(out, ranged)


def key_skew_audit(
    df: DataFrame,
    key_cols: Sequence[str],
    k: int = 20,
) -> DataFrame:
    """Heavy-hitter profile of a prospective shuffle/join key: the top-k
    keys by row count with each key's share of the table and its skew
    factor (count / mean-count-per-key) — the audit a 100 TB job runs
    BEFORE picking partition keys, salting factors, or AQE skew-join
    thresholds. skew >> 1 on the head key is the "one giant entity"
    signature that motivates functions/skew.py.

    Arithmetic is engine-exact: share = cnt/total is one long/long
    division; skew = (cnt * n_keys) / total multiplies in DOUBLE first
    (same order both engines, and immune to the long-overflow a
    cnt*n_keys integer product would risk at scale).

    Scale shape: one partial-aggregated groupBy on the key (the same
    shuffle the audited job would pay), a 1-row totals aggregate
    broadcast-crossed back (bounded frame, the knn.py bounds pattern),
    and a TakeOrdered top-k — the per-key frame never sorts globally and
    never collects."""
    counts = df.groupBy(*key_cols).agg(F.count("*").alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("_total"), F.count("*").alias("_n_keys")
    )
    keyed = counts.crossJoin(F.broadcast(totals))
    return (
        keyed.select(
            *key_cols,
            "cnt",
            (F.col("cnt") / F.col("_total")).alias("share"),
            (F.col("cnt").cast("double") * F.col("_n_keys") / F.col("_total")).alias(
                "skew"
            ),
        )
        .orderBy(F.col("cnt").desc(), *[F.col(c).asc() for c in key_cols])
        .limit(k)
    )


def rolling_features(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    value_col: str,
    window: int = 5,
    lags: Sequence[int] = (1,),
) -> DataFrame:
    """Per-key rolling/lag feature engineering — the standard ML feature
    prep pass over an event series: trailing-``window`` mean/std/min/max
    (current row included, partial windows allowed at the head) plus
    ``lag_<k>`` columns. One exchange on the keys, one sort — the same
    shape as every windowed scorer here; at 100 TB the bound is the
    per-key sort spill, not memory.

    Deterministic ordering: rows order by (ts, value) within a key so
    same-timestamp rows cannot flip lag values between runs (the
    repetition a raw ts orderBy would allow)."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts).asc(), F.col(value_col).asc())
        .rowsBetween(-(int(window) - 1), 0)
    )
    lw = Window.partitionBy(*keys).orderBy(F.col(ts).asc(), F.col(value_col).asc())
    out = (
        df.withColumn(f"roll_mean_{window}", F.avg(value_col).over(w))
        .withColumn(f"roll_std_{window}", F.stddev_samp(value_col).over(w))
        .withColumn(f"roll_min_{window}", F.min(value_col).over(w))
        .withColumn(f"roll_max_{window}", F.max(value_col).over(w))
    )
    for k in lags:
        out = out.withColumn(f"lag_{int(k)}", F.lag(value_col, int(k)).over(lw))
    return out


#: Benford first-digit expected shares, log10(1 + 1/d) — module-level so the
#: Spark expression and the SQL oracle bake the IDENTICAL float literals
BENFORD_SHARES = {d: math.log10(1.0 + 1.0 / d) for d in range(1, 10)}


def benford_audit(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    scale: int = 100,
) -> DataFrame:
    """First-significant-digit (Benford's-law) audit per key — the classic
    fabricated/synthetic-data and unit-mismatch screen: per digit 1-9, the
    observed share vs the Benford expectation log10(1+1/d) and the excess.
    A key whose excesses are large and systematic (spikes at 1 and 5,
    say) warrants a provenance look before the data trains anything.

    Digit extraction is ENGINE-EXACT by construction: the value scales to
    an integer first (floor(|v| * scale)) and the digit is the first
    character of that integer's decimal rendering — integers render
    identically everywhere, where a log10-based digit could flip at
    power-of-10 ulp boundaries and double->string formatting differs
    between engines. Zero/null values are excluded (no leading digit).

    Scale shape: one partial-aggregated groupBy(keys, digit); the share
    window runs over the <= 9-rows-per-key aggregated frame."""
    iv = F.floor(F.abs(F.col(value_col)) * F.lit(int(scale))).cast("long")
    base = df.select(*keys, iv.alias("_iv")).filter(F.col("_iv") > 0)
    digit = F.substring(F.col("_iv").cast("string"), 1, 1).cast("int")
    counts = base.withColumn("digit", digit).groupBy(*keys, "digit").agg(
        F.count("*").alias("n")
    )
    total = F.sum("n").over(Window.partitionBy(*keys))
    expected = F.lit(None).cast("double")
    for d, s in sorted(BENFORD_SHARES.items()):
        expected = F.when(F.col("digit") == d, F.lit(s)).otherwise(expected)
    share = F.col("n") / total
    return counts.select(
        *keys,
        "digit",
        "n",
        F.round(share, 6).alias("share"),
        F.round(expected, 6).alias("benford_share"),
        F.round(share - expected, 6).alias("excess"),
    )


def column_profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Per-column completeness/cardinality data card: one row per column
    with (n_rows, n_nulls, null_frac, n_distinct) — the first table every
    ingest review reads, and the input to null-rate drift alerts. One
    aggregation pass computes every column's counts (Catalyst expands the
    multi-distinct into one shuffle over the requested columns); the melt
    to rows is a stack() projection of the single aggregate row, so the
    scan reads only ``cols`` and the shuffle carries counting state, not
    data. NULL n_distinct counts exclude NULLs (SQL COUNT DISTINCT
    semantics, identical in DuckDB)."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"_nn_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"_nd_{c}"))
    row = df.agg(*aggs)
    pairs = ", ".join(
        f"'{c}', `_nn_{c}`, `_nd_{c}`" for c in cols
    )
    melted = row.select(
        F.col("_n"),
        F.expr(
            f"stack({len(cols)}, {pairs}) as (column, _nonnull, n_distinct)"
        ),
    )
    return melted.select(
        "column",
        F.col("_n").alias("n_rows"),
        (F.col("_n") - F.col("_nonnull")).alias("n_nulls"),
        F.round((F.col("_n") - F.col("_nonnull")) / F.col("_n"), 6).alias(
            "null_frac"
        ),
        "n_distinct",
    )


def column_profile_drift(
    df_a: DataFrame, df_b: DataFrame, cols: Sequence[str]
) -> DataFrame:
    """Data-quality drift between two snapshots: column_profile of each
    side joined on the column name, with null-fraction and distinct-count
    deltas — the alert feed behind 'a upstream schema change silently
    nulled a field'. Two single-pass aggregates + a |cols|-row join; the
    fact tables never co-shuffle."""
    a = column_profile(df_a, cols).select(
        "column",
        F.col("n_rows").alias("n_rows_a"),
        F.col("null_frac").alias("null_frac_a"),
        F.col("n_distinct").alias("n_distinct_a"),
    )
    b = column_profile(df_b, cols).select(
        "column",
        F.col("n_rows").alias("n_rows_b"),
        F.col("null_frac").alias("null_frac_b"),
        F.col("n_distinct").alias("n_distinct_b"),
    )
    return a.join(b, "column").select(
        "column",
        "n_rows_a",
        "n_rows_b",
        "null_frac_a",
        "null_frac_b",
        F.round(F.col("null_frac_b") - F.col("null_frac_a"), 6).alias(
            "null_frac_delta"
        ),
        "n_distinct_a",
        "n_distinct_b",
    )


def numeric_profile(
    df: DataFrame,
    cols: Sequence[str],
    quantiles: Sequence[float] = (0.25, 0.5, 0.75),
    exact: bool = True,
    method: str = "prefix",
) -> DataFrame:
    """Per-column numeric distribution card: one row per column with
    (n, n_nulls, mean, std, min, q25, q50, q75, max) — the numeric
    companion to ``column_profile``'s completeness card, and the summary
    table a feature/label review reads before training (the reference's
    olss.py score-statistics report generalized to any numeric column,
    `python/app/olss.py:35-115`). Quantiles are EXACT linear-interpolated
    order statistics (``quantile_cont`` semantics), so the card is
    oracle-verifiable.

    Two exact engines, same values bit-for-bit:

    - ``method='prefix'`` (default, the 100 TB shape): one moments pass
      (count/nulls/mean/std/min/max — a single partial+final aggregate
      over a pruned scan) plus one melt -> partial-aggregated
      groupBy(column, value) -> the repo's DISTRIBUTED prefix-sum CDF
      (the ks_two_sample machinery: range partition by (column, value),
      per-slice ROWS cumsum, broadcast per-slice base offsets — NO
      single-partition stage and no per-column value map, so a column
      with billions of distinct values profiles as safely as an enum).
      The straddling order statistics come from a conditional min over
      the cum frame against a |cols| x |quantiles| broadcast rank spec;
      the interpolation replays Spark's ``percentile`` arithmetic
      (pos = q*(n-1); lo*(ceil(pos)-pos) + hi*(pos-floor(pos))) so both
      methods agree exactly.
    - ``method='map'``: the single-aggregate ``percentile`` form — one
      pass total, but the aggregation state is a per-column
      O(distinct values) map; the right choice for enum-like columns or
      small frames.

    ``exact=False`` swaps the map form's aggregate for
    ``approx_percentile`` (bounded GK sketch state) — oracle-exempt, for
    one-pass cards over unbounded-cardinality columns where the second
    pass of 'prefix' is unwanted.
    """
    if not (0 < len(quantiles) and all(0.0 <= q <= 1.0 for q in quantiles)):
        raise ValueError("quantiles must be in [0, 1] and non-empty")
    if method not in ("prefix", "map"):
        raise ValueError("method must be 'prefix' or 'map'")
    qnames = [f"q{int(round(q * 100))}" for q in quantiles]

    if not exact or method == "map":
        qarr = F.array(*[F.lit(float(q)) for q in quantiles])
        pct = F.percentile if exact else F.approx_percentile
        aggs = [F.count(F.lit(1)).alias("_n")]
        for c in cols:
            col = F.col(c).cast("double")
            aggs += [
                F.count(col).alias(f"_nn_{c}"),
                F.avg(col).alias(f"_mean_{c}"),
                F.stddev_samp(col).alias(f"_std_{c}"),
                F.min(col).alias(f"_min_{c}"),
                pct(col, qarr).alias(f"_q_{c}"),
                F.max(col).alias(f"_max_{c}"),
            ]
        row = df.agg(*aggs)
        pairs = ", ".join(
            f"'{c}', `_nn_{c}`, `_mean_{c}`, `_std_{c}`, `_min_{c}`, "
            + ", ".join(f"`_q_{c}`[{i}]" for i in range(len(quantiles)))
            + f", `_max_{c}`"
            for c in cols
        )
        melted = row.select(
            F.col("_n"),
            F.expr(
                f"stack({len(cols)}, {pairs}) as "
                f"(column, _nonnull, mean, std, min, {', '.join(qnames)}, max)"
            ),
        )
        return melted.select(
            "column",
            F.col("_nonnull").alias("n"),
            (F.col("_n") - F.col("_nonnull")).alias("n_nulls"),
            "mean",
            "std",
            "min",
            *qnames,
            "max",
        )

    # ---- method='prefix': moments pass + distributed prefix-sum quantiles
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        col = F.col(c).cast("double")
        aggs += [
            F.count(col).alias(f"_nn_{c}"),
            F.avg(col).alias(f"_mean_{c}"),
            F.stddev_samp(col).alias(f"_std_{c}"),
            F.min(col).alias(f"_min_{c}"),
            F.max(col).alias(f"_max_{c}"),
        ]
    row = df.agg(*aggs)
    pairs = ", ".join(
        f"'{c}', `_nn_{c}`, `_mean_{c}`, `_std_{c}`, `_min_{c}`, `_max_{c}`"
        for c in cols
    )
    moments = row.select(
        F.col("_n"),
        F.expr(
            f"stack({len(cols)}, {pairs}) as "
            "(column, _nonnull, mean, std, min, max)"
        ),
    ).select(
        "column",
        F.col("_nonnull").alias("n"),
        (F.col("_n") - F.col("_nonnull")).alias("n_nulls"),
        "mean",
        "std",
        "min",
        "max",
    )

    # melt to (column, value) occurrence counts: one scan, one
    # partial-aggregated groupBy — distinct-value granularity
    melted = (
        df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("column"),
                            F.col(c).cast("double").alias("_v"),
                        )
                        for c in cols
                    ]
                )
            ).alias("_s")
        )
        .select(F.col("_s.column").alias("column"), F.col("_s._v").alias("_v"))
        .filter(F.col("_v").isNotNull())
        .groupBy("column", "_v")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    # distributed prefix sum keyed on the column (the ks_two_sample /
    # pack_sequences pattern): range partition, per-slice cumsum,
    # broadcast per-(column, slice) base offsets
    parts = df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        melted.repartitionByRange(int(parts), F.col("column"), F.col("_v"))
        .withColumn("_pid", F.spark_partition_id())
        # persist AFTER the range exchange + _pid assignment: the ranged
        # frame feeds THREE branches (cumsum window, per-slice totals ->
        # base offsets, rank spec) whose offsets only reconcile if every
        # branch observes the SAME physical partitioning. Without a cache
        # that consistency rides on exchange reuse (and each branch
        # re-runs the scan + melt + aggregation — measured 4 FileScans of
        # the fact table per card); persisting ANY frame *below* the
        # range exchange instead breaks reuse and lets the range sampler
        # draw different boundaries per branch, silently misaligning the
        # CDF (caught by the parity mirror). The frame is
        # |distinct (column, value)| narrow rows; pinned to the result,
        # caller releases.
        .persist()
    )
    wloc = (
        Window.partitionBy("column", "_pid")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.select(
        "column", "_pid", "_v", F.sum("_c").over(wloc).alias("_lf")
    )
    totals = ranged.groupBy("column", "_pid").agg(F.sum("_c").alias("_t"))
    wbase = (
        Window.partitionBy("column")
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = totals.select(
        "column",
        "_pid",
        F.coalesce(F.sum("_t").over(wbase), F.lit(0)).alias("_b"),
        F.sum("_t").over(Window.partitionBy("column")).alias("_cnt"),
    )
    cum = local.join(F.broadcast(base), ["column", "_pid"]).select(
        "column", "_v", (F.col("_b") + F.col("_lf")).alias("_f"), "_cnt"
    )
    # rank spec per (column, quantile): Spark percentile arithmetic —
    # pos = q*(n-1) (one double multiply), straddling 0-based indices
    # floor/ceil(pos); built from the tiny per-column totals frame
    spec = (
        base.groupBy("column")
        .agg(F.max("_cnt").alias("_cnt"))
        .select(
            "column",
            F.explode(
                F.array(*[F.lit(float(q)) for q in quantiles])
            ).alias("_q"),
            "_cnt",
        )
        .withColumn("_pos", F.col("_q") * (F.col("_cnt") - 1).cast("double"))
        .withColumn("_lo", F.floor(F.col("_pos")))
        .withColumn("_hi", F.ceil(F.col("_pos")))
    )
    straddle = (
        cum.join(F.broadcast(spec), "column")
        .groupBy("column", "_q", "_pos", "_lo", "_hi")
        .agg(
            F.min(F.when(F.col("_f") >= F.col("_lo") + 1, F.col("_v"))).alias(
                "_vlo"
            ),
            F.min(F.when(F.col("_f") >= F.col("_hi") + 1, F.col("_v"))).alias(
                "_vhi"
            ),
        )
    )
    qval = F.when(F.col("_lo") == F.col("_hi"), F.col("_vlo")).otherwise(
        F.col("_vlo") * (F.col("_hi").cast("double") - F.col("_pos"))
        + F.col("_vhi") * (F.col("_pos") - F.col("_lo").cast("double"))
    )
    qcols = [
        F.min(F.when(F.col("_q") == float(q), F.col("_qv"))).alias(name)
        for q, name in zip(quantiles, qnames)
    ]
    quants = (
        straddle.withColumn("_qv", qval).groupBy("column").agg(*qcols)
    )
    out = moments.join(quants, "column", "left").select(
        "column", "n", "n_nulls", "mean", "std", "min", *qnames, "max"
    )
    return caching.pin(out, ranged)


def numeric_profile_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    cols: Sequence[str],
    quantiles: Sequence[float] = (0.25, 0.5, 0.75),
    method: str = "prefix",
) -> DataFrame:
    """Numeric distribution drift between two snapshots: per-column
    mean / std / median deltas — the feature-drift alert feed ("did
    yesterday's deploy shift a model input's distribution?"), the numeric
    companion to ``column_profile_drift``'s completeness deltas and the
    summary-statistic complement of ``ks_two_sample``'s shape test (KS
    says THAT a distribution moved; this card says WHERE — location,
    scale, or tail).

    The location quantile is 0.5 when ``quantiles`` contains it (the
    default), else the middle of the requested list. ``method='prefix'``
    (default) runs ONE joint distributed prefix-sum CDF over both sides
    (the ks_two_sample two-indicator shape: each side's cumulative counts
    ride the same range-partitioned pass), plus one cheap moments
    aggregate per side — half the quantile machinery of two independent
    cards, same values bit-for-bit. ``method='map'`` joins two one-pass
    ``numeric_profile`` cards instead. The fact tables never co-shuffle
    in either form; an empty side reports NULL medians, never a garbage
    order statistic."""
    if not (0 < len(quantiles) and all(0.0 <= float(q) <= 1.0 for q in quantiles)):
        raise ValueError("quantiles must be in [0, 1] and non-empty")
    if method not in ("prefix", "map"):
        raise ValueError("method must be 'prefix' or 'map'")
    loc_q = (
        0.5
        if any(float(q) == 0.5 for q in quantiles)
        else float(sorted(float(q) for q in quantiles)[len(quantiles) // 2])
    )
    if method == "map":
        qname = f"q{int(round(loc_q * 100))}"
        a = numeric_profile(df_a, cols, (loc_q,), method="map").select(
            "column",
            F.col("n").alias("n_a"),
            F.col("mean").alias("_ma"),
            F.col("std").alias("_sa"),
            F.col(qname).alias("_da"),
        )
        b = numeric_profile(df_b, cols, (loc_q,), method="map").select(
            "column",
            F.col("n").alias("n_b"),
            F.col("mean").alias("_mb"),
            F.col("std").alias("_sb"),
            F.col(qname).alias("_db"),
        )
        joined = a.join(b, "column")
        return _npd_shape(joined)

    def moments(df: DataFrame, s: str) -> DataFrame:
        aggs = []
        for c in cols:
            col = F.col(c).cast("double")
            aggs += [
                F.count(col).alias(f"_nn_{c}"),
                F.avg(col).alias(f"_mean_{c}"),
                F.stddev_samp(col).alias(f"_std_{c}"),
            ]
        row = df.agg(*aggs)
        pairs = ", ".join(
            f"'{c}', `_nn_{c}`, `_mean_{c}`, `_std_{c}`" for c in cols
        )
        return row.select(
            F.expr(
                f"stack({len(cols)}, {pairs}) as (column, n_{s}, _m{s}, _s{s})"
            )
        )

    def melt(df: DataFrame, ia: int, ib: int) -> DataFrame:
        return (
            df.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(c).alias("column"),
                                F.col(c).cast("double").alias("_v"),
                            )
                            for c in cols
                        ]
                    )
                ).alias("_s")
            )
            .select(F.col("_s.column").alias("column"), F.col("_s._v").alias("_v"))
            .filter(F.col("_v").isNotNull())
            .select(
                "column", "_v", F.lit(ia).alias("_ia"), F.lit(ib).alias("_ib")
            )
        )

    g = (
        melt(df_a, 1, 0)
        .unionByName(melt(df_b, 0, 1))
        .groupBy("column", "_v")
        .agg(F.sum("_ia").alias("_ca"), F.sum("_ib").alias("_cb"))
    )
    parts = df_a.sparkSession.sparkContext.defaultParallelism
    ranged = (
        g.repartitionByRange(int(parts), F.col("column"), F.col("_v"))
        .withColumn("_pid", F.spark_partition_id())
        # persist AFTER the range exchange — same three-consumer offset-
        # consistency + recompute rationale as numeric_profile's ranged
        # frame (a cache below the exchange breaks reuse and misaligns
        # the per-branch range boundaries)
        .persist()
    )
    wloc = (
        Window.partitionBy("column", "_pid")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.select(
        "column",
        "_pid",
        "_v",
        F.sum("_ca").over(wloc).alias("_lfa"),
        F.sum("_cb").over(wloc).alias("_lfb"),
    )
    totals = ranged.groupBy("column", "_pid").agg(
        F.sum("_ca").alias("_ta"), F.sum("_cb").alias("_tb")
    )
    wbase = (
        Window.partitionBy("column")
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wtot = Window.partitionBy("column")
    base = totals.select(
        "column",
        "_pid",
        F.coalesce(F.sum("_ta").over(wbase), F.lit(0)).alias("_ba"),
        F.coalesce(F.sum("_tb").over(wbase), F.lit(0)).alias("_bb"),
        F.sum("_ta").over(wtot).alias("_cna"),
        F.sum("_tb").over(wtot).alias("_cnb"),
    )
    cum = local.join(F.broadcast(base), ["column", "_pid"]).select(
        "column",
        "_v",
        (F.col("_ba") + F.col("_lfa")).alias("_fa"),
        (F.col("_bb") + F.col("_lfb")).alias("_fb"),
    )
    spec = base.groupBy("column").agg(
        F.max("_cna").alias("_cna"), F.max("_cnb").alias("_cnb")
    )
    for s in ("a", "b"):
        spec = (
            spec.withColumn(
                f"_pos{s}",
                F.lit(loc_q) * (F.col(f"_cn{s}") - 1).cast("double"),
            )
            .withColumn(f"_lo{s}", F.floor(F.col(f"_pos{s}")))
            .withColumn(f"_hi{s}", F.ceil(F.col(f"_pos{s}")))
        )
    keys = [
        "column", "_cna", "_cnb",
        "_posa", "_loa", "_hia", "_posb", "_lob", "_hib",
    ]
    st = (
        cum.join(F.broadcast(spec), "column")
        .groupBy(*keys)
        .agg(
            F.min(F.when(F.col("_fa") >= F.col("_loa") + 1, F.col("_v"))).alias("_vloa"),
            F.min(F.when(F.col("_fa") >= F.col("_hia") + 1, F.col("_v"))).alias("_vhia"),
            F.min(F.when(F.col("_fb") >= F.col("_lob") + 1, F.col("_v"))).alias("_vlob"),
            F.min(F.when(F.col("_fb") >= F.col("_hib") + 1, F.col("_v"))).alias("_vhib"),
        )
    )

    def qv(s: str):
        interp = F.when(
            F.col(f"_lo{s}") == F.col(f"_hi{s}"), F.col(f"_vlo{s}")
        ).otherwise(
            F.col(f"_vlo{s}") * (F.col(f"_hi{s}").cast("double") - F.col(f"_pos{s}"))
            + F.col(f"_vhi{s}") * (F.col(f"_pos{s}") - F.col(f"_lo{s}").cast("double"))
        )
        # an empty side must report NULL, not the min of the other side's
        # values (its rank thresholds would degenerate to 0)
        return F.when(F.col(f"_cn{s}") > 0, interp)

    med = st.select("column", qv("a").alias("_da"), qv("b").alias("_db"))
    joined = (
        moments(df_a, "a")
        .join(moments(df_b, "b"), "column")
        .join(med, "column", "left")
    )
    return caching.pin(_npd_shape(joined), ranged)


def _npd_shape(joined: DataFrame) -> DataFrame:
    """Shared output projection for numeric_profile_drift's two engines."""
    return joined.select(
        "column",
        "n_a",
        "n_b",
        F.col("_ma").alias("mean_a"),
        F.col("_mb").alias("mean_b"),
        F.round(F.col("_mb") - F.col("_ma"), 6).alias("mean_delta"),
        F.col("_sa").alias("std_a"),
        F.col("_sb").alias("std_b"),
        F.round(F.col("_sb") - F.col("_sa"), 6).alias("std_delta"),
        F.col("_da").alias("median_a"),
        F.col("_db").alias("median_b"),
        F.round(F.col("_db") - F.col("_da"), 6).alias("median_delta"),
    )


def finite_audit(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Per-column non-finite-value audit: one row per numeric column with
    (n_rows, n_null, n_nan, n_pos_inf, n_neg_inf, n_finite) — the gate
    report every stats operator needs BEFORE it runs. IEEE non-finite
    doubles are data-quality violations first (SCALE.md round-7 note:
    cross-engine stats semantics diverge on NaN/Inf — DuckDB's
    STDDEV_SAMP errors on Inf, NaN quantile rank differs), so the audit
    makes the violation visible and :func:`finite_gate` removes it before
    any mean/std/quantile touches the column.

    One aggregation pass over all columns (map-side partial counts, the
    shuffle carries counter state, not data); the melt to rows is a
    stack() projection of the single aggregate row, same shape as
    :func:`column_profile`. NaN is detected with isnan (NaN == anything
    is false in both engines); ±Inf by equality, which NaN can never
    satisfy. Counts are pure longs, so the result hashes identically on
    any engine regardless of the non-finite payloads that produced it.
    """
    if not cols:
        raise ValueError("finite_audit needs at least one column")
    # sums coalesce to 0 so an EMPTY frame audits as all-zero counts like
    # the count() columns do (SUM over zero rows is NULL; a gated-empty
    # frame otherwise reported NULL n_nan/n_±inf — caught by a hypothesis
    # draw in test_finite_gate_partitions_and_audit_agrees). Non-empty
    # inputs are value-identical, so the declared query is unchanged.
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        col = F.col(c).cast("double")
        aggs.append(F.count(col).alias(f"_nn_{c}"))
        aggs.append(
            F.coalesce(
                F.sum(F.when(F.isnan(col), 1).otherwise(0)), F.lit(0)
            ).alias(f"_nan_{c}")
        )
        aggs.append(
            F.coalesce(
                F.sum(F.when(col == F.lit(float("inf")), 1).otherwise(0)),
                F.lit(0),
            ).alias(f"_pi_{c}")
        )
        aggs.append(
            F.coalesce(
                F.sum(F.when(col == F.lit(float("-inf")), 1).otherwise(0)),
                F.lit(0),
            ).alias(f"_ni_{c}")
        )
    row = df.agg(*aggs)
    pairs = ", ".join(
        f"'{c}', `_nn_{c}`, `_nan_{c}`, `_pi_{c}`, `_ni_{c}`" for c in cols
    )
    melted = row.select(
        F.col("_n"),
        F.expr(
            f"stack({len(cols)}, {pairs}) as "
            "(column, _nonnull, n_nan, n_pos_inf, n_neg_inf)"
        ),
    )
    return melted.select(
        "column",
        F.col("_n").alias("n_rows"),
        (F.col("_n") - F.col("_nonnull")).alias("n_null"),
        "n_nan",
        "n_pos_inf",
        "n_neg_inf",
        (
            F.col("_nonnull")
            - F.col("n_nan")
            - F.col("n_pos_inf")
            - F.col("n_neg_inf")
        ).alias("n_finite"),
    )


def finite_gate(
    df: DataFrame, cols: Sequence[str], mode: str = "drop"
) -> DataFrame:
    """Enforce the finite-input contract of the stats family: remove (or
    NULL out) rows carrying NaN/±Inf in any of ``cols`` so every
    downstream mean/std/quantile/KS operator sees only finite doubles —
    the pre-filter SCALE.md's non-finite boundary note prescribes.

    ``mode='drop'`` removes offending rows (NULLs pass — they are the
    *missing* signal, handled by every aggregate already);
    ``mode='null'`` keeps the row and NULLs only the offending cells, for
    pipelines that must preserve row counts. Pure codegen predicates
    (isnan + ±Inf equality per column), no shuffle — the filter pushes
    into the scan like any other predicate.
    """
    if mode not in ("drop", "null"):
        raise ValueError(f"finite_gate mode must be 'drop' or 'null', got {mode!r}")
    if not cols:
        raise ValueError("finite_gate needs at least one column")

    def bad(c: str) -> F.Column:
        col = F.col(c).cast("double")
        return F.isnan(col) | (col == F.lit(float("inf"))) | (
            col == F.lit(float("-inf"))
        )

    if mode == "drop":
        pred = None
        for c in cols:
            pred = bad(c) if pred is None else (pred | bad(c))
        return df.filter(~F.coalesce(pred, F.lit(False)))
    out = df
    for c in cols:
        out = out.withColumn(
            c, F.when(bad(c), F.lit(None)).otherwise(F.col(c))
        )
    return out

"""Per-key ordered numpy sequence detectors (SURVEY.md §2.1 #5, #6, #7, #9)
— the applyInPandas family. Spark sorts/spills the group feed; each key group
is processed by a vectorized numpy kernel (no scipy dependency — the
two-sample statistics are implemented directly).

  spectral_residual ≙ SpectralResiduePredictor (/root/reference/spark/src/
      main/scala/org/beymani/spark/seq/SpectralResiduePredictor.scala:74-153;
      hoidla FastFourierTransformWindow): saliency map — FFT, log amplitude
      minus its moving average, inverse FFT, residue minus trailing-neighbor
      average (the SR step of the SR-CNN paper).
  one_step_ahead ≙ OneStepAheadPredictor (/root/reference/spark/.../seq/
      OneStepAheadPredictor.scala:91-196): predict next value from a trailing
      window (average / weighted / exponential smoothing), score =
      |pred-actual| normalized by the residual std; an outlier's value is
      replaced by its prediction inside the window (stateful feedback,
      :150-151) — inherently sequential per key.
  subsequence_distance ≙ SubSequenceDistanceDetector (/root/reference/spark/
      .../seq/SubSequenceDistanceDetector.scala:69-199): discord score of the
      window at offset i = min Euclidean distance to all non-overlapping
      windows of the reference series.
  change_point ≙ ChangePointDetector (/root/reference/spark/.../misc/
      ChangePointDetector.scala:47-175; hoidla two-sample stat windows):
      KS / Cramér-von Mises / Anderson-Darling statistic between the halves
      of a sliding window, emitted at the window center.
"""
from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StructType


def _grouped(df: DataFrame, keys: Sequence[str], fn, extra_schema: str) -> DataFrame:
    schema = StructType(list(df.schema.fields))
    for part in extra_schema.split(","):
        name, typ = part.strip().rsplit(" ", 1)
        schema = schema.add(name, typ)
    return df.groupBy(*keys).applyInPandas(fn, schema=schema)


def spectral_residual(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    value: str,
    avg_window: int = 3,
    neighbor_window: int = 21,
    threshold: float = 3.0,
) -> DataFrame:
    """Adds sr_score (saliency normalized by its mean) and label."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts).reset_index(drop=True)
        x = pdf[value].to_numpy(dtype=float)
        n = len(x)
        if n < 4:
            sal = np.zeros(n)
        else:
            spec = np.fft.fft(x)
            amp = np.abs(spec)
            amp[amp == 0] = 1e-12
            log_amp = np.log(amp)
            kern = np.ones(avg_window) / avg_window
            avg_log = np.convolve(log_amp, kern, mode="same")
            residual = log_amp - avg_log
            sal = np.abs(np.fft.ifft(np.exp(residual + 1j * np.angle(spec))))
        m = sal.mean() if sal.size and sal.mean() > 0 else 1.0
        score = (sal - m) / m
        out = pdf.copy()
        out["sr_score"] = score
        out["label"] = np.where(score > threshold, "O", "N")
        return out

    return _grouped(df, keys, kernel, "sr_score double, label string")


def one_step_ahead(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    value: str,
    window: int = 8,
    method: str = "average",
    alpha: float = 0.3,
    threshold: float = 3.0,
) -> DataFrame:
    """Adds predicted, osa_score, label; outliers are replaced by their
    prediction inside the rolling window (reference feedback semantics)."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts).reset_index(drop=True)
        x = pdf[value].to_numpy(dtype=float)
        n = len(x)
        work = x.copy()
        pred = np.full(n, np.nan)
        score = np.zeros(n)
        # running residual moments (population std, matching np.std ddof=0)
        r_n, r_s1, r_s2 = 0, 0.0, 0.0
        if method == "ewma":
            ew = (1 - alpha) ** np.arange(window - 1, -1, -1)
            ew_sum = ew.sum()
        for i in range(window, n):
            w = work[i - window : i]
            if method == "average":
                p = w.mean()
            elif method == "ewma":
                p = float((w * ew).sum() / ew_sum)
            else:
                raise ValueError(f"unknown method: {method}")
            pred[i] = p
            r = x[i] - p
            if r_n >= 3:
                var = r_s2 / r_n - (r_s1 / r_n) ** 2
                sd = var**0.5 if var > 0 else 0.0
            else:
                sd = 0.0
            s = abs(r) / sd if sd > 0 else 0.0
            score[i] = s
            if s > threshold:
                work[i] = p  # feedback: outlier replaced by prediction
            else:
                r_n += 1
                r_s1 += r
                r_s2 += r * r
        out = pdf.copy()
        out["predicted"] = pred
        out["osa_score"] = score
        out["label"] = np.where(score > threshold, "O", "N")
        return out

    return _grouped(df, keys, kernel, "predicted double, osa_score double, label string")


def subsequence_distance(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    value: str,
    window: int = 16,
    threshold: float | None = None,
    exclusion: int | None = None,
) -> DataFrame:
    """Discord detection: one output row per window offset with the min
    distance to any non-overlapping window (self-join of subsequences)."""
    excl = exclusion if exclusion is not None else window

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts).reset_index(drop=True)
        x = pdf[value].to_numpy(dtype=float)
        n = len(x) - window + 1
        key_cols = {k: pdf[k].iloc[0] for k in keys}
        if n <= 1:
            return pd.DataFrame(columns=[*keys, "offset", "start_ts", "discord_score"])
        # windows matrix (n, window) via stride trick; blocked row sweep keeps
        # memory at O(block * n) instead of O(n^2). float32 matmul: scores are
        # relative discord rankings, not oracle-compared values
        win = np.ascontiguousarray(
            np.lib.stride_tricks.sliding_window_view(x, window), dtype=np.float32
        )
        win_t = win.T.copy()
        sq = (win.astype(np.float64) ** 2).sum(axis=1).astype(np.float32)
        block = 2048
        dmin = np.empty(n)
        for b0 in range(0, n, block):
            b1 = min(b0 + block, n)
            d2 = sq[b0:b1, None] + sq[None, :] - 2.0 * (win[b0:b1] @ win_t)
            for i in range(b0, b1):  # exclude self + trivially-overlapping
                lo = max(0, i - excl + 1)
                hi = min(n, i + excl)
                d2[i - b0, lo:hi] = np.inf
            dmin[b0:b1] = np.sqrt(np.maximum(d2.min(axis=1), 0.0))
        out = pd.DataFrame(
            {
                **{k: [v] * n for k, v in key_cols.items()},
                "offset": np.arange(n),
                "start_ts": pdf[ts].iloc[:n].to_numpy(),
                "discord_score": dmin,
            }
        )
        return out

    key_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema if f.name in keys
    )
    ts_type = next(f.dataType.simpleString() for f in df.schema if f.name == ts)
    return df.groupBy(*keys).applyInPandas(
        kernel,
        schema=f"{key_schema}, offset long, start_ts {ts_type}, discord_score double",
    )


def _ks_stat(a: np.ndarray, b: np.ndarray) -> float:
    """Two-sample Kolmogorov-Smirnov statistic (no scipy)."""
    all_v = np.sort(np.concatenate([a, b]))
    ca = np.searchsorted(np.sort(a), all_v, side="right") / len(a)
    cb = np.searchsorted(np.sort(b), all_v, side="right") / len(b)
    return float(np.abs(ca - cb).max())


def _cvm_stat(a: np.ndarray, b: np.ndarray) -> float:
    """Two-sample Cramér-von Mises T statistic."""
    n, m = len(a), len(b)
    both = np.concatenate([a, b])
    ranks = both.argsort().argsort() + 1
    ra = np.sort(ranks[:n])  # ranks of the sorted sample (Anderson 1962 form)
    rb = np.sort(ranks[n:])
    u = n * ((ra - np.arange(1, n + 1)) ** 2).sum() + m * (
        (rb - np.arange(1, m + 1)) ** 2
    ).sum()
    t = u / (n * m * (n + m)) - (4 * n * m - 1) / (6 * (n + m))
    return float(t)


def _ad_stat(a: np.ndarray, b: np.ndarray) -> float:
    """Two-sample Anderson-Darling statistic (k-sample form, k=2)."""
    n, m = len(a), len(b)
    nt = n + m
    both = np.concatenate([a, b])
    order = both.argsort(kind="mergesort")
    z = both[order]
    from_a = (order < n).astype(float)
    mi = np.cumsum(from_a)[:-1]
    i = np.arange(1, nt)
    num = (mi * nt - i * n) ** 2
    den = i * (nt - i)
    a2 = (num / den).sum() / (n * m / nt) / nt
    return float(a2)


_STATS = {"ks": _ks_stat, "cvm": _cvm_stat, "ad": _ad_stat}


def change_point(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    value: str,
    window: int = 64,
    step: int = 8,
    stat: str = "ks",
    critical_value: float | None = None,
) -> DataFrame:
    """Sliding two-sample test between window halves; emits (keys..., center
    ts, stat value[, is_change]) every ``step`` offsets."""
    if stat not in _STATS:
        raise ValueError(f"unknown stat: {stat}")
    stat_fn = _STATS[stat]
    half = window // 2

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts).reset_index(drop=True)
        x = pdf[value].to_numpy(dtype=float)
        rows = []
        key_cols = {k: pdf[k].iloc[0] for k in keys}
        for start in range(0, len(x) - window + 1, step):
            a = x[start : start + half]
            b = x[start + half : start + window]
            s = stat_fn(a, b)
            row = dict(key_cols)
            row["center_ts"] = pdf[ts].iloc[start + half]
            row["stat"] = s
            if critical_value is not None:
                row["is_change"] = bool(s >= critical_value)
            rows.append(row)
        cols = [*keys, "center_ts", "stat"] + (
            ["is_change"] if critical_value is not None else []
        )
        return pd.DataFrame(rows, columns=cols)

    key_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema if f.name in keys
    )
    ts_type = next(f.dataType.simpleString() for f in df.schema if f.name == ts)
    extra = ", is_change boolean" if critical_value is not None else ""
    return df.groupBy(*keys).applyInPandas(
        kernel, schema=f"{key_schema}, center_ts {ts_type}, stat double{extra}"
    )

"""Concept-drift detectors (SURVEY.md §2.5), batch form: per-key
applyInPandas over seq-ordered 0/1 error streams, emitting the reference's
per-row diagnostics + drift flag. State in/out is explicit (a dict of
counters), mirroring the reference's save/restore files so the same kernels
drive the Structured Streaming wrappers.

Reference: /root/reference/python/lib/sucodr.py —
  ddm   :59-89   (Gama DDM: error rate + binomial sd vs running minimum)
  eddm  :115-161 (distance-between-errors running stats vs max)
  fhddm :186-219 (sliding-window accuracy vs max, Hoeffding bound). The
                 reference's bound sqrt(0.5*ln(2/δ)*w) exceeds 1 for all
                 realistic (δ, w) so it can never fire; we use the standard
                 FHDDM bound sqrt(ln(1/δ)/(2w)) and document the deviation.
  lp    :235-262 (signed prediction-disagreement rate)
  ecdd  :281-310 (EWMA chart with dynamic control limit)
  aggregateDrift/anyDrift/allDrift :335-361 (consensus across detectors)
"""
from __future__ import annotations

import math
from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ddm_scan(values: np.ndarray, threshold: float = 3.0, warmup: int = 30, state: dict | None = None):
    """DDM over a 0/1 error array -> (DataFrame cols dict, end state)."""
    st = dict(state or {})
    count = st.get("count", 0)
    ecount = st.get("ecount", 0)
    pr_min = st.get("pr_min")
    sd_min = st.get("sd_min")
    n = len(values)
    pr_out = np.full(n, np.nan)
    sd_out = np.full(n, np.nan)
    drift = np.zeros(n, dtype=int)
    start = 0
    if pr_min is None:
        # warmup seeding is resumable: a restored state with count < warmup
        # (first micro-batch shorter than warmup) continues seeding here
        w = min(max(warmup - count, 0), n)
        for i in range(w):
            ecount += int(values[i] == 1)
            count += 1
        start = w
        if count >= warmup and count:
            pr_min = ecount / count
            sd_min = math.sqrt(pr_min * (1 - pr_min) / count)
        else:
            end = {"count": count, "ecount": ecount, "pr_min": None, "sd_min": None}
            return {"pr": pr_out, "sd": sd_out, "drift": drift}, end
    for i in range(start, n):
        ecount += int(values[i] == 1)
        count += 1
        pr = ecount / count
        sd = math.sqrt(pr * (1 - pr) / count)
        pr_out[i] = pr
        sd_out[i] = sd
        drift[i] = 1 if (pr + sd) > (pr_min + threshold * sd_min) else 0
        if (pr + sd) < (pr_min + sd_min):
            pr_min, sd_min = pr, sd
    end = {"count": count, "ecount": ecount, "pr_min": pr_min, "sd_min": sd_min}
    return {"pr": pr_out, "sd": sd_out, "drift": drift}, end


def eddm_scan(values: np.ndarray, threshold: float = 0.9, warmup: int = 30, state: dict | None = None):
    """EDDM: running mean/sd of distance-between-errors vs historical max."""
    st = dict(state or {})
    cnt = st.get("count", 0)
    s1 = st.get("sum", 0.0)
    s2 = st.get("sum_sq", 0.0)
    last_er = st.get("last_er")
    mean_max = st.get("mean_max")
    sd_max = st.get("sd_max")
    max_lim = (mean_max + 2.0 * sd_max) if mean_max is not None else 0.0
    n = len(values)
    cur_out = np.full(n, np.nan)
    drift = np.zeros(n, dtype=int)
    pdr = 0
    pos0 = st.get("pos", 0)
    for i in range(n):
        pos = pos0 + i
        if values[i] == 1:
            if last_er is not None:
                dist = pos - last_er
                cnt += 1
                s1 += dist
                s2 += dist * dist
                if cnt >= 2:
                    mean = s1 / cnt
                    var = (s2 - s1 * s1 / cnt) / (cnt - 1)
                    sd = math.sqrt(var) if var > 0 else 0.0
                    cur = mean + 2.0 * sd
                    if cur > max_lim:
                        mean_max, sd_max, max_lim = mean, sd, cur
                    if max_lim > 0 and pos >= warmup:
                        pdr = 1 if (cur / max_lim) < threshold else 0
                    cur_out[i] = cur
            last_er = pos
        drift[i] = pdr
    end = {
        "count": cnt, "sum": s1, "sum_sq": s2, "last_er": last_er,
        "mean_max": mean_max, "sd_max": sd_max, "pos": pos0 + n,
    }
    return {"cur": cur_out, "drift": drift}, end


def fhddm_scan(values: np.ndarray, conf_level: float = 0.000001, win_size: int = 100, state: dict | None = None):
    """FHDDM: sliding accuracy window vs max accuracy, Hoeffding bound
    sqrt(ln(1/δ)/(2w)) (standard form; see module docstring)."""
    st = dict(state or {})
    max_acc = st.get("max_acc")
    n = len(values)
    thr = math.sqrt(math.log(1.0 / conf_level) / (2.0 * win_size))
    acc_out = np.full(n, np.nan)
    drift = np.zeros(n, dtype=int)
    if n < win_size:
        return {"acc": acc_out, "drift": drift}, st
    acc_count = int((values[:win_size] == 0).sum())
    for i in range(win_size, n):
        if values[i - win_size] == 0:
            acc_count -= 1
        if values[i] == 0:
            acc_count += 1
        acc = acc_count / win_size
        if max_acc is None or acc > max_acc:
            max_acc = acc
        acc_out[i] = acc
        drift[i] = 1 if (max_acc - acc) > thr else 0
    return {"acc": acc_out, "drift": drift}, {"max_acc": max_acc}


def ecdd_scan(values: np.ndarray, threshold: float = 3.0, expf: float = 0.2, warmup: int = 30, state: dict | None = None):
    """ECDD: EWMA chart z vs pr + L*sd_z (reference ecddStep :300-310)."""
    st = dict(state or {})
    count = st.get("count", 0)
    pr = st.get("pr", 0.0)
    z = st.get("z", 0.0)
    n = len(values)
    z_out = np.full(n, np.nan)
    drift = np.zeros(n, dtype=int)
    e = 1.0 - expf
    for i in range(n):
        t = count + 1
        pr = (count * pr) / t + values[i] / t
        sd = pr * (1.0 - pr)
        sdz = math.sqrt(sd * expf * (1.0 - e ** (2 * count)) / (2.0 - expf))
        z = e * z + expf * values[i]
        count = t
        z_out[i] = z
        if count > warmup:
            drift[i] = 1 if z > pr + threshold * sdz else 0
    return {"z": z_out, "drift": drift}, {"count": count, "pr": pr, "z": z}


_SCANS = {"ddm": ddm_scan, "eddm": eddm_scan, "fhddm": fhddm_scan, "ecdd": ecdd_scan}


def lp_drift(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    predicted_col: str,
    actual_col: str,
    threshold: float = 0.1,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """sucodr lp (:235-262): signed prediction-disagreement rate — +1 when
    (pred=1, actual=0), −1 when (pred=0, actual=1); drift when the cumulative
    rate exceeds the threshold. Fully SQL: a cumulative-sum window."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*keys)
        .orderBy(ts, *order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    delta = (
        F.when((F.col(predicted_col) == 1) & (F.col(actual_col) == 0), 1)
        .when((F.col(predicted_col) == 0) & (F.col(actual_col) == 1), -1)
        .otherwise(0)
    )
    out = (
        df.withColumn("_d", delta)
        .withColumn("ecount", F.sum("_d").over(w))
        .withColumn("count", F.count("*").over(w))
        .withColumn("ediff", F.col("ecount") / F.col("count"))
        .withColumn(
            "drift", (F.col("ediff") > F.lit(float(threshold))).cast("int")
        )
    )
    return out.drop("_d")


def local_drift(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    values: Sequence[str],
    neighborhood_size: float = 0.05,
    top_k: int = 20,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """sucodr UnsupConceptDrift.localDrift (:363-395): split each key's
    seq-ordered rows in half (old vs new window), take each point's
    nCount = neighborhood_size * n nearest neighbors (brute-force numpy, no
    KDTree dependency), and score drift = (other-half neighbors)/(own-half
    neighbors) − 1; emit the top_k by |drift|.

    Tie-breaking is fully deterministic so the result is DuckDB-oracle
    reproducible: squared distance is Σ(aᵢ−bᵢ)² (the same expression the SQL
    side computes — NOT the ‖a‖²+‖b‖²−2a·b identity, whose different
    rounding can reorder near-equal distances), neighbor ties break by row
    index (stable sort), and the top_k cut orders by (|drift| desc,
    row_idx asc)."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts, *order_cols], kind="mergesort").reset_index(drop=True)
        x = pdf[list(values)].to_numpy(dtype=float)
        n = len(x)
        key_cols = {k: pdf[k].iloc[0] for k in keys}
        if n < 4:
            return pd.DataFrame(columns=[*keys, "row_idx", "drift_score"])
        lh = n // 2
        ncount = max(1, int(n * neighborhood_size))
        # blocked vectorized kNN: (B, n, d) difference block; the ncount
        # nearest by (d2, index) are selected with a kth-distance threshold
        # mask — rows strictly closer than the kth distance, plus the
        # lowest-index ties at it — no per-row sort needed
        block = 256
        other_counts = np.empty(n, dtype=np.int64)
        for b0 in range(0, n, block):
            b1 = min(b0 + block, n)
            diff = x[b0:b1, None, :] - x[None, :, :]
            d2 = np.einsum("ijk,ijk->ij", diff, diff)
            d2[np.arange(b1 - b0), np.arange(b0, b1)] = np.inf
            kth = np.partition(d2, ncount - 1, axis=1)[:, ncount - 1]
            less = d2 < kth[:, None]
            eq = d2 == kth[:, None]
            need = ncount - less.sum(axis=1)
            sel = less | (eq & (np.cumsum(eq, axis=1) <= need[:, None]))
            in_new = sel[:, lh:].sum(axis=1)
            is_old = np.arange(b0, b1) < lh
            other_counts[b0:b1] = np.where(is_old, in_new, ncount - in_new)
        own = np.maximum(ncount - other_counts, 1)
        ds = other_counts / own - 1.0
        pick = np.lexsort((np.arange(n), -np.abs(ds)))[:top_k]
        out = pd.DataFrame(
            {
                **{k: [v] * len(pick) for k, v in key_cols.items()},
                "row_idx": pick,
                "drift_score": ds[pick],
            }
        )
        return out.reset_index(drop=True)

    key_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema if f.name in keys
    )
    return df.groupBy(*keys).applyInPandas(
        kernel, schema=f"{key_schema}, row_idx long, drift_score double"
    )


def drift_detect(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    error_col: str,
    detector: str = "ddm",
    order_cols: Sequence[str] = (),
    **params,
) -> DataFrame:
    """Per-key drift scan; output adds the detector's diagnostic columns."""
    if detector not in _SCANS:
        raise ValueError(f"unknown detector: {detector}")
    scan = _SCANS[detector]
    diag_cols = {"ddm": ["pr", "sd"], "eddm": ["cur"], "fhddm": ["acc"], "ecdd": ["z"]}[
        detector
    ]

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts, *order_cols], kind="mergesort").reset_index(drop=True)
        vals = pdf[error_col].to_numpy()
        out_cols, _ = scan(vals, **params)
        res = pdf.copy()
        for c in diag_cols:
            res[c] = out_cols[c]
        res["drift"] = out_cols["drift"]
        return res

    schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema]
        + [f"{c} double" for c in diag_cols]
        + ["drift int"]
    )
    return df.groupBy(*keys).applyInPandas(kernel, schema=schema)


def drift_detect_multi(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    error_col: str,
    detectors: Sequence[tuple[str, str, dict]],
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Run SEVERAL drift scans over one seq-ordered pass: ``detectors`` is
    [(out_col, detector_kind, params), ...]; output adds one int drift
    column per entry (no diagnostics — this is the consensus feed).

    One shuffle + one Python pass replaces N independent
    ``drift_detect`` calls joined on (keys, row id): each member scan
    re-executed the error-stream lineage and the join paired two
    fact-sized frames with a full sort-merge shuffle (measured plan for
    the 2-detector consensus: 2 FlatMapGroupsInPandas + SortMergeJoin, 4
    fact scans -> this form: 1 + no join). The member kernels consume the
    identical sorted value array, so every flag is bit-identical to the
    joined two-pass form (pinned by test_drift_streaming's multi/join
    parity test)."""
    for _, kind, _p in detectors:
        if kind not in _SCANS:
            raise ValueError(f"unknown detector: {kind}")

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts, *order_cols], kind="mergesort").reset_index(drop=True)
        vals = pdf[error_col].to_numpy()
        res = pdf.copy()
        for out_col, kind, params in detectors:
            cols, _ = _SCANS[kind](vals, **params)
            res[out_col] = cols["drift"]
        return res

    schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema]
        + [f"{c} int" for c, _, _ in detectors]
    )
    return df.groupBy(*keys).applyInPandas(kernel, schema=schema)


def consensus_drift(
    df: DataFrame, drift_cols: Sequence[str], consensus: int | str = 1
) -> DataFrame:
    """aggregateDrift/anyDrift/allDrift: combine detector flags per row."""
    total = sum((F.col(c) for c in drift_cols), F.lit(0))
    if consensus == "any":
        consensus = 1
    elif consensus == "all":
        consensus = len(drift_cols)
    return df.withColumn(
        "drift_consensus", (total >= F.lit(int(consensus))).cast("int")
    )

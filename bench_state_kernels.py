#!/usr/bin/env python
"""Micro-bench: per-event cost of the streaming state kernels on a hot
entity (one key, 100k rows in one micro-batch) — the vectorized form
(the kernel body, replicated here because the fn is module-internal) vs
the row-at-a-time loop it replaced in round 9 (inlined verbatim as the
baseline). Asserts value parity before printing one timing line per
kernel; the committed numbers live in BASELINE.md §8.8. Pure
pandas/numpy — no SparkSession (the applyInPandasWithState wrapper adds
the same cost to both forms).

Kernels covered: stream_markov (vectorized r9), stream_multigram
(vectorized r9 — symbol rendering + rolling gram join), and
stream_one_step_ahead (deliberately SEQUENTIAL — the window feedback
makes each step depend on the previous output, so there is no
vectorized form; its row records the per-event throughput CEILING of
the loop, not a speedup)."""
import json
import math
import sys
import time

import numpy as np
import pandas as pd

import os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N = 100_000
rng = np.random.RandomState(7)
states = np.array(["a", "b", "c", "d"], dtype=object)
pdf = pd.DataFrame(
    {
        "user_id": 1,
        "ts": np.arange(N),
        "event_type": states[rng.randint(0, 4, N)],
        "value": rng.rand(N) * 50,
        "event_id": np.arange(N),
    }
)

probs = {
    (a, b): p
    for a in states
    for b, p in zip(states, [0.4, 0.3, 0.2, 0.1])
}
UNSEEN = 20.0
window = 5
threshold = 2.0


class FakeState:
    exists = False

    def update(self, v):
        self.val = v

    @property
    def get(self):
        return self.val


def old_markov(pdf):
    last_state, scores = None, []
    rows = []
    p = pdf.sort_values("ts")
    for _, row in p.iterrows():
        cur = row["event_type"]
        if last_state is not None:
            pr = probs.get((last_state, cur))
            t = -math.log(pr) if pr and pr > 0 else UNSEEN
            scores.append(t)
            if len(scores) > window:
                scores.pop(0)
        score = sum(scores) / len(scores) if scores else None
        rows.append(
            {
                "user_id": row["user_id"],
                "ts": row["ts"],
                "event_type": cur,
                "score": score,
                "label": "I"
                if score is None
                else ("O" if score > threshold else "N"),
            }
        )
        last_state = cur
    return pd.DataFrame(rows)


def new_markov(pdf):
    from beymani_spark.streaming import jobs  # noqa: F401 — kernel import

    # replicate the vectorized fn body (module-internal) directly
    last_state, carry = None, []
    whole = pdf.sort_values("ts", kind="mergesort")
    cur = whole["event_type"].to_numpy(dtype=object)
    prev = np.empty(len(cur), dtype=object)
    prev[1:] = cur[:-1]
    prev[0] = last_state
    p = np.fromiter(
        (probs.get((a, b)) or np.nan for a, b in zip(prev, cur)),
        dtype=float,
        count=len(cur),
    )
    with np.errstate(invalid="ignore", divide="ignore"):
        t = np.where(p > 0, -np.log(p), UNSEEN)
    # the shipped kernel's null-prev mask (prev[0] is the carried None,
    # so the first row drops out exactly like the old baseline's)
    has_t = pd.notna(prev)
    seq = np.concatenate([np.asarray(carry, dtype=float), t[has_t]])
    roll = pd.Series(seq).rolling(window, min_periods=1).mean().to_numpy()
    score = np.full(len(cur), np.nan)
    score[has_t] = roll[len(carry):]
    label = np.where(np.isnan(score), "I", np.where(score > threshold, "O", "N"))
    out = whole[["user_id", "ts", "event_type"]].copy()
    out["score"] = score
    out["label"] = label
    return out


t0 = time.perf_counter()
a = old_markov(pdf)
t_old = time.perf_counter() - t0
t0 = time.perf_counter()
b = new_markov(pdf)
t_new = time.perf_counter() - t0

# value check: identical scores to 1e-9 and identical labels
sa = a["score"].to_numpy(dtype=float)
sb = b["score"].to_numpy(dtype=float)
assert np.allclose(sa[1:], sb[1:], rtol=1e-9), "score mismatch"
assert (a["label"].to_numpy() == b["label"].to_numpy()).all(), "label mismatch"

print(
    json.dumps(
        {
            "kernel": "stream_markov",
            "rows": N,
            "old_sec": round(t_old, 3),
            "new_sec": round(t_new, 3),
            "speedup": round(t_old / t_new, 1),
        }
    )
)


# ---------------------------------------------------------------- multigram
# apply_stream_multigram's vectorized body (symbol render + rolling gram
# join, jobs.py _syms) vs the per-row loop it replaced in round 9.

SPEC = [("event_type", None), ("value", 10.0)]
SEQ_LEN = 3


def old_multigram(pdf):
    grams, tail = [], []
    p = pdf.sort_values(["ts", "event_id"])
    for _, row in p.iterrows():
        parts = []
        for c, w in SPEC:
            v = row[c]
            if v is None or (isinstance(v, float) and v != v):
                continue
            if w is None:
                parts.append(str(v))
            else:
                try:
                    parts.append(str(int(math.floor(float(v) / float(w)))))
                except (TypeError, ValueError, OverflowError):
                    continue
        tail.append(":".join(parts))
        if len(tail) >= SEQ_LEN:
            grams.append("|".join(tail[-SEQ_LEN:]))
            tail = tail[-(SEQ_LEN - 1):]
    return grams


def new_multigram(pdf):
    # replicate the vectorized fn body (jobs.py _syms + the rolling gram
    # concatenation), using the shipped bucket renderer
    from beymani_spark.streaming.jobs import _safe_bucket_strings

    whole = pdf.sort_values(["ts", "event_id"], kind="mergesort")
    n = len(whole)
    sym = np.full(n, "", dtype=object)
    started = np.zeros(n, dtype=bool)
    for c, w in SPEC:
        col = whole[c]
        if w is None:
            valid = col.notna().to_numpy()
            sv = np.where(valid, col.to_numpy(dtype=object), "")
        else:
            fv = pd.to_numeric(col, errors="coerce").to_numpy(dtype=float)
            valid, sv = _safe_bucket_strings(fv, float(w))
        sep = np.where(started & valid, ":", "")
        sym = np.where(valid, sym + sep + sv, sym)
        started |= valid
    tail: list = []
    all_syms = np.concatenate([np.asarray(tail, dtype=object), sym])
    m = len(all_syms) - SEQ_LEN + 1
    if m > 0:
        grams = all_syms[0:m].copy()
        for off in range(1, SEQ_LEN):
            grams = grams + "|" + all_syms[off : off + m]
    else:
        grams = np.empty(0, dtype=object)
    return grams.tolist()


t0 = time.perf_counter()
g_old = old_multigram(pdf)
t_old = time.perf_counter() - t0
t0 = time.perf_counter()
g_new = new_multigram(pdf)
t_new = time.perf_counter() - t0
assert g_old == g_new, "gram mismatch"

print(
    json.dumps(
        {
            "kernel": "stream_multigram",
            "rows": N,
            "old_sec": round(t_old, 3),
            "new_sec": round(t_new, 3),
            "speedup": round(t_old / t_new, 1),
        }
    )
)


# ------------------------------------------------------- one-step-ahead
# apply_stream_one_step_ahead is deliberately sequential (window feedback:
# each step depends on the previous OUTPUT). No old/new pair — this row
# records the per-event throughput CEILING of the shipped loop body on a
# hot entity, so the limit is a number, not a narrative.

WINDOW, OSA_THRESHOLD = 8, 3.0


def osa_loop(xs):
    work: list = []
    r_n, r_s1, r_s2 = 0, 0.0, 0.0
    n = len(xs)
    preds = np.full(n, np.nan)
    scores = np.zeros(n)
    for i in range(n):
        x = float(xs[i])
        if len(work) < WINDOW:
            work.append(x)
            continue
        w = np.asarray(work[-WINDOW:])
        p = w.mean()
        r = x - p
        if r_n >= 3:
            var = r_s2 / r_n - (r_s1 / r_n) ** 2
            sd = var**0.5 if var > 0 else 0.0
        else:
            sd = 0.0
        s = abs(r) / sd if sd > 0 else 0.0
        preds[i] = float(p)
        scores[i] = s
        if s > OSA_THRESHOLD:
            work.append(float(p))
        else:
            work.append(x)
            r_n += 1
            r_s1 += r
            r_s2 += r * r
        work = work[-WINDOW:]
    return preds, scores


xs_hot = pdf["value"].to_numpy(dtype=float)
t0 = time.perf_counter()
osa_preds, osa_scores = osa_loop(xs_hot)
t_osa = time.perf_counter() - t0
assert np.isfinite(osa_preds[WINDOW:]).all()

print(
    json.dumps(
        {
            "kernel": "stream_one_step_ahead",
            "rows": N,
            "sec": round(t_osa, 3),
            "events_per_sec": int(N / t_osa),
            "note": "sequential by design (window feedback); ceiling, not speedup",
        }
    )
)

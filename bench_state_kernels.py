#!/usr/bin/env python
"""Micro-bench: per-event cost of the streaming state kernels on a hot
entity (one key, 100k rows in one micro-batch) — the vectorized form
(apply_stream_markov's kernel body, replicated here because the fn is
module-internal) vs the row-at-a-time loop it replaced in round 9
(inlined verbatim as the baseline). Asserts value parity (scores to
1e-9, labels exact) before printing the timing line; the committed
number lives in BASELINE.md §8.8. Pure pandas/numpy — no SparkSession
(the applyInPandasWithState wrapper adds the same cost to both forms)."""
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

"""Hypothesis property tests for the score-aggregation/tagging semantics —
the conventions every detector shares (OutlierScoreAggregator parity)."""
from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from beymani_spark.functions.scaling import exp_scale, logistic_scale
from beymani_spark.functions.scores import aggregate_scores, tag_label

scores_strat = st.lists(
    st.one_of(st.none(), st.floats(0, 100, allow_nan=False)), min_size=1, max_size=5
)


def _eval_agg(spark, scores, weights, strategy):
    from pyspark.sql import functions as F

    df = spark.range(1)
    cols = [
        F.lit(float(s)).cast("double") if s is not None else F.lit(None).cast("double")
        for s in scores
    ]
    return df.select(
        aggregate_scores(cols, weights, strategy).alias("agg")
    ).first()["agg"]


@settings(max_examples=25, deadline=None)
@given(scores=scores_strat)
def test_weighted_average_matches_numpy(spark, scores):
    got = _eval_agg(spark, scores, None, "average")
    avail = [s for s in scores if s is not None]
    if not avail:
        assert got is None
    else:
        assert got == pytest.approx(float(np.mean(avail)), rel=1e-12)


@settings(max_examples=25, deadline=None)
@given(scores=scores_strat)
def test_median_strategy_matches_numpy(spark, scores):
    got = _eval_agg(spark, scores, None, "median")
    avail = sorted(s for s in scores if s is not None)
    if not avail:
        assert got is None
    else:
        assert got == pytest.approx(float(np.median(avail)), rel=1e-12)


@settings(max_examples=25, deadline=None)
@given(
    scores=st.lists(st.floats(0, 100, allow_nan=False), min_size=1, max_size=5),
    weights=st.data(),
)
def test_weighted_average_weights(spark, scores, weights):
    w = weights.draw(
        st.lists(
            st.floats(0.1, 10, allow_nan=False),
            min_size=len(scores),
            max_size=len(scores),
        )
    )
    got = _eval_agg(spark, scores, w, "weightedAverage")
    expected = float(np.average(scores, weights=w))
    assert got == pytest.approx(expected, rel=1e-9)


@settings(max_examples=40, deadline=None)
@given(x=st.floats(0, 50, allow_nan=False), k=st.floats(0.01, 5, allow_nan=False))
def test_scalings_bounded_monotone(spark, x, k):
    from pyspark.sql import functions as F

    df = spark.range(1)
    row = df.select(
        exp_scale(k, F.lit(x)).alias("e"),
        logistic_scale(k, F.lit(x)).alias("l"),
        exp_scale(k, F.lit(x + 1.0)).alias("e2"),
        logistic_scale(k, F.lit(x + 1.0)).alias("l2"),
    ).first()
    # saturation to exactly 1.0 at float64 precision is expected for large k*x
    assert 0.0 <= row.e <= 1.0 and 0.0 < row.l <= 1.0
    assert row.e2 >= row.e and row.l2 >= row.l  # monotone in the score
    assert row.e == pytest.approx(1 - math.exp(-k * x), rel=1e-12)
    assert row.l == pytest.approx(1 / (1 + math.exp(-k * x)), rel=1e-12)


def test_tag_label_truth_table(spark):
    from pyspark.sql import functions as F

    df = spark.range(1)
    row = df.select(
        tag_label(F.lit(None).cast("double"), 1.0).alias("i"),
        tag_label(F.lit(2.0), 1.0).alias("o"),
        tag_label(F.lit(1.0), 1.0).alias("n_eq"),
        tag_label(F.lit(0.5), 1.0).alias("n"),
    ).first()
    assert (row.i, row.o, row.n_eq, row.n) == ("I", "O", "N", "N")


@settings(max_examples=15, deadline=None)
@given(
    vals=st.lists(st.floats(-50, 50, allow_nan=False), min_size=70, max_size=120),
)
def test_ks_stat_bounds_and_identity(vals):
    """Two-sample KS is in [0,1]; identical halves give 0 shift under a
    constant offset large enough to disjoint the samples gives 1."""
    from beymani_spark.operators import sequence

    a = np.asarray(vals[: len(vals) // 2])
    b = np.asarray(vals[len(vals) // 2 :])
    s = sequence._ks_stat(a, b)
    assert 0.0 <= s <= 1.0
    assert sequence._ks_stat(a, a) == 0.0
    assert sequence._ks_stat(a, a + (a.max() - a.min() + 1.0)) == 1.0


def test_median_mad_approx_close_to_exact(spark):
    from beymani_spark.operators import profile
    from beymani_spark.sources import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    exact = (
        profile.median_mad(ev, ["event_type"], ["value"])
        .toPandas().sort_values("event_type", ignore_index=True)
    )
    approx = (
        profile.median_mad(ev, ["event_type"], ["value"], approx_accuracy=10000)
        .toPandas().sort_values("event_type", ignore_index=True)
    )
    # GK sketch at accuracy 10000 on ~200-row groups is near-exact; allow a
    # generous relative envelope to keep the test about wiring, not the sketch
    np.testing.assert_allclose(approx["median"], exact["median"], rtol=0.05)
    np.testing.assert_allclose(approx["mad"], exact["mad"], rtol=0.05)


@settings(max_examples=15, deadline=None)
@given(
    toklists=st.lists(
        st.lists(
            st.text(alphabet="abcdefg", min_size=1, max_size=4),
            min_size=1,
            max_size=40,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_cdc_chunks_partition_tokens(spark, toklists):
    """For ANY token content, cdc_chunk_dedup's chunks partition each doc's
    tokens: with globally-unique tokens (no chunk can equal any other,
    within or across docs — hypothesis found that shared suffixes and
    in-doc repeats legitimately dedup) every chunk is kept and clean_text
    reassembles the original token stream exactly."""
    from beymani_spark.operators.dedup import cdc_chunk_dedup

    uniq = [
        [f"d{i}t{j}{tok}" for j, tok in enumerate(t)]
        for i, t in enumerate(toklists)
    ]
    rows = [(i, " ".join(t)) for i, t in enumerate(uniq)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in cdc_chunk_dedup(df, "doc_id").collect()}
    for i, t in enumerate(uniq):
        assert out[i].n_kept == out[i].n_chunks
        assert out[i].clean_text == " ".join(t)


@settings(max_examples=15, deadline=None)
@given(
    ns=st.lists(st.integers(0, 500), min_size=1, max_size=20),
    length=st.integers(1, 64),
)
def test_context_length_plan_accounting_identity(spark, ns, length):
    """n_chunks*L always equals n_tokens + padded_tokens (the slot-token
    identity), and chunk counts are the exact ceil-div."""
    from beymani_spark.operators.packing import context_length_plan

    rows = [(("w " * n).strip(),) for n in ns]
    df = spark.createDataFrame(rows, ["text"])
    r = context_length_plan(df, "text", lengths=(length,)).collect()[0]
    assert r.n_chunks * length == r.n_tokens + r.padded_tokens
    assert r.n_chunks == sum((n + length - 1) // length for n in ns)
    assert r.n_tokens == sum(ns) and r.n_docs == len(ns)


# ---- round-7 session-2 operators ------------------------------------------

_signal_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.floats(-100, 100, allow_nan=False)),
        st.one_of(st.none(), st.floats(-100, 100, allow_nan=False)),
    ),
    min_size=2,
    max_size=8,
)


@settings(max_examples=10, deadline=None)
@given(rows=_signal_rows)
def test_quality_fuse_weight_scale_invariance(spark, rows):
    """Scaling every weight by the same power of two leaves every fused
    score unchanged (the weighted mean is scale-free; powers of two keep
    the float arithmetic exact)."""
    from beymani_spark.operators.text import quality_fuse

    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(rows)],
        "id long, a double, b double",
    )
    one = {
        r["id"]: r["fused_score"]
        for r in quality_fuse(df, ["a", "b"], weights=[1.0, 3.0]).collect()
    }
    scaled = {
        r["id"]: r["fused_score"]
        for r in quality_fuse(df, ["a", "b"], weights=[4.0, 12.0]).collect()
    }
    assert one == scaled


@settings(max_examples=10, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10_000)),
        min_size=1,
        max_size=12,
    ),
    target=st.integers(1, 5_000),
)
def test_compaction_plan_covers_every_row(spark, rows, target):
    """files >= 1 always; rows_per_file * n_files >= n_rows (the plan
    never loses a row); est_bytes matches the per-partition sum."""
    from pyspark.sql import functions as F

    from beymani_spark.operators.packing import compaction_plan

    df = spark.createDataFrame(
        [(f"p{g}", "x" * n) for g, n in rows], "part string, payload string"
    )
    out = compaction_plan(
        df, ["part"], bytes_col=F.octet_length("payload"), target_file_bytes=target
    ).collect()
    per = {}
    for g, n in rows:
        c, b = per.get(f"p{g}", (0, 0))
        per[f"p{g}"] = (c + 1, b + n)
    assert {r["part"] for r in out} == set(per)
    for r in out:
        c, b = per[r["part"]]
        assert (r["n_rows"], r["est_bytes"]) == (c, b)
        assert r["n_files"] >= 1
        assert r["rows_per_file"] * r["n_files"] >= r["n_rows"]


@settings(max_examples=10, deadline=None)
@given(
    vals=st.lists(
        st.one_of(
            st.none(),
            st.floats(allow_nan=True, allow_infinity=True, width=64),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_finite_gate_partitions_and_audit_agrees(spark, vals):
    """drop mode + its complement partition the frame exactly; the gated
    frame always audits clean; audit counts sum to n_rows."""
    import math

    from beymani_spark.operators.profile import finite_audit, finite_gate

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, a double"
    )
    kept = finite_gate(df, ["a"])
    n_kept = kept.count()
    expected_kept = sum(
        1 for v in vals if v is None or (not math.isnan(v) and not math.isinf(v))
    )
    assert n_kept == expected_kept
    audit = finite_audit(df, ["a"]).first()
    assert (
        audit["n_null"] + audit["n_nan"] + audit["n_pos_inf"]
        + audit["n_neg_inf"] + audit["n_finite"]
    ) == len(vals)
    clean = finite_audit(kept, ["a"]).first()
    assert clean["n_nan"] == 0 and clean["n_pos_inf"] == 0 and clean["n_neg_inf"] == 0

"""Unit tests for training-sequence preparation (operators/packing.py) and
the per-stratum rank gate (sampling.stratified_rank_filter): hand-computed
cases, partition invariance, and the plan shapes that matter at scale."""
from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from beymani_spark.operators import packing, sampling


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_windows_hand_computed(spark):
    # 10 tokens, max 4, stride 3 -> windows at token offsets 0, 3, 6
    text = " ".join(f"t{i}" for i in range(10))
    out = packing.chunk_for_training(
        _docs(spark, [(1, text)]), "doc_id", max_tokens=4, stride=3
    ).collect()
    got = {(r.chunk_id, r.chunk_text) for r in out}
    assert got == {
        (0, "t0 t1 t2 t3"),
        (1, "t3 t4 t5 t6"),
        (2, "t6 t7 t8 t9"),
    }
    assert all(r.chunk_tokens == 4 for r in out)


def test_chunk_short_doc_single_window_and_ragged_tail(spark):
    out = packing.chunk_for_training(
        _docs(spark, [(1, "a b c"), (2, " ".join("x" * 1 for _ in range(11)))]),
        "doc_id",
        max_tokens=4,
        stride=3,
    )
    rows = {(r.doc_id, r.chunk_id): r for r in out.collect()}
    assert rows[(1, 0)].chunk_tokens == 3  # n <= max: one window, whole doc
    assert (1, 1) not in rows
    # n=11: windows start 0,3,6,9; the last carries only 2 tokens
    assert rows[(2, 3)].chunk_tokens == 2
    assert (2, 4) not in rows


def test_chunk_covers_every_token_no_empty_windows(spark):
    df = _docs(
        spark,
        [(i, " ".join(f"w{i}_{j}" for j in range(n))) for i, n in enumerate([1, 4, 5, 12, 13, 100])],
    )
    out = packing.chunk_for_training(df, "doc_id", max_tokens=5, stride=2).collect()
    assert all(r.chunk_tokens > 0 for r in out)
    # union of window tokens = the doc's token set (coverage; overlap allowed)
    seen = {}
    for r in out:
        seen.setdefault(r.doc_id, set()).update(r.chunk_text.split(" "))
    for i, n in enumerate([1, 4, 5, 12, 13, 100]):
        assert seen[i] == {f"w{i}_{j}" for j in range(n)}


def test_chunk_empty_doc_yields_no_rows_and_bad_stride_raises(spark):
    df = _docs(spark, [(1, "   "), (2, "a b")])
    out = packing.chunk_for_training(df, "doc_id", max_tokens=4, stride=3)
    assert [r.doc_id for r in out.collect()] == [2]
    with pytest.raises(ValueError):
        packing.chunk_for_training(df, "doc_id", max_tokens=4, stride=5)
    with pytest.raises(ValueError):
        packing.chunk_for_training(df, "doc_id", max_tokens=4, stride=0)


def test_pack_manifest_hand_computed(spark):
    # spans with sep=1: 6, 4, 5 -> offsets 0, 6, 10 against seq_tokens=8
    df = _docs(
        spark,
        [
            (1, "a b c d e"),        # 5 tokens: seq 0 only
            (2, "f g h"),            # start 6, tokens 6..8 -> spans seqs 0 and 1
            (3, "i j k l"),          # start 10, tokens 10..13 -> seq 1
        ],
    )
    out = {
        r.doc_id: r
        for r in packing.pack_sequences(
            df, "doc_id", seq_tokens=8, sep_tokens=1, partitions=3
        ).collect()
    }
    assert (out[1].start_offset, out[1].seq_id, out[1].n_seq_spanned) == (0, 0, 1)
    assert (out[2].start_offset, out[2].seq_id, out[2].n_seq_spanned) == (6, 0, 2)
    assert (out[3].start_offset, out[3].seq_id, out[3].n_seq_spanned) == (10, 1, 1)
    assert out[2].n_tokens == 3


def test_pack_manifest_partition_invariant(spark):
    rows = [(i, " ".join("w" for _ in range(1 + i % 7))) for i in range(200)]
    a = packing.pack_sequences(
        _docs(spark, rows).repartition(1), "doc_id", seq_tokens=32, partitions=2
    )
    b = packing.pack_sequences(
        _docs(spark, rows).repartition(13), "doc_id", seq_tokens=32, partitions=7
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_pack_manifest_offsets_are_contiguous(spark):
    rows = [(i, " ".join("w" for _ in range(1 + i % 5))) for i in range(100)]
    out = sorted(
        packing.pack_sequences(_docs(spark, rows), "doc_id", sep_tokens=2).collect(),
        key=lambda r: r.doc_id,
    )
    pos = 0
    for r in out:
        assert r.start_offset == pos
        pos += r.n_tokens + 2


def test_chunk_plan_has_no_shuffle_and_pack_avoids_global_window(spark):
    df = _docs(spark, [(1, "a b c")])
    chunk_plan = (
        packing.chunk_for_training(df, "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in chunk_plan
    pack_plan = (
        packing.pack_sequences(df, "doc_id", partitions=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the fact-side prefix sum is range-partitioned; base offsets are a
    # driver-collected element_at literal (r11) — no single-partition
    # stage, no join, and a global-order window would add both
    assert "Exchange rangepartitioning" in pack_plan
    assert pack_plan.count("Exchange SinglePartition") == 0
    assert "BroadcastHashJoin" not in pack_plan
    assert "element_at" in pack_plan


def test_rank_filter_hand_computed_with_ties(spark):
    df = spark.createDataFrame(
        [
            ("a", 1, 0.9), ("a", 2, 0.9), ("a", 3, 0.5), ("a", 4, 0.1),
            ("b", 5, 0.3), ("b", 6, 0.2),
        ],
        "s string, id long, v double",
    )
    out = sampling.stratified_rank_filter(df, "s", "v", 0.5, tiebreak_col="id")
    kept = sorted((r.s, r.id) for r in out.collect())
    # a: ceil(4*0.5)=2 -> the two 0.9s, tie broken toward lower id first
    # b: ceil(2*0.5)=1 -> id 5
    assert kept == [("a", 1), ("a", 2), ("b", 5)]
    # every non-empty stratum keeps at least one row even at tiny fractions
    out_min = sampling.stratified_rank_filter(df, "s", "v", 0.01, tiebreak_col="id")
    assert sorted((r.s, r.id) for r in out_min.collect()) == [("a", 1), ("b", 5)]
    with pytest.raises(ValueError):
        sampling.stratified_rank_filter(df, "s", "v", 0.0)


def test_rank_filter_threshold_is_integer_exact(spark):
    """keep_frac=0.07 over a 100-row stratum must keep exactly
    ceil(100 * 7/100) = 7 rows: binary-double ceil(100*0.07) is
    ceil(7.000000000000001) = 8 — the bug the rational p/q ceil-div
    avoids — and a DECIMAL-literal oracle (DuckDB) agrees with 7."""
    rows = [("s", i, float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "s string, id long, v double")
    out = sampling.stratified_rank_filter(df, "s", "v", 0.07, tiebreak_col="id")
    kept = sorted(r.id for r in out.collect())
    assert len(kept) == 7
    assert kept == [93, 94, 95, 96, 97, 98, 99]  # top 7 by v desc
    # a handful of (n, frac) boundary cases vs exact rational ceil
    from fractions import Fraction
    import math
    for n, frac in [(100, 0.07), (30, 0.1), (49, 0.07), (10, 0.3), (3, 1.0)]:
        sub = spark.createDataFrame(
            [("s", i, float(i)) for i in range(n)], "s string, id long, v double"
        )
        got = sampling.stratified_rank_filter(sub, "s", "v", frac).count()
        f = Fraction(str(frac))
        assert got == math.ceil(Fraction(n) * f), (n, frac, got)


def test_rank_filter_single_stratum_shuffle(spark):
    df = spark.createDataFrame(
        [("a", i, float(i)) for i in range(20)], "s string, id long, v double"
    )
    out = sampling.stratified_rank_filter(df, "s", "v", 0.4, tiebreak_col="id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one hash exchange on the stratum key feeds both windows (rank + count)
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_pack_manifest_null_and_empty_text_get_rows(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, None), (3, "   "), (4, "d e")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in
           packing.pack_sequences(df, "doc_id", seq_tokens=8, sep_tokens=1).collect()}
    # every input doc appears; null/whitespace text occupies only its
    # separator slot and never poisons downstream offsets
    assert set(out) == {1, 2, 3, 4}
    assert out[2].n_tokens == 0 and out[3].n_tokens == 0
    assert out[1].start_offset == 0
    assert out[2].start_offset == 4   # 3 tokens + sep
    assert out[3].start_offset == 5
    assert out[4].start_offset == 6
    assert all(r.n_seq_spanned == 1 for r in out.values())


def test_chunk_null_text_yields_no_rows(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "a b")], "doc_id long, text string"
    )
    out = packing.chunk_for_training(df, "doc_id", max_tokens=4, stride=3)
    assert [r.doc_id for r in out.collect()] == [2]


def test_pack_manifest_with_precomputed_token_column(spark):
    """n_tokens_col packs in the caller's tokenizer units (e.g. BPE counts
    from text.bpe_token_count) instead of whitespace tokens."""
    from beymani_spark.operators import text as text_ops

    rows = [(i, "alpha beta gamma delta"[: 6 + i]) for i in range(20)]
    df = _docs(spark, rows)
    counted = text_ops.bpe_token_count(df).withColumnRenamed("n_bpe_tokens", "bpe_n")
    joined = df.join(counted.select("doc_id", "bpe_n"), "doc_id")
    out = sorted(
        packing.pack_sequences(
            joined, "doc_id", seq_tokens=16, n_tokens_col="bpe_n"
        ).collect(),
        key=lambda r: r.doc_id,
    )
    by_id = {r.doc_id: r.bpe_n for r in joined.collect()}
    pos = 0
    for r in out:
        assert r.n_tokens == by_id[r.doc_id]
        assert r.start_offset == pos
        pos += r.n_tokens + 1


def test_chunk_windows_match_reference_chunker_exhaustively(spark):
    """One Spark job per (m, s) combo sweeps every doc length 1..150 and
    compares against an independent Python reference chunker — pins the
    window-count formula and slicing across all boundary alignments
    (n == m, n == m + k*s, one-token tails, n < s, ...)."""
    def reference(tokens_, m, s):
        wins, start = [], 0
        while True:
            wins.append(tokens_[start : start + m])
            if start + m >= len(tokens_):
                break
            start += s
        return wins

    for m, s in [(4, 3), (5, 5), (7, 2), (16, 11)]:
        rows = [(n, " ".join(f"t{n}_{j}" for j in range(n))) for n in range(1, 151)]
        df = _docs(spark, rows)
        got = {}
        for r in packing.chunk_for_training(df, "doc_id", max_tokens=m, stride=s).collect():
            got.setdefault(r.doc_id, {})[r.chunk_id] = r.chunk_text.split(" ")
        for n, text in rows:
            exp = reference(text.split(" "), m, s)
            assert len(got[n]) == len(exp), (m, s, n, len(got[n]), len(exp))
            for i, w in enumerate(exp):
                assert got[n][i] == w, (m, s, n, i)


def test_ks_two_sample_hand_computed(spark):
    from beymani_spark.operators import profile

    a = spark.createDataFrame([(v,) for v in [0.1, 0.2, 0.3, 0.4]], "q double")
    b_same = spark.createDataFrame([(v,) for v in [0.1, 0.2, 0.3, 0.4]], "q double")
    b_disj = spark.createDataFrame([(v,) for v in [0.7, 0.8, 0.9]], "q double")
    # identical samples: KS = 0; disjoint supports: KS = 1
    r0 = profile.ks_two_sample(a, b_same, "q").collect()[0]
    assert (r0.ks_stat, r0.n_a, r0.n_b) == (0.0, 4, 4)
    r1 = profile.ks_two_sample(a, b_disj, "q").collect()[0]
    assert (r1.ks_stat, r1.n_a, r1.n_b) == (1.0, 4, 3)
    # shifted overlap: a={1,2,3,4}/4, b={3,4,5,6}/4 -> max gap at v=2: |2/4-0|=0.5
    b_shift = spark.createDataFrame([(v/10,) for v in [3, 4, 5, 6]], "q double")
    a2 = spark.createDataFrame([(v/10,) for v in [1, 2, 3, 4]], "q double")
    r2 = profile.ks_two_sample(a2, b_shift, "q").collect()[0]
    assert r2.ks_stat == 0.5
    # nulls are excluded, not counted
    a3 = spark.createDataFrame([(0.1,), (None,)], "q double")
    r3 = profile.ks_two_sample(a3, b_same, "q").collect()[0]
    assert r3.n_a == 1


def test_ks_two_sample_wide_domain_matches_numpy(spark):
    """Wide-domain columns (raw integer counts spanning 10^6 values — the
    case the old single-partition cumulative window couldn't bound) give
    the exact empirical-CDF KS statistic computed independently in numpy."""
    import numpy as np
    from beymani_spark.operators import profile

    rng_a = [(i * 9973 + 17) % 1_000_003 for i in range(4000)]
    rng_b = [(i * 6151 + 911) % 1_000_003 + (i % 3) * 250_000 for i in range(3000)]
    a = spark.createDataFrame([(float(v),) for v in rng_a], "q double")
    b = spark.createDataFrame([(float(v),) for v in rng_b], "q double")
    r = profile.ks_two_sample(a, b, "q").collect()[0]
    assert (r.n_a, r.n_b) == (4000, 3000)

    xa, xb = np.sort(np.array(rng_a, float)), np.sort(np.array(rng_b, float))
    grid = np.unique(np.concatenate([xa, xb]))
    fa = np.searchsorted(xa, grid, side="right") / len(xa)
    fb = np.searchsorted(xb, grid, side="right") / len(xb)
    expect = round(float(np.max(np.abs(fa - fb))), 6)
    assert abs(r.ks_stat - expect) < 1e-9, (r.ks_stat, expect)


def test_pack_manifest_rows_frame_with_duplicate_ids(spark):
    """Duplicate id values must still pack sequentially (ROWS frame): the
    default RANGE frame would hand peers identical overlapping offsets.
    With duplicates the concat order among peers is arbitrary, so assert
    the INVARIANTS: all offsets distinct, stream is gapless, total length
    conserved."""
    df = spark.createDataFrame(
        [(1, "a b c"), (1, "d e"), (2, "f")], "doc_id long, text string"
    )
    out = packing.pack_sequences(df, "doc_id", seq_tokens=4, sep_tokens=1, partitions=2)
    rows = sorted(out.collect(), key=lambda r: r.start_offset)
    offsets = [r.start_offset for r in rows]
    assert len(set(offsets)) == 3, offsets
    pos = 0
    for r in rows:
        assert r.start_offset == pos, rows
        pos += r.n_tokens + 1
    assert pos == 3 + 2 + 1 + 3  # tokens + one separator per doc


def test_ks_two_sample_keyed_matches_per_key_global(spark):
    """The keys= form must equal running the global KS separately per key
    (the key-aware prefix sum changes the plan, not the math), and a key
    present in only one frame must surface as a 0-count side, never a
    silent drop."""
    from beymani_spark.operators import profile

    rows_a = [("en", v / 10) for v in range(1, 9)] + [("de", v / 7) for v in range(1, 6)]
    rows_b = [("en", v / 10 + 0.2) for v in range(1, 9)] + [("de", v / 7) for v in range(1, 6)]
    a = spark.createDataFrame(rows_a + [("fr", 0.5)], "lang string, q double")
    b = spark.createDataFrame(rows_b, "lang string, q double")
    keyed = {r.lang: r for r in profile.ks_two_sample(a, b, "q", keys=["lang"]).collect()}
    for lang in ("en", "de"):
        solo = profile.ks_two_sample(
            a.filter(F.col("lang") == lang), b.filter(F.col("lang") == lang), "q"
        ).collect()[0]
        assert (keyed[lang].ks_stat, keyed[lang].n_a, keyed[lang].n_b) == (
            solo.ks_stat, solo.n_a, solo.n_b,
        ), lang
    assert keyed["de"].ks_stat == 0.0  # identical distributions
    assert keyed["en"].ks_stat > 0.0
    # fr exists only in frame a: ks_stat NULL (try_divide, matching
    # DuckDB's divide-by-zero NULL), counts expose the one-sided key —
    # and crucially the job completes instead of ANSI-failing on 0/0
    assert keyed["fr"].ks_stat is None
    assert (keyed["fr"].n_a, keyed["fr"].n_b) == (1, 0)


def test_pack_sequences_base_offset_equals_full_repack(spark):
    """Day-2 contract: packing the batch with base_offset = the standing
    stream's total must hand every batch doc exactly the offsets/seq ids a
    FULL repack of corpus+batch (ids ordered corpus-first) would."""
    corpus = _docs(spark, [(i, " ".join("w" for _ in range(1 + i % 5))) for i in range(40)])
    batch = _docs(spark, [(100 + i, " ".join("w" for _ in range(1 + i % 7))) for i in range(25)])
    full = {
        r.doc_id: r
        for r in packing.pack_sequences(
            corpus.unionByName(batch), "doc_id", seq_tokens=16, sep_tokens=1
        ).collect()
        if r.doc_id >= 100
    }
    prev_total = sum(1 + i % 5 + 1 for i in range(40))
    incr = {
        r.doc_id: r
        for r in packing.pack_sequences(
            batch, "doc_id", seq_tokens=16, sep_tokens=1, base_offset=prev_total
        ).collect()
    }
    assert incr.keys() == full.keys()
    for k in incr:
        assert tuple(incr[k]) == tuple(full[k]), k


def test_context_length_plan_exact_integer_accounting(spark):
    """ceil-div chunk math on hand-checkable docs: exact multiples pad
    zero, zero-token docs contribute zero chunks but count as docs."""
    from beymani_spark.operators.packing import context_length_plan

    df = spark.createDataFrame(
        [("a " * 8,), ("b " * 3,), ("",), ("c " * 9,)], ["text"]
    )
    out = {
        r["context_len"]: r
        for r in context_length_plan(df, "text", lengths=(4, 8)).collect()
    }
    # L=4: chunks 2+1+0+3=6, padded 0+1+0+3=4 over 24 slot tokens
    assert out[4]["n_docs"] == 4 and out[4]["n_tokens"] == 20
    assert out[4]["n_chunks"] == 6 and out[4]["padded_tokens"] == 4
    assert abs(out[4]["waste_share"] - round(4 / 24, 6)) < 1e-12
    # L=8: chunks 1+1+0+2=4, padded 0+5+0+7=12 over 32
    assert out[8]["n_chunks"] == 4 and out[8]["padded_tokens"] == 12
    assert abs(out[8]["waste_share"] - round(12 / 32, 6)) < 1e-12


def test_shuffle_plan_is_exact_permutation_and_partition_invariant(spark):
    """shuffle_plan: positions are exactly 0..n-1 (a permutation), agree
    with a driver-side sort by (key, id), and are identical under any
    `partitions` value and input repartitioning — the bit-reproducible
    global shuffle contract."""
    from beymani_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    n = docs.count()
    out = packing.shuffle_plan(docs, "doc_id", seed=42).toPandas()
    assert sorted(out.shuffle_pos) == list(range(n)), "must be a permutation"
    expected = (
        out.sort_values(["shuffle_key", "doc_id"], ignore_index=True)
        .doc_id.tolist()
    )
    got = out.sort_values("shuffle_pos", ignore_index=True).doc_id.tolist()
    assert got == expected, "position must equal rank by (key, id)"

    b = packing.shuffle_plan(
        docs.repartition(17), "doc_id", seed=42, partitions=3
    ).toPandas()
    ja = out.sort_values("doc_id", ignore_index=True)
    jb = b.sort_values("doc_id", ignore_index=True)
    assert (ja.shuffle_pos.to_numpy() == jb.shuffle_pos.to_numpy()).all()

    # a different seed is a different epoch order (and still a permutation)
    c = packing.shuffle_plan(docs, "doc_id", seed=7).toPandas()
    assert sorted(c.shuffle_pos) == list(range(n))
    jc = c.sort_values("doc_id", ignore_index=True)
    assert (ja.shuffle_pos.to_numpy() != jc.shuffle_pos.to_numpy()).any()


def test_shuffle_plan_avoids_global_window(spark):
    """The prefix-sum plan shape: range-partitioned rank + driver-
    collected element_at base offsets (r11) — never a global-order
    window over the fact, no single-partition stage, no join."""
    from beymani_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    plan = (
        packing.shuffle_plan(docs, "doc_id", partitions=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange rangepartitioning" in plan
    assert plan.count("Exchange SinglePartition") == 0
    assert "BroadcastHashJoin" not in plan
    assert "element_at" in plan


def test_curriculum_plan_stages_positions_and_invariance(spark):
    """curriculum_plan: positions are exactly 0..n-1 (a permutation) that
    walks stages in order; stages are equal-size (±1) cuts of the exact
    quality rank with stage 0 = top scores and NULL scores in the worst
    stage; the whole manifest is invariant to input partitioning and
    `partitions`; re-seeding reshuffles within stages only."""
    rows = [
        (i, float(100 - i) if i % 7 else None) for i in range(41)
    ]
    df = spark.createDataFrame(rows, "doc_id long, q double")
    out = packing.curriculum_plan(df, "doc_id", "q", n_stages=4).toPandas()
    n = len(rows)
    assert sorted(out.curriculum_pos) == list(range(n))
    # stage sizes differ by at most one and stage-major order holds
    sizes = out.groupby("stage").size()
    assert sorted(sizes.index) == [0, 1, 2, 3]
    assert sizes.max() - sizes.min() <= 1
    by_pos = out.sort_values("curriculum_pos")
    assert by_pos.stage.is_monotonic_increasing
    # stage assignment = floor(rank * 4 / n) over (-q, id) with nulls last
    ranked = sorted(
        rows, key=lambda r: (-(r[1]) if r[1] is not None else float("inf"), r[0])
    )
    expect_stage = {
        doc: (r * 4) // n for r, (doc, _) in enumerate(ranked)
    }
    got_stage = dict(zip(out.doc_id, out.stage))
    assert got_stage == expect_stage
    # every NULL-score doc sits in the last stage
    assert all(got_stage[i] == 3 for i in range(41) if i % 7 == 0)

    b = packing.curriculum_plan(
        df.repartition(13), "doc_id", "q", n_stages=4, partitions=3
    ).toPandas()
    ja = out.sort_values("doc_id", ignore_index=True)
    jb = b.sort_values("doc_id", ignore_index=True)
    assert (ja.curriculum_pos.to_numpy() == jb.curriculum_pos.to_numpy()).all()
    assert (ja.stage.to_numpy() == jb.stage.to_numpy()).all()

    c = packing.curriculum_plan(df, "doc_id", "q", n_stages=4, seed=7).toPandas()
    jc = c.sort_values("doc_id", ignore_index=True)
    assert (ja.stage.to_numpy() == jc.stage.to_numpy()).all(), (
        "re-seeding must not move rows across stages"
    )
    assert (ja.curriculum_pos.to_numpy() != jc.curriculum_pos.to_numpy()).any()

    with pytest.raises(ValueError, match="n_stages"):
        packing.curriculum_plan(df, "doc_id", "q", n_stages=0)
    assert packing.curriculum_plan(df.limit(0), "doc_id", "q").count() == 0


def test_curriculum_plan_avoids_global_window(spark):
    """Both prefix-sum passes keep the shuffle_plan shape: range-
    partitioned ranks + broadcast base offsets — never a global-order
    window over the fact table."""
    from beymani_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    plan = (
        packing.curriculum_plan(docs, "doc_id", "n_chars", partitions=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange rangepartitioning") >= 2
    # base offsets and stage boundaries are driver-collected literals
    # (r11): no single-partition base-offset stage, no join, and pass 2
    # reads pass 1's cache through a scan-side comparison expression
    # instead of re-running its window+join subtree
    assert plan.count("Exchange SinglePartition") == 0
    assert "BroadcastHashJoin" not in plan
    assert "element_at" in plan


def test_curriculum_plan_fewer_docs_than_stages(spark):
    """N < n_stages: boundary ranks coincide/overflow — empty stages must
    stay empty and stage ids still follow floor(rank*K/N) exactly (the
    r11 closed-form boundary rewrite's edge case)."""
    df = spark.createDataFrame([(1, 9.0), (2, 1.0)], "doc_id long, q double")
    out = {r.doc_id: (r.stage, r.curriculum_pos) for r in
           packing.curriculum_plan(df, "doc_id", "q", n_stages=4).collect()}
    # rank 0 = doc 1 (higher q): stage (0*4)//2 = 0; rank 1 = doc 2:
    # stage (1*4)//2 = 2; positions walk stages in order
    assert out == {1: (0, 0), 2: (2, 1)}

"""Deterministic sampling / dataset-mixing operators for training-data
pipelines (north-star surface; no counterpart in the reference, which only
samples inside model fits).

Everything derives from a content hash, never from ``rand()``:
``u(id) = int(md5(id ":" seed)[:8 hex]) / 2^32`` is an exact dyadic double,
so a row's keep/drop decision is a pure function of (id, seed) —
reproducible across runs, partitionings, cluster sizes, and engines (the
DuckDB oracles reproduce it bit-for-bit). At 100 TB this is the property
that matters: re-running a sample job after adding executors must not
change the sample, and a resumed pipeline must agree with its first half.

All operators are single-pass column expressions (JVM codegen, no shuffle
beyond what the caller already has); the per-stratum rate lookup is a
literal map, the scan stays narrow.
"""
from __future__ import annotations

from collections.abc import Mapping, Sequence
from fractions import Fraction

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HASH_DENOM = float(1 << 32)


def hash_uniform(col: Column, seed: int = 42) -> Column:
    """Deterministic uniform in [0, 1): first 8 md5 hex chars of
    ``value ":" seed`` scaled by 2^-32. Exact dyadic rational — engine
    round-trips (Spark vs DuckDB ``('0x'||substr(md5(..),1,8))::UBIGINT``)
    agree exactly."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", col.cast("string"), F.lit(str(seed)))), 1, 8),
        16,
        10,
    ).cast("double")
    return h / F.lit(HASH_DENOM)


def _stratum_lookup(
    stratum_col: str,
    mapping: Mapping[str, float],
    default: float | None = None,
) -> Column:
    """Literal-map stratum lookup shared by the samplers (stratified_
    sample rates, repeat_mix epochs, mix_to_targets weights): element_at
    on a create_map of the recipe, the stratum cast to string so numeric
    strata hit string keys. ``default=None`` returns NULL for absent
    strata (the exclusion form); a float default coalesces. ONE home for
    these semantics so null-key/ANSI behavior can never drift apart
    between the samplers."""
    if not mapping:
        base = F.lit(None).cast("double")
        return base if default is None else F.lit(float(default))
    pairs = [
        x for k, v in mapping.items() for x in (F.lit(k), F.lit(float(v)))
    ]
    got = F.element_at(
        F.create_map(*pairs), F.col(stratum_col).cast("string")
    )
    return got if default is None else F.coalesce(got, F.lit(float(default)))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    rates: Mapping[str, float],
    seed: int = 42,
    default_rate: float = 0.0,
    u_col: str | None = None,
) -> DataFrame:
    """Per-stratum deterministic Bernoulli sample: keep a row iff
    ``u(id) < rates[stratum]``. This is the domain-mixing primitive — e.g.
    {'web': 0.1, 'code': 1.0, 'forums': 0.5} re-weights sources without a
    shuffle or a random draw. Strata absent from ``rates`` use
    ``default_rate``. ``u_col`` optionally exposes the uniform for audit."""
    u = hash_uniform(F.col(id_col), seed)
    rate = _stratum_lookup(stratum_col, rates, default=float(default_rate))
    out = df.filter(u < rate)
    if u_col:
        out = out.withColumn(u_col, u)
    return out


def repeat_mix(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    epochs: Mapping[str, float],
    seed: int = 42,
    epoch_col: str = "epoch",
    default_epochs: float = 0.0,
) -> DataFrame:
    """Fractional-epoch domain repetition — the multi-epoch training
    recipe ("code 2.0 epochs, books 1.5, web 0.25"): every row of
    stratum s emits floor(e_s) full copies plus one extra with
    probability frac(e_s), decided by the same deterministic
    hash-uniform every sampler here uses. The realized multiplicity of
    each row is a pure function of (id, seed) — bit-reproducible across
    cluster sizes, appends, and engines — and each stratum's expected
    multiplicity is exactly e_s. Output = input columns + ``epoch_col``
    (0-based copy index): downstream packing/shuffling treats each
    (row, epoch) as an independent training instance. Dyadic fractional
    parts (x/2^k) make the keep decision engine-exact like
    stratified_sample's rates.

    Scale shape: pure scan + explode(sequence(0, n-1)) — ZERO shuffles,
    zero joins (the recipe is a literal map); output rows = Σ_s e_s·n_s,
    the size the recipe itself demands. Strata absent from ``epochs``
    use ``default_epochs`` (0.0 = dropped); NULL strata take the default
    too (element_at on NULL key is NULL, coalesced)."""
    e = _stratum_lookup(stratum_col, epochs, default=float(default_epochs))
    u = hash_uniform(F.col(id_col), seed)
    n = F.floor(e).cast("long") + F.when(u < (e - F.floor(e)), 1).otherwise(0)
    return (
        df.withColumn("_n", n)
        .filter(F.col("_n") > 0)
        .withColumn(
            epoch_col,
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.col("_n") - F.lit(1))
            ),
        )
        .drop("_n")
    )


def deterministic_split(
    df: DataFrame,
    id_col: str,
    splits: Sequence[tuple[str, float]] = (("train", 0.8), ("val", 0.1), ("test", 0.1)),
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row a split label by cumulative u-ranges:
    train = [0, 0.8), val = [0.8, 0.9), test = [0.9, 1). Weights need not
    sum to 1; the last split absorbs the remainder. A row's split is a pure
    function of (id, seed): stable under reruns, appends, and repartitions
    — the property that keeps eval sets leak-free as the corpus grows."""
    u = hash_uniform(F.col(id_col), seed)
    expr = None
    acc = 0.0
    for name, w in list(splits)[:-1]:
        acc += float(w)
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = list(splits)[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(split_col, expr)


def score_sample(
    df: DataFrame,
    id_col: str,
    score_col: str,
    seed: int = 42,
    gamma: float = 1.0,
    u_col: str | None = None,
) -> DataFrame:
    """Probability-proportional-to-score sampling: keep a row iff
    hash_uniform(id, seed) < score^gamma, for a [0,1] score column — the
    SOFT companion to the hard gates (quality_rank_gate cuts a cliff at a
    percentile; this keeps every doc with probability equal to its
    sharpened score, preserving some low-score mass for diversity, the
    standard soft quality-filter of web-corpus pipelines). gamma sharpens
    toward the hard gate; gamma=0 degenerates to a plain full sample.

    Deterministic pure function of (id, seed) — stable under
    repartitioning and appends, like every sampler here; single-pass
    column expression, zero shuffle."""
    u = hash_uniform(F.col(id_col), seed)
    rate = (
        F.pow(F.col(score_col), F.lit(float(gamma)))
        if float(gamma) != 1.0
        else F.col(score_col)
    )
    out = df.filter(u < rate)
    if u_col:
        out = out.withColumn(u_col, u)
    return out


def decayed_sample(
    df: DataFrame,
    id_col: str,
    ts_col: str,
    base_rate: float = 1.0,
    half_life_days: float = 30.0,
    reference_ts: str = "2026-01-01 00:00:00",
    seed: int = 42,
    u_col: str | None = None,
) -> DataFrame:
    """Recency-weighted deterministic sample: keep probability decays by
    half per ``half_life_days`` of age at ``reference_ts`` —
    rate(row) = base_rate * 2^(-age_days / half_life). Fresh data is kept,
    stale data thins out geometrically; the keep decision stays a pure
    function of (id, seed), so refreshing the sample with a later
    reference_ts deterministically DROPS rows but never resurrects ones a
    stricter cut removed (u is fixed; only the threshold moves).

    reference_ts is an explicit literal, not now(): reruns must be
    reproducible. Single-pass column expression, no shuffle."""
    u = hash_uniform(F.col(id_col), seed)
    age_days = (
        F.lit(reference_ts).cast("timestamp").cast("double")
        - F.col(ts_col).cast("timestamp").cast("double")
    ) / F.lit(86400.0)
    rate = F.lit(float(base_rate)) * F.pow(
        F.lit(2.0), -F.greatest(age_days, F.lit(0.0)) / F.lit(float(half_life_days))
    )
    out = df.filter(u < rate)
    if u_col:
        out = out.withColumn(u_col, u)
    return out


def mix_to_targets(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    targets: Mapping[str, float],
    seed: int = 42,
    u_col: str | None = None,
    rate_col: str | None = None,
    strict: bool = False,
    weight: Column | None = None,
) -> DataFrame:
    """Resample so the kept rows follow the TARGET stratum proportions
    while keeping as much data as possible: given target shares w_s, the
    largest feasible kept-total is T = min_s(n_s / w_s), so each stratum
    keeps at a rate r_s = w_s * T / n_s (the binding stratum keeps
    everything, the over-represented ones thin down). This is the "mix web
    /code/books to a recipe" primitive of corpus assembly — stratified_
    sample with the rates *derived from the data* instead of hand-set.

    Strata absent from ``targets`` (or with zero weight) are dropped.
    Rows keep iff u(id) < r_s with the same md5-dyadic u as every sampler
    here, so the mix is reproducible across runs and engines; expected
    kept composition matches ``targets`` exactly in ratio.

    T = min(n_s / w_s) runs over strata OBSERVED in the data: a target
    stratum with positive weight but ZERO rows does not force T to 0 (that
    would keep nothing); instead the mix is computed over the strata that
    exist, and the kept ratios match the recipe only among those. Pass
    ``strict=True`` to instead fail fast — one eager |strata|-row count
    (the same aggregate the plan needs anyway) raises ValueError naming
    the missing strata before any data is sampled.

    ``weight`` switches the mix from DOC proportions to MASS proportions:
    pass a per-row weight expression (e.g. the token count) and n_s
    becomes sum(weight) per stratum, so the EXPECTED kept token mass
    follows the recipe — real mixing plans target token budgets, not doc
    counts. Keep decisions remain per-row (u(id) < r_s): the kept mass
    matches the target in expectation, with per-doc granularity as the
    variance floor (exact mass matching is a knapsack, out of scope).
    Integral weights up to 2^53 stay exact through the double sum.

    Scale shape: one partial-aggregated count per stratum (a |strata|-row
    frame), a keyless 1-row min for T, and a broadcast join of the rates
    back onto the fact scan — the fact table itself is never shuffled.
    All rate arithmetic is double ops in one fixed order (w*T/n), so the
    DuckDB oracle reproduces the keep decision bit-for-bit.
    """
    w = _stratum_lookup(stratum_col, targets)
    mass = F.count("*") if weight is None else F.sum(weight)
    counts = (
        df.filter(w.isNotNull() & (w > 0))
        .groupBy(F.col(stratum_col).alias("_stratum"))
        .agg(mass.cast("double").alias("_n"))
    )
    if strict:
        present = {r["_stratum"] for r in counts.select("_stratum").collect()}
        missing = sorted(
            str(k) for k, v in targets.items() if float(v) > 0 and k not in present
        )
        if missing:
            raise ValueError(
                "mix_to_targets(strict=True): target strata with positive "
                f"weight but zero observed rows: {missing}"
            )
    w_of_stratum = _stratum_lookup("_stratum", targets)
    # T = min(n/w) as an unpartitioned window over the |strata|-row counts
    # frame (not a separate global aggregate + crossJoin): the aggregate
    # form re-derived `counts` in a second plan branch, costing one extra
    # pass over the input per action — the window keeps exactly ONE counts
    # aggregation, and single-partitioning a |strata|-row frame is free.
    # min over doubles is order-insensitive, so the value (and the oracle's
    # w*T/n keep decision) is bit-identical to the aggregate form.
    rates = counts.select(
        "_stratum",
        (
            w_of_stratum
            * F.min(F.col("_n") / w_of_stratum).over(Window.partitionBy())
            / F.col("_n")
        ).alias("_rate"),
    )
    u = hash_uniform(F.col(id_col), seed)
    out = (
        df.join(
            F.broadcast(rates), F.col(stratum_col) == F.col("_stratum")
        )
        .filter(u < F.col("_rate"))
        .drop("_stratum")
    )
    if u_col:
        out = out.withColumn(u_col, u)
    if rate_col:
        out = out.withColumn(rate_col, F.col("_rate"))
    return out.drop("_rate") if rate_col != "_rate" else out


def stratified_rank_filter(
    df: DataFrame,
    stratum_col: str,
    order_col: str,
    keep_frac: float,
    tiebreak_col: str | None = None,
    rank_col: str | None = None,
) -> DataFrame:
    """Keep the top ``keep_frac`` of each stratum ranked by ``order_col``
    descending (the per-domain quality-percentile gate of modern corpus
    pipelines — e.g. "keep the best 30% of each language by quality" — a
    RANK cut, unlike the hash-uniform RATE cuts above, so the kept set is
    the best rows, not a random sample). Keeps ceil(keep_frac * n_s) rows
    per stratum s: every non-empty stratum retains at least one row.

    The threshold is computed in INTEGER arithmetic: keep_frac is read as
    the rational p/q of its decimal literal (0.3 -> 3/10, 0.07 -> 7/100;
    non-terminating floats snap to the nearest q <= 10^6 rational) and the
    keep count is the ceil-division (n_s*p + q - 1) div q. Binary-double
    ceil(n*frac) is NOT engine-exact — 100*0.07 is 7.000000000000001 in
    ieee754, so float ceil keeps 8 rows where a DECIMAL oracle keeps 7 —
    the integer form agrees with decimal/rational engines for every n_s
    up to 2^63/p (well past any per-stratum count).

    Ties on ``order_col`` break by ``tiebreak_col`` ascending (required if
    ``order_col`` has duplicates — a nondeterministic rank would not be
    reproducible across engines or runs).

    Scale shape: one hash-partitioned shuffle on the stratum key feeding
    BOTH the row_number window and the per-stratum count (computed as a
    count window over the same partitioning, so Catalyst reuses one sort +
    exchange instead of adding an aggregate branch + join). Skewed strata
    sort-spill like any window; there is no driver state.
    """
    if not (0 < keep_frac <= 1):
        raise ValueError("require 0 < keep_frac <= 1")
    # decimal-literal rational: str() prints the shortest decimal that
    # round-trips the float, so clean fractions (0.3, 0.07, 0.25) become
    # exact p/q; limit_denominator snaps pathological expansions to the
    # nearest q <= 10^6 rational (within 1e-6 of the requested fraction)
    frac = Fraction(str(float(keep_frac))).limit_denominator(1_000_000)
    p, q = frac.numerator, frac.denominator
    order = [F.col(order_col).desc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(stratum_col).orderBy(*order)
    wc = Window.partitionBy(stratum_col)
    out = (
        df.withColumn("_rk", F.row_number().over(w))
        .withColumn("_ns", F.count("*").over(wc))
        .filter(
            # ceil(n*p/q) in pure longs — `div` is integer division
            F.col("_rk")
            <= F.expr(f"(_ns * {p} + {q - 1}) div {q}")
        )
    )
    if rank_col:
        out = out.withColumn(rank_col, F.col("_rk"))
    return out.drop("_rk", "_ns")


def split_leak_check(
    labeled: DataFrame,
    id_col: str,
    pairs: DataFrame,
    split_col: str = "split",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Eval-hygiene audit: where do the corpus's near-dup pairs fall
    relative to a split assignment? One row per unordered split pair
    (split_a <= split_b) with the pair count, its share of all near-dup
    pairs, and a ``leaked`` flag (split_a != split_b) — cross-split rows
    are exactly the train/test contamination a per-doc split permits and
    group_split prevents. Run it against a PROPOSED split before
    committing the corpus.

    Scale shape: two narrow equi-joins of the (tiny, near-dup-
    proportional) pair set against the (id, split) projection — AQE
    broadcasts the pair side; the share window runs over the aggregated
    frame (<= |splits|^2 rows)."""
    lab = labeled.select(F.col(id_col), F.col(split_col))
    j = (
        pairs.select(src, dst)
        .join(
            lab.select(F.col(id_col).alias(src), F.col(split_col).alias("_sa")), src
        )
        .join(
            lab.select(F.col(id_col).alias(dst), F.col(split_col).alias("_sb")), dst
        )
    )
    counts = (
        j.select(
            F.least("_sa", "_sb").alias("split_a"),
            F.greatest("_sa", "_sb").alias("split_b"),
        )
        .groupBy("split_a", "split_b")
        .agg(F.count("*").alias("n_pairs"))
    )
    total = F.sum("n_pairs").over(Window.partitionBy())
    return counts.select(
        "split_a",
        "split_b",
        "n_pairs",
        (F.col("n_pairs") / total).alias("share"),
        (F.col("split_a") != F.col("split_b")).alias("leaked"),
    )


def stratum_percentile(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    out_col: str = "pct",
) -> DataFrame:
    """Percentile-normalize a score WITHIN each stratum: out_col =
    percent_rank of ``value_col`` among its stratum's rows. The
    calibration step before any cross-domain gate — raw quality scores
    are not comparable across sources (a mid-tier web page outscores a
    top-tier forum post on absolute heuristics), but their within-source
    percentiles are.

    percent_rank is tie-aware (equal values share a rank), so the output
    is deterministic WITHOUT an id tie-break and equal scores calibrate
    equally — rank the caller's round-6 value to keep the result
    summation-order-stable across engines. Single-row strata map to 0.0.

    Scale shape: one hash exchange on the stratum key + a per-stratum
    sort (spills, never OOMs) — the stratified_rank_filter shape."""
    w = Window.partitionBy(stratum_col).orderBy(F.col(value_col).asc())
    return df.withColumn(out_col, F.percent_rank().over(w))


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    seed: int = 42,
    key_col: str = "sample_key",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis A-ES): keep the ``k`` rows with the smallest
    ``key = -ln(u(id)) / weight`` — each row's inclusion probability is
    proportional to its weight, and like every sampler here the draw is a
    pure function of (id, seed): re-running on more executors, resuming, or
    replaying in another engine yields the SAME k rows. The "sample 1M docs
    proportional to quality" primitive a curation pipeline needs once rates
    alone can't hit an exact budget.

    ``u`` is the exact dyadic hash uniform shifted by 2^-33 (still exactly
    representable: (2m+1)/2^33, 33 bits < 53) so u=0 can't produce an
    infinite key. ln() is the one non-dyadic step; adjacent keys in any
    realistic frame are separated by ~range/n >> 1 ulp, and ties break on
    id, so the kept SET is engine-stable (key values themselves are
    emitted round-6 for the hash). Rows with weight <= 0 or NULL are
    excluded (zero mass).

    Scale shape: one narrow codegen scan computing the key, then a global
    top-k — Spark plans orderBy().limit(k) as TakeOrderedAndProject:
    per-partition k-row heaps + a k-row driver merge, never a global sort
    or a single-partition window. 100 TB in, k rows shuffled out.
    """
    u = hash_uniform(F.col(id_col), seed) + F.lit(2.0 ** -33)
    key = -F.log(u) / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn(key_col, key)
        .orderBy(key_col, id_col)
        .limit(int(k))
    )


def weighted_sample_by(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    stratum_col: str,
    k: int,
    seed: int = 42,
    key_col: str = "sample_key",
) -> DataFrame:
    """Per-stratum weighted sampling without replacement: ``k`` rows PER
    ``stratum_col`` group, each kept with probability proportional to
    ``weight_col`` within its stratum (the "500 docs per language,
    quality-weighted" budget draw). Same A-ES key as weighted_sample —
    deterministic in (id, seed), engine-replayable; strata smaller than k
    keep all their positive-weight rows.

    Scale shape: ONE hash exchange on the stratum key + a per-stratum
    window sort (spills, never OOMs) — the stratified_rank_filter shape;
    ties break on id so the kept set is stable."""
    u = hash_uniform(F.col(id_col), seed) + F.lit(2.0 ** -33)
    key = -F.log(u) / F.col(weight_col).cast("double")
    w = Window.partitionBy(stratum_col).orderBy(key_col, id_col)
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn(key_col, key)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= int(k))
        .drop("_rn")
    )


def domain_cap(
    df: DataFrame,
    key_col: str = "source",
    id_col: str = "doc_id",
    cap: int = 100,
    seed: int = 42,
    mode: str = "exact",
) -> DataFrame:
    """Per-domain document cap — the balancing pass every crawled corpus
    applies so one mega-domain cannot dominate the mixture (C4/Gopher
    pipelines cap per registered domain). Keeps at most ``cap`` rows per
    ``key_col``, chosen DETERMINISTICALLY: the cap-winners are the rows
    with the smallest hash_uniform(id, seed) — a pure function of
    (id, seed), so re-runs, repartitions and engines agree exactly.

    ``mode='exact'`` ranks within each domain over one hash exchange on
    the key (row_number over (u, id)) — exact top-``cap``; the per-key
    ordered window sorts one domain's rows, so a pathological mega-domain
    bounds the task (the altseed hot-key draw stress-tests this shape).
    ``mode='rate'`` is the 100 TB off-ramp: a tiny per-key count
    aggregate broadcasts back and the scan keeps u < cap/n — ZERO fact
    shuffle, ``cap`` per domain in expectation (Chernoff-tight for the
    caps that matter), the statistical capping large pipelines actually
    run when exact-k is not worth a shuffle. Same hash, same
    determinism; only the guarantee differs (exact-k vs expected-k).
    """
    u = hash_uniform(F.col(id_col), seed)
    if mode == "rate":
        counts = df.groupBy(key_col).agg(F.count("*").alias("_n"))
        return (
            df.join(F.broadcast(counts), key_col)
            .filter(u < F.lit(float(cap)) / F.col("_n"))
            .drop("_n")
        )
    if mode != "exact":
        raise ValueError(f"unknown mode: {mode}")
    w = Window.partitionBy(key_col).orderBy(u.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= int(cap))
        .drop("_rk")
    )


def temperature_mix(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    alpha: float = 0.5,
    seed: int = 42,
    u_col: str | None = None,
    rate_col: str | None = None,
    weight: Column | None = None,
) -> DataFrame:
    """Temperature-flattened mixture: resample so kept shares follow
    n_s^alpha instead of n_s — the standard multilingual/multi-domain
    data recipe (alpha in (0, 1) up-weights small strata and flattens
    head domains; alpha=1 keeps everything, alpha=0 equalizes strata).
    This is :func:`mix_to_targets` with the recipe DERIVED from the data:
    unnormalized target weights w_s = n_s^alpha (the mix machinery is
    scale-invariant in w — T = min(n/w) and r = w*T/n both cancel a
    common factor — so no cross-stratum normalizing sum exists to
    introduce summation-order noise). The smallest stratum is always the
    binding one for alpha < 1 (n/n^alpha = n^(1-alpha) is increasing),
    so it keeps everything and larger strata thin toward the recipe.

    Engine-exactness: alpha=0.5 computes w via sqrt (IEEE
    correctly-rounded on every engine — the keep decision u < w*T/n is
    bit-reproducible, same guarantee as the other samplers). Other
    alphas go through pow(), where libm implementations may differ in
    the last ulp — the emitted round-6 ``rate_col`` stays comparable but
    a keep decision within an ulp of the boundary could differ across
    engines; pin alpha=0.5 where cross-engine replay matters.

    ``weight`` switches n_s from doc counts to mass sums (token budgets)
    exactly as in mix_to_targets. Scale shape: identical — one
    partial-agg stratum count, a |strata|-row window, broadcast rates
    back; the fact table never shuffles. NULL strata are dropped (no
    recipe can be derived for them), and so is any stratum with
    non-positive total mass (a ``weight`` summing to <= 0 gives the
    recipe a 0/0 rate — those strata are filtered out of the recipe
    explicitly rather than silently failing the keep predicate)."""
    if not (0.0 <= float(alpha) <= 1.0):
        raise ValueError("alpha must be in [0, 1]")
    mass = F.count("*") if weight is None else F.sum(weight)
    counts = (
        df.filter(F.col(stratum_col).isNotNull())
        .groupBy(F.col(stratum_col).alias("_stratum"))
        .agg(mass.cast("double").alias("_n"))
        .filter(F.col("_n") > 0)
    )
    w_of = (
        F.sqrt(F.col("_n"))
        if float(alpha) == 0.5
        else F.pow(F.col("_n"), F.lit(float(alpha)))
    )
    rates = counts.select(
        "_stratum",
        (
            w_of
            * F.min(F.col("_n") / w_of).over(Window.partitionBy())
            / F.col("_n")
        ).alias("_rate"),
    )
    u = hash_uniform(F.col(id_col), seed)
    out = (
        df.join(F.broadcast(rates), F.col(stratum_col) == F.col("_stratum"))
        .filter(u < F.col("_rate"))
        .drop("_stratum")
    )
    if u_col:
        out = out.withColumn(u_col, u)
    if rate_col:
        out = out.withColumn(rate_col, F.col("_rate"))
    return out.drop("_rate") if rate_col != "_rate" else out

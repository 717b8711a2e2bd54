"""PII detection and redaction for training-data pipelines (north-star
surface; the reference has no privacy operators — this extends the text
family of operators/text.py with the scrub pass every corpus build runs
before tokenization).

Design constraints:

- Pure column expressions (``regexp_count`` / ``regexp_replace``) — JVM
  whole-stage codegen, zero UDFs, zero shuffles: at 100 TB this is a
  scan-speed map pass that fuses with whatever filter/projection surrounds
  it.
- Patterns live in the Java-regex ∩ RE2 common dialect: character classes,
  bounded quantifiers, non-capturing groups, ASCII ``\\b`` — no
  lookaround, no backreferences — so the DuckDB oracle (RE2) reproduces
  Spark (java.util.regex) match-for-match and the redaction is
  hash-verifiable.
- Redaction is sequential by kind (email first, then SSN, phone, IPv4):
  each pass rewrites the previous pass's output, so overlapping matches
  resolve deterministically by kind priority, not engine-dependent order.
"""
from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: kind -> (pattern, replacement token); dict order IS redaction priority.
#: Patterns deliberately simple + dialect-portable; swap in stricter ones
#: (they must stay lookaround-free) for a production corpus.
DEFAULT_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    "phone": (r"\+?\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    "ipv4": (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
}


def pii_counts(
    df: DataFrame,
    text_col: str = "text",
    patterns: Mapping[str, tuple[str, str]] | None = None,
    total_col: str = "pii_total",
) -> DataFrame:
    """Append one ``n_<kind>`` match-count column per PII kind plus their
    sum. Counts are over the RAW text (each kind sees the original string,
    unlike redaction's sequential rewrite), so the columns are independent
    audit metrics."""
    pats = dict(DEFAULT_PATTERNS if patterns is None else patterns)
    for kind, (pat, _) in pats.items():
        df = df.withColumn(f"n_{kind}", F.regexp_count(F.col(text_col), F.lit(pat)))
    # sum the materialized count COLUMNS, not the regexp exprs: re-using the
    # expression would inline each regexp_count a second time (Catalyst
    # collapses projections), doubling the regex scan work per row
    total: Column | None = None
    for kind in pats:
        c = F.col(f"n_{kind}")
        total = c if total is None else total + c
    return df.withColumn(total_col, total if total is not None else F.lit(0))


def pii_redact(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "redacted",
    patterns: Mapping[str, tuple[str, str]] | None = None,
) -> DataFrame:
    """Replace every PII match with its kind token, applying kinds in
    ``patterns`` order (each pass sees the previous pass's output)."""
    pats = dict(DEFAULT_PATTERNS if patterns is None else patterns)
    col = F.col(text_col)
    for _, (pat, token) in pats.items():
        col = F.regexp_replace(col, pat, token)
    return df.withColumn(out_col, col)


def pii_filter(
    df: DataFrame,
    text_col: str = "text",
    max_total: int = 0,
    patterns: Mapping[str, tuple[str, str]] | None = None,
) -> DataFrame:
    """Keep only rows whose total PII match count is <= ``max_total``
    (default: drop any row containing PII). Single-pass filter expression —
    pushes below wider projections."""
    pats = dict(DEFAULT_PATTERNS if patterns is None else patterns)
    total: Column = F.lit(0)
    for _, (pat, _tok) in pats.items():
        total = total + F.regexp_count(F.col(text_col), F.lit(pat))
    return df.filter(total <= F.lit(max_total))


def pii_pseudonymize(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "pseudo",
    patterns: Mapping[str, tuple[str, str]] | None = None,
    seed: int = 42,
) -> DataFrame:
    """Replace every PII match with a DETERMINISTIC pseudonym —
    ``<KIND>_<md5(match ":" seed)[:8]>`` — instead of redaction's flat
    token. Equal values map to equal pseudonyms (referential integrity
    survives: the same email is the same entity across the corpus, joins
    and dedup still work), unequal values collide only at md5 odds, and
    nothing is reversible without the original value. The salt ``seed``
    breaks rainbow-table linkage across corpora.

    Mechanics, still pure codegen: per kind (patterns order, each pass on
    the previous pass's output), extract the matches in appearance order
    and fold replace(acc, match, pseudonym(match)) over them with
    F.aggregate — replacing ALL occurrences at a match's first encounter
    makes later duplicates no-ops, so no distinct/ordering semantics are
    needed. The md5-based pseudonym reuses the sampling family's engine-
    exact hash convention, so the DuckDB oracle (list_reduce) reproduces
    the rewrite byte-for-byte. Cost is one regex extraction pass + one
    fold per kind — scan-side, no shuffle, no UDF.

    Each pass is projected as a REAL intermediate column: the pass input
    feeds both the extraction and the fold init, and inlining a non-cheap
    expression referenced twice doubles the expression tree per kind
    (2^kinds blow-up — the lang_id/quantize JIT trap). CollapseProject
    keeps a non-cheap alias that is referenced more than once, so each
    pass's regex work runs exactly once per row."""
    pats = dict(DEFAULT_PATTERNS if patterns is None else patterns)

    def _fold(prefix: Column):
        # closure factory, NOT a default arg: PySpark maps a lambda's
        # parameter count onto the HOF arity, so a bound `p=prefix` third
        # parameter mis-binds aggregate's 2-arg merge (the lang_id trap)
        return lambda acc, m: F.replace(
            acc,
            m,
            F.concat(
                prefix,
                F.substring(F.md5(F.concat_ws(":", m, F.lit(str(seed)))), 1, 8),
            ),
        )

    if not pats:  # no patterns: pseudonym text is the raw text, by definition
        return df.withColumn(out_col, F.col(text_col))

    out = df
    cur = text_col
    for i, (kind, (pat, _tok)) in enumerate(pats.items()):
        nxt = out_col if i == len(pats) - 1 else f"_pseudo{i}"
        out = out.withColumn(
            nxt,
            F.aggregate(
                F.regexp_extract_all(F.col(cur), F.lit(pat), F.lit(0)),
                F.col(cur),
                _fold(F.lit(kind.upper() + "_")),
            ),
        )
        cur = nxt
    # NOTE: unconditional — gating on `drop` being non-empty silently
    # overwrote the single-pattern result with the raw text (PII leak).
    return out.drop(*[f"_pseudo{i}" for i in range(len(pats) - 1)])

"""Text-analysis operators for large-scale training-data pipelines (beyond
the reference surface; BASELINE.json north-star: language-ID, quality
scoring, token counting, document fingerprinting).

Everything is a column expression over built-in functions (split/regexp/
array lambdas) — JVM-side, whole-stage codegen, no UDFs — so these run at
scan speed on a 100 TB documents table. Formulas are defined here precisely
so the DuckDB oracles can mirror them term-for-term.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: stopword marker sets per language for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "y", "que", "en"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "les", "des", "et", "est"],
    "zh": ["的", "是", "在", "了"],
}

STOPWORDS = LANG_MARKERS["en"] + ["it", "that", "in", "for", "on", "with"]

FP_TOKEN_MOD = 1000003
FP_MOD = 1000000007
FP_MULT = 131


def tokens(text: Column) -> Column:
    """Whitespace tokens, empties removed."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda x: x != "")


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("n_tokens", F.size(tokens(F.col(text_col))))


def text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n_tokens, avg_token_len, punct_ratio, stopword_ratio, type-token ratio."""
    t = tokens(F.col(text_col))
    out = df.withColumn("_toks", t)
    n = F.size("_toks")
    total_len = F.aggregate(
        F.col("_toks"), F.lit(0), lambda acc, x: acc + F.length(x)
    )
    n_stop = F.size(F.filter(F.col("_toks"), lambda x: x.isin(STOPWORDS)))
    punct = F.length(
        F.regexp_replace(F.col(text_col), r"[a-zA-Z0-9\s]", "")
    ) / F.length(F.col(text_col))
    return (
        out.withColumn("n_tokens", n)
        .withColumn("avg_token_len", total_len / n)
        .withColumn("punct_ratio", punct)
        .withColumn("stopword_ratio", n_stop / n)
        .withColumn("type_token_ratio", F.size(F.array_distinct("_toks")) / n)
        .drop("_toks")
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite quality in [0,1]:
    0.25*min(1, n_tokens/50) + 0.25*(1 - min(1, punct_ratio*4))
    + 0.25*min(1, stopword_ratio*5) + 0.25*type_token_ratio
    """
    out = text_features(df, text_col)
    q = (
        F.lit(0.25) * F.least(F.lit(1.0), F.col("n_tokens") / 50.0)
        + F.lit(0.25) * (F.lit(1.0) - F.least(F.lit(1.0), F.col("punct_ratio") * 4.0))
        + F.lit(0.25) * F.least(F.lit(1.0), F.col("stopword_ratio") * 5.0)
        + F.lit(0.25) * F.col("type_token_ratio")
    )
    return out.withColumn("quality", q)


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-marker language ID; ties resolve in LANG_MARKERS order."""
    t = tokens(F.lower(F.col(text_col)))
    out = df.withColumn("_toks", t)
    def _in_markers(markers):
        # single-arg lambda: F.filter passes the element index to a second
        # parameter, so a two-arg lambda with a default would be clobbered
        return lambda x: x.isin(markers)

    for lang, markers in LANG_MARKERS.items():
        out = out.withColumn(
            f"_hits_{lang}", F.size(F.filter(F.col("_toks"), _in_markers(markers)))
        )
    langs = list(LANG_MARKERS)
    pred = None
    for i, lang in enumerate(langs):
        cond = None
        for other in langs[i + 1 :]:
            c = F.col(f"_hits_{lang}") >= F.col(f"_hits_{other}")
            cond = c if cond is None else (cond & c)
        if cond is None:
            branch = F.lit(lang)
            pred = pred.otherwise(branch) if pred is not None else branch
        else:
            pred = (
                F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
            )
    out = out.withColumn("pred_lang", pred)
    return out.drop("_toks", *[f"_hits_{lang}" for lang in langs])


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic rolling-hash document fingerprint (order-sensitive):
    code(tok) = (31*len(tok) + ascii(first char)) mod 1000003
    fp = fold(codes, 0, (acc, c) -> (131*acc + c) mod 1e9+7)
    """
    t = tokens(F.col(text_col))
    codes = F.transform(
        t,
        lambda x: (F.lit(31) * F.length(x) + F.ascii(x)) % F.lit(FP_TOKEN_MOD),
    )
    fp = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(FP_MULT) + c.cast("long")) % F.lit(FP_MOD),
    )
    return df.withColumn("fingerprint", fp)

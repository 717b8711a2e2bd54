"""Adversarial-unicode parity draw for the text family.

The driver fixtures are pure printable ASCII with single-space separators
(verified: zero rows match [\\t\\n\\r\\x0b\\x0c] or non-ASCII at any SF), so
they cannot exercise the places where Java regex and RE2 disagree. This
draw feeds every documents-only text query a corpus of the nasty cases —
exotic whitespace (VT/FF/CR/CRLF, NBSP, ideographic space, zero-width
space, BOM), C0 controls, combining marks, CJK without spaces, emoji ZWJ
sequences, mixed scripts, giant tokens, empty/whitespace-only docs, exact
duplicates — and requires the same driver-style hash parity as the
standard fixtures.

This is what caught the Java-vs-RE2 vertical-tab divergence (Java's \\s
includes \\x0B, RE2's does not): every whitespace/punct class in the text
family is now the explicit PORTABLE_WS class on BOTH engines
(operators/text.py), and this test keeps it that way.
"""
from __future__ import annotations

import os

import duckdb
import pytest

from beymani_spark.plans.registry import QUERIES
from tests.oracle import compare, duck_run

ADVERSARIAL_DOCS = [
    ("hello world the quick brown fox", "en", "plain"),
    ("", "en", "edge"),
    ("   \t  \n ", "en", "edge"),
    ("one", "en", "edge"),
    ("tab\tsep\ttokens\tand  double  spaces", "en", "ws"),
    ("line1\nline2\r\nline3\rline4\x0bline5\x0cline6", "en", "ws"),
    ("ctrl\x00chars\x01here\x1f end\x7f", "en", "ctrl"),
    ("café naïve résumé über", "fr", "latin"),
    ("combining é à ô marks", "fr", "latin"),
    ("中文没有空格的长句子", "zh", "cjk"),
    ("日本語 テスト 文字", "ja", "cjk"),
    ("emoji \U0001f600\U0001f680 and zwj \U0001f468‍\U0001f469‍\U0001f467 family", "en", "emoji"),
    ("nbsp separated words here", "en", "ws"),
    ("ideographic　space　tokens", "ja", "ws"),
    ("MiXeD CaSe TOKENS and UPPER lower", "en", "case"),
    ("punct!!! ???' quotes \"double\" 'single' (paren) [brack]", "en", "punct"),
    ("numbers 123 456.789 1e10 0x1f -42", "en", "num"),
    ("a " * 500 + "tail", "en", "long"),
    ("x" * 2000, "en", "long"),
    ("the the the the the the the the", "en", "rep"),
    ("danke schön über straße groß", "de", "latin"),
    ("русский текст здесь", "ru", "cyr"),
    ("back\\slash and /slash/ and $dollar ^caret", "en", "punct"),
    ("dup text dup text", "en", "dup"),
    ("dup text dup text", "en", "dup"),
    ("ends with period.", "en", "sent"),
    ("Sent one. Sent two! Sent three? Tail frag", "en", "sent"),
    (" line para separators", "en", "ws"),
    ("zero​width​space tokens", "en", "ws"),
    ("﻿BOM leading text", "en", "ctrl"),
]

#: documents-only registry queries the draw covers (lang column unused by
#: most; contamination/minhash variants need other fixture tables or model
#: artifacts and are covered by their own altseed draws)
TEXT_QUERIES = [
    "text_normalize", "sentence_stats", "token_count", "bpe_token_count",
    "lang_id", "quality_score", "text_features", "doc_fingerprint",
    "repetition_score", "ngram_novelty", "zipf_spectrum", "vocab_topk",
    "source_gram_topk", "corpus_stats", "gopher_quality", "dedup_exact",
    "dedup_rate_by_source", "dedup_jaccard", "dedup_simhash", "tfidf_topk",
    # round-7 session-2 additions (documents-only)
    "compression_ratio", "quality_fuse", "quality_fuse_by_lang",
    "lang_fertility", "dedup_containment", "compaction_plan",
    "media_phash_dup_pairs", "media_phash_dup_pairs_c2", "media_phash_png",
    "audio_dup_pairs", "video_phash_dup_pairs",
    # round-10 addition
    "bm25_topk",
]


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("advdocs")
    rows = [(i, t, l, s, len(t)) for i, (t, l, s) in enumerate(ADVERSARIAL_DOCS)]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR,"
        " source VARCHAR, n_chars BIGINT)"
    )
    con.executemany("INSERT INTO d VALUES (?,?,?,?,?)", rows)
    con.execute(f"COPY d TO '{d}/documents.parquet' (FORMAT PARQUET)")
    return str(d)


@pytest.mark.parametrize("name", TEXT_QUERIES)
def test_adversarial_text_parity(spark, adv_dir, name):
    q = QUERIES[name]
    errs = compare(q.builder(spark, adv_dir), duck_run(adv_dir, q.oracle_sql(adv_dir)))
    assert not errs, f"{name}[adversarial]: " + "; ".join(repr(e) for e in errs)


def test_compression_ratio_edges(spark):
    """compression_ratio: empty text -> NULL ratio, NULL text -> all
    NULL, repetitive text compresses below prose, random-ish text above."""
    import zlib

    from beymani_spark.operators.text import compression_ratio

    rows = [
        (1, ""),
        (2, None),
        (3, "spam " * 200),
        (4, "The quick brown fox jumps over the lazy dog near the bank."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in compression_ratio(df).collect()}
    assert out[1]["n_bytes"] == 0 and out[1]["zlib_ratio"] is None
    assert out[2]["n_zlib"] is None and out[2]["zlib_ratio"] is None
    # exact agreement with a local zlib replay (the oracle contract)
    for i in (3, 4):
        t = rows[i - 1][1].encode("utf-8")
        assert out[i]["n_zlib"] == len(zlib.compress(t, 6))
        assert out[i]["n_bytes"] == len(t)
    assert out[3]["zlib_ratio"] < 0.1 < out[4]["zlib_ratio"]

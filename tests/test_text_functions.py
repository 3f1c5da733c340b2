"""Tokenizer parity probes — non-ASCII included.

The synthetic corpus is ASCII-only, so oracle parity on it cannot
catch a Unicode divergence between Go's ``unicode.IsLetter`` (the
reference tokenizer, ``plugin/word_count/wc.go:23``), Java's
``\\p{L}`` (Spark), and DuckDB's RE2 ``\\p{L}``. These tests probe
the class boundary explicitly with manufactured rows.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mapreduce_lab_spark.functions.text import tokenize

PROBES = [
    "héllo wörld",             # latin letters with diacritics
    "日本語のテキストです",        # CJK + hiragana (all letters)
    "привет мир",              # cyrillic
    "don't split-this up",     # apostrophe + hyphen are separators
    "mixed42digits and_underscores",  # digits/underscore are separators
    "  leading and trailing  ",
    "",                        # empty text → no tokens
    "!!!",                     # separators only → no tokens
]

EXPECTED = [
    ["héllo", "wörld"],
    ["日本語のテキストです"],
    ["привет", "мир"],
    ["don", "t", "split", "this", "up"],
    ["mixed", "digits", "and", "underscores"],
    ["leading", "and", "trailing"],
    [],
    [],
]


@pytest.fixture(scope="module")
def probe_df(spark):
    return spark.createDataFrame([(i, t) for i, t in enumerate(PROBES)], "i int, text string")


def test_spark_tokenizer_unicode_semantics(probe_df):
    rows = (
        probe_df.select("i", tokenize(F.col("text")).alias("toks"))
        .orderBy("i")
        .collect()
    )
    got = [list(r.toks) for r in rows]
    assert got == EXPECTED


def test_duckdb_oracle_tokenizer_agrees(duck):
    for text, want in zip(PROBES, EXPECTED):
        got = duck.execute(
            "SELECT [t for t in regexp_split_to_array(?, '[^\\p{L}]+') if t <> '']",
            [text],
        ).fetchone()[0]
        assert got == want, (text, got, want)


def test_go_isletter_word_regex_agrees():
    # The Python-side tokenizer used by the generic MR contract.
    from mapreduce_lab_spark.operators.mapreduce_contract import _WORD

    for text, want in zip(PROBES, EXPECTED):
        assert _WORD.findall(text) == want, text

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


# --- gopher_quality_flags ----------------------------------------------------


def _gopher(spark, docs):
    from mapreduce_lab_spark.operators.textstats import gopher_quality_flags

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    return {r["doc_id"]: r.asDict() for r in gopher_quality_flags(df).collect()}


def test_gopher_rules_fire_independently(spark):
    # NB: tokenize() splits on non-LETTERS, so distinct words must be
    # letter-only (word0/word1/... all collapse to "word").
    import itertools

    words = [
        "wo" + a + b for a, b in itertools.product("abcdefghij", repeat=2)
    ]  # woaa..wojj: 100 distinct 4-letter tokens (mean length stays >= 3)
    long_good = "the a of " + " ".join(words[:60])
    too_short = "the a tiny doc here"
    repetitive = "the a " + " ".join(["spam"] * 58)
    short_words = "the a " + " ".join(["ab"] * 58)
    got = _gopher(
        spark,
        [(1, long_good), (2, too_short), (3, repetitive), (4, short_words)],
    )
    assert got[1]["passes"] and got[1]["word_count_ok"]
    assert not got[2]["word_count_ok"] and got[2]["stopword_ok"]
    assert not got[3]["repetition_ok"] and not got[3]["distinct_ratio_ok"]
    assert not got[3]["passes"]
    assert not got[4]["mean_word_len_ok"]


def test_gopher_modal_token_count_matches_python(spark):
    """The sorted-run modal count must equal collections.Counter."""
    import collections

    text = "x y z x x y the a of in q r s t u v w " * 5
    toks = [t for t in text.split() if t]
    top = collections.Counter(toks).most_common(1)[0][1]
    n = len(toks)
    got = _gopher(spark, [(1, text)])
    assert got[1]["repetition_ok"] == (top * 5 <= n)


def test_max_token_run_structural_edges(spark):
    """Run-boundary scan edge shapes after the r8 structural rewrite
    (seeded boundary 1, lambda over sequence(2, n) — no dependence on
    Or evaluation order, no element_at(srt, 0) ever constructed):
    n=0, n=1, all-identical, all-distinct, longest-run-at-end."""
    from pyspark.sql import functions as F

    from mapreduce_lab_spark.operators.textstats import _max_token_run

    cases = [
        ([], 0),            # n=0: sentinel-only bounds, max gap 0
        (["a"], 1),         # n=1: single run of 1
        (["a"] * 7, 7),     # all identical
        (["a", "b", "c", "d"], 1),  # all distinct
        (["a", "b", "b", "b"], 3),  # longest run at the end
        (["a", "a", "b"], 2),       # longest run at the start
    ]
    df = spark.createDataFrame(
        [(i, srt) for i, (srt, _) in enumerate(cases)], "id int, srt array<string>"
    )
    got = {
        r["id"]: r["mr"]
        for r in df.select(
            "id", _max_token_run(F.col("srt"), F.size("srt")).alias("mr")
        ).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, f"case {i}: got {got[i]}, want {want}"


def test_gopher_empty_doc_fails_all(spark):
    got = _gopher(spark, [(1, ""), (2, "!!! ...")])
    for d in (1, 2):
        assert not got[d]["passes"]
        assert not got[d]["word_count_ok"]
        assert got[d]["n_tokens"] == 0

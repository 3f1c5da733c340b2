"""Property tests: the three BPE implementations (Spark trainer,
DuckDB unrolled oracle, pure-Python reference) must agree on
randomized corpora — catches tie-break and greedy-merge edge cases
(repeated symbols, single-char words, shared prefixes) that a fixed
corpus can't. The DuckDB-vs-Python legs run WITHOUT Spark, so they
afford two orders of magnitude more examples per run — exactly the
coverage that would have caught the round-12 oracle prefix-hazard
(ADVICE r12: replace() merged (x)(ab</w>) under (x,a)) before an
advisor did."""

from __future__ import annotations

import duckdb
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from tests.fuzzbudget import examples

from mapreduce_lab_spark.operators.bpe import (
    END_OF_WORD,
    _bpe_encode_oracle,
    _bpe_train_oracle,
    bpe_train_merges,
)
from tests.test_bpe import _py_bpe

WORD = st.text(alphabet="ab", min_size=1, max_size=4)
DOC = st.lists(WORD, min_size=1, max_size=8).map(" ".join)
CORPUS = st.lists(DOC, min_size=1, max_size=5)
# Wider alphabet for the cheap DuckDB legs: 'x' seeds prefix-hazard
# shapes (merged symbols adjacent to their own first letter).
WORD_X = st.text(alphabet="abx", min_size=1, max_size=5)
DOC_X = st.lists(WORD_X, min_size=1, max_size=10).map(" ".join)
CORPUS_X = st.lists(DOC_X, min_size=1, max_size=6)


def _duck_docs(corpus):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", list(enumerate(corpus))
    )
    return con


def _py_encode(texts, merges):
    """Reference encode: greedy left-to-right merge replay per word."""
    out = {}
    for doc_id, t in enumerate(texts):
        words = [w for w in t.split() if w]
        if not words:
            continue
        n_tokens = 0
        for w in words:
            syms = list(w) + [END_OF_WORD]
            for left, right in merges:
                nxt, prev = [], None
                for x in syms:
                    if prev == left and x == right:
                        nxt.append(left + right)
                        prev = None
                    elif prev is None:
                        prev = x
                    else:
                        nxt.append(prev)
                        prev = x
                if prev is not None:
                    nxt.append(prev)
                syms = nxt
            n_tokens += len(syms)
        out[doc_id] = (n_tokens, len(words))
    return out

_spark = None


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=CORPUS)
def test_bpe_matches_reference_on_random_corpora(spark, corpus):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id LONG, text STRING"
    )
    got = [
        (r["round"], r["left"], r["right"], r["pair_count"])
        for r in bpe_train_merges(docs, rounds=4).orderBy("round").collect()
    ]
    assert got == _py_bpe(corpus, 4)


@settings(max_examples=examples(150), deadline=None)
@given(corpus=CORPUS_X)
@example(corpus=["ab " * 10 + "xab xab xac xad xae xaf"])  # ADVICE r12
@example(corpus=["aaaa aaa aa"])  # overlap chains
@example(corpus=["abab abab ab", "xabab"])  # merged-symbol adjacency
def test_train_oracle_matches_reference_on_random_corpora(corpus):
    """The DuckDB unrolled trainer (list_reduce greedy fold) vs the
    pure-Python reference — Spark-free, so the fuzz is wide. Twelve
    rounds, matching the registered oracle's unroll depth."""
    con = _duck_docs(corpus)
    got = sorted(tuple(r) for r in con.execute(_bpe_train_oracle()).fetchall())
    con.close()
    assert got == sorted(_py_bpe(corpus, 12))


@settings(max_examples=examples(150), deadline=None)
@given(corpus=CORPUS_X)
@example(corpus=["ab " * 10 + "xab xab xac xad xae xaf"])
def test_encode_oracle_matches_reference_on_random_corpora(corpus):
    """The DuckDB train->encode chain vs a pure-Python greedy merge
    replay, per document. Six rounds, matching the registered
    bpe_token_counts oracle."""
    con = _duck_docs(corpus)
    got = {
        r[0]: (r[1], r[2])
        for r in con.execute(_bpe_encode_oracle()).fetchall()
    }
    con.close()
    merges = [(left, right) for _, left, right, _ in _py_bpe(corpus, 6)]
    assert got == _py_encode(corpus, merges)

"""Dedup-specific unit tests, beyond the oracle-parity sweep.

Pins the prefix-filtering properties of the shingle-index join:
(1) SAFETY — filtering loses no Jaccard>=0.5 pair (identical verified
output to the naive index), and (2) EFFECTIVENESS — a corpus with a
planted hot shingle (a phrase every doc shares) produces quadratically
many naive candidates but only O(true-pairs) filtered candidates.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_lab_spark.functions.guards import (
    ExactBaselineScaleError,
    guard_quadratic,
)
from mapreduce_lab_spark.operators.dedup import (
    _doc_shingles,
    _pair_jaccard,
    naive_candidate_pairs,
    prefix_filtered_pairs,
)
from mapreduce_lab_spark.operators.similarity import knn_bruteforce

N_DOCS = 30
HOT_PHRASE = "the quick brown fox jumps over the lazy dog again and again"


def _hot_shingle_corpus(spark):
    """Every doc shares HOT_PHRASE (hot shingles, df = N_DOCS); each
    doc adds a unique tail (rare shingles, df = 1) long enough to keep
    cross-doc Jaccard well under 0.5. Docs 0 and 1 are exact
    near-duplicates (identical text, J = 1)."""
    rows = []
    for i in range(N_DOCS):
        tag = 0 if i == 1 else i  # doc 1 duplicates doc 0
        # Letter-only tokens: the tokenizer splits on non-letters, so
        # digit tags would collapse every doc's tail to the same tokens.
        t = chr(ord("a") + tag % 26) + chr(ord("a") + tag // 26)
        tail = " ".join(
            f"tok{t}w{chr(ord('a') + j)} filler{t}x{chr(ord('a') + j)}"
            for j in range(9)
        )
        rows.append((i, f"{HOT_PHRASE} {tail}"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_prefix_filter_kills_hot_shingle_blowup(spark):
    doc_sh = _doc_shingles(_hot_shingle_corpus(spark)).cache()
    n_naive = naive_candidate_pairs(doc_sh).count()
    n_filtered = prefix_filtered_pairs(doc_sh).count()
    # Naive: the hot phrase links every pair -> full quadratic C(30,2).
    assert n_naive == N_DOCS * (N_DOCS - 1) // 2
    # Filtered: hot shingles fall out of every doc's rarest-half
    # prefix; only docs sharing RARE shingles remain candidates.
    assert n_filtered < n_naive / 10, (n_filtered, n_naive)


def test_prefix_filter_is_lossless_for_threshold(spark):
    doc_sh = _doc_shingles(_hot_shingle_corpus(spark)).cache()
    verified_naive = sorted(
        tuple(r) for r in _pair_jaccard(naive_candidate_pairs(doc_sh), doc_sh).collect()
    )
    verified_filtered = sorted(
        tuple(r) for r in _pair_jaccard(prefix_filtered_pairs(doc_sh), doc_sh).collect()
    )
    assert verified_filtered == verified_naive
    # The planted duplicate pair must survive the filter.
    assert (0, 1, 1.0) in verified_filtered


def test_prefix_filter_handles_tiny_docs(spark):
    """Docs with < 3 tokens collapse to a single whole-doc shingle;
    prefix length floor(1/2)+1 = 1 must still index it (identical
    short docs are found)."""
    rows = [(1, "hi there"), (2, "hi there"), (3, "bye now")]
    doc_sh = _doc_shingles(spark.createDataFrame(rows, "doc_id long, text string"))
    pairs = sorted(
        (r.doc_a, r.doc_b) for r in _pair_jaccard(prefix_filtered_pairs(doc_sh), doc_sh).collect()
    )
    assert pairs == [(1, 2)]


# --- O(n²) baseline guards ---------------------------------------------------


def test_guard_quadratic_raises_over_bound(spark):
    df = spark.range(100)
    with pytest.raises(ExactBaselineScaleError, match="all-pairs over 100 rows"):
        guard_quadratic(df, 10, "op_under_test", "the_scale_path")


def test_guard_quadratic_passes_under_bound_and_opt_out(spark):
    df = spark.range(100)
    assert guard_quadratic(df, 1000, "op", "path") is df
    assert guard_quadratic(df, None, "op", "path") is df  # explicit opt-in


def test_knn_bruteforce_guard(spark):
    e = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.array(F.rand(seed=7), F.rand(seed=11)).alias("embedding"),
    )
    with pytest.raises(ExactBaselineScaleError, match="knn_bruteforce"):
        knn_bruteforce(e, n_queries=5, max_comparisons=100)
    # Under the bound it runs and returns top-k rows per query.
    out = knn_bruteforce(e, n_queries=2, k=3, max_comparisons=10_000)
    assert out.count() == 6

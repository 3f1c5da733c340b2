"""Property test: distributed BPE must match the pure-Python reference
on randomized corpora — catches tie-break and greedy-merge edge cases
(repeated symbols, single-char words, shared prefixes) that a fixed
corpus can't."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mapreduce_lab_spark.operators.bpe import bpe_train_merges
from tests.test_bpe import _py_bpe

WORD = st.text(alphabet="ab", min_size=1, max_size=4)
DOC = st.lists(WORD, min_size=1, max_size=8).map(" ".join)
CORPUS = st.lists(DOC, min_size=1, max_size=5)

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

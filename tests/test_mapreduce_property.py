"""Property-based check of the generic MapReduce contract.

The reference defines its semantics by the sequential oracle
(``main_test/mrsequential.go``); here the oracle is a plain-Python
fold over the same (Map, Reduce) functions, and hypothesis drives
randomized corpora (including unicode letters, separators, empty
docs) through the distributed pipeline.
"""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.fuzzbudget import examples

from mapreduce_lab_spark.operators.mapreduce_contract import (
    _WORD,
    map_reduce,
    wc_map,
    wc_reduce,
)

ALPHABET = "ab Zé九\t\n.!'"

corpora = st.lists(
    st.text(alphabet=ALPHABET, max_size=40), min_size=0, max_size=6
)


@pytest.fixture(scope="module")
def sc(spark):
    return spark.sparkContext


@given(texts=corpora)
@settings(
    max_examples=examples(15),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_mr_wordcount_matches_sequential_oracle(sc, texts):
    records = [(f"doc-{i}", t) for i, t in enumerate(texts)]
    got = dict(
        map_reduce(sc.parallelize(records, 3), wc_map, wc_reduce, n_reduce=4).collect()
    )
    want = Counter(w for _, t in records for w in _WORD.findall(t))
    assert got == {w: str(n) for w, n in want.items()}

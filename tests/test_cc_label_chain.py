"""Property tests for the round-12 label-doubling CC oracle chain
(semantic_ivf._cc_label_chain): the SQL that replaced the
transitive-closure recursion in the pinned-IVF twin must compute
EXACT connected components (min-id labels) for any graph — including
graphs whose diameter exceeds the 4096 the 12 doubling rounds cover,
where correctness rests entirely on the contracted recursive finish."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tests.fuzzbudget import examples

from mapreduce_lab_spark.operators.semantic_ivf import (
    _CC_ROUNDS,
    _cc_label_chain,
)


def _chain_labels(pairs, rounds=_CC_ROUNDS):
    """Run the SQL chain over undirected pairs; returns {node: label}."""
    if not pairs:
        return {}
    con = duckdb.connect()
    try:
        con.register(
            "p", pd.DataFrame(pairs, columns=["a", "b"]).astype("int64")
        )
        sql = f"""
        WITH edges AS MATERIALIZED (
          SELECT a AS src, b AS dst FROM p
          UNION SELECT b, a FROM p
        ),
        {_cc_label_chain(rounds)}
        labels AS (
          SELECT l.v AS rep, coalesce(cl.cl, l.l) AS cluster_id
          FROM l{rounds} l LEFT JOIN clab cl ON cl.cv = l.l
        )
        SELECT rep, cluster_id FROM labels
        """
        return dict(con.execute(sql).fetchall())
    finally:
        con.close()


def _uf_labels(pairs):
    """Python union-find reference: node -> min id of its component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    return {n: min(ns) for ns in comp.values() for n in ns}


@settings(max_examples=examples(120), deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 60), st.integers(0, 60)),
        min_size=1,
        max_size=80,
    )
)
def test_chain_matches_union_find_random_graphs(pairs):
    pairs = [(a, b) for a, b in pairs if a != b]
    if not pairs:
        return
    assert _chain_labels(pairs) == _uf_labels(pairs)


@pytest.mark.parametrize(
    "shape",
    ["path", "reversed_path", "star", "cycle", "two_paths", "binary_tree"],
)
def test_chain_on_adversarial_shapes(shape):
    n = 500
    if shape == "path":
        pairs = [(i, i + 1) for i in range(n)]
    elif shape == "reversed_path":
        # min id at the FAR end: labels must travel the whole path
        pairs = [(n - i, n - i - 1) for i in range(n)]
    elif shape == "star":
        pairs = [(0, i) for i in range(1, n)]
    elif shape == "cycle":
        pairs = [(i, (i + 1) % n) for i in range(n)]
    elif shape == "two_paths":
        pairs = [(i, i + 1) for i in range(0, n, 2)]
    else:  # binary_tree
        pairs = [(i, 2 * i + 1) for i in range(n)] + [
            (i, 2 * i + 2) for i in range(n)
        ]
    assert _chain_labels(pairs) == _uf_labels(pairs)


def test_finish_catches_diameter_beyond_doubling_budget():
    """A path much longer than 2^rounds at a SMALL round count: the
    doubling alone CANNOT converge, so the contracted recursive
    finish must close the gap — this is the exactness guarantee the
    pinned-IVF oracle rests on for any input."""
    n = 3000
    pairs = [(i, i + 1) for i in range(n)]
    # rounds=3 covers distance 8 only; diameter is 3000
    assert _chain_labels(pairs, rounds=3) == {i: 0 for i in range(n + 1)}
    # and at the production rounds the same graph also converges
    assert _chain_labels(pairs) == {i: 0 for i in range(n + 1)}

"""Property test: the alternating large-star/small-star
connected-components loop must match a pure-Python union-find on
randomized edge lists — catches convergence and labeling edge cases
(chains, self-loops, duplicate/reversed edges, singleton components
from self-loop-only nodes) that the fixed dedup corpora can't.

The union-find is the textbook sequential oracle; the Spark side is
the O(log^2 n)-round distributed algorithm (Kiveris et al., SoCC
2014) in operators/dedup.py — two entirely different routes to the
same fixpoint: every input endpoint labeled with its component's
minimum node id.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.fuzzbudget import examples

from mapreduce_lab_spark.operators.dedup import connected_components

NODE = st.integers(min_value=0, max_value=24)
EDGES = st.lists(st.tuples(NODE, NODE), min_size=1, max_size=40)


def _py_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    roots: dict[int, list[int]] = {}
    for n in parent:
        roots.setdefault(find(n), []).append(n)
    return {n: min(members) for members in roots.values() for n in members}


@settings(
    max_examples=examples(10),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=EDGES)
def test_cc_matches_union_find_on_random_graphs(spark, edges):
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(df).collect()
    }
    assert got == _py_components(edges)


def test_cc_long_chain_converges_under_iteration_cap(spark):
    """A 64-node path graph has diameter 63 — min-label propagation
    would need ~63 rounds, far past the max_iters=15 backstop; the
    star algorithm must still reach the exact fixpoint within it."""
    edges = [(i, i + 1) for i in range(63)]
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(df).collect()
    }
    assert got == {i: 0 for i in range(64)}

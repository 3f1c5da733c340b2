"""k-core peeling vs an independent pure-Python reference, on both a
planted graph with a known core and the real copurchase graph."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from mapreduce_lab_spark.operators.graph import MIN_COPURCHASES, kcore_parts
from mapreduce_lab_spark.sources.tables import load_table


def _py_kcore(edges, k):
    """Reference peeling on an undirected edge set {(u,v), ...}."""
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj[n]:
                    adj[m].discard(n)
                del adj[n]
                changed = True
    return {n: len(ns) for n, ns in adj.items()}


def _lineitem_from_baskets(spark, baskets):
    # Each basket repeated twice so every pair clears MIN_COPURCHASES.
    rows = [
        (o * 2 + r, p)
        for o, parts in enumerate(baskets)
        for r in (0, 1)
        for p in parts
    ]
    return spark.createDataFrame(rows, "l_orderkey LONG, l_partkey LONG")


def test_planted_clique_survives_tail_does_not(spark):
    # K5 on {0..4} (3-core) + a pendant path 4-10-11 (peeled away).
    baskets = [[0, 1, 2, 3, 4], [4, 10], [10, 11]]
    li = _lineitem_from_baskets(spark, baskets)
    got = {r["part"]: r["core_degree"] for r in kcore_parts(li, k=3).collect()}
    assert got == {0: 4, 1: 4, 2: 4, 3: 4, 4: 4}


def test_matches_python_reference_on_real_graph(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    pairs = (
        li.select("l_orderkey", "l_partkey").distinct().alias("a")
        .join(li.select("l_orderkey", "l_partkey").distinct().alias("b"), "l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2"))
        .agg(F.count("*").alias("c"))
        .where(F.col("c") >= MIN_COPURCHASES)
        .select("p1", "p2")
        .collect()
    )
    want = _py_kcore([(r["p1"], r["p2"]) for r in pairs], 3)
    got = {r["part"]: r["core_degree"] for r in kcore_parts(li, k=3).collect()}
    assert got == want


def test_kcore_round_budget_exhaustion_raises(spark):
    """A 12-node path with k=2 peels two endpoints per round (~5
    rounds to the empty fixpoint); a 2-round budget must raise rather
    than silently return the partially-peeled non-fixpoint."""
    import pytest

    path_baskets = [[i, i + 1] for i in range(11)]
    li = _lineitem_from_baskets(spark, path_baskets)
    with pytest.raises(RuntimeError, match="did not converge"):
        kcore_parts(li, k=2, max_rounds=2).collect()
    # With the default budget the same graph converges (to empty).
    assert kcore_parts(li, k=2).count() == 0

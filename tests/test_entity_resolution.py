"""Micro-cases for the Fellegi-Sunter entity-resolution census.

Parity vs DuckDB is covered by the registry sweep; these pin the
semantics: a clone pair scores the full-agreement weight and is a
match, a same-block-but-different record pair is not, and records in
different blocks are never candidates at all.
"""

from __future__ import annotations

from mapreduce_lab_spark.operators.entity import (
    ER_MATCH_THRESHOLD,
    ER_WEIGHTS,
    entity_resolution_scores,
)

SCHEMA = (
    "p_partkey long, p_name string, p_brand string, p_type string, "
    "p_size int, p_retailprice double"
)


def test_clone_pair_is_full_agreement_match(spark):
    rows = [
        (1, "small ring", "Brand#1", "ECONOMY", 5, 100.00),
        (2, "small ring", "Brand#1", "ECONOMY", 5, 100.50),  # within $1
        (3, "red ring", "Brand#1", "STANDARD", 9, 500.00),
    ]
    out = entity_resolution_scores(spark.createDataFrame(rows, SCHEMA)).collect()
    full = [r for r in out if r["score"] == sum(w for w, _ in ER_WEIGHTS.values())]
    assert len(full) == 1 and full[0]["n_pairs"] == 1 and full[0]["is_match"] == 1
    # total candidates inside the (ring, Brand#1) block of 3 = 3 pairs
    assert sum(r["n_pairs"] for r in out) == 3
    assert all(r["is_match"] == 0 for r in out if r["score"] < ER_MATCH_THRESHOLD)


def test_blocking_prevents_cross_block_candidates(spark):
    # Same everything except the blocking noun -> zero candidate pairs.
    rows = [
        (1, "small ring", "Brand#1", "ECONOMY", 5, 100.00),
        (2, "small bolt", "Brand#1", "ECONOMY", 5, 100.00),
    ]
    out = entity_resolution_scores(spark.createDataFrame(rows, SCHEMA)).collect()
    assert out == []


def test_window_cap_bounds_candidates(spark):
    # 6 records in ONE block: sorted-neighborhood with W=3 gives
    # 3+3+3+2+1 = 12 pairs, not C(6,2)=15.
    rows = [
        (i, "small ring", "Brand#1", "ECONOMY", i, 100.0 + i) for i in range(6)
    ]
    out = entity_resolution_scores(spark.createDataFrame(rows, SCHEMA)).collect()
    assert sum(r["n_pairs"] for r in out) == 12


def test_recall_eval_clone_run_chains(spark):
    # 12 clones in one block: a W=3 window cannot pairwise-enumerate
    # C(12,2)=66 true matches, but every record finds >= 1 partner —
    # pair recall < 1, record recall == 1 (transitive closure, which
    # the dedup consumer applies, recovers the full cluster).
    from mapreduce_lab_spark.operators.entity import er_window_recall_eval

    rows = [(i, "small ring", "Brand#1", "ECONOMY", 5, 100.00) for i in range(12)]
    out = er_window_recall_eval(spark.createDataFrame(rows, SCHEMA)).collect()
    # the block may or may not survive the hash gate; if it does, the
    # invariants must hold
    if out and out[0]["n_true"] > 0:
        r = out[0]
        assert r["record_recall"] == 1.0
        assert r["pair_recall"] < 1.0
        assert r["n_rec_true"] == 12

"""Sketch accuracy + mergeability. Parity for kmv_distinct_users is
covered by the oracle suite; these tests pin what parity can't —
estimates land near the exact truth, and HLL partial-union equals the
direct single-pass sketch (the re-aggregation contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_lab_spark.operators.sketches import (
    hll_union_users,
    kmv_distinct_users,
)
from mapreduce_lab_spark.sources.tables import load_table


def _exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }


def test_kmv_estimates_within_error(spark, sf_dir):
    exact = _exact(spark, sf_dir)
    est = {r["event_type"]: r["est_users"]
           for r in kmv_distinct_users(load_table(spark, sf_dir, "events")).collect()}
    assert set(est) == set(exact)
    for t, n in exact.items():
        # k=256 → ~6% standard error; exact below k distinct values.
        tol = 0 if n < 256 else 0.2 * n
        assert abs(est[t] - n) <= tol, (t, est[t], n)


def test_hll_union_matches_direct_sketch_and_truth(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    exact = _exact(spark, sf_dir)
    merged = {r["event_type"]: r["approx_users"]
              for r in hll_union_users(ev).collect()}
    direct = {
        r["event_type"]: r["approx_users"]
        for r in ev.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("approx_users"))
        .collect()
    }
    # Merging daily partials must equal sketching the whole stream
    # (associativity of the union), and both must track the truth.
    assert merged == direct
    for t, n in exact.items():
        assert abs(merged[t] - n) <= max(2, 0.1 * n), (t, merged[t], n)

"""Incremental SCD2 refresh: result parity vs the full rebuild is the
oracle check; this pins the non-degeneracy of the split (both the
keep branch and the rebuild branch carry rows) and the targeted-
recompute contract (unaffected users' rows are byte-identical to
their pre-delta dimension)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_lab_spark.operators.lifecycle import (
    SCD2_SPLIT_TS,
    scd2_incremental,
    scd2_user_status,
)
from mapreduce_lab_spark.sources.tables import load_table


def test_both_branches_nonempty_and_match_full_rebuild(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    affected = set(
        r["user_id"]
        for r in events.where(F.col("ts") >= SCD2_SPLIT_TS)
        .select("user_id").distinct().collect()
    )
    all_users = set(r["user_id"] for r in events.select("user_id").distinct().collect())
    assert affected and (all_users - affected), (
        f"degenerate split: {len(affected)}/{len(all_users)} affected"
    )
    got = sorted(tuple(r) for r in scd2_incremental(events).collect())
    want = sorted(tuple(r) for r in scd2_user_status(events).collect())
    assert got == want


def test_unaffected_rows_come_from_pre_delta_dimension(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    affected = events.where(F.col("ts") >= SCD2_SPLIT_TS).select("user_id").distinct()
    old_dim = scd2_user_status(events.where(F.col("ts") < SCD2_SPLIT_TS)).join(
        affected, "user_id", "left_anti"
    )
    refreshed_unaffected = scd2_incremental(events).join(
        affected, "user_id", "left_anti"
    )
    assert sorted(tuple(r) for r in refreshed_unaffected.collect()) == sorted(
        tuple(r) for r in old_dim.collect()
    )

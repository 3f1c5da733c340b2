"""Plan-quality pins for the LM-scoring and drift lanes.

The global hygiene sweep (test_plan_hygiene.py) bans cartesians,
unaudited BNLJs, row-at-a-time Python, and unbounded duplicate scans
for EVERY query; these tests pin the lane-specific properties a
100 TB reviewer checks by hand: the scan reads only the columns the
monitor needs (payload columns prune out), and the count frames that
feed every join are map-side combinable.
"""

from __future__ import annotations

import pytest

from mapreduce_lab_spark import registry
from mapreduce_lab_spark.plans.inspect import (
    has_partial_aggregation,
    scan_read_schemas,
)

registry.load_all()
_Q = registry.queries()

# query -> (allowed scan columns per input table)
PRUNING = {
    # text payload feeds the tokenizer; doc metadata beyond the key
    # and grouping column must never reach the scan.
    "lm_bigram_bits": {"doc_id", "text"},
    "lm_trigram_backoff_bits": {"doc_id", "text"},
    "lm_filter_retention": {"doc_id", "text", "source"},
    "source_unigram_tvd": {"source", "text"},
    # the 64-float payload and the grouping label; vec_id prunes out.
    "label_centroid_drift": {"label", "embedding"},
    # event monitors: the timestamp plus exactly the monitored column.
    "daily_event_mix_drift": {"ts", "event_type"},
    "daily_value_ks_drift": {"ts", "value"},
    # trajectory lane: ordering keys + type; value/props prune out.
    "behavioral_nearest_neighbor": {"user_id", "ts", "event_id", "event_type"},
}


@pytest.mark.parametrize("name", sorted(PRUNING))
def test_scan_reads_only_needed_columns(spark, sf_dir, name):
    if name == "behavioral_nearest_neighbor":
        # The round-13 rewrite localCheckpoints the family chain (it
        # feeds 3+ physical subtrees), so the REGISTERED query's final
        # plan scans the checkpointed RDD, not parquet. The lane's only
        # file scan lives in the pre-checkpoint fragment — pin pruning
        # there, where Catalyst still sees the parquet source.
        from mapreduce_lab_spark.operators.paths import _trajectory_families
        from mapreduce_lab_spark.sources.tables import load_table

        df = _trajectory_families(load_table(spark, sf_dir, "events"))
    else:
        df = _Q[name](spark, sf_dir)
    schemas = scan_read_schemas(df)
    assert schemas, f"{name}: no file scan found in plan"
    allowed = PRUNING[name]
    for cols in schemas:
        extra = set(cols) - allowed
        assert not extra, (
            f"{name}: scan reads {sorted(extra)} beyond {sorted(allowed)}"
        )


@pytest.mark.parametrize(
    "name",
    [
        "lm_bigram_bits",
        "lm_trigram_backoff_bits",
        "source_unigram_tvd",
        "label_centroid_drift",
        "daily_event_mix_drift",
        "daily_value_ks_drift",
        "behavioral_nearest_neighbor",
    ],
)
def test_count_frames_are_map_side_combinable(spark, sf_dir, name):
    # Every lane's first wide stage is a count/sum rollup; partial
    # aggregation is what keeps the shuffle carrying (key, partial)
    # instead of raw positions at 100 TB.
    if name == "behavioral_nearest_neighbor":
        # Post round-13 the registered query's rollups execute inside
        # the localCheckpoint'd family fragment (see the pruning test
        # above) — pin the property on that fragment's plan, where the
        # first wide stage (per-user code assembly) is visible.
        from mapreduce_lab_spark.operators.paths import _trajectory_families
        from mapreduce_lab_spark.sources.tables import load_table

        df = _trajectory_families(load_table(spark, sf_dir, "events"))
    else:
        df = _Q[name](spark, sf_dir)
    assert has_partial_aggregation(df), name

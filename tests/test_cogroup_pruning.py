"""Regression: column-agnostic consumers of the cogroup as-of join.

Round-13 find: with both cogroup children derived from ONE events
scan (shared expression ids), Catalyst's self-cogroup attribute
deduplication plus column pruning strips the RIGHT child's
non-grouping columns whenever the plan above references none of the
FlatMapCoGroupsInPandas output columns — a bare ``count()`` crashed
inside the UDF with ``KeyError: 'ts'`` while ``collect()`` (what the
parity harness and the driver compare run) worked, so the defect
stayed latent for twelve rounds. The operator now re-aliases the
view side to fresh attribute ids (operators/events.py); these tests
pin every consumer shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_lab_spark.operators.events import asof_join_cogroup
from mapreduce_lab_spark.sources.tables import load_table


def test_count_on_cogroup_asof(spark, sf_dir):
    """The column-agnostic consumer that crashed: count()."""
    out = asof_join_cogroup(load_table(spark, sf_dir, "events"))
    n = out.count()
    assert n > 0


def test_subset_projection_on_cogroup_asof(spark, sf_dir):
    """A consumer referencing only LEFT-derived output columns must
    still deliver the right side's data to the UDF (the lag is
    computed from the view side's ts)."""
    out = asof_join_cogroup(load_table(spark, sf_dir, "events"))
    rows = out.select("event_id", "lag_seconds").collect()
    assert rows and any(r["lag_seconds"] is not None for r in rows)


def test_count_matches_collect_on_cogroup_asof(spark, sf_dir):
    out = asof_join_cogroup(load_table(spark, sf_dir, "events"))
    assert out.count() == len(out.collect())


def test_cogroup_asof_agrees_with_window_asof(spark, sf_dir):
    """Cross-implementation: the cogroup route and the window route
    share an oracle; pin their agreement engine-side too (matched
    pairs and per-event lag), through a count()-style aggregate that
    exercises the pruned path."""
    from mapreduce_lab_spark.operators.events import asof_join_purchases_to_views

    events = load_table(spark, sf_dir, "events")
    a = asof_join_cogroup(events).select("event_id", "lag_seconds")
    b = asof_join_purchases_to_views(events).select("event_id", "lag_seconds")
    diff = a.join(b, "event_id", "full").where(
        ~(
            F.coalesce(a["lag_seconds"], F.lit(-1))
            == F.coalesce(b["lag_seconds"], F.lit(-1))
        )
    )
    assert diff.count() == 0

"""Scale-posture assertions for the retrieval / timeseries /
lifecycle / graph / anomaly operator families."""

from __future__ import annotations

from mapreduce_lab_spark.operators.anomaly import q_iqr_outlier_orders, q_zscore_outlier_events
from mapreduce_lab_spark.operators.lifecycle import q_funnel
from mapreduce_lab_spark.operators.retrieval import q_bm25_search, q_tfidf_top_terms
from mapreduce_lab_spark.operators.timeseries import q_gapfill_locf_signups
from mapreduce_lab_spark.plans import inspect


def test_bm25_filters_terms_before_joins(spark, sf_dir):
    # The query-term IN-filter must reach the postings side before any
    # join: the plan joins |Q| terms' postings, never the full corpus.
    df = q_bm25_search(spark, sf_dir)
    plan = inspect.formatted_plan(df)
    # The |Q|-term IN filter is a post-explode Filter node feeding the
    # postings aggregation — it must exist (the join inputs are the
    # filtered slice, not the full posting list).
    assert "term" in plan and "IN (" in plan.upper().replace("IN(", "IN ("), plan
    # Doc-frequency and corpus stats are tiny: both must broadcast.
    assert inspect.broadcast_join_count(df) >= 2, plan


def test_tfidf_topk_window_partitions_by_doc(spark, sf_dir):
    # The top-k window must partition by doc_id — a global window
    # (empty partition spec) would serialize on one task. (The plan
    # does contain one SinglePartition exchange: the one-row corpus
    # count that broadcasts; that one is legitimate.)
    df = q_tfidf_top_terms(spark, sf_dir)
    plan = inspect.formatted_plan(df)
    assert "windowspecdefinition(doc_id" in plan, plan
    # Spark 4 pushes the rank limit into the shuffle (WindowGroupLimit)
    # so only k+ties rows per doc survive to the Window — pin it.
    assert "WindowGroupLimit" in plan, plan


def test_gapfill_aggregates_before_spine_join(spark, sf_dir):
    # Gap-fill LOCF sorts only the bucket spine (time-bounded), and
    # the per-bucket aggregation is map-side combinable.
    df = q_gapfill_locf_signups(spark, sf_dir)
    assert inspect.has_partial_aggregation(df), inspect.formatted_plan(df)


def test_funnel_reuses_user_partitioning(spark, sf_dir):
    # Three stage aggregations all hash by user_id; Catalyst must not
    # re-shuffle the same keying three extra times. The filtered event
    # slice is scanned per stage (3 scans) but each stage adds at most
    # one exchange; allow the final tiny stage-count rollup too.
    df = q_funnel(spark, sf_dir)
    assert inspect.exchange_count(df) <= 8, inspect.formatted_plan(df)


def test_zscore_stats_broadcast_back(spark, sf_dir):
    # Per-group stats frame is dimension-sized: must broadcast, so the
    # fact side never shuffles for the join.
    df = q_zscore_outlier_events(spark, sf_dir)
    assert inspect.broadcast_join_count(df) >= 1, inspect.formatted_plan(df)


def test_iqr_fences_broadcast_back(spark, sf_dir):
    df = q_iqr_outlier_orders(spark, sf_dir)
    assert inspect.broadcast_join_count(df) >= 2, inspect.formatted_plan(df)


def test_skyline_has_no_global_window(spark, sf_dir):
    # The prefix-max must run inside range partitions (window keyed by
    # _pid); a plan with an empty-partition-spec Window would be the
    # single-task global sort this operator exists to avoid.
    from mapreduce_lab_spark.operators.profiling import q_skyline_parts

    df = q_skyline_parts(spark, sf_dir)
    plan = inspect.formatted_plan(df)
    assert "windowspecdefinition(_pid" in plan, plan


def test_bigram_counts_partial_aggregation(spark, sf_dir):
    # The bigram shuffle must carry (bigram, partial-count), not one
    # row per occurrence.
    from mapreduce_lab_spark.operators.ngrams import q_bigram_top_counts

    df = q_bigram_top_counts(spark, sf_dir)
    assert inspect.has_partial_aggregation(df), inspect.formatted_plan(df)


def test_markov_partitions_by_user(spark, sf_dir):
    from mapreduce_lab_spark.operators.paths import q_markov_event_transitions

    df = q_markov_event_transitions(spark, sf_dir)
    plan = inspect.formatted_plan(df)
    assert "windowspecdefinition(user_id" in plan, plan


def test_pagerank_mass_conservation(spark, sf_dir):
    # Rank mass starts at PAGERANK_UNITS and each iteration can only
    # lose floor residue: < deg per node at the contribution split,
    # plus < 2 units per node at the damping combine. Everything else
    # would indicate dropped or double-counted edges.
    from mapreduce_lab_spark.operators.graph import (
        PAGERANK_ITERS,
        PAGERANK_UNITS,
        q_pagerank_copurchase,
    )

    ranks = q_pagerank_copurchase(spark, sf_dir).collect()
    total = sum(r.rank_units for r in ranks)
    n = len(ranks)
    assert n > 0 and all(r.rank_units > 0 for r in ranks)
    # 2E = sum(deg) bounded by n*(n-1); use the loose-but-sound bound
    # from the actual initial division loss + per-iter caps.
    max_loss_per_iter = 2 * n + sum(1 for _ in ranks) * n  # deg < n
    assert PAGERANK_UNITS - PAGERANK_ITERS * max_loss_per_iter - n <= total <= PAGERANK_UNITS


def test_pagerank_iterations_read_edge_cache(spark, sf_dir):
    # Each iteration must join against the CACHED edge list — without
    # the cache every iteration re-derives the whole graph-construction
    # subtree (distinct + self-join + union + degree agg), tripling the
    # most expensive stage. The textual plan still prints the cached
    # relation's stored subtree per use, so bound the exchange count at
    # that level rather than the executed one.
    from mapreduce_lab_spark.operators.graph import q_pagerank_copurchase
    from mapreduce_lab_spark.plans import inspect

    df = q_pagerank_copurchase(spark, sf_dir)
    plan = inspect.formatted_plan(df)
    assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan, plan
    assert inspect.exchange_count(df) <= 20, plan

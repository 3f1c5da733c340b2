"""Scale-posture assertions on physical plans.

Correctness tests can't see a plan regression (answers stay right at
test scale); these tests pin the properties that decide whether the
same plan survives 100 TB: predicate pushdown, column pruning,
broadcast dimension joins, map-side partial aggregation, and
whole-stage codegen coverage.
"""

from __future__ import annotations

import re

import pytest

from pyspark.sql import functions as F

from mapreduce_lab_spark.plans import inspect
from mapreduce_lab_spark.operators.relational import (
    q3_shipping_priority,
    q5_local_supplier_volume,
    topk_expensive_parts,
)
from mapreduce_lab_spark.operators.wordcount import q_wordcount
from mapreduce_lab_spark.sources.tables import load_table


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 40).select(
        "l_orderkey", "l_quantity"
    )
    pushed = inspect.pushed_filters(df)
    assert any("l_quantity" in p and "GreaterThan" in p for p in pushed), pushed


def test_column_pruning_narrow_read_schema(spark, sf_dir):
    # wordcount projects a single column from a 5-column table: the
    # scan must read only `text`.
    df = q_wordcount(spark, sf_dir)
    schemas = inspect.scan_read_schemas(df)
    assert schemas and all(cols == ["text"] for cols in schemas), schemas


def test_q3_broadcasts_customer_dimension(spark, sf_dir):
    df = q3_shipping_priority(spark, sf_dir)
    assert inspect.broadcast_join_count(df) >= 1, inspect.formatted_plan(df)


def test_q5_snowflake_dims_all_broadcast(spark, sf_dir):
    df = q5_local_supplier_volume(spark, sf_dir)
    # supplier, nation, region joins must all be broadcast — the only
    # shuffle joins allowed are the fact-fact joins.
    assert inspect.broadcast_join_count(df) >= 3, inspect.formatted_plan(df)
    assert inspect.shuffle_join_count(df) <= 2, inspect.formatted_plan(df)


def test_wordcount_has_partial_aggregation(spark, sf_dir):
    # Catalyst must insert a map-side partial count so the shuffle
    # carries (word, partial) not one row per occurrence — the key
    # upgrade over the reference (SURVEY.md §2.3 aggregation row).
    df = q_wordcount(spark, sf_dir)
    assert inspect.has_partial_aggregation(df), inspect.formatted_plan(df)


def test_topk_uses_single_scan_and_codegen(spark, sf_dir):
    # The shared test session runs with whole-stage codegen OFF (see
    # conftest — plan-compile time dominated the suite); this test is
    # ABOUT codegen coverage, so flip it on for its own plan only.
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    try:
        df = topk_expensive_parts(spark, sf_dir)
        assert inspect.codegen_stage_count(df) >= 1
    finally:
        spark.conf.set("spark.sql.codegen.wholeStage", "false")


def test_aqe_splits_skewed_join(spark, sf_dir):
    """A manufactured hot key must trigger AQE's runtime skew-join
    split (OptimizeSkewedJoin), the engine's no-code-change answer to
    skew; salting (operators/indexer.py) is the explicit fallback for
    skew AQE can't see. Thresholds are lowered to make test-scale
    partitions 'big'; production keeps defaults (256 MB / 5x median).
    """
    lowered = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force shuffle join
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in lowered}
    try:
        for k, v in lowered.items():
            spark.conf.set(k, v)
        n = 40_000
        skewed = spark.range(n).select(
            F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id")).alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        dim = spark.range(n).select(F.col("id").alias("k"), F.lit("d").alias("v"))
        # Bare join: AQE declines to split when a downstream keyed agg
        # needs the join's partitioning intact (splitting would force a
        # re-shuffle) — in that shape, skew relief is salting's job.
        joined = skewed.join(dim, "k").select("k", "pad", "v")
        joined.collect()  # AQE replans at runtime — must execute first
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final, final
        assert "skewed" in final, final  # AQEShuffleRead applied the split
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_exists_decorrelates_to_semi_join(spark, sf_dir):
    # EXISTS must become a LEFT SEMI hash/sort-merge join keyed on
    # l_orderkey — not a nested loop, which would be O(n*m) at scale.
    from mapreduce_lab_spark.operators.subqueries import q4_exists_order_priority

    plan = inspect.formatted_plan(q4_exists_order_priority(spark, sf_dir))
    assert "LeftSemi" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_not_exists_decorrelates_to_anti_join(spark, sf_dir):
    from mapreduce_lab_spark.operators.subqueries import not_exists_no_big_order

    plan = inspect.formatted_plan(not_exists_no_big_order(spark, sf_dir))
    assert "LeftAnti" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_correlated_scalars_decorrelate_to_keyed_aggregates(spark, sf_dir):
    # Q17's correlated scalar aggregates must decorrelate to per-key
    # (l_partkey) aggregates joined back to lineitem, never a
    # per-outer-row re-execution (no nested loop in the plan).
    from mapreduce_lab_spark.operators.subqueries import q17_small_quantity_revenue

    plan = inspect.formatted_plan(q17_small_quantity_revenue(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert re.search(r"Keys \[\d+\]: \[l_partkey", plan), plan


# --- TPC-H completions (operators/tpch_rest.py) ---

def test_q6_all_predicates_push_to_scan(spark, sf_dir):
    from mapreduce_lab_spark.operators.tpch_rest import q6_forecast_revenue

    df = q6_forecast_revenue(spark, sf_dir)
    pushed = " ".join(inspect.pushed_filters(df))
    # All four predicate columns must reach the parquet reader — Q6 is
    # the pure scan-pruning query; a missing pushdown means a full
    # 100 TB decode instead of row-group skips.
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, pushed
    schemas = inspect.scan_read_schemas(df)
    assert all(len(c) <= 4 for c in schemas), schemas


def test_q7_single_fact_fact_shuffle(spark, sf_dir):
    from mapreduce_lab_spark.operators.tpch_rest import q7_volume_shipping

    df = q7_volume_shipping(spark, sf_dir)
    # supplier+nation(x2) broadcast; the only shuffle joins allowed are
    # lineitem ⋈ orders and orders ⋈ customer.
    assert inspect.broadcast_join_count(df) >= 3, inspect.formatted_plan(df)
    assert inspect.shuffle_join_count(df) <= 2, inspect.formatted_plan(df)


def test_q8_seven_table_join_broadcasts_dims(spark, sf_dir):
    from mapreduce_lab_spark.operators.tpch_rest import q8_market_share

    df = q8_market_share(spark, sf_dir)
    # part/supplier/nation/region all broadcast; fact-fact shuffles
    # only for lineitem ⋈ orders and orders ⋈ customer.
    assert inspect.broadcast_join_count(df) >= 4, inspect.formatted_plan(df)
    assert inspect.shuffle_join_count(df) <= 2, inspect.formatted_plan(df)


def test_q18_semi_filter_is_broadcast_and_aggregates_once(spark, sf_dir):
    from mapreduce_lab_spark.operators.tpch_rest import q18_large_volume_customers

    df = q18_large_volume_customers(spark, sf_dir)
    plan = inspect.formatted_plan(df)
    # The >300-qty survivor set must come back as a broadcast, and the
    # per-order quantity sum must be computed exactly once (one
    # partial+final pair over lineitem, not two scans).
    assert inspect.broadcast_join_count(df) >= 1, plan
    assert len(re.findall(r"partial_sum", plan)) <= 2, plan


def test_q19_is_hash_join_not_nested_loop(spark, sf_dir):
    from mapreduce_lab_spark.operators.tpch_rest import q19_disjunct_revenue

    df = q19_disjunct_revenue(spark, sf_dir)
    plan = inspect.formatted_plan(df)
    # The disjunction must ride on the p_partkey equi-key as a hash
    # join residual — BroadcastNestedLoopJoin here would be O(n·m).
    assert "BroadcastHashJoin" in plan, plan
    assert "NestedLoop" not in plan, plan


def test_q22_anti_join_with_broadcast_threshold(spark, sf_dir):
    from mapreduce_lab_spark.operators.tpch_rest import q22_sales_opportunity

    df = q22_sales_opportunity(spark, sf_dir)
    plan = inspect.formatted_plan(df)
    # NOT EXISTS must plan as an anti join; the scalar threshold joins
    # via broadcast (1 row) — never a shuffle of customer against it.
    assert "LeftAnti" in plan, plan
    assert inspect.broadcast_join_count(df) >= 1, plan


def test_q9_broadcasts_all_three_dims(spark, sf_dir):
    from mapreduce_lab_spark.operators.tpch_rest import q9_product_profit

    df = q9_product_profit(spark, sf_dir)
    plan = inspect.formatted_plan(df)
    # part (LIKE-filtered), supplier, nation all broadcast; lineitem ⋈
    # orders is the only shuffle join. part's scan must read only the
    # 3 referenced columns of its 6.
    assert inspect.broadcast_join_count(df) >= 3, plan
    assert inspect.shuffle_join_count(df) <= 1, plan
    schemas = inspect.scan_read_schemas(df)
    assert any(set(c) == {"p_partkey", "p_name", "p_retailprice"} for c in schemas), schemas


def test_ntile_share_has_no_global_single_partition_window(spark, sf_dir):
    from mapreduce_lab_spark.operators.windows import window_ntile_share

    df = window_ntile_share(spark, sf_dir)
    plan = inspect.formatted_plan(df)
    # ntile(4) OVER (ORDER BY ...) would plan Exchange SinglePartition
    # + a one-task global sort — the distributed ranking composition
    # must keep every exchange hash/range partitioned.
    assert "SinglePartition" not in plan, plan
    assert "ntile" not in plan, plan


def test_q11_reuses_grouped_relation_for_scalar(spark, sf_dir):
    from mapreduce_lab_spark.operators.tpch_rest import q11_important_parts

    df = q11_important_parts(spark, sf_dir)
    plan = inspect.formatted_plan(df)
    # The global threshold comes back as a 1-row broadcast against the
    # per-part rows — never a shuffle of the grouped relation against
    # its own aggregate.
    assert inspect.broadcast_join_count(df) >= 1, plan
    assert inspect.shuffle_join_count(df) == 0, plan


# --- curation operators (operators/curation.py) ---

def test_stratified_sample_is_narrow_pruned_scan(spark, sf_dir):
    from mapreduce_lab_spark.operators.curation import q_stratified_sample_documents

    df = q_stratified_sample_documents(spark, sf_dir)
    plan = inspect.formatted_plan(df)
    # A sampling gate is a pure narrow filter: no keyed shuffle of any
    # kind (the only exchange allowed is fan_out()'s test-scale
    # RoundRobin split of the single-file parquet), and the scan must
    # not read `text` — the gate hashes doc_id, not content.
    for kind in ("hashpartitioning", "rangepartitioning", "SinglePartition"):
        assert kind not in plan, plan
    schemas = inspect.scan_read_schemas(df)
    assert schemas and all("text" not in cols for cols in schemas), schemas


def test_group_topk_windows_are_salted_then_tiny(spark, sf_dir):
    from mapreduce_lab_spark.operators.curation import q_group_topk_documents

    df = q_group_topk_documents(spark, sf_dir)
    plan = inspect.formatted_plan(df)
    # Phase 1 must partition by (lang, salt) — the full-data window
    # over bare `lang` (one task per language at 100 TB) is exactly
    # what this operator exists to avoid. A bare-lang window is only
    # allowed downstream of the per-salt top-k filter.
    assert "SinglePartition" not in plan, plan
    first_window = plan.find("Window")
    assert first_window != -1, plan
    # Two Window nodes: salted local rank, then global re-rank.
    assert plan.count("Window ") >= 2 or plan.count("[Window]") >= 2, plan
    assert "salt" in plan, plan


def test_token_histogram_partial_agg_and_pruned_scan(spark, sf_dir):
    from mapreduce_lab_spark.operators.curation import q_token_count_histogram

    df = q_token_count_histogram(spark, sf_dir)
    assert inspect.has_partial_aggregation(df), inspect.formatted_plan(df)
    schemas = inspect.scan_read_schemas(df)
    assert schemas and all(cols == ["text"] for cols in schemas), schemas


def test_embedding_centroids_partial_agg(spark, sf_dir):
    from mapreduce_lab_spark.operators.curation import q_embedding_centroids_by_label

    df = q_embedding_centroids_by_label(spark, sf_dir)
    plan = inspect.formatted_plan(df)
    # The shuffle must carry (label, dim, unit-sum) partials, never
    # vectors: partial agg present, and the only keyed exchange is the
    # final groupBy (fan_out()'s RoundRobin split doesn't count).
    assert inspect.has_partial_aggregation(df), plan
    assert plan.count("hashpartitioning") == 1, plan
    assert "rangepartitioning" not in plan and "SinglePartition" not in plan, plan


def test_item_similarity_broadcast_gate_both_modes(spark, sf_dir):
    """The per-item-totals dimension broadcasts only under the
    catalog-size gate; over the bound the plan falls back to shuffle
    joins instead of OOMing the driver on a web-scale catalog.
    autoBroadcastJoinThreshold is disabled so the assert sees OUR
    hint, not Catalyst's own size-estimate broadcast."""
    from mapreduce_lab_spark.operators.graph import item_similarity_cosine

    li = load_table(spark, sf_dir, "lineitem")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        gated = item_similarity_cosine(li, broadcast_max_items=0)
        open_ = item_similarity_cosine(li)  # default bound: tiny catalog fits
        assert inspect.broadcast_join_count(gated) == 0, inspect.formatted_plan(gated)
        assert inspect.broadcast_join_count(open_) >= 2, inspect.formatted_plan(open_)
        # Both modes compute the same answer.
        assert sorted(map(tuple, gated.collect())) == sorted(map(tuple, open_.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

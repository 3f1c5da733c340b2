"""Repo-wide physical-plan hygiene sweep.

Per-query plan tests pin the properties of individual operators; this
sweep pins two global invariants across EVERY registered batch query:

1. **No CartesianProduct, ever.** A cartesian of two distributed
   sides cannot survive any scale-up; nothing in this engine needs
   one.
2. **BroadcastNestedLoopJoin only where audited.** BNLJ is how
   Catalyst compiles a join against a broadcast frame with a
   non-equi (or absent) condition. That is FINE — and idiomatic —
   when the broadcast side is bounded by construction (a 1-row
   total/threshold frame, exact percentile fences, a k-bounded
   top-k, a small pattern table). It is a scale bug when the
   broadcast side grows with the data. Every name below is audited
   to be the former; a new query that introduces a BNLJ fails this
   test until it is audited and listed.

Streaming replays are excluded (their query functions execute the
stream to drain it, and their batch twins are swept instead).
"""

from __future__ import annotations

import pytest

from mapreduce_lab_spark import registry

# name -> what the broadcast side is, and why it is bounded.
BNLJ_AUDITED = {
    # 1-row aggregate frames (scalar totals / corpus stats):
    "heavy_hitter_words": "1-row corpus-total frame gates the threshold",
    "bigram_pmi_top": "1-row token-total frame scales the lift ratio",
    "tfidf_top_terms": "1-row corpus doc-count frame",
    "bm25_search": "1-row avg-doclen/corpus-stats frame",
    "rrf_hybrid_search": "two k-bounded rank frames fused",
    "q11_important_parts": "1-row global revenue threshold (scalar subquery)",
    "q22_sales_opportunity": "1-row average-balance frame (scalar subquery)",
    "above_avg_balance_customers": "1-row average-balance frame",
    "dq_expectations_orders": "1-row expectation-stats frame",
    "fk_integrity_audit": "1-row orphan-count frame joined to the 1-row "
    "child summary, per FK edge",
    "rolling_7d_distinct_users": "1-row max-active-day frame fences the "
    "trailing-window tail",
    "triangle_count_copurchase": "1-row wedge-count frame joined to 1-row triangle count",
    "weighted_sample_orders": "1-row total-weight frame",
    "temperature_mix_sample": "per-language rate frame (|langs| rows)",
    # exact percentile / fence frames (per-group, group-count bounded):
    "range_join_price_bands": "static band table (constant rows)",
    "event_pattern_match": "4-row funnel-pattern table",
    # vector-search baselines / bounded query sides:
    "knn_cosine_bruteforce": "k-bounded query side (explicit recall baseline)",
    "near_dup_embedding_cosine": "O(n²) recall baseline, max_rows-guarded",
    "ann_int8_quantized": "bounded query side vs quantized corpus",
    "ivf_knn_cosine": "broadcast centroid table (K rows)",
    "kmeans_clusters": "broadcast centroid table (K rows per iteration)",
}


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    out = {}
    for name, fn in registry.queries().items():
        # Queries whose FUNCTION executes a stream to drain it: the
        # returned frame is a memory-sink rollup whose plan says
        # nothing about the real dataflow, and building it costs a
        # full drain.
        if name.startswith("streaming_") or name == "python_datasource_stream_replay":
            continue
        df = fn(spark, sf_dir)
        out[name] = df._jdf.queryExecution().executedPlan().toString()
    return out


def test_no_cartesian_product_anywhere(plans):
    offenders = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert offenders == [], offenders


def test_nested_loop_joins_all_audited(plans):
    offenders = [
        n for n, p in plans.items()
        if "BroadcastNestedLoopJoin" in p and n not in BNLJ_AUDITED
    ]
    assert offenders == [], (
        f"unaudited BroadcastNestedLoopJoin in {offenders}; verify the "
        "broadcast side is bounded and add to BNLJ_AUDITED with a reason"
    )


def test_audit_list_not_stale(plans):
    stale = [n for n in BNLJ_AUDITED
             if n in plans and "BroadcastNestedLoopJoin" not in plans[n]]
    assert stale == [], f"BNLJ_AUDITED entries no longer needed: {stale}"


# name -> why a row-at-a-time Python eval is THE POINT of the query.
ROW_PYTHON_AUDITED = {
    "udtf_wordcount": "reference Map-UDTF parity contract — row-at-a-time "
    "1->N generation IS the semantics being mirrored; the DataFrame twin "
    "(wordcount) is the scale path",
}


def test_no_row_at_a_time_python_udfs(plans):
    # 3. **Python only through Arrow.** Row-at-a-time Python UDFs/UDTFs
    #    (BatchEvalPython*) serialize row-by-row through pickle — the
    #    10-100x slow path. Every Python crossing in this engine is
    #    Arrow-batched (ArrowEvalPython / MapInPandas / mapInArrow /
    #    FlatMapGroupsInPandas / applyInPandasWithState) or the
    #    deliberately-RDD map_reduce contract, which never appears in
    #    a SQL plan. The one audited exception is the reference-parity
    #    UDTF, whose row-at-a-time shape is the contract under test.
    offenders = [
        n for n, p in plans.items()
        if "BatchEvalPython" in p and n not in ROW_PYTHON_AUDITED
    ]
    assert offenders == [], offenders

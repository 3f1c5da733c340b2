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
    # Cached frames left by earlier test modules get plan-substituted
    # into ANY matching subtree here (InMemoryRelation text nests the
    # cached child plan, recursively), which inflates FileScan text
    # counts nondeterministically depending on which tests ran first.
    # Start from a clean cache so the sweep sees the same plans as a
    # fresh session.
    spark.catalog.clearCache()
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


# 4. **Duplicate scans bounded and audited.** Round 4's sweep
# (scripts/audit_scans.py) found queries whose plan re-scans — and
# re-COMPUTES the subtree above — the same parquet input because
# multiple consumers of one DataFrame prune differently and never
# canonicalize into a ReusedExchange. Six queries were rewritten to
# single-lineage forms (window rank instead of min-per-key + join
# back; conditional rollups instead of per-stage counts; window
# totals over tiny aggregates instead of crossJoin'd scalar frames).
# What remains is either inherent (self-joins, set ops, per-edge
# audits, independent retrieval rankings) or an explicitly documented
# persist-at-scale intermediate; every query scanning one table >= 4
# times must be listed here with its reason, and nothing may exceed 6.
DUP_SCAN_AUDITED = {
    "fk_integrity_audit": (6, "one independent key-column audit pass per FK "
                              "edge; lineitem carries three edges"),
    "near_dup_ngram_jaccard": (12, "candidate-then-verify: shingle table "
                                   "feeds the prefix index and both pair "
                                   "endpoints (6 subtrees; the test profile's "
                                   "64MB broadcast threshold inlines each "
                                   "twice); persisted intermediate at scale "
                                   "(dedup.py)"),
    "near_dup_incremental_minhash": (12, "CACHED per-side-collapsed frame "
                                         "consumed by corpus/new band sides, "
                                         "verify endpoints, and both member-"
                                         "expansion sides (6 subtrees, doubled "
                                         "by test-profile broadcast inlining); "
                                         "InMemoryTableScan serves all after "
                                         "first compute"),
    "scalar_subquery_above_avg_price": (5, "correlated scalar-subquery "
                                           "decorrelation duplicates the keyed "
                                           "aggregate (TPC-H Q17 shape)"),
    "skew_join_priority_revenue": (5, "hot/cold split join reads the fact "
                                      "side once per branch BY DESIGN"),
    "rrf_hybrid_search": (5, "two independent retrieval rankings (BM25 + "
                             "TF-IDF) fused; each reads the corpus"),
    "cdc_apply_orders": (5, "snapshot-diff + MERGE quadrants each read "
                            "base/delta; 16-byte fingerprints only"),
    "embedding_correlation": (5, "mean/std stats frame + centered Gramian "
                                 "pass over the vector column"),
    "near_dup_minhash_lsh": (8, "CACHED marked-groups frame consumed by the "
                                "collapse representatives, both band-join "
                                "sides, both verify endpoints, and both "
                                "member-expansion sides — InMemoryTableScan "
                                "serves every appearance after the first "
                                "compute; signature table persisted at scale"),
    "near_dup_band_edit_distance": (8, "CACHED marked-groups frame consumed "
                                       "by the collapse representatives, band "
                                       "sides, verify endpoints, and member "
                                       "expansion — same cache-served shape "
                                       "as near_dup_minhash_lsh"),
    "near_dup_simhash": (4, "CACHED signature frame consumed by the "
                            "distinct-fp banding and both expansion "
                            "endpoints — InMemoryTableScan serves all four "
                            "plan-text appearances after the first compute"),
    "near_dup_snm_multipass": (4, "two passes (forward + reversed key) x "
                                  "(main + boundary) — each linear"),
    "bm25_search": (4, "term stats + doc-length stats + scored postings"),
    "ivf_knn_cosine": (4, "centroid sample, assignment, and probe passes"),
    "copurchase_degree_hist": (4, "basket self-join (2 sides) + degree rollup"),
    "bigram_pmi_top": (4, "bigram counts + two unigram marginals"),
    "mad_outlier_events": (4, "exact median, then MAD, then outlier gate — "
                              "three order-statistic passes by definition"),
    "scd2_incremental_refresh": (4, "delta-affected rebuild joins base "
                                    "snapshot + delta on both branches"),
    "item_similarity_cosine": (4, "basket self-join (2 sides) + per-item "
                                  "totals on both pair endpoints (gated "
                                  "broadcast)"),
    "bag_set_ops_probe": (4, "EXCEPT ALL / INTERSECT ALL operands are "
                             "branches of the same table by definition"),
    "ivm_join_revenue": (4, "three IVM delta terms each join a delta side"),
}


# Iterative loops whose driver-side unrolling re-references a CACHED
# frame: the FileScan text repeats under InMemoryRelation per
# iteration but is served by the cache, never re-executed — scan-count
# text matching is a false positive there.
DUP_SCAN_ITERATIVE_EXEMPT = {"pagerank_copurchase"}


def test_duplicate_scans_bounded_and_audited(plans):
    import re
    from collections import Counter

    offenders = {}
    for name, plan in plans.items():
        if name in DUP_SCAN_ITERATIVE_EXEMPT:
            continue
        tables = Counter(re.findall(r"file:[^\]]*/(\w+)\.parquet", plan))
        mx = max(tables.values(), default=0)
        cap = DUP_SCAN_AUDITED.get(name, (3, ""))[0]
        if mx > cap:
            offenders[name] = dict(tables)
    assert offenders == {}, (
        f"plans re-scanning an input beyond their audited bound: {offenders}; "
        "run scripts/audit_scans.py, fix the duplicated lineage (see the "
        "round-4 rewrites) or audit it here with a reason"
    )


def test_dup_scan_audit_list_not_stale(plans):
    import re
    from collections import Counter

    stale = []
    for name, (cap, _why) in DUP_SCAN_AUDITED.items():
        if name not in plans:
            continue
        tables = Counter(re.findall(r"file:[^\]]*/(\w+)\.parquet", plans[name]))
        if max(tables.values(), default=0) < 4:
            stale.append(name)
    assert stale == [], f"DUP_SCAN_AUDITED entries below 4 scans now: {stale}"

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


# --- chunking -------------------------------------------------------------


def test_chunk_production_is_narrow_zero_shuffle(spark, sf_dir):
    # tokenize -> starts -> explode -> slice derives every chunk from
    # its own row: the plan must contain no Exchange at all, and the
    # scan must read only the two columns used.
    from mapreduce_lab_spark.operators.chunking import q_chunk_documents_overlap

    df = q_chunk_documents_overlap(spark, sf_dir)
    plan = inspect.formatted_plan(df)
    # The only permitted exchange is the input fan-out (round-robin,
    # a no-op on many-split 100 TB inputs) — never a hash/range
    # shuffle of chunk data.
    assert inspect.exchange_count(df) <= 1, plan
    assert "hashpartitioning" not in plan.lower(), plan
    schemas = inspect.scan_read_schemas(df)
    assert schemas and all(set(c) == {"doc_id", "text"} for c in schemas), schemas


def test_chunk_dedup_two_phase_distinct_agg(spark, sf_dir):
    # count_distinct(doc_id) plans as the standard two-phase distinct
    # aggregate: shuffle on (hash, doc_id) then on hash — exactly 2
    # exchanges, both carrying (16-byte hash, longs), never chunk
    # text; with a map-side partial before the first.
    from mapreduce_lab_spark.operators.chunking import q_chunk_level_dedup

    df = q_chunk_level_dedup(spark, sf_dir)
    assert inspect.exchange_count(df) <= 3, inspect.formatted_plan(df)  # +1 fan-out
    assert inspect.has_partial_aggregation(df), inspect.formatted_plan(df)


# --- recursive CTE reachability -------------------------------------------


def test_recursive_reachability_seeds_have_hop_zero(spark, sf_dir):
    # Semantic pin alongside the oracle parity test: every seed part
    # appears with hops=0, and every hops=1 part shares an order with
    # some seed part.
    from mapreduce_lab_spark.operators.graph import q_recursive_reachable_parts
    from mapreduce_lab_spark.sources.tables import load_table

    rows = {r["part_id"]: r["hops"] for r in q_recursive_reachable_parts(spark, sf_dir).collect()}
    part = load_table(spark, sf_dir, "part")
    seeds = {r[0] for r in part.where("p_partkey % 97 = 0").select("p_partkey").collect()}
    assert seeds, "seed set must be non-empty at test scale"
    assert all(rows.get(s) == 0 for s in seeds), {s: rows.get(s) for s in seeds}

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a, b = li.alias("a"), li.alias("b")
    import pyspark.sql.functions as F

    # Independent edge derivation with the SAME repeat-copurchase gate
    # the operator applies (>= MIN_COPURCHASES shared orders).
    from mapreduce_lab_spark.operators.graph import MIN_COPURCHASES

    edges = (
        a.join(b, "l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.count("*").alias("c"))
        .where(F.col("c") >= MIN_COPURCHASES)
        .collect()
    )
    one_hop = set()
    for r in edges:
        if r["u"] in seeds and r["v"] not in seeds:
            one_hop.add(r["v"])
        if r["v"] in seeds and r["u"] not in seeds:
            one_hop.add(r["u"])
    assert {p for p, h in rows.items() if h == 1} == one_hop


# --- signed projection / temperature mix ----------------------------------


def test_signed_projection_is_narrow_zero_shuffle(spark, sf_dir):
    # aggregate-over-sequence inside codegen: no Exchange, no Generate
    # fan-out, scan reads only the three columns used.
    from mapreduce_lab_spark.operators.linalg import q_embedding_signed_projection

    df = q_embedding_signed_projection(spark, sf_dir)
    plan = inspect.formatted_plan(df)
    assert inspect.exchange_count(df) <= 1, plan  # input fan-out only
    assert "hashpartitioning" not in plan.lower(), plan


def test_temperature_mix_upsamples_tail_languages(spark, sf_dir):
    # alpha=0.5 must give a rarer language a HIGHER sampling rate
    # (n_sampled/n_l) than a more common one, up to hash noise; assert
    # the rate of the rarest lang >= rate of the most common lang.
    import pyspark.sql.functions as F

    from mapreduce_lab_spark.operators.sampling import temperature_mix
    from mapreduce_lab_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    n_by_lang = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    sampled = {r["lang"]: r["n_sampled"] for r in temperature_mix(docs).collect()}
    rare = min(n_by_lang, key=n_by_lang.get)
    common = max(n_by_lang, key=n_by_lang.get)
    assert n_by_lang[rare] < n_by_lang[common]
    rate = lambda lang: sampled.get(lang, 0) / n_by_lang[lang]
    assert rate(rare) >= rate(common), (rare, rate(rare), common, rate(common))


def test_lateral_limit_decorrelates_to_window_group_limit(spark, sf_dir):
    # The correlated LATERAL ... ORDER BY ... LIMIT 2 must decorrelate
    # into a partitioned rank with WindowGroupLimit pushdown and a
    # broadcast of the nation dimension — never a nested-loop re-run
    # of the subquery per outer row.
    from mapreduce_lab_spark.operators.sql_surface import (
        q_lateral_top2_customers_per_nation,
    )

    df = q_lateral_top2_customers_per_nation(spark, sf_dir)
    plan = inspect.formatted_plan(df)
    assert "NestedLoop" not in plan, plan
    assert "WindowGroupLimit" in plan, plan
    assert inspect.broadcast_join_count(df) >= 1, plan


def test_classifier_weight_join_is_broadcast(spark, sf_dir):
    # The hashed weight table is bounded (N_BUCKETS rows) and must ride
    # a broadcast join; the only shuffle carries (doc_id, int partials)
    # for the score aggregation, with a map-side partial.
    from mapreduce_lab_spark.operators.classify import q_quality_classifier_hashed

    df = q_quality_classifier_hashed(spark, sf_dir)
    assert inspect.broadcast_join_count(df) >= 1, inspect.formatted_plan(df)
    assert inspect.has_partial_aggregation(df), inspect.formatted_plan(df)


def test_heavy_hitters_verify_gate_is_broadcast(spark, sf_dir):
    # Candidate gate (semi) and the one-row total both broadcast; the
    # exact recount must keep its map-side partial aggregation.
    from mapreduce_lab_spark.operators.heavy_hitters import q_heavy_hitter_words

    df = q_heavy_hitter_words(spark, sf_dir)
    assert inspect.broadcast_join_count(df) >= 2, inspect.formatted_plan(df)
    assert inspect.has_partial_aggregation(df), inspect.formatted_plan(df)


def test_cms_partial_aggregation_and_broadcast_probe(spark, sf_dir):
    # Cell construction must be map-side combinable (partial sum) and
    # the d*w-row cell table rides a broadcast into the probe join.
    from mapreduce_lab_spark.operators.sketches import q_cms_word_frequency

    df = q_cms_word_frequency(spark, sf_dir)
    assert inspect.has_partial_aggregation(df), inspect.formatted_plan(df)
    assert inspect.broadcast_join_count(df) >= 1, inspect.formatted_plan(df)


def test_item_similarity_broadcasts_item_totals(spark, sf_dir):
    # Both endpoint joins of the per-item occurrence counts must
    # broadcast (the totals are bounded by the part catalog); the
    # scored-edge top-k must be TakeOrdered, not a global sort.
    from mapreduce_lab_spark.operators.graph import q_item_similarity_cosine

    df = q_item_similarity_cosine(spark, sf_dir)
    plan = inspect.formatted_plan(df)
    assert inspect.broadcast_join_count(df) >= 2, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_sampled_quantiles_windows_partition_by_group(spark, sf_dir):
    # Both rank windows partition by the group key — no global-order
    # single-task window anywhere in the sketch.
    from mapreduce_lab_spark.operators.sketches import q_sampled_quantiles_prices

    df = q_sampled_quantiles_prices(spark, sf_dir)
    plan = inspect.formatted_plan(df)
    assert "windowspecdefinition(o_orderpriority" in plan, plan
    assert "windowspecdefinition()" not in plan.replace(" ", ""), plan


def test_interval_overlap_plans_hash_join_not_theta(spark, sf_dir):
    # Keyed variant: equi-join on user_id with the overlap predicate as
    # a post-join filter — never a nested-loop theta join.
    from mapreduce_lab_spark.operators.events import q_interval_overlap_sessions

    df = q_interval_overlap_sessions(spark, sf_dir)
    plan = inspect.formatted_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan, plan


def test_concurrent_overlap_joins_on_block(spark, sf_dir):
    # Keyless variant: candidate generation must equi-join on the time
    # block (hash or sort-merge), never scan all pairs.
    from mapreduce_lab_spark.operators.events import q_concurrent_error_overlap

    df = q_concurrent_error_overlap(spark, sf_dir)
    plan = inspect.formatted_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan, plan
    assert "blk" in plan, plan

#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Runs each headline query end-to-end (plan + execute + collect-count)
on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE COMPACT JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the summed warm wall-clock of all headline queries. Each
query is forced with a ``count()`` so the full plan executes but no
result set is shipped to the driver (the driver-side collect cost is
not what we're measuring).

The stdout line is kept deliberately small: round 2's full per-query
dump (~3.4 KB) plus Spark's ``\r`` console-progress spam overflowed
the driver's stdout tail buffer and the official bench recorded
``parsed: null``. Console progress is now disabled in the session
config and the per-query detail (cold timings, input-rows/s
throughput) goes to ``BENCH_DETAIL.json`` next to this script; stdout
carries only the headline totals plus the per-query warm map.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# Representative slice of SURVEY.md §2 coverage: reference parity
# (wordcount/indexer), TPC-H relational (scan+agg, joins), windows,
# event-time, and the training-pipeline extensions.
HEADLINE = [
    "wordcount",
    "inverted_index",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q18_large_volume_customers",
    "window_top_orders_per_customer",
    "tumbling_window_hourly",
    "session_window_10min",
    "asof_join_purchase_to_view",
    "dedup_exact",
    "near_dup_minhash_lsh",
    "near_dup_simhash",
    "knn_cosine_bruteforce",
    "text_quality_scores",
    "multimodal_frame_sample",
    "mapreduce_wordcount",
    "bm25_search",
    "session_top_paths",
    "attribution_linear",
    "embedding_covariance",
    "skyline_parts",
    "chunk_documents_overlap",
    "dup_span_fraction_13gram",
    "skew_join_priority_revenue",
    "heavy_hitter_words",
    "quality_classifier_hashed",
    "triangle_count_copurchase",
    "bloom_semi_join_orders",
    "cms_word_frequency",
    "item_similarity_cosine",
    "concurrent_error_overlap",
    "ivm_join_revenue",
    "multi_grain_event_rollup",
    # round 4:
    "near_dup_snm_multipass",
    "multimodal_decode_stats",
    # round 5:
    "near_dup_embedding_lsh",
    # round 6:
    "dup_token_coverage_13gram",
    "cdc_chunk_dedup",
    "dsir_select_topk",
    "minhash_fuzzy_join",
    "corpus_shard_manifest",
    "mixture_water_fill",
    "kmv_corpus_overlap",
    # round 8: the scale-safe embedding near-dup contract (cluster ids,
    # output linear in docs) alongside the pair query whose output is
    # inherently quadratic in replica-duplicated corpora.
    "near_dup_embedding_clusters",
    # round 8b: LM train+score (Stupid Backoff trigram, held-out
    # quarter) — the CCNet-style perplexity-filter shape — and the
    # day-over-trailing-week drift monitor.
    "lm_trigram_backoff_bits",
    "daily_event_mix_drift",
    # round 8b: trajectory similarity with twin collapse.
    "behavioral_nearest_neighbor",
    # round 9: the registered loose-threshold embedding near-dup scale
    # route (trained inverted multi-index -> verified pairs -> CC).
    "near_dup_embedding_ivf_clusters",
    # round 9b: blocked entity resolution (window-pair generation, no
    # join) and exact order statistics via bounded histogram
    # refinement (the no-global-sort selection pattern).
    "entity_resolution_scores",
    "distributed_exact_quantiles",
    # round 9b: journey-chain attribution (transition census + bounded
    # integer matrix solve), the governance trilogy's leak census, and
    # the censoring-aware survival table.
    "markov_removal_attribution",
    "t_closeness_census",
    "life_table_signup_purchase",
    # round 10: the fully-oracled pinned-codebook IVF contract, real
    # JPEG + WAV container decode (the multimodal ingest shape), and
    # the pretraining sequence-packing census (two-level cumsum).
    "near_dup_embedding_ivf_pinned",
    "multimodal_jpeg_decode_stats",
    "multimodal_wav_decode_stats",
    "sequence_packing_census",
    # round 11: the no-split shelf-packing comparison (two packing
    # plans over one scan family) and the fully-oracled codebook
    # construction artifact.
    "sequence_packing_strategy_compare",
    "ivf_init_codebook",
    "basket_association_rules",
    "cuped_adjusted_revenue",
    "multimodal_gif_decode_stats",
    "ivf_incremental_postings",
    "webdataset_shard_census",
    "hilbert_layout_census",
    "bootstrap_mean_ci_revenue",
    "delete_propagation_census",
    "conformal_keep_threshold",
    # round 12: the fully-oracled exact-integer Lloyd (iterative
    # k-means behind a hash gate — the unrolled-oracle lane) and its
    # product-quantization sibling.
    "kmeans_lattice_census",
    "pq_lattice_census",
    # round 13: the two inferred-filter-through-exchange postmortem
    # queries (docs/SCALE.md r13) — in the headline so the fix stays
    # measured: 41.4->2.1 s and 8.1->1.5 s warm at sf0.1.
    "decontaminate_benchmark_overlap",
    "bigram_pmi_top",
]

# Primary input table per headline query, for input-rows/s throughput.
# (Result-row counts don't measure throughput — a 6-row Q1 summary
# still scanned 600k lineitem rows.)
PRIMARY_INPUT = {
    "wordcount": "documents",
    "inverted_index": "documents",
    "chunk_documents_overlap": "documents",
    "dup_span_fraction_13gram": "documents",
    "q1_pricing_summary": "lineitem",
    "q3_shipping_priority": "lineitem",
    "q5_local_supplier_volume": "lineitem",
    "q6_forecast_revenue": "lineitem",
    "q18_large_volume_customers": "lineitem",
    "window_top_orders_per_customer": "orders",
    "tumbling_window_hourly": "events",
    "session_window_10min": "events",
    "asof_join_purchase_to_view": "events",
    "dedup_exact": "documents",
    "near_dup_minhash_lsh": "documents",
    "near_dup_simhash": "documents",
    "knn_cosine_bruteforce": "embeddings",
    "kmeans_lattice_census": "embeddings",
    "pq_lattice_census": "embeddings",
    "decontaminate_benchmark_overlap": "documents",
    "bigram_pmi_top": "documents",
    "text_quality_scores": "documents",
    "multimodal_frame_sample": "documents",
    "mapreduce_wordcount": "documents",
    "bm25_search": "documents",
    "session_top_paths": "events",
    "attribution_linear": "events",
    "embedding_covariance": "embeddings",
    "skyline_parts": "part",
    "skew_join_priority_revenue": "lineitem",
    "heavy_hitter_words": "documents",
    "quality_classifier_hashed": "documents",
    "triangle_count_copurchase": "lineitem",
    "bloom_semi_join_orders": "orders",
    "cms_word_frequency": "documents",
    "item_similarity_cosine": "lineitem",
    "concurrent_error_overlap": "events",
    "ivm_join_revenue": "lineitem",
    "multi_grain_event_rollup": "events",
    "near_dup_snm_multipass": "documents",
    "dup_token_coverage_13gram": "documents",
    "cdc_chunk_dedup": "documents",
    "dsir_select_topk": "documents",
    "minhash_fuzzy_join": "documents",
    "corpus_shard_manifest": "documents",
    "mixture_water_fill": "documents",
    "kmv_corpus_overlap": "documents",
    "multimodal_decode_stats": "documents",
    "near_dup_embedding_lsh": "embeddings",
    "near_dup_embedding_clusters": "embeddings",
    "lm_trigram_backoff_bits": "documents",
    "daily_event_mix_drift": "events",
    "behavioral_nearest_neighbor": "events",
    "near_dup_embedding_ivf_clusters": "embeddings",
    "entity_resolution_scores": "part",
    "distributed_exact_quantiles": "lineitem",
    "markov_removal_attribution": "events",
    "t_closeness_census": "customer",
    "life_table_signup_purchase": "events",
    "near_dup_embedding_ivf_pinned": "embeddings",
    "multimodal_jpeg_decode_stats": "documents",
    "multimodal_wav_decode_stats": "documents",
    "sequence_packing_census": "documents",
    "sequence_packing_strategy_compare": "documents",
    "ivf_init_codebook": "embeddings",
    "basket_association_rules": "lineitem",
    "cuped_adjusted_revenue": "events",
    "multimodal_gif_decode_stats": "documents",
    "ivf_incremental_postings": "embeddings",
    "webdataset_shard_census": "documents",
    "hilbert_layout_census": "lineitem",
    "bootstrap_mean_ci_revenue": "events",
    "delete_propagation_census": "lineitem",
    "conformal_keep_threshold": "documents",
}


def main() -> None:
    from pyspark.sql import SparkSession

    from mapreduce_lab_spark import registry

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("mapreduce_lab_spark-bench")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        # \r progress lines interleaved with the metric line overflowed
        # the driver's stdout tail buffer in round 2 (parsed: null).
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = registry.queries()
    names = [n for n in HEADLINE if n in qs]
    # Optional subset (comma-separated) for targeted scale runs; the
    # per-round driver invocation sets neither, so BENCH_r{N} numbers
    # always cover the full headline list.
    only = {n for n in os.environ.get("SPARK_GRAFT_ONLY", "").split(",") if n}
    if only:
        unknown = only - set(names)
        assert not unknown, f"SPARK_GRAFT_ONLY not in headline: {sorted(unknown)}"
        names = [n for n in names if n in only]

    # Warm the JVM + parquet footers once so per-query numbers measure
    # the plan, not first-touch JIT/IO.
    qs[names[0]](spark, SF_DIR).count()

    # Warm one Python UDF worker per core: daemon fork + Arrow import
    # costs ~2-4 s across 32 workers on first touch, which would land
    # on whichever mapInPandas query runs first (workers are reused
    # afterwards — spark.python.worker.reuse defaults true).
    def _noop(batches):
        yield from batches

    spark.range(int(CPUS) * 4).repartition(int(CPUS)).mapInPandas(
        _noop, schema="id long"
    ).count()

    # Warm the shared expression kernels (tokenize/md5/conv/array ops)
    # on a 200-row slice: their first execution pays ~5-8 s of codegen
    # + JIT that would otherwise land on whichever dedup/text query
    # runs first. Real clusters amortize this over minutes of uptime;
    # a one-shot bench must warm it explicitly or it measures JIT.
    from pyspark.sql import functions as _F

    from mapreduce_lab_spark.functions.hashing import hex8_int
    from mapreduce_lab_spark.functions.text import tokenize
    from mapreduce_lab_spark.sources.tables import load_table

    (
        load_table(spark, SF_DIR, "documents")
        .limit(200)
        .select(_F.explode(tokenize(_F.col("text"))).alias("w"))
        .select(hex8_int(_F.col("w")).alias("h"))
        .agg(_F.sum("h"))
        .count()
    )

    input_rows = {
        t: load_table(spark, SF_DIR, t).count()
        for t in sorted(set(PRIMARY_INPUT.values()))
    }

    # Per query: one untimed run to compile its generated code (each
    # unique plan costs a one-time driver-side codegen+JIT pass, 1-8 s
    # for the expression-heavy dedup queries), clear any caches the
    # query populated so the timed run recomputes the full data path,
    # then time. This measures steady-state throughput — the quantity
    # that scales to 100 TB — not one-shot compile latency, which is a
    # fixed cost amortized in any long-lived session.
    # The first (compile) run is ALSO timed and reported as the cold
    # number — the latency a one-shot user pays, plan codegen included.
    # The steady number is the MIN across post-compile runs. Wall-clock
    # on a shared host has multi-second transient noise (observed 3x
    # swings on identical plans, and multi-minute slow windows right
    # after boot), so the runs of each query are spread across FULL
    # PASSES over the whole headline set — back-to-back runs of one
    # query all land inside the same slow window, while passes are
    # 30-60 s apart, so the per-query min across passes measures the
    # plan's capability rather than the host's worst moment.
    cold: dict[str, float] = {}
    best: dict[str, float] = {name: float("inf") for name in names}
    for name in names:
        t0 = time.perf_counter()
        qs[name](spark, SF_DIR).count()
        cold[name] = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
    for _ in range(int(os.environ.get("SPARK_GRAFT_PASSES", "3"))):
        for name in names:
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).count()
            best[name] = min(best[name], time.perf_counter() - t0)
            spark.catalog.clearCache()
    timings = {name: round(best[name], 3) for name in names}
    throughput = {
        name: int(input_rows[PRIMARY_INPUT[name]] / best[name]) for name in names
    }

    # Round-1 headline subset: the 18 queries benched since r1, so the
    # cross-round trend stays apples-to-apples as the headline set
    # grows with new families.
    r01_subset = [
        "wordcount", "inverted_index", "q1_pricing_summary",
        "q3_shipping_priority", "q5_local_supplier_volume",
        "q6_forecast_revenue", "q18_large_volume_customers",
        "window_top_orders_per_customer", "tumbling_window_hourly",
        "session_window_10min", "asof_join_purchase_to_view",
        "dedup_exact", "near_dup_minhash_lsh", "near_dup_simhash",
        "knn_cosine_bruteforce", "text_quality_scores",
        "multimodal_frame_sample", "mapreduce_wordcount",
    ]
    r01_total = round(sum(timings[n] for n in r01_subset if n in timings), 3)

    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    summary = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "r01_subset_total_sec": r01_total,
        "cold_total_sec": round(sum(cold.values()), 3),
        "sf": sf_val,
    }
    # Per-round detail file, keyed on (round, cpu count):
    # BENCH_DETAIL_r{N}_c{CPUS}.json with N = one past the newest
    # committed BENCH_r*.json. Round 13's scheme omitted the cpu
    # count, so the driver's second (8-core) leg auto-incremented N
    # and squatted on the NEXT round's filename (VERDICT r13 #2);
    # keying on cpus gives every leg of a multi-leg driver run its
    # own file and N stays the true round for all of them.
    # $SPARK_GRAFT_DETAIL_PATH overrides. The write is best-effort —
    # a read-only install dir must not cost us the stdout metric line
    # the driver parses.
    here = os.path.dirname(os.path.abspath(__file__))
    detail_path = os.environ.get("SPARK_GRAFT_DETAIL_PATH")
    if not detail_path:
        import glob as _glob
        import re as _re

        rounds = [
            int(m.group(1))
            for p in _glob.glob(os.path.join(here, "BENCH_r*.json"))
            if (m := _re.search(r"BENCH_r(\d+)\.json$", p))
        ]
        n = max(rounds, default=0) + 1
        detail_path = os.path.join(here, f"BENCH_DETAIL_r{n:02d}_c{int(CPUS)}.json")
    try:
        with open(detail_path, "w") as f:
            json.dump(
                {
                    **summary,
                    "queries_cold": cold,
                    "input_rows_per_s": throughput,
                    "input_rows": input_rows,
                    "cpus": int(CPUS),
                },
                f,
                indent=1,
            )
    except OSError as exc:
        print(f"bench: detail write failed ({exc}); metric line follows", file=sys.stderr)
    # Keep the driver-contract "queries" map but emit the line compact
    # (~1 KB with separators vs 3.4 KB last round).
    print(json.dumps(summary, separators=(",", ":")))
    # Measurement-bug fix (round 13, documented in OPTIMIZATION_r13.md):
    # the round driver parses the metric from a 2000-char stdout TAIL.
    # BENCH_r09/r10 (55/59 queries, line < 2 KB) parsed; BENCH_r11/r12
    # (70/72 queries, line > 2.3 KB) both recorded "parsed": null
    # because the line's head fell outside the tail window — and the 74
    # query names alone are now 1606 bytes, so the full map can never
    # fit again. The full line above still carries EVERY query (nothing
    # is removed or renamed; BENCH_DETAIL_r{N}.json keeps it all too);
    # this FINAL line is a tail-sized summary with the same metric,
    # value and sf, and as many per-query entries as fit the window in
    # headline (= seniority) order, so the driver regains a parseable
    # value plus per-query scaling for the longest-measured queries.
    # "queries_truncated" discriminates this line from the canonical
    # full line above (same metric name — ADVICE r13: a consumer that
    # keys on the metric rather than taking the last line must be able
    # to tell them apart), and per-query values keep the canonical
    # line's 3-decimal rounding for consistency with BENCH_DETAIL.
    tail_summary = {
        "metric": summary["metric"],
        "value": summary["value"],
        "unit": "sec",
        "queries_truncated": True,
        "queries": {},
        "sf": sf_val,
    }
    budget = 1900  # tail window is 2000 chars; leave newline + slack
    for name in names:
        candidate = dict(tail_summary["queries"], **{name: round(best[name], 3)})
        trial = dict(tail_summary, queries=candidate)
        if len(json.dumps(trial, separators=(",", ":"))) > budget:
            break
        tail_summary["queries"] = candidate
    print(json.dumps(tail_summary, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()

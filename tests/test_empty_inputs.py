"""Empty-input robustness: every operator family must handle a
zero-row lake without raising.

At fleet scale, empty inputs are routine — a partition-pruned date
range, a filter that matches nothing, a cold-start table. A driver-
side scalar derived from data (counts used as divisors, collected
centroids) is where operators crash; this suite pins graceful empty
behavior (0+ rows, no exception) for one representative query per
family."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mapreduce_lab_spark import registry

# One representative per family, weighted toward operators with
# driver-side scalars, caches, iterative loops, or Python workers.
REPRESENTATIVES = [
    "wordcount",
    "q1_pricing_summary",
    "q2_cheapest_supplier_per_part",
    "window_top_orders_per_customer",
    "tumbling_window_hourly",
    "asof_join_purchase_to_view",
    "asof_join_cogroup",
    "dedup_exact",
    "near_dup_minhash_lsh",
    "near_dup_simhash",
    "near_dup_clusters",
    "knn_cosine_bruteforce",
    "ann_lsh_cosine",
    "kmeans_clusters",
    "pagerank_copurchase",
    "copurchase_degree_hist",
    "text_quality_scores",
    "doc_repetition_scores",
    "bm25_search",
    "rrf_hybrid_search",
    "tfidf_top_terms",
    "multimodal_blob_stats",
    "multimodal_audio_energy",
    "train_val_test_split",
    "dsir_select_topk",
    "minhash_fuzzy_join",
    "corpus_shard_manifest",
    "mixture_water_fill",
    "kmv_corpus_overlap",
    "weighted_sample_orders",
    "winsorized_price_stats",
    "attribution_linear",
    "embedding_covariance",
    "cdc_apply_orders",
    "snapshot_diff_orders",
    "pipeline_quality_dedup_stats",
    "mapreduce_wordcount",
    "session_top_paths",
    "markov_event_transitions",
    "incremental_daily_revenue",
    "key_skew_report",
    "exact_percentiles_lineitem",
    # round-2 continuation families
    "chunk_documents_overlap",
    "chunk_level_dedup",
    "pipeline_chunk_dedup_stats",
    "dup_span_fraction_13gram",
    "remove_dup_spans_13gram",
    "rare_bigram_rate",
    "embedding_signed_projection",
    "embedding_correlation",
    "temperature_mix_sample",
    "recursive_reachable_parts",
    "event_pattern_match",
    "lateral_top2_customers_per_nation",
    "null_semantics_probe",
    "collated_segment_rollup",
    "try_functions_probe",
    "variant_props_stats",
    "udtf_wordcount",
    "window_ignore_nulls_locf",
    "multimodal_blob_stats_arrow",
    # round-2 continuation, second wave
    "skew_join_priority_revenue",
    "heavy_hitter_words",
    "quality_classifier_hashed",
    "triangle_count_copurchase",
    "bigram_pmi_top",
    "kmv_distinct_users",
    "hll_portable_users",
    "near_dup_incremental_minhash",
    "near_dup_embedding_lsh",
    "lsh_band_census",
    "minhash_band_census",
    "gapfill_interp_signups",
    "not_in_null_aware_probe",
    "argmax_orders_probe",
    "ann_pq_adc",
    "multimodal_frame_dedup",
    "domain_quota_cap",
    # round 9: IVF lane (driver-scalar count + collected codebook —
    # exactly the class this suite exists to pin on empty inputs)
    "near_dup_embedding_ivf_clusters",
    "ivf_cell_census",
    # round 9: layout / governance / eval lanes
    "zorder_layout_census",
    "postings_compression_estimate",
    "k_anonymity_census",
    "seasonal_naive_mae",
    "embedding_lsh_recall_eval",
    "minhash_lsh_recall_eval",
    "trajectory_nn_recall_at_1",
    "conversion_lag_percentiles",
    # round 9b: governance / selection / ER / weak-label / stats /
    # format lanes (quantiles and ORC carry driver-side scalars and a
    # session-memoized write — the crash-prone class)
    "l_diversity_census",
    "distributed_exact_quantiles",
    "entity_resolution_scores",
    "weak_label_vote_census",
    "seasonal_decompose_revenue",
    "ols_trend_by_type",
    "chi_square_lang_source",
    "orc_roundtrip_census",
    "grouped_exact_median",
    "benford_digit_census",
    "markov_removal_attribution",
    "join_cardinality_estimate",
    "pipeline_governed_release",
    "er_window_recall_eval",
    "life_table_signup_purchase",
    "t_closeness_census",
    "diff_in_diff_revenue",
    # round 10: pinned-IVF contract (driver scalars + pair memo), the
    # JPEG/WAV codec queries (Python workers over empty batches),
    # packing (empty-corpus cumsum/aggregate arithmetic), capstone #5,
    # the codebook artifact, and the streaming decode replay.
    "near_dup_embedding_ivf_pinned",
    "ivf_train_codebook",
    "multimodal_jpeg_decode_stats",
    "multimodal_wav_decode_stats",
    "sequence_packing_census",
    "sequence_packing_efficiency",
    "sequence_packing_incremental",
    "multimodal_codec_cross_check",
    "multimodal_jpeg420_decode_stats",
    "pipeline_packed_corpus",
    "streaming_wav_decode_replay",
    # round 11: the new lanes' crash-prone classes — driver-side
    # scalar fences over empty frames (IVF init/incremental, conformal
    # k-selection, vocab checkpoints), Python codec/tar workers over
    # empty batches, replica writes of empty tables, and the one-row
    # aggregate parity edges (strategy compare, CUPED, bootstrap).
    "ivf_init_codebook",
    "ivf_incremental_postings",
    "ann_ivf_pinned",
    "sequence_packing_greedy_census",
    "sequence_packing_strategy_compare",
    "basket_association_rules",
    "basket_pair_census",
    "cuped_adjusted_revenue",
    "bootstrap_mean_ci_revenue",
    "multimodal_gif_decode_stats",
    "streaming_gif_decode_replay",
    "webdataset_shard_census",
    "webdataset_member_index",
    "hilbert_layout_census",
    "delete_propagation_census",
    "conformal_keep_threshold",
    "schema_evolution_census",
    "vocab_growth_census",
    "listagg_ordered_probe",
    # round 12: unrolled-oracle iterative lanes
    "kmeans_lattice_census",
    "pq_lattice_census",
]


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory, sf_dir):
    d = tmp_path_factory.mktemp("empty_lake")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        schema = pq.read_schema(os.path.join(sf_dir, f"{t}.parquet"))
        pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    return str(d)


_QUERIES = registry.queries()


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_runs_on_empty_lake(name, spark, empty_dir):
    df = _QUERIES[name](spark, empty_dir)
    assert df.count() >= 0


def test_hll_union_users_empty_events(spark, empty_dir):
    """The unregistered native-HLL rollup (retired from the registry
    round 11) keeps its empty-input contract via direct call."""
    import os

    from mapreduce_lab_spark.operators.sketches import hll_union_users

    ev = spark.read.parquet(os.path.join(empty_dir, "events.parquet"))
    assert hll_union_users(ev).count() == 0

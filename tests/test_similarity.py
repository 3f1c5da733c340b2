"""ANN quality invariants beyond oracle parity (the oracle verifies
the computation; these verify the approximation is worth using)."""

from __future__ import annotations

from mapreduce_lab_spark.operators.similarity import (
    knn_bruteforce,
    q_ann_lsh_cosine,
    q_ann_lsh_multiprobe,
)
from mapreduce_lab_spark.sources.tables import fan_out, load_table


def _pairs(df):
    return {(r.query_id, r.neighbor_id) for r in df.collect()}


def test_multiprobe_recall_dominates_single_probe(spark, sf_dir):
    # Multi-probe candidates are a strict superset of single-probe
    # candidates, so recall@k against the exact neighbors can only be
    # equal or better — the invariant that holds on ANY data
    # distribution, unlike an absolute recall number.
    truth = _pairs(knn_bruteforce(fan_out(load_table(spark, sf_dir, "embeddings"), spark)))
    single = _pairs(q_ann_lsh_cosine(spark, sf_dir))
    multi = _pairs(q_ann_lsh_multiprobe(spark, sf_dir))
    assert len(multi & truth) >= len(single & truth)
    assert len(multi & truth) > 0


def test_int8_recall_vs_exact(spark, sf_dir):
    """Quantization costs bytes-precision, not much recall: the int8
    approximate-cosine top-k must recover >= 80% of the exact float
    baseline's neighbor set (measured 96% on the synthetic corpus;
    the bound leaves slack for data regeneration, not for regression
    to unnormalized ranking, which scores 64%)."""
    from mapreduce_lab_spark.operators.similarity import ann_int8, knn_bruteforce
    from mapreduce_lab_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    exact = {(r.query_id, r.neighbor_id) for r in knn_bruteforce(e).collect()}
    quant = {(r.query_id, r.neighbor_id) for r in ann_int8(e).collect()}
    assert len(exact & quant) >= 0.8 * len(exact)


def test_hard_negatives_bucket_join_not_cartesian(spark, sf_dir):
    # The label-inequality predicate must ride on the bucket equi-join
    # (broadcast query side), never degrade the join to a cartesian
    # over the corpus.
    from mapreduce_lab_spark.operators.similarity import q_hard_negative_mining
    from mapreduce_lab_spark.plans import inspect

    df = q_hard_negative_mining(spark, sf_dir)
    plan = inspect.formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert inspect.broadcast_join_count(df) >= 1, plan


# --- ann_recall_at_5 ---------------------------------------------------------


def test_ann_recall_matches_composed_queries(spark, sf_dir):
    """The recall rows must equal the intersection of the two
    registered rankings computed independently."""
    from mapreduce_lab_spark.operators.similarity import (
        TOP_K,
        q_ann_lsh_cosine,
        q_ann_recall_at_5,
        q_knn_cosine_bruteforce,
    )

    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in q_knn_cosine_bruteforce(spark, sf_dir).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in q_ann_lsh_cosine(spark, sf_dir).collect()
    }
    got = {r["query_id"]: r for r in q_ann_recall_at_5(spark, sf_dir).collect()}
    for qid, row in got.items():
        want_hits = len({p for p in exact & approx if p[0] == qid})
        assert row["n_hits"] == want_hits
        assert row["n_exact"] == TOP_K
        assert abs(row["recall"] - want_hits / TOP_K) < 1e-5

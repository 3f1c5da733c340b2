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

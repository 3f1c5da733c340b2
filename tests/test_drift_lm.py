"""Hand-built micro-cases pinning the drift and LM-scoring algebra.

Oracle parity (tests/test_oracle_parity.py) proves Spark == DuckDB on
the synthetic corpus; these cases pin that both engines compute the
RIGHT answer, on inputs small enough to verify by hand:

- disjoint-vocabulary sources → TVD exactly (other side)/(corpus),
  identical sources → 0, and the top term is the modal word;
- mirrored singleton labels → centroid distance exactly 1.0 per side;
- a two-doc two-token corpus → exactly 1 bit per bigram position;
- an identical-mix day → temporal TVD 0, a one-sided day → 0.5.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from mapreduce_lab_spark.operators.drift import (
    daily_event_mix_drift,
    daily_value_ks_drift,
    label_centroid_drift,
    source_unigram_tvd,
)
from mapreduce_lab_spark.operators.lm import (
    lm_bigram_bits,
    lm_trigram_backoff_bits,
)


def test_source_tvd_disjoint_and_identical_vocab(spark):
    # Sources a/b: disjoint vocab, 3 tokens each. For source a,
    # present terms give sum|o*nt - ns*cw| = na*nb and the absent
    # fold adds na*nb again: TVD = 2*na*nb / (2*na*nt) = nb/nt = 0.5.
    docs = spark.createDataFrame(
        [(1, "x x y", "a"), (2, "p p q", "b")],
        "doc_id long, text string, source string",
    )
    rows = {r["source"]: r for r in source_unigram_tvd(docs).collect()}
    assert rows["a"]["tvd_ppm"] == pytest.approx(0.5)
    assert rows["b"]["tvd_ppm"] == pytest.approx(0.5)
    assert rows["a"]["top_term"] == "x"  # o=2 beats o=1
    assert rows["b"]["top_term"] == "p"
    assert rows["a"]["n_tokens"] == 3

    same = spark.createDataFrame(
        [(1, "x x y", "a"), (2, "x x y", "b")],
        "doc_id long, text string, source string",
    )
    for r in source_unigram_tvd(same).collect():
        assert r["tvd_ppm"] == pytest.approx(0.0)


def test_label_centroid_drift_mirrored_singletons(spark):
    # Labels 0/1 hold (1, 0) and (-1, 0): global centroid (0, 0),
    # each label centroid at distance^2 exactly 1.0, driven by dim 0.
    embs = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [-1.0, 0.0], 1)],
        "vec_id long, embedding array<float>, label int",
    )
    rows = {r["label"]: r for r in label_centroid_drift(embs).collect()}
    assert rows[0]["dist2"] == pytest.approx(1.0)
    assert rows[1]["dist2"] == pytest.approx(1.0)
    assert rows[0]["top_dim"] == 0 and rows[1]["top_dim"] == 0

    # One label only → its centroid IS the global centroid → 0.
    solo = spark.createDataFrame(
        [(1, [0.25, -0.5], 7), (2, [0.75, 0.5], 7)],
        "vec_id long, embedding array<float>, label int",
    )
    (r,) = label_centroid_drift(solo).collect()
    assert r["dist2"] == pytest.approx(0.0) and r["n_vecs"] == 2


def test_lm_bigram_bits_two_identical_docs(spark):
    # Corpus {"a b", "a b"}: V=2, c(a b)=2, c(a .)=2; each doc's one
    # position costs width(2+2) - width(2+1) = 3 - 2 = 1 bit exactly.
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b")], "doc_id long, text string"
    )
    for r in lm_bigram_bits(docs).collect():
        assert r["n_bigrams"] == 1
        assert r["bits"] == 1
        assert r["mean_bits"] == pytest.approx(1.0)


def test_lm_trigram_backoff_exercised_on_corpus(spark, sf_dir):
    from mapreduce_lab_spark.sources.tables import load_table

    res = lm_trigram_backoff_bits(load_table(spark, sf_dir, "documents"))
    agg = res.agg(
        F.sum("n_backoff").alias("bo"),
        F.sum("n_trigrams").alias("n"),
        F.min(F.col("n_backoff") <= F.col("n_trigrams")).alias("bounded"),
    ).collect()[0]
    # Held-out docs must contain trigrams the 3/4 train slice never
    # saw — if this is ever 0 the split gate is broken.
    assert agg["bo"] > 0
    assert agg["bounded"] is True
    assert agg["n"] > agg["bo"]  # and the trigram level fires too


def test_daily_mix_drift_identical_then_shifted_day(spark):
    def ev(day, hour, typ):
        return (datetime(2024, 1, day, hour, 30), typ)

    events = spark.createDataFrame(
        # day 1 and day 2: identical 2xA + 2xB mix; day 3: 4xA only.
        [ev(1, h, t) for h, t in [(1, "A"), (2, "A"), (3, "B"), (4, "B")]]
        + [ev(2, h, t) for h, t in [(1, "A"), (2, "A"), (3, "B"), (4, "B")]]
        + [ev(3, h, t) for h, t in [(1, "A"), (2, "A"), (3, "A"), (4, "A")]],
        "ts timestamp, event_type string",
    )
    rows = {r["day"]: r for r in daily_event_mix_drift(events).collect()}
    # day 1 has an empty reference window → excluded.
    assert set(rows) == {"2024-01-02", "2024-01-03"}
    assert rows["2024-01-02"]["tvd_ppm"] == pytest.approx(0.0)
    # day 3 vs ref {4A, 4B}: 1/2 * (|1 - 1/2| + |0 - 1/2|) = 0.5.
    assert rows["2024-01-03"]["tvd_ppm"] == pytest.approx(0.5)
    assert rows["2024-01-03"]["top_type"] == "A"


def test_behavioral_nearest_neighbor_twins_and_partial_overlap(spark):
    from mapreduce_lab_spark.operators.paths import behavioral_nearest_neighbor

    from datetime import timedelta

    def user(uid, types, base_eid):
        # 30-second gaps → every non-first token gets gap class '0'.
        base = datetime(2024, 1, 1, 12, 0, 0)
        return [
            (uid, base + timedelta(seconds=30 * i), base_eid + i, t)
            for i, t in enumerate(types)
        ]

    events = spark.createDataFrame(
        user(1, ["view", "click", "purchase", "error"], 100)
        + user(2, ["view", "click", "purchase", "error"], 200)  # exact twin
        + user(3, ["view", "click", "purchase", "signup"], 300),  # 1/3 overlap
        "user_id long, ts timestamp, event_id long, event_type string",
    )
    rows = {r["user_id"]: r for r in behavioral_nearest_neighbor(events).collect()}
    # twins resolve algebraically at exactly 1.0, smallest co-member.
    assert rows[1]["neighbor_id"] == 2 and rows[1]["jaccard"] == 1.0
    assert rows[2]["neighbor_id"] == 1 and rows[2]["jaccard"] == 1.0
    # the singleton matches the twin family's REPRESENTATIVE (min id)
    # through the shared "vsc0p0" shingle; J = 1 shared / 3 union.
    assert rows[3]["neighbor_id"] == 1
    assert rows[3]["jaccard"] == pytest.approx(0.333333)


def test_daily_value_ks_identical_then_disjoint_day(spark):
    def ev(day, hour, value):
        return (datetime(2024, 1, day, hour, 30), value)

    events = spark.createDataFrame(
        # days 1-2: four values in dollar-bucket 1 each (1.5 vs 1.2
        # bins identically); day 3: four values in bucket 10.
        [ev(1, h, 1.5) for h in range(1, 5)]
        + [ev(2, h, 1.2) for h in range(1, 5)]
        + [ev(3, h, 10.25) for h in range(1, 5)],
        "ts timestamp, value double",
    )
    rows = {r["day"]: r for r in daily_value_ks_drift(events).collect()}
    assert set(rows) == {"2024-01-02", "2024-01-03"}
    # same binned distribution as the reference → KS 0.
    assert rows["2024-01-02"]["ks_ppm"] == pytest.approx(0.0)
    # disjoint buckets → KS exactly 1, peaking at the reference's bin.
    assert rows["2024-01-03"]["ks_ppm"] == pytest.approx(1.0)
    assert rows["2024-01-03"]["gap_bucket"] == 1
    assert rows["2024-01-03"]["n_day"] == 4
    assert rows["2024-01-03"]["n_ref"] == 8


def test_trajectory_nn_recall_floor_sf01(spark):
    """The two-tier postings index (full postings at df <= 128,
    per-rep bottom-4 selection in the 129-512 motif lobe) must recover
    the true top-1 neighbor for (almost) every sampled singleton user
    on the organic sf0.1 corpus. Round-9 measured the single-tier knee
    (64/128/256 all sat at 12/25; 512 = 25/25 at 2x warm cost);
    round-10's two-tier keeps 25/25 at sf0.1 while halving the warm
    wall (docs/SCALE.md round-10 table). Floor 0.9 for corpus
    robustness."""
    from mapreduce_lab_spark.operators.paths import trajectory_nn_recall
    from mapreduce_lab_spark.sources.tables import load_table

    events = load_table(spark, "/root/testdata/sf0.1", "events")
    rows = trajectory_nn_recall(events).collect()
    assert len(rows) == 25
    assert sum(r["hit"] for r in rows) / len(rows) >= 0.9

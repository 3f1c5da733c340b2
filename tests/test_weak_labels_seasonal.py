"""Micro-cases for the weak-supervision vote and the STL-lite
decomposition — hand-checkable frames; cross-engine parity is covered
by the registry sweep."""

from __future__ import annotations

from mapreduce_lab_spark.operators.classify import weak_label_votes
from mapreduce_lab_spark.operators.timeseries import seasonal_decompose_revenue

DOC_SCHEMA = "doc_id long, text string, n_chars long"


def test_weak_label_vote_combination(spark):
    rows = [
        # fast>slow, long, spark+query  -> lfs (1,1,1), vote 4, label 1
        (1, "fast fast slow spark query", 400),
        # slow>fast, short, dup         -> lfs (-1,-1,-1), vote -4, label -1
        (2, "slow dup", 50),
        # fast==slow, mid-length, none  -> lfs (0,0,0), vote 0, label 0
        (3, "fast slow table", 200),
        # conflict: slow-heavy but long + on-topic -> 2*(-1)+1+1 = 0
        (4, "slow slow fast spark query", 400),
    ]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    got = {r["doc_id"]: r for r in weak_label_votes(df).collect()}
    assert (got[1]["vote"], got[1]["label"]) == (4, 1)
    assert (got[2]["vote"], got[2]["label"]) == (-4, -1)
    assert (got[3]["vote"], got[3]["label"]) == (0, 0)
    assert (got[4]["vote"], got[4]["label"]) == (0, 0)
    assert (got[4]["lf_speed"], got[4]["lf_len"], got[4]["lf_topic"]) == (-1, 1, 1)


def test_seasonal_decomposition_identity_and_flat_series(spark):
    # A constant series: trend == value, seasonal == 0, residual == 0,
    # nothing anomalous.
    rows = [(f"1995-01-{d:02d}", 100.0) for d in range(1, 15)]
    df = spark.createDataFrame(rows, "o_orderdate string, o_totalprice double")
    out = seasonal_decompose_revenue(df).collect()
    assert len(out) == 14
    for r in out:
        assert r["trend"] == 100.0
        assert r["seasonal"] == 0.0
        assert r["residual"] == 0.0
        assert r["is_anomaly"] == 0
        # value = trend + seasonal + residual (the decomposition identity)
        assert abs(r["revenue"] - (r["trend"] + r["seasonal"] + r["residual"])) < 1e-9


def test_seasonal_decomposition_flags_spike(spark):
    # Flat series with one huge spike: the spike day must be flagged.
    rows = [(f"1995-01-{d:02d}", 100.0) for d in range(1, 29)]
    rows[14] = ("1995-01-15", 10000.0)
    df = spark.createDataFrame(rows, "o_orderdate string, o_totalprice double")
    out = {r["day"]: r for r in seasonal_decompose_revenue(df).collect()}
    assert out["1995-01-15"]["is_anomaly"] == 1
    flagged = [d for d, r in out.items() if r["is_anomaly"] == 1]
    # the spike bleeds into its trend neighbors' residuals, but the
    # spike day itself dominates; it must be among the flagged days
    assert "1995-01-15" in flagged

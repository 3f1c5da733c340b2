"""Sampling-specific regressions beyond the oracle-parity sweep."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_lab_spark.functions.hashing import hex8_int
from mapreduce_lab_spark.operators.sampling import upsample_by_lang


def test_upsample_sub_1000_rate_drops_instead_of_phantom_duplicating(spark):
    """A rate under 1000 permille means n_copies can be 0 for some
    docs. Spark's sequence(1, 0) yields the DESCENDING [1, 0] (two
    phantom copies) where DuckDB's generate_series is empty — the
    guard must emit zero rows for those docs."""
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"), F.lit("xx").alias("lang")
    )
    out = upsample_by_lang(docs, rates={"xx": 400}).collect()
    gate = hex8_int(F.concat(F.lit("up:"), F.col("doc_id").cast("string"))) % 1000
    expected_docs = docs.where(gate < 400).count()
    assert 0 < expected_docs < 200  # the rate genuinely drops some docs
    assert len(out) == 1
    row = out[0]
    # One copy per gated doc, zero for the rest — never [1, 0] phantoms.
    assert row["n_docs"] == expected_docs
    assert row["n_copies"] == expected_docs


def test_upsample_default_rates_unchanged(spark):
    """Fractional >1000 rates keep their exact copy arithmetic."""
    docs = spark.createDataFrame(
        [(i, "fr") for i in range(100)], "doc_id long, lang string"
    )
    row = upsample_by_lang(docs).collect()[0]  # fr: 2500 permille
    gate = hex8_int(F.concat(F.lit("up:"), F.col("doc_id").cast("string"))) % 1000
    extra = docs.where(gate < 500).count()
    assert row["n_docs"] == 100
    assert row["n_copies"] == 2 * 100 + extra

"""Roundtrip tests for sources and sinks."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_lab_spark.operators.wordcount import word_count
from mapreduce_lab_spark.sources import sinks
from mapreduce_lab_spark.sources.tables import load_table
from mapreduce_lab_spark.sources.text import documents_as_corpus


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_text_kv_roundtrip_reference_format(spark, sf_dir, tmp_path):
    """wordcount → mr-out text lines → read back: the reference's E8
    sink and final-merge comparison semantics (sorted, value kept as
    string)."""
    wc = word_count(load_table(spark, sf_dir, "documents")).select(
        F.col("word").alias("key"), F.col("cnt").cast("string").alias("value")
    )
    path = str(tmp_path / "mr-out")
    sinks.write_text_kv(wc, path)
    back = sinks.read_text_kv(spark, path)
    assert _rows(back) == _rows(wc)


def test_text_kv_value_with_spaces(spark, tmp_path):
    df = spark.createDataFrame(
        [("w", "3 doc-a,doc-b"), ("x", "1 doc-c")], "key string, value string"
    )
    path = str(tmp_path / "kv")
    sinks.write_text_kv(df, path)
    assert _rows(sinks.read_text_kv(spark, path)) == _rows(df)


def test_jsonl_roundtrip(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "jsonl")
    sinks.write_jsonl(src, path)
    back = spark.read.json(path).select(*src.columns)
    assert back.count() == src.count()
    assert _rows(back.select("n_nationkey", "n_name")) == _rows(
        src.select("n_nationkey", "n_name")
    )


def test_partitioned_parquet_prunes(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    path = str(tmp_path / "orders_part")
    sinks.write_parquet(src, path, partition_by=["o_orderstatus"])
    back = spark.read.parquet(path)
    flt = back.filter(F.col("o_orderstatus") == "F")
    # partition pruning: the predicate must land in PartitionFilters
    # (directory-level pruning before any IO), not a data filter.
    from mapreduce_lab_spark.plans.inspect import formatted_plan

    plan = formatted_plan(flt)
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "o_orderstatus" in m.group(1), plan
    assert flt.count() == src.filter(F.col("o_orderstatus") == "F").count()


def test_documents_as_corpus_shape(spark, sf_dir):
    df = documents_as_corpus(spark, sf_dir)
    assert df.columns == ["filename", "text"]
    assert df.count() > 0

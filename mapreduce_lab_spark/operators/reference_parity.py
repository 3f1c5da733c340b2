"""Remaining reference-parity queries: A5-A8.

- ``file_count`` (early_exit plugin, reference
  ``plugin/early_exit/early_exit.go:18-35``): one marker per input
  file, counted per filename. On the synthetic data the ``documents``
  table plays the corpus and ``source`` the filename.
- ``const_agg`` (crash/nocrash plugins, reference
  ``plugin/crash/crash.go:36-57`` / ``nocrash.go:28-49``): each
  document emits four pairs — ('a', filename), ('b',
  len(filename)), ('c', len(contents)), ('d', "xyzzy") — and each
  key's values are sorted and space-joined (holistic UDAF).

``const_agg`` is deliberately holistic (the reference's Reduce sees
the whole value list); ``sort_array(collect_list(...))`` reproduces
``sort.Strings`` + ``strings.Join`` deterministically. The output is
4 rows whose cells grow O(rows) — the reference's semantics, kept for
parity, appropriate only for bounded corpora (the engine's scalable
aggregations live in operators/relational.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_lab_spark.registry import query
from mapreduce_lab_spark.sources.tables import load_table


def file_count(df: DataFrame, file_col: str) -> DataFrame:
    return (
        df.groupBy(F.col(file_col).alias("filename"))
        .agg(F.count("*").alias("cnt"))
    )


def const_kv_pairs(df: DataFrame, file_col: str, text_col: str) -> DataFrame:
    """The crash/nocrash Map: 4 constant-keyed pairs per input row."""
    return df.select(
        F.explode(
            F.array(
                F.struct(F.lit("a").alias("key"), F.col(file_col).cast("string").alias("value")),
                F.struct(
                    F.lit("b").alias("key"),
                    F.length(F.col(file_col)).cast("string").alias("value"),
                ),
                F.struct(
                    F.lit("c").alias("key"),
                    F.length(F.col(text_col)).cast("string").alias("value"),
                ),
                F.struct(F.lit("d").alias("key"), F.lit("xyzzy").alias("value")),
            )
        ).alias("kv")
    ).select("kv.key", "kv.value")


def sorted_value_join(kv: DataFrame) -> DataFrame:
    """The crash/nocrash Reduce: sort values, join with single spaces."""
    return kv.groupBy("key").agg(
        F.concat_ws(" ", F.sort_array(F.collect_list("value"))).alias("joined")
    )


@query(
    "file_count",
    oracle="""
    SELECT source AS filename, count(*) AS cnt
    FROM documents
    GROUP BY source
    """,
)
def q_file_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return file_count(load_table(spark, sf_dir, "documents"), "source")


@query(
    "const_agg",
    oracle="""
    WITH kv AS (
      SELECT 'a' AS key, source AS value FROM documents
      UNION ALL SELECT 'b', CAST(length(source) AS VARCHAR) FROM documents
      UNION ALL SELECT 'c', CAST(length(text) AS VARCHAR) FROM documents
      UNION ALL SELECT 'd', 'xyzzy' FROM documents
    )
    SELECT key, string_agg(value, ' ' ORDER BY value) AS joined
    FROM kv
    GROUP BY key
    """,
)
def q_const_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return sorted_value_join(const_kv_pairs(docs, "source", "text"))

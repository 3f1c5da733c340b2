"""Word count — the reference's flagship query (A1 + A2).

Semantics (reference ``plugin/word_count/wc.go:21-42``): tokenize on
every non-letter rune, case-sensitive, drop empty tokens, count
occurrences per word.

Spark-first design: ``explode(filter(split(...)))`` → ``groupBy.count``.
Catalyst inserts a map-side partial count before the shuffle, so the
shuffle carries one row per (partition, word) instead of one per
occurrence — the reference ships every occurrence (its shuffle volume
is O(tokens); ours is O(distinct words × partitions)). Word frequency
is Zipfian, so at 100 TB the partial agg is the difference between a
shuffle of ~10^12 rows and ~10^7; skewed hot words ("the") are
absorbed by the partial agg too, with AQE skew handling as backstop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_lab_spark.functions.text import tokenize
from mapreduce_lab_spark.registry import query
from mapreduce_lab_spark.sources.tables import load_table


def word_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Count case-sensitive word-token occurrences in a text column."""
    return (
        df.select(F.explode(tokenize(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "wordcount",
    oracle="""
    SELECT word, count(*) AS cnt
    FROM (
      SELECT unnest(regexp_split_to_array(text, '[^\\p{L}]+')) AS word
      FROM documents
    )
    WHERE word <> ''
    GROUP BY word
    """,
)
def q_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    return word_count(load_table(spark, sf_dir, "documents"))

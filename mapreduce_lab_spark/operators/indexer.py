"""Inverted index — reference A3 + A4.

Semantics (reference ``plugin/indexer/indexer.go:22-41``): per
document, tokenize and deduplicate words (a set), emit ``(word,
filename)`` once per distinct word; per word, output the document
count and the comma-joined lexicographically-sorted document list.

Spark-first design: explode → distinct → groupBy word →
``count`` + ``concat_ws(",", sort_array(collect_set(doc)))``.
``sort_array`` makes the holistic "sorted posting list" deterministic
regardless of shuffle arrival order (the reference gets this from its
per-partition sort, SURVEY.md §7 hard-part (a)).

Scale note: the distinct is a shuffle on (word, doc) — unavoidable
for exact posting lists — but Catalyst plans it as partial hash
aggregate before the exchange, so duplicate (word, doc) pairs within
a partition never hit the wire. Posting lists for hot words grow
O(corpus); at 100 TB a real deployment would cap or bucket posting
lists, which `doc_count` (kept separate) already supports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_lab_spark.functions.text import tokenize
from mapreduce_lab_spark.registry import query
from mapreduce_lab_spark.sources.tables import load_table


def inverted_index(df: DataFrame, doc_col: str, text_col: str = "text") -> DataFrame:
    """(word, doc_count, docs) — docs is the sorted distinct doc list."""
    pairs = df.select(
        F.col(doc_col).alias("doc"),
        F.explode(tokenize(F.col(text_col))).alias("word"),
    ).distinct()
    return pairs.groupBy("word").agg(
        F.count("doc").alias("doc_count"),
        F.concat_ws(",", F.sort_array(F.collect_set("doc"))).alias("docs"),
    )


_ORACLE = """
    SELECT word,
           count(doc) AS doc_count,
           string_agg(doc, ',' ORDER BY doc) AS docs
    FROM (
      SELECT DISTINCT source AS doc,
             unnest(regexp_split_to_array(text, '[^\\p{L}]+')) AS word
      FROM documents
    )
    WHERE word <> ''
    GROUP BY word
    """


@query("inverted_index", oracle=_ORACLE)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return inverted_index(docs, doc_col="source")


@query("inverted_index_salted", oracle=_ORACLE)
def q_inverted_index_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof posting lists: salted two-phase collect_set.

    Same result as `inverted_index` (same oracle checks both — a
    built-in differential test of the salting), but hot words' posting
    lists are assembled across 16 sub-aggregates instead of one
    reducer task: the plan that survives Zipfian word keys at 100 TB.
    See functions/skew.py for the construction.
    """
    from mapreduce_lab_spark.functions.skew import salted_collect_set

    docs = load_table(spark, sf_dir, "documents")
    pairs = docs.select(
        F.col("source").alias("doc"),
        F.explode(tokenize(F.col("text"))).alias("word"),
    )
    sets = salted_collect_set(pairs, ["word"], "doc")
    return sets.select(
        "word",
        F.size("values").alias("doc_count"),
        F.concat_ws(",", "values").alias("docs"),
    )

"""Inverted index — reference A3 + A4.

Semantics (reference ``plugin/indexer/indexer.go:22-41``): per
document, tokenize and deduplicate words (a set), emit ``(word,
filename)`` once per distinct word; per word, output the document
count and the comma-joined lexicographically-sorted document list.

Spark-first design: explode → groupBy word →
``sort_array(collect_set(doc))`` → derive count + joined list.
``sort_array`` makes the holistic "sorted posting list" deterministic
regardless of shuffle arrival order (the reference gets this from its
per-partition sort, SURVEY.md §7 hard-part (a)).

Scale note: ONE shuffle on word — collect_set dedupes (word, doc)
itself, partially map-side, so duplicate pairs within a partition
never hit the wire and no separate distinct pass is needed. Posting
lists for hot words grow O(corpus); at 100 TB a real deployment caps
or buckets posting lists — or uses the salted two-phase variant
(`inverted_index_salted`, functions/skew.py) to spread hot-word
assembly across reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_lab_spark.functions.text import tokenize
from mapreduce_lab_spark.registry import query
from mapreduce_lab_spark.sources.tables import load_table


def inverted_index(df: DataFrame, doc_col: str, text_col: str = "text") -> DataFrame:
    """(word, doc_count, docs) — docs is the sorted distinct doc list.

    Single shuffle: collect_set dedupes (word, doc) itself — partially
    map-side — so the separate distinct (a second shuffle) the naive
    formulation pays is unnecessary; doc_count derives from the set.
    """
    pairs = df.select(
        F.col(doc_col).alias("doc"),
        F.explode(tokenize(F.col(text_col))).alias("word"),
    )
    return pairs.groupBy("word").agg(
        F.sort_array(F.collect_set("doc")).alias("_docs")
    ).select(
        "word",
        F.size("_docs").alias("doc_count"),
        F.concat_ws(",", "_docs").alias("docs"),
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

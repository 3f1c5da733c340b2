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


# VERDICT r12 #3: the driver's synthetic documents are ASCII-only, so
# the one cross-engine tokenizer risk SURVEY §7 flags — Java-regex vs
# RE2 agreement on the \p{L} class and per-code-point iteration — was
# exercised only by pytest, never by the official hash gate. This
# corpus is inlined as literals on BOTH sides (the same Python list
# renders the Spark rows and the oracle's VALUES), covering: accented
# precomposed Latin, DECOMPOSED combining marks (category Mn — a
# separator in both engines, and neither may NFC-normalize, so the
# lone 'e' of the decomposed éclair stays distinct from precomposed
# 'é'), CJK + kana runs with no spaces, Hangul, polytonic Greek,
# Cyrillic, Arabic, supplementary-plane fraktur letters (surrogate
# pairs in the JVM, 4-byte runes in RE2), apostrophes, and digit
# splits. Word repeats across lines keep counts > 1 so the hash is
# sensitive to counting, not just the token set.
UNICODE_CORPUS = [
    "Crème brûlée déjà vu à Zürich déjà",
    "éclair näive résumé éclair",
    "日本語のテキスト処理と分かち書き",
    "한국어 텍스트 처리 텍스트",
    "Ελληνικά κείμενα καὶ τόνοι καὶ πνεύματα",
    "русский текст и ещё слова и предложения",
    "نص عربي للاختبار نص",
    "𝔘𝔫𝔦𝔠𝔬𝔡𝔢 𝔩𝔢𝔱𝔱𝔢𝔯𝔰 mixed ascii 𝔩𝔢𝔱𝔱𝔢𝔯𝔰",
    "don't l'école won't abc123def-ghi.jkl",
]


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


@query(
    "wordcount_unicode",
    oracle=f"""
    SELECT word, count(*) AS cnt
    FROM (
      SELECT unnest(regexp_split_to_array(text, '[^\\p{{L}}]+')) AS word
      FROM (VALUES {", ".join(f"({_sql_quote(t)})" for t in UNICODE_CORPUS)})
           corpus(text)
    )
    WHERE word <> ''
    GROUP BY word
    """,
)
def q_wordcount_unicode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine Unicode tokenizer parity probe: word count over an
    inlined non-ASCII corpus (module commentary above). Deliberately
    scale-independent — it is a correctness gate on the letter class
    both engines share, not a throughput lane; sf_dir is unused."""
    docs = spark.createDataFrame([(t,) for t in UNICODE_CORPUS], "text STRING")
    return word_count(docs)

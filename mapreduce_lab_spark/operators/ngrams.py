"""N-gram language-model counts over the document corpus.

Superset surface for the LLM-data side: corpus n-gram statistics are
the building block of KenLM-style models, contamination n-gram
checks, and quality heuristics. The reference's word count
(``plugin/word_count/wc.go:21-34``) is the unigram special case.

``bigram_top_counts``: global top-k word bigrams with counts and the
conditional probability P(w2 | w1) in exact fixed-point.

Scale shape: bigram generation is a per-document array transform
(narrow, codegen-friendly, no Python); the count aggregation is
map-side combinable so the shuffle carries (bigram, partial-count).
The conditional probability needs the unigram total of the LEFT word
— computed by a second aggregation over the same bigram counts
(sum over w2), joined back on w1: dimension-sized against the bigram
table, hash join on the natural key. Top-k is a TakeOrdered over
aggregated counts, never a global row sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_lab_spark.functions.numeric import exact_ratio, oracle_exact_ratio
from mapreduce_lab_spark.registry import query
from mapreduce_lab_spark.sources.tables import fan_out, load_table

NGRAM_TOP_K = 30

_ORACLE_TOKENS = (
    "[t for t in regexp_split_to_array(lower(text), '[^\\p{L}]+') if t <> '']"
)


def _bigrams() -> F.Column:
    toks = F.filter(
        F.split(F.lower(F.col("text")), r"[^\p{L}]+"), lambda t: t != F.lit("")
    )
    idx = F.sequence(F.lit(1), F.size(toks) - 1)
    return F.transform(
        idx,
        lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
    )


def bigram_counts(docs: DataFrame) -> DataFrame:
    counts = (
        docs.where(F.size(_bigrams()) > 0)
        .select(F.explode(_bigrams()).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .withColumn("w1", F.split("bigram", " ").getItem(0))
    )
    lefts = counts.groupBy("w1").agg(F.sum("n").alias("n_left"))
    return (
        counts.join(lefts, "w1")
        .select(
            "bigram",
            "n",
            exact_ratio(F.col("n"), F.col("n_left")).alias("p_next"),
        )
        .orderBy(F.col("n").desc(), F.col("bigram").asc())
        .limit(NGRAM_TOP_K)
    )


@query(
    "bigram_top_counts",
    oracle=f"""
    WITH toks AS (
        SELECT {_ORACLE_TOKENS} AS ts FROM documents
    ),
    bigrams AS (
        SELECT unnest(list_transform(generate_series(1, len(ts) - 1),
                                     i -> ts[i] || ' ' || ts[i + 1])) AS bigram
        FROM toks WHERE len(ts) >= 2
    ),
    counts AS (
        SELECT bigram, count(*) AS n,
               string_split(bigram, ' ')[1] AS w1
        FROM bigrams GROUP BY bigram
    ),
    lefts AS (
        SELECT w1, CAST(sum(n) AS BIGINT) AS n_left FROM counts GROUP BY w1
    )
    SELECT bigram, n, {oracle_exact_ratio("n", "n_left")} AS p_next
    FROM counts JOIN lefts USING (w1)
    ORDER BY n DESC, bigram ASC
    LIMIT {NGRAM_TOP_K}
    """,
)
def q_bigram_top_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bigram_counts(fan_out(load_table(spark, sf_dir, "documents"), spark))

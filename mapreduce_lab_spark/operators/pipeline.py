"""Composed training-data pipeline — the capstone query.

A realistic corpus-preparation pass chaining the engine's operator
families in one DataFrame plan: quality scoring → threshold filter →
exact dedup (canonical survivor) → per-language corpus stats. The
point is composition: each stage is the already-verified operator
(``operators/textstats.py``, ``operators/dedup.py``) and Catalyst
fuses the narrow stages into one pass over the scan; the only
shuffles are the dedup groupBy and the final per-language rollup.

At 100 TB this shape is the daily ETL: the scan streams once, scoring
is codegen'd into it, and the dedup shuffle carries only
(hash, doc_id, lang, n_tokens) — never the text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_lab_spark.operators.textstats import quality_scores
from mapreduce_lab_spark.functions.text import tokenize
from mapreduce_lab_spark.registry import query
from mapreduce_lab_spark.sources.tables import fan_out, load_table

QUALITY_THRESHOLD = 0.7


@query(
    "pipeline_quality_dedup_stats",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, text, md5(text) AS h,
             len([t for t in regexp_split_to_array(text, '[^\\p{{L}}]+') if t <> '']) AS n_tokens,
             len(list_filter([t for t in regexp_split_to_array(text, '[^\\p{{L}}]+') if t <> ''],
                             t -> t IN ('the','a','of','and','to','in','is','on','for','it'))) AS stop_cnt,
             len(regexp_extract_all(text, '[^\\p{{L}}\\p{{N}}\\s]')) AS punct_cnt,
             len(text) AS n_chars
      FROM documents
    ), scored AS (
      SELECT *,
             floor((4 * least(1000, floor(n_tokens * 1000 / 100))
                    + 3 * (1000 - floor(stop_cnt * 1000 / n_tokens))
                    + 3 * (1000 - floor(punct_cnt * 1000 / n_chars))) / 10) / 1000.0
               AS quality_score
      FROM toks
    ), kept AS (
      SELECT * FROM scored WHERE quality_score >= {QUALITY_THRESHOLD}
    ), survivors AS (
      SELECT h, min(doc_id) AS doc_id FROM kept GROUP BY h
    )
    SELECT k.lang,
           count(*) AS n_docs,
           CAST(sum(k.n_tokens) AS BIGINT) AS total_tokens,
           floor(sum(CAST(k.quality_score * 1000 AS BIGINT)) * 1000 / count(*)) / 1000000.0
             AS avg_quality
    FROM survivors s JOIN kept k ON k.doc_id = s.doc_id AND k.h = s.h
    GROUP BY k.lang
    """,
)
def q_pipeline_quality_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    scored = docs.join(quality_scores(docs), "doc_id").withColumn(
        "h", F.md5("text")
    ).withColumn("n_tokens", F.size(tokenize(F.col("text"))))
    kept = scored.filter(F.col("quality_score") >= QUALITY_THRESHOLD).select(
        "doc_id", "lang", "h", "n_tokens", "quality_score"
    )
    survivors = kept.groupBy("h").agg(F.min("doc_id").alias("doc_id"))
    surviving_rows = kept.join(survivors, ["h", "doc_id"])
    return surviving_rows.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (
            F.floor(
                F.sum((F.col("quality_score") * 1000).cast("long")) * 1000 / F.count("*")
            )
            / 1e6
        ).alias("avg_quality"),
    )


# --- capstone #2: chunk-level dedup pipeline -------------------------------


def _chunk_capstone_oracle() -> str:
    from mapreduce_lab_spark.operators.chunking import _CHUNK_ORACLE_BODY
    from mapreduce_lab_spark.functions.numeric import oracle_exact_ratio

    return f"""
    WITH chunks AS ({_CHUNK_ORACLE_BODY}),
    keyed AS (
        SELECT c.doc_id, c.chunk_idx, c.chunk_tokens,
               md5(c.chunk_text) AS h, d.lang
        FROM chunks c JOIN documents d USING (doc_id)
    ),
    keep AS (
        SELECT h, min({{'doc_id': doc_id, 'chunk_idx': chunk_idx}}) AS k
        FROM keyed GROUP BY h
    ),
    kept AS (
        SELECT y.* FROM keyed y JOIN keep p
          ON y.h = p.h AND y.doc_id = p.k.doc_id AND y.chunk_idx = p.k.chunk_idx
    ),
    tot AS (SELECT lang, count(*) AS n_chunks FROM keyed GROUP BY lang),
    kt AS (SELECT lang, count(*) AS n_kept,
                  CAST(sum(chunk_tokens) AS BIGINT) AS kept_tokens
           FROM kept GROUP BY lang)
    SELECT t.lang, t.n_chunks, kt.n_kept, kt.kept_tokens,
           {oracle_exact_ratio('t.n_chunks - kt.n_kept', 't.n_chunks')} AS dup_frac
    FROM tot t JOIN kt USING (lang)
    """


@query("pipeline_chunk_dedup_stats", oracle=_chunk_capstone_oracle())
def q_pipeline_chunk_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone #2 — the RAG-ingest pipeline in one plan: chunk every
    document (narrow), dedup chunks corpus-wide by content hash
    (first-occurrence keeper), and report per-language chunk retention.

    Composition story: ``chunk_documents`` fuses into the scan
    (zero-shuffle); the dedup keeper is one hash groupBy whose shuffle
    carries (16-byte hash, two longs); the keeper join is hash-on-h
    with the pre-aggregated keep side; the rollups carry (lang,
    partials). The chunk TEXT never shuffles — at 100 TB the plan
    moves ~24 bytes per chunk, not the corpus.
    """
    from mapreduce_lab_spark.functions.numeric import exact_ratio
    from mapreduce_lab_spark.operators.chunking import chunk_documents

    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    keyed = (
        chunk_documents(docs)
        .withColumn("h", F.md5("chunk_text"))
        .join(docs.select("doc_id", "lang"), "doc_id")
        .select("doc_id", "chunk_idx", "chunk_tokens", "h", "lang")
    )
    keep = keyed.groupBy("h").agg(
        F.min(F.struct("doc_id", "chunk_idx")).alias("k")
    )
    kept = keyed.join(keep, "h").where(
        (F.col("doc_id") == F.col("k.doc_id"))
        & (F.col("chunk_idx") == F.col("k.chunk_idx"))
    )
    tot = keyed.groupBy("lang").agg(F.count("*").alias("n_chunks"))
    kt = kept.groupBy("lang").agg(
        F.count("*").alias("n_kept"),
        F.sum("chunk_tokens").alias("kept_tokens"),
    )
    return tot.join(kt, "lang").select(
        "lang",
        "n_chunks",
        "n_kept",
        "kept_tokens",
        exact_ratio(F.col("n_chunks") - F.col("n_kept"), F.col("n_chunks")).alias(
            "dup_frac"
        ),
    )

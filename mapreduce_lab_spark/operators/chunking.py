"""Document chunking: overlapping token-window chunks + chunk-level dedup.

The standard preprocessing step of a RAG / training-data pipeline:
split each document into fixed-size token windows with overlap, so
downstream embedding / packing / dedup operates on bounded-length
units. The reference's closest analog is the whole-file map input
(`core/worker.go:322-328` — one record per file, no splitting); this
module is superset surface driven by the LLM-pipeline requirements.

Scale shape: tokenize → generate chunk starts → explode → slice is a
NARROW pipeline — no shuffle at all for chunk production; every row's
chunks are derived from that row alone, so the operator scales
embarrassingly. The only shuffle in this module is the chunk-level
dedup groupBy, which carries (16-byte hash, counts) — never chunk
text. Chunk count per doc is ceil(n_tokens / stride), so output size
is a bounded constant factor (~size/stride) of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_lab_spark.registry import query
from mapreduce_lab_spark.sources.tables import fan_out, load_table

CHUNK_TOKENS = 40
CHUNK_STRIDE = 30  # 10-token overlap between consecutive chunks


def chunk_documents(docs: DataFrame, size: int = CHUNK_TOKENS, stride: int = CHUNK_STRIDE) -> DataFrame:
    """Overlapping token-window chunks, one row per (doc, chunk).

    Chunk ``i`` covers tokens ``[i*stride, i*stride + size)``. A chunk
    is emitted iff it is the first chunk or it adds tokens the previous
    chunk did not cover (``(i-1)*stride + size < n_tokens``) — the
    standard rule that makes the final partial chunk appear exactly
    once and never as a fully-contained suffix duplicate.
    """
    toks = docs.select(
        "doc_id",
        F.expr(r"filter(split(text, '\\s+'), t -> t <> '')").alias("tokens"),
    ).withColumn("n_tokens", F.size("tokens"))
    starts = toks.select(
        "doc_id",
        "tokens",
        "n_tokens",
        F.explode(
            F.expr(
                f"filter(sequence(0, greatest(0, CAST(floor((n_tokens-1)/{stride}) AS INT))),"
                f" i -> i = 0 OR (i*{stride} < n_tokens AND (i-1)*{stride} + {size} < n_tokens))"
            )
        ).alias("chunk_idx"),
    )
    return (
        starts.select(
            "doc_id",
            "chunk_idx",
            F.expr(f"slice(tokens, chunk_idx*{stride}+1, {size})").alias("chunk"),
        )
        .where(F.size("chunk") > 0)
        .select(
            "doc_id",
            "chunk_idx",
            F.size("chunk").alias("chunk_tokens"),
            F.array_join("chunk", " ").alias("chunk_text"),
        )
    )


_CHUNK_ORACLE_BODY = f"""
WITH toks AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '') AS tokens
    FROM documents
), base AS (
    SELECT doc_id, tokens, len(tokens) AS n_tokens FROM toks
), idx AS (
    SELECT doc_id, tokens, n_tokens,
           unnest(generate_series(0,
               greatest(0, CAST(floor((n_tokens-1)/{CHUNK_STRIDE}) AS INT)))) AS chunk_idx
    FROM base
), kept AS (
    SELECT doc_id, chunk_idx,
           list_slice(tokens, chunk_idx*{CHUNK_STRIDE}+1,
                      chunk_idx*{CHUNK_STRIDE}+{CHUNK_TOKENS}) AS chunk
    FROM idx
    WHERE chunk_idx = 0
       OR (chunk_idx*{CHUNK_STRIDE} < n_tokens
           AND (chunk_idx-1)*{CHUNK_STRIDE} + {CHUNK_TOKENS} < n_tokens)
)
SELECT doc_id, chunk_idx, len(chunk) AS chunk_tokens,
       array_to_string(chunk, ' ') AS chunk_text
FROM kept WHERE len(chunk) > 0
"""


@query("chunk_documents_overlap", oracle=_CHUNK_ORACLE_BODY)
def q_chunk_documents_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_documents(fan_out(load_table(spark, sf_dir, "documents"), spark))


def chunk_dedup(chunks: DataFrame) -> DataFrame:
    """Chunk-level exact dedup: duplicated chunk texts across the corpus.

    Dedup at chunk granularity catches boilerplate shared between
    otherwise-distinct documents (headers, licenses, navigation bars)
    that document-level dedup misses. Shuffle carries md5 + two longs
    per chunk — the chunk text itself never moves after the local hash.
    """
    return (
        chunks.groupBy(F.md5("chunk_text").alias("chunk_hash"))
        .agg(
            F.count("*").alias("n_copies"),
            F.count_distinct("doc_id").alias("n_docs"),
            F.min(F.struct("doc_id", "chunk_idx")).alias("keep"),
        )
        .where(F.col("n_copies") > 1)
        .select(
            "chunk_hash",
            "n_copies",
            "n_docs",
            F.col("keep.doc_id").alias("keep_doc_id"),
            F.col("keep.chunk_idx").alias("keep_chunk_idx"),
        )
    )


_CHUNK_DEDUP_ORACLE = f"""
WITH chunks AS ({_CHUNK_ORACLE_BODY}),
g AS (
    SELECT md5(chunk_text) AS chunk_hash,
           count(*) AS n_copies,
           count(DISTINCT doc_id) AS n_docs,
           min({{'doc_id': doc_id, 'chunk_idx': chunk_idx}}) AS keep
    FROM chunks GROUP BY 1
)
SELECT chunk_hash, n_copies, n_docs,
       keep.doc_id AS keep_doc_id, keep.chunk_idx AS keep_chunk_idx
FROM g WHERE n_copies > 1
"""


@query("chunk_level_dedup", oracle=_CHUNK_DEDUP_ORACLE)
def q_chunk_level_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_dedup(
        chunk_documents(fan_out(load_table(spark, sf_dir, "documents"), spark))
    )


# --- content-defined chunking ------------------------------------------------

CDC_WINDOW = 4  # tokens per boundary-test window
CDC_DIVISOR = 16  # P[boundary] = 1/16 per position -> ~16-token chunks


def cdc_chunks(docs: DataFrame) -> DataFrame:
    """Content-defined chunks: boundaries where the hash of the
    trailing CDC_WINDOW-token window is 0 mod CDC_DIVISOR.

    Fixed-stride chunking shifts EVERY downstream chunk when one token
    is inserted; content-defined boundaries depend only on the local
    token window, so an edit perturbs at most the chunk it lands in —
    the property storage dedup systems (LBFS et al.) and incremental
    training-data pipelines rely on (tests pin it: insertion changes
    O(1) chunk hashes). This is baseline CDC without min/max bounds,
    whose boundaries are POSITION-INDEPENDENT — which is exactly what
    makes the whole construction array-native and shuffle-free: flag
    boundary positions, derive [start, end] ranges in-array, explode
    ranges, slice. No window function, no per-doc sequential fold; a
    production variant swaps the md5 window hash for a Gear/Rabin
    rolling hash (O(1) per position) — md5 here because the DuckDB
    oracle must compute the identical boundary set.
    """
    w, d = CDC_WINDOW, CDC_DIVISOR
    toks = docs.select(
        "doc_id",
        F.expr(r"filter(split(text, '\\s+'), t -> t <> '')").alias("tokens"),
    ).withColumn("n", F.size("tokens"))
    with_bounds = toks.where(F.col("n") >= 1).withColumn(
        "bpos",
        F.filter(
            F.sequence(F.lit(1), F.col("n")),
            lambda i: (i >= w)
            & (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws(" ", F.slice(F.col("tokens"), i - (w - 1), w))),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % d
                == 0
            ),
        ),
    )
    ranges = with_bounds.select(
        "doc_id",
        "tokens",
        F.posexplode(
            F.arrays_zip(
                F.concat(
                    F.array(F.lit(1)), F.transform("bpos", lambda b: b + 1)
                ).alias("s"),
                F.concat(F.col("bpos"), F.array(F.col("n"))).alias("e"),
            )
        ).alias("chunk_idx", "r"),
    ).where(F.col("r.s") <= F.col("r.e"))
    return ranges.select(
        "doc_id",
        "chunk_idx",
        F.col("r.s").alias("start_pos"),
        (F.col("r.e") - F.col("r.s") + 1).alias("chunk_tokens"),
        F.md5(
            F.array_join(
                F.slice(F.col("tokens"), F.col("r.s"), F.col("r.e") - F.col("r.s") + 1),
                " ",
            )
        ).alias("chunk_hash"),
    )


_CDC_HEX8 = (
    "('0x' || substr(md5(array_to_string("
    f"list_slice(tokens, i - {CDC_WINDOW - 1}, i), ' ')), 1, 8))::BIGINT"
)

_CDC_ORACLE_BODY = f"""
WITH toks AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '') AS tokens
    FROM documents
), b AS (
    SELECT doc_id, tokens, len(tokens) AS n,
           [i for i in range({CDC_WINDOW}, len(tokens) + 1)
            if {_CDC_HEX8} % {CDC_DIVISOR} = 0] AS bpos
    FROM toks WHERE len(tokens) >= 1
), rg AS (
    SELECT doc_id, tokens,
           list_prepend(1, list_transform(bpos, x -> x + 1)) AS starts,
           list_append(bpos, n) AS ends
    FROM b
), ex AS (
    SELECT doc_id, tokens, starts, ends,
           unnest(range(1, len(starts) + 1)) AS c
    FROM rg
)
SELECT doc_id, c - 1 AS chunk_idx, starts[c] AS start_pos,
       ends[c] - starts[c] + 1 AS chunk_tokens,
       md5(array_to_string(list_slice(tokens, starts[c], ends[c]), ' ')) AS chunk_hash
FROM ex WHERE starts[c] <= ends[c]
"""


@query("content_defined_chunks", oracle=_CDC_ORACLE_BODY)
def q_content_defined_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC chunk inventory over the documents table: one row per
    (doc, chunk) with its start position, length, and content hash."""
    return cdc_chunks(fan_out(load_table(spark, sf_dir, "documents"), spark))


_CDC_DEDUP_ORACLE = f"""
WITH chunks AS ({_CDC_ORACLE_BODY}),
g AS (
    SELECT chunk_hash,
           count(*) AS n_copies,
           count(DISTINCT doc_id) AS n_docs,
           min({{'doc_id': doc_id, 'chunk_idx': chunk_idx}}) AS keep
    FROM chunks GROUP BY 1
)
SELECT chunk_hash, n_copies, n_docs,
       keep.doc_id AS keep_doc_id, keep.chunk_idx AS keep_chunk_idx
FROM g WHERE n_copies > 1
"""


@query("cdc_chunk_dedup", oracle=_CDC_DEDUP_ORACLE)
def q_cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over content-defined chunks: because CDC boundaries
    survive insertions, shared boilerplate dedups even when documents
    embed it at DIFFERENT token offsets — the case fixed-stride
    chunk_level_dedup structurally misses. Same compact-hash shuffle
    shape as chunk_dedup."""
    chunks = cdc_chunks(fan_out(load_table(spark, sf_dir, "documents"), spark))
    return (
        chunks.groupBy("chunk_hash")
        .agg(
            F.count("*").alias("n_copies"),
            F.count_distinct("doc_id").alias("n_docs"),
            F.min(F.struct("doc_id", "chunk_idx")).alias("keep"),
        )
        .where(F.col("n_copies") > 1)
        .select(
            "chunk_hash",
            "n_copies",
            "n_docs",
            F.col("keep.doc_id").alias("keep_doc_id"),
            F.col("keep.chunk_idx").alias("keep_chunk_idx"),
        )
    )

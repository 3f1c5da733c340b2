"""Generic MapReduce contract — the reference's UDF surface, verbatim.

The reference's entire query language is a pair of Go functions
(``main/mrworker.go:22-39``)::

    Map(filename, contents string) []KeyValue   // a UDTF
    Reduce(key string, values []string) string  // a holistic UDAF

``map_reduce`` reproduces that contract on an RDD so any (Map, Reduce)
pair written against the reference runs unchanged: whole-document
records → flatMap(mapf) → hash-partition into ``n_reduce`` buckets
with a per-partition key sort → run-grouping → reducef — the literal
E1→E8 pipeline of SURVEY.md §2.1, including the reduce seeing the
COMPLETE value list per key (which ``groupBy().agg()`` partial
aggregation deliberately does not guarantee).

This is the one RDD surface in the engine; everything queryable
declaratively lives in the DataFrame operators. Scale notes:
``repartitionAndSortWithinPartitions`` is one shuffle whose reduce
side streams sorted runs (no per-key hash map, spills via the sorter);
the holistic value list per key is the memory hazard at 100 TB —
exactly why the DataFrame path is preferred when the reduce is
algebraic.

The two registered queries run the reference's own word-count
(``plugin/word_count/wc.go``) and indexer (``plugin/indexer/
indexer.go``) Map/Reduce pairs through this engine and check them
against independent SQL oracles — the same differential role
``mrsequential`` plays in the reference's test.sh.
"""

from __future__ import annotations

import re
import sys
from collections.abc import Callable, Iterable, Iterator

from pyspark.rdd import portable_hash
from pyspark.sql import DataFrame, SparkSession

from mapreduce_lab_spark.registry import query
from mapreduce_lab_spark.sources.tables import fan_out, load_table

# Ship this module's functions INSIDE the pickled closures instead of
# by reference: executors (which may not have the package on their
# PYTHONPATH — e.g. a cluster where only the driver has the repo
# checkout) must not need to import mapreduce_lab_spark to run the
# map/reduce UDFs.
try:
    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
except (ImportError, AttributeError):  # pragma: no cover - old pyspark
    pass

MapFn = Callable[[str, str], Iterable[tuple[str, str]]]
ReduceFn = Callable[[str, list[str]], str]

# Letter runs: [^\W\d_] is Python-re for "word char minus digits and
# underscore" ≈ Unicode L* — matches Go unicode.IsLetter on this
# corpus (ASCII; differs only on rare Nl/No codepoints).
_WORD = re.compile(r"[^\W\d_]+", re.UNICODE)


def map_reduce(
    records: "Iterable[tuple[str, str]] | object",
    mapf: MapFn,
    reducef: ReduceFn,
    n_reduce: int = 10,
):
    """Run a reference-contract (Map, Reduce) pair over an RDD.

    ``records`` is an RDD of (name, contents) — the reference's
    per-file map input (``core/worker.go:322-328``). Returns an RDD of
    (key, value) strings, one per distinct key.
    """

    def run_reduce(part: Iterator[tuple[str, str]]) -> Iterator[tuple[str, str]]:
        # The partition arrives sorted by key: group maximal runs and
        # hand reducef the complete value list, mirroring the run-scan
        # in core/worker.go:267-318.
        cur_key: str | None = None
        vals: list[str] = []
        for k, v in part:
            if cur_key is not None and k != cur_key:
                yield cur_key, reducef(cur_key, vals)
                vals = []
            cur_key = k
            vals.append(v)
        if cur_key is not None:
            yield cur_key, reducef(cur_key, vals)

    return (
        records.flatMap(lambda kv: mapf(kv[0], kv[1]))
        .repartitionAndSortWithinPartitions(
            numPartitions=n_reduce, partitionFunc=portable_hash
        )
        .mapPartitions(run_reduce, preservesPartitioning=True)
    )


# Map-side slice sizing for the RDD lane: one Python map task per
# ~this many compressed input bytes. The round-13 scaling block
# measured mapreduce_wordcount at ratio 0.14 (6.3 s at 32 cores vs
# 0.9 s at 8): fan_out blew a ~50 MB scan to defaultParallelism map
# slices, so the task count scaled with CORES on a fixed tiny input
# and each extra slice paid the fixed RDD-lane cost (Python worker
# round-trip, pickled-closure setup, per-task scheduling) for ~2 MB
# of useful work. The slice count is now derived from input BYTES
# (VERDICT r13 #6 — data-driven, never a local[32] constant): at
# 100 TB bytes/32 MB far exceeds any core count, so the cap never
# binds and the scan's own splits win; locally the tiny corpus gets
# the few slices its size justifies at ANY core count.
MR_SLICE_BYTES = 32 << 20


def _doc_records(spark: SparkSession, sf_dir: str):
    """documents as (filename-like name, contents) map inputs."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    try:
        nbytes = sum(
            __import__("os").path.getsize(p.removeprefix("file:"))
            for p in docs.inputFiles()
        )
    except OSError:  # non-local store: fall back to cluster parallelism
        nbytes = 0
    if nbytes > 0:
        target = min(
            spark.sparkContext.defaultParallelism,
            max(1, -(-nbytes // MR_SLICE_BYTES)),
        )
        if docs.rdd.getNumPartitions() < target:
            docs = docs.repartition(target)
    else:
        docs = fan_out(docs, spark)
    return docs.rdd.map(lambda r: (f"doc-{r.doc_id}", r.text))


def wc_map(filename: str, contents: str) -> list[tuple[str, str]]:
    """Reference word_count.Map (plugin/word_count/wc.go:21-34)."""
    return [(w, "1") for w in _WORD.findall(contents)]


def wc_reduce(key: str, values: list[str]) -> str:
    """Reference word_count.Reduce (plugin/word_count/wc.go:39-42)."""
    return str(len(values))


@query(
    "mapreduce_wordcount",
    oracle="""
    SELECT word AS key, CAST(count(*) AS VARCHAR) AS value
    FROM (
      SELECT unnest(regexp_split_to_array(text, '[^\\p{L}]+')) AS word
      FROM documents
    )
    WHERE word <> ''
    GROUP BY word
    """,
)
def q_mapreduce_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count through the generic MR engine (not the DataFrame path)."""
    rdd = map_reduce(_doc_records(spark, sf_dir), wc_map, wc_reduce)
    return spark.createDataFrame(rdd, schema="key string, value string")


def indexer_map(filename: str, contents: str) -> list[tuple[str, str]]:
    """Reference indexer.Map (plugin/indexer/indexer.go:22-33):
    per-document distinct words, each emitted once with the doc name."""
    return [(w, filename) for w in sorted(set(_WORD.findall(contents)))]


def indexer_reduce(key: str, values: list[str]) -> str:
    """Reference indexer.Reduce (plugin/indexer/indexer.go:38-41):
    '<count> <sorted,comma,joined,docs>'."""
    docs = sorted(values)
    return f"{len(docs)} {','.join(docs)}"


@query(
    "mapreduce_indexer",
    oracle="""
    SELECT word AS key,
           CAST(count(*) AS VARCHAR) || ' ' ||
             string_agg('doc-' || doc_id::VARCHAR, ',' ORDER BY 'doc-' || doc_id::VARCHAR)
             AS value
    FROM (
      SELECT DISTINCT doc_id, word FROM (
        SELECT doc_id,
               unnest(regexp_split_to_array(text, '[^\\p{L}]+')) AS word
        FROM documents
      )
    )
    WHERE word <> ''
    GROUP BY word
    """,
)
def q_mapreduce_indexer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index through the generic MR engine."""
    rdd = map_reduce(_doc_records(spark, sf_dir), indexer_map, indexer_reduce)
    return spark.createDataFrame(rdd, schema="key string, value string")


@query(
    "udtf_wordcount",
    oracle="""
    SELECT word, count(*) AS n
    FROM (
      SELECT unnest(regexp_split_to_array(text, '[^\\p{L}]+')) AS word
      FROM documents
    )
    WHERE word <> ''
    GROUP BY word
    """,
)
def q_udtf_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference Map contract as a Spark 4 Python UDTF.

    Modern-API twin of ``mapreduce_wordcount``: the reference's
    ``Map(filename, contents) -> []KeyValue`` is literally a
    user-defined TABLE function, and Spark 4 finally has that exact
    construct (``@udtf`` + LATERAL correlated invocation). The Reduce
    side intentionally goes through the DataFrame aggregate, showing
    the contract decomposition a Spark user should actually write:
    UDTF only for the 1→N generative step, Catalyst partial+final agg
    for the algebraic reduce.

    Scale posture: a Python UDTF is row-at-a-time across the Arrow
    boundary — the documented slow path, quarantined to this
    contract-parity module (the DataFrame `wordcount` is the fast
    twin). The LATERAL join stays narrow (no shuffle until the agg).
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string")
    class MrTokenize:
        def eval(self, text: str):  # noqa: ANN001 - UDTF contract
            for w in _WORD.findall(text or ""):
                yield (w,)

    spark.udtf.register("mr_tokenize", MrTokenize)
    docs = fan_out(load_table(spark, sf_dir, "documents").select("text"), spark)
    docs.createOrReplaceTempView("_udtf_docs")
    toks = spark.sql("SELECT t.word FROM _udtf_docs d, LATERAL mr_tokenize(d.text) t")
    from pyspark.sql import functions as F

    return toks.groupBy("word").agg(F.count("*").alias("n"))

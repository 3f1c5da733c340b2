"""Custom source connector via the Spark 4 Python DataSource API.

The reference's only source is the whole-file text scan
(`core/worker.go:122-142`), a fixed built-in. Spark 4's
``pyspark.sql.datasource`` makes the source surface PLUGGABLE from
Python: a DataSource declares a schema and a partition plan, and each
InputPartition is read independently on an executor — the same
split/scan contract the reference hard-codes (one map task per file,
`core/coordinator.go:497-499`), now user-definable.

``SyntheticKV`` is a deterministic generator source: row ``i`` is
``(i, md5(i))``, split into ``parts`` disjoint ranges. Determinism
makes it DuckDB-oracleable (generate_series + md5 produce the exact
rows), so the correctness harness covers the connector path
end-to-end: partition planning, per-partition generation, and the
downstream aggregation.

Scale shape: ``partitions()`` runs on the driver and returns only
(lo, hi) bounds — O(parts) metadata, no data; every executor
generates its slice locally, so the source scales linearly with no
driver bottleneck and no skew (equal-width ranges). This is the
blueprint for wrapping any external system (feature store, KV
snapshot, proprietary format) as a first-class scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mapreduce_lab_spark.registry import query

SYNTH_N = 5_000
SYNTH_PARTS = 8
SYNTH_BUCKETS = 16


def _make_datasource():
    """Build the DataSource class lazily (import-gated so module import
    never fails on an older pyspark)."""
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class SyntheticKV(DataSource):
        @classmethod
        def name(cls) -> str:
            return "synthetic_kv"

        def schema(self) -> str:
            return "i bigint, h string"

        def reader(self, schema):
            n = int(self.options.get("n", SYNTH_N))
            parts = int(self.options.get("parts", SYNTH_PARTS))

            class Reader(DataSourceReader):
                def partitions(self):
                    step = (n + parts - 1) // parts
                    return [
                        InputPartition((lo, min(lo + step, n)))
                        for lo in range(0, n, step)
                    ]

                def read(self, part):
                    # Runs on the executor; self-contained (stdlib only).
                    import hashlib

                    lo, hi = part.value
                    for i in range(lo, hi):
                        yield (i, hashlib.md5(str(i).encode()).hexdigest())

            return Reader()

    return SyntheticKV


def read_synthetic_kv(
    spark: SparkSession, n: int = SYNTH_N, parts: int = SYNTH_PARTS
) -> DataFrame:
    spark.dataSource.register(_make_datasource())
    return (
        spark.read.format("synthetic_kv")
        .option("n", str(n))
        .option("parts", str(parts))
        .load()
    )


@query(
    "python_datasource_scan",
    oracle=f"""
    WITH s AS (
        SELECT unnest(generate_series(0, {SYNTH_N - 1})) AS i
    ), rows_ AS (
        SELECT i, md5(i::VARCHAR) AS h FROM s
    )
    SELECT i % {SYNTH_BUCKETS} AS bucket,
           count(*) AS n_rows,
           min(h) AS min_h,
           max(h) AS max_h
    FROM rows_ GROUP BY i % {SYNTH_BUCKETS}
    """,
)
def q_python_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan the custom Python data source and roll it up per bucket.

    The oracle regenerates the identical rows in DuckDB, so the hash
    check pins the whole connector path: partition bounds cover
    [0, n) exactly once (any gap/overlap changes counts), and the
    generated payloads match byte-for-byte.
    """
    from pyspark.sql import functions as F

    df = read_synthetic_kv(spark)
    return (
        df.groupBy((F.col("i") % SYNTH_BUCKETS).alias("bucket"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min("h").alias("min_h"),
            F.max("h").alias("max_h"),
        )
    )


# --- streaming variant (SimpleDataSourceStreamReader) ----------------------

import itertools as _it

STREAM_CHUNK = 1_000
_STREAM_SINK_IDS = _it.count()


def _make_streaming_datasource():
    """Same generator as SyntheticKV, exposed as a STREAMING source via
    Spark 4's SimpleDataSourceStreamReader: offsets are row indices,
    each microbatch reads the next chunk, and once the generator is
    exhausted the offset stops advancing. The offset log gives
    exactly-once delivery, so a full drain yields rows [0, n) exactly
    once regardless of how the chunks landed in microbatches."""
    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    class SyntheticKVStream(DataSource):
        @classmethod
        def name(cls) -> str:
            return "synthetic_kv_stream"

        def schema(self) -> str:
            return "i bigint, h string"

        def simpleStreamReader(self, schema):
            n = int(self.options.get("n", SYNTH_N))
            chunk = int(self.options.get("chunk", STREAM_CHUNK))

            class StreamReader(SimpleDataSourceStreamReader):
                def initialOffset(self) -> dict:
                    return {"i": 0}

                def read(self, start: dict):
                    import hashlib

                    lo = int(start["i"])
                    hi = min(lo + chunk, n)
                    # A LIST iterator, not a generator: the engine's
                    # prefetch cache both next()s and copy.copy()s the
                    # returned iterator (generators support neither
                    # copy nor pickle).
                    rows = [
                        (i, hashlib.md5(str(i).encode()).hexdigest())
                        for i in range(lo, hi)
                    ]
                    return iter(rows), {"i": hi}

                def readBetweenOffsets(self, start: dict, end: dict):
                    import hashlib

                    for i in range(int(start["i"]), int(end["i"])):
                        yield (i, hashlib.md5(str(i).encode()).hexdigest())

            return StreamReader()

    return SyntheticKVStream


@query(
    "python_datasource_stream_replay",
    oracle=f"""
    WITH s AS (
        SELECT unnest(generate_series(0, {SYNTH_N - 1})) AS i
    ), rows_ AS (
        SELECT i, md5(i::VARCHAR) AS h FROM s
    )
    SELECT i % {SYNTH_BUCKETS} AS bucket,
           count(*) AS n_rows,
           min(h) AS min_h,
           max(h) AS max_h
    FROM rows_ GROUP BY i % {SYNTH_BUCKETS}
    """,
)
def q_python_datasource_stream_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the custom PYTHON STREAMING source and roll it up — the
    same oracle as the batch scan, so the hash match proves the
    offset-tracked chunked delivery was exactly-once and complete
    (a dropped or repeated chunk changes the counts).

    The drain runs the real streaming engine: microbatches of
    STREAM_CHUNK rows via the offset log, memory sink,
    processAllAvailable() to quiesce (the offset stops advancing at
    n, so availability stabilizes), then the rollup over the sink.
    """
    from pyspark.sql import functions as F

    spark.dataSource.register(_make_streaming_datasource())
    name = f"pysource_stream_sink_{next(_STREAM_SINK_IDS)}"
    q = (
        spark.readStream.format("synthetic_kv_stream")
        .option("n", str(SYNTH_N))
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.table(name)
        .groupBy((F.col("i") % SYNTH_BUCKETS).alias("bucket"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min("h").alias("min_h"),
            F.max("h").alias("max_h"),
        )
    )


# --- custom sink: Python DataSource writer --------------------------------


def _make_sink_datasource():
    """JSONL sink through the Spark 4 Python DataSource WRITER API —
    the other half of the connector contract. Each task writes a
    uniquely-named temp file and returns it as a commit message; the
    driver-side commit() renames temps into final part files and drops
    a _SUCCESS manifest, abort() deletes everything. This is the
    two-phase commit protocol the reference hand-rolls
    (core/worker.go:459-494 signalCommiting*/rollback) — and unlike
    the reference's non-atomic O_CREATE-without-TRUNC writes (see
    SURVEY.md E13 note), failed attempts here can never contaminate
    committed output: finalization is rename-only.

    Classes are defined inside the factory (pickled by value) per the
    same rule as the reader above.
    """
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceWriter,
        WriterCommitMessage,
    )

    class KVSinkCommit(WriterCommitMessage):
        def __init__(self, tmp_path: str, n_rows: int):
            self.tmp_path = tmp_path
            self.n_rows = n_rows

    class KVSink(DataSource):
        @classmethod
        def name(cls) -> str:
            return "synthetic_kv_sink"

        def writer(self, schema, overwrite: bool):
            import uuid as _uuid

            path = self.options["path"]
            fail_part = int(self.options.get("fail_partition", "-1"))
            cols = [f.name for f in schema.fields]
            # Job-scoped id, minted on the driver and carried to every
            # task via closure pickling: final part names and the
            # temp sweep are namespaced by it, so two concurrent
            # writers into one directory can neither clobber each
            # other's committed parts nor sweep each other's temps.
            job_id = _uuid.uuid4().hex[:12]

            class Writer(DataSourceWriter):
                def write(self, rows):
                    import json
                    import os
                    import uuid

                    from pyspark import TaskContext

                    ctx = TaskContext.get()
                    tmp = os.path.join(
                        path,
                        f"_tmp-{job_id}-{ctx.partitionId()}-{ctx.attemptNumber()}"
                        f"-{uuid.uuid4().hex}.jsonl",
                    )
                    n = 0
                    with open(tmp, "w") as f:
                        for r in rows:
                            if fail_part == ctx.partitionId() and n == 1:
                                raise RuntimeError("injected sink failure")
                            f.write(json.dumps(dict(zip(cols, r))) + "\n")
                            n += 1
                    return KVSinkCommit(tmp, n)

                def _sweep_temps(self):
                    import glob
                    import os

                    # Own-job temps only: another writer's in-flight
                    # temps in the same directory are live, not garbage.
                    for leftover in glob.glob(
                        os.path.join(path, f"_tmp-{job_id}-*")
                    ):
                        try:
                            os.remove(leftover)
                        except OSError:
                            pass

                def commit(self, messages):
                    import json
                    import os

                    total = 0
                    for j, m in enumerate(messages):
                        os.replace(
                            m.tmp_path,
                            os.path.join(path, f"part-{job_id}-{j:05d}.jsonl"),
                        )
                        total += m.n_rows
                    # Failed-attempt temps of THIS job (their tasks
                    # retried into new temp names) are garbage by
                    # construction: sweep.
                    self._sweep_temps()
                    with open(os.path.join(path, "_SUCCESS"), "w") as f:
                        json.dump({"n_rows": total, "n_files": len(messages)}, f)

                def abort(self, messages):
                    import os

                    # Failed tasks contribute None messages; their
                    # attempt temps fall to the sweep below.
                    for m in messages:
                        if m is None:
                            continue
                        try:
                            os.remove(m.tmp_path)
                        except OSError:
                            pass
                    self._sweep_temps()

            return Writer()

    return KVSink


def write_kv_jsonl(df: DataFrame, path: str, fail_partition: int = -1) -> None:
    """Write ``df`` through the custom two-phase-commit JSONL sink."""
    spark = df.sparkSession
    spark.dataSource.register(_make_sink_datasource())
    w = df.write.format("synthetic_kv_sink").option("path", path)
    if fail_partition >= 0:
        w = w.option("fail_partition", str(fail_partition))
    w.mode("append").save()

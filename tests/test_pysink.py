"""Custom Python DataSource WRITER: round trip, manifest, and the
abort path (a failing task must leave the target directory exactly as
it was — no partial files, no manifest)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from mapreduce_lab_spark.sources.pysource import write_kv_jsonl


def _frame(spark, n=200, parts=4):
    return spark.range(n).repartition(parts).select(
        F.col("id").alias("i"), F.md5(F.col("id").cast("string")).alias("h")
    )


def test_sink_round_trip_with_manifest(spark, tmp_path):
    d = str(tmp_path / "sink_ok")
    os.makedirs(d)
    df = _frame(spark)
    write_kv_jsonl(df, d)
    files = sorted(os.listdir(d))
    assert "_SUCCESS" in files
    assert not any(f.startswith("_tmp-") for f in files)
    manifest = json.load(open(os.path.join(d, "_SUCCESS")))
    assert manifest["n_rows"] == 200 and manifest["n_files"] == 4
    back = spark.read.schema("i LONG, h STRING").json(d + "/part-*.jsonl")
    assert sorted((r["i"], r["h"]) for r in back.collect()) == sorted(
        (r["i"], r["h"]) for r in df.collect()
    )


def test_sink_abort_leaves_no_output(spark, tmp_path):
    d = str(tmp_path / "sink_abort")
    os.makedirs(d)
    with pytest.raises(Exception):
        write_kv_jsonl(_frame(spark), d, fail_partition=2)
    # Abort must delete committed-message temps AND failed-attempt
    # leftovers: the directory is exactly as before the write.
    assert os.listdir(d) == []


def test_sink_does_not_clobber_concurrent_writer(spark, tmp_path):
    """Part names and the temp sweep are job-scoped: a second write
    into the same directory must leave another job's committed parts
    AND its in-flight temps untouched, and add its own parts under
    distinct names."""
    d = str(tmp_path / "sink_concurrent")
    os.makedirs(d)
    write_kv_jsonl(_frame(spark), d)
    first_parts = {f for f in os.listdir(d) if f.startswith("part-")}
    # A foreign writer's in-flight temp (different job id).
    foreign_tmp = os.path.join(d, "_tmp-deadbeef0000-0-0-abc.jsonl")
    open(foreign_tmp, "w").write('{"i": 1}\n')
    write_kv_jsonl(_frame(spark), d)
    files = set(os.listdir(d))
    assert os.path.basename(foreign_tmp) in files  # live temp survives
    second_parts = {f for f in files if f.startswith("part-")}
    assert first_parts < second_parts  # first job's parts intact
    assert len(second_parts) == 2 * len(first_parts)  # no overwrites

"""Whole-file text source — parity with the reference's input model.

The reference feeds each user Map function ``(filename,
entire_contents)`` — one map task per file, file read whole
(reference ``core/worker.go:122-142``, ``core/coordinator.go:497-499``,
``main_test/mrsequential.go:41-52``).

Two Spark-native equivalents are provided:

- ``whole_text_files``: ``sc.wholeTextFiles`` → DataFrame
  ``(filename, text)``. Exactly the reference's granularity; right for
  corpora of many small-to-medium documents. At 100 TB scale the
  unit of parallelism is the file, so this source is appropriate only
  when files are numerous and bounded in size (as in the reference's
  8-book corpus); it never splits a file.
- ``documents_as_corpus``: adapts the synthetic ``documents`` table
  to the same ``(filename, text)`` shape (``source`` plays the role
  of filename), which is how the reference-parity queries run on the
  driver's test data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mapreduce_lab_spark.sources.tables import load_table

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("filename", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)


def whole_text_files(spark: SparkSession, glob: str, min_partitions: int | None = None) -> DataFrame:
    """One row per file: (filename, entire contents)."""
    rdd = spark.sparkContext.wholeTextFiles(glob, minPartitions=min_partitions)
    return spark.createDataFrame(rdd, schema=CORPUS_SCHEMA)


def documents_as_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents table in the reference's (filename, text) shape."""
    return load_table(spark, sf_dir, "documents").select(
        F.col("source").alias("filename"), F.col("text")
    )

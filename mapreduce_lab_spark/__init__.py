"""mapreduce_lab_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
``nawaphonOHM/MapReduce-lab`` (a Go implementation of the classic
MapReduce paper, surveyed in SURVEY.md), re-expressed Spark-first:

- the reference's entire query workload (word count, inverted index,
  per-file counts, constant-projection + sorted-value join) as native
  DataFrame queries (``operators/``);
- the generic ``Map(filename, contents) -> [(k, v)]`` /
  ``Reduce(key, values) -> value`` contract as a distributed RDD
  pipeline (``mapreduce.py``) so any (Map, Reduce) pair written
  against the reference's plugin API (reference
  ``main/mrworker.go:22-39``) runs unchanged;
- the relational superset the reference lacks (joins, windows,
  rollup/cube, set ops, scalar functions) driven by Catalyst;
- large-scale training-data-pipeline operators: deduplication (exact,
  MinHash-LSH, SimHash, n-gram Jaccard), embedding similarity search,
  text analysis, multimodal column plumbing;
- Structured Streaming jobs over the events table (``streaming/``).

Everything is DataFrame/SQL-first so Catalyst + Tungsten pick the
physical strategy; Python UDFs appear only where built-ins genuinely
cannot express the semantics, and then always Arrow-batched.
"""

from mapreduce_lab_spark.session import get_spark

__all__ = ["get_spark"]

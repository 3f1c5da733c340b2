"""Similarity search over the embeddings table.

ABSENT from the reference (no join of two datasets exists anywhere in
it — SURVEY.md §2.3); this is the training-pipeline extension: top-k
nearest neighbors by cosine over ``array<float>`` embeddings.

Two operators:

- brute-force: broadcast the (small) query set against the full
  corpus — O(|Q|·n·d) with NO shuffle of the corpus side; the exact
  baseline every ANN variant is measured against;
- LSH-bucketed ANN: sign-bit bucketing (axis-aligned hyperplanes),
  neighbors searched only within the query's bucket — the scale path:
  the corpus is hash-partitioned by bucket once and each probe
  touches one partition. Production would use random hyperplanes or
  IVF centroids; axis-aligned planes keep the construction fully
  expressible in both engines so the oracle checks it end-to-end.

All cosine arithmetic is double-precision index-ordered folds (see
``operators/dedup.py``) so both engines produce bit-identical values;
ranking ties break on vec_id, deterministically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_lab_spark.registry import query
from mapreduce_lab_spark.sources.tables import fan_out, load_table

N_QUERIES = 5  # vec_id < 5 are the probe vectors
TOP_K = 5
LSH_BITS = 4  # 16 buckets

_O_FOLD = "list_reduce([{a}[i] * {b}[i] for i in range(1, len({a}) + 1)], (x, y) -> x + y)"


def _with_norm(e: DataFrame) -> DataFrame:
    v = F.transform("embedding", lambda x: x.cast("double"))
    df = e.select("vec_id", v.alias("v"))
    return df.withColumn(
        "norm", F.aggregate(F.zip_with("v", "v", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
    )


def _cosine(va: str, vb: str, na: str, nb: str) -> Column:
    dot = F.aggregate(
        F.zip_with(va, vb, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    return dot / F.sqrt(F.col(na) * F.col(nb))


def knn_bruteforce(e: DataFrame, n_queries: int = N_QUERIES, k: int = TOP_K) -> DataFrame:
    """Exact top-k cosine neighbors for each probe vector."""
    base = _with_norm(e)
    q = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("norm").alias("qnorm")
    )
    c = base.select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"), F.col("norm").alias("cnorm")
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_raw", _cosine("qv", "cv", "qnorm", "cnorm"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos_raw", 6).alias("cosine"))
    )


@query(
    "knn_cosine_bruteforce",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), n AS (
      SELECT vec_id, v, {_O_FOLD.format(a='v', b='v')} AS norm FROM e
    ), scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_O_FOLD.format(a='q.v', b='c.v')} / sqrt(q.norm * c.norm) AS cos_raw
      FROM n q JOIN n c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < {N_QUERIES}
    ), ranked AS (
      SELECT query_id, neighbor_id, cos_raw,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_raw DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, rank, round(cos_raw, 6) AS cosine
    FROM ranked WHERE rank <= {TOP_K}
    """,
)
def q_knn_cosine_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    return knn_bruteforce(fan_out(load_table(spark, sf_dir, "embeddings"), spark))


def _bucket(v: Column) -> Column:
    """Sign-bit LSH bucket: bit j set iff embedding[j] >= 0."""
    b = F.lit(0)
    for j in range(LSH_BITS):
        b = b + F.when(F.element_at(v, j + 1) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return b


_O_BUCKET = " + ".join(
    f"(CASE WHEN v[{j + 1}] >= 0 THEN {1 << j} ELSE 0 END)" for j in range(LSH_BITS)
)


def ann_lsh(e: DataFrame, n_queries: int = N_QUERIES, k: int = TOP_K) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's bucket.

    The bucket equi-join replaces the all-pairs comparison: at scale
    the corpus is shuffled once on ``bucket`` (or pre-bucketed at
    write time) and each query probes ~n/2^bits vectors. Recall is
    traded for that pruning — the oracle reproduces the same buckets,
    so the approximation itself is what's verified.
    """
    base = _with_norm(e).withColumn("bucket", _bucket(F.col("v")))
    q = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
        "bucket",
    )
    c = base.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("cv"),
        F.col("norm").alias("cnorm"),
        "bucket",
    )
    scored = (
        F.broadcast(q)
        .join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_raw", _cosine("qv", "cv", "qnorm", "cnorm"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos_raw", 6).alias("cosine"))
    )


@query(
    "ann_lsh_cosine",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), n AS (
      SELECT vec_id, v, {_O_FOLD.format(a='v', b='v')} AS norm,
             ({_O_BUCKET}) AS bucket
      FROM e
    ), scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_O_FOLD.format(a='q.v', b='c.v')} / sqrt(q.norm * c.norm) AS cos_raw
      FROM n q JOIN n c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
      WHERE q.vec_id < {N_QUERIES}
    ), ranked AS (
      SELECT query_id, neighbor_id, cos_raw,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_raw DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, rank, round(cos_raw, 6) AS cosine
    FROM ranked WHERE rank <= {TOP_K}
    """,
)
def q_ann_lsh_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ann_lsh(fan_out(load_table(spark, sf_dir, "embeddings"), spark))

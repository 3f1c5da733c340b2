"""Graph-shaped analytics over relational data: co-occurrence degree.

Superset surface (the reference's closest analog is the inverted
index, ``plugin/indexer/indexer.go:14-33`` — a bipartite term→doc
edge list; this module materializes the one-mode projection of such
a bipartite graph and its degree distribution, the first diagnostics
pass of any large-graph pipeline).

``copurchase_degree_hist``: parts are nodes; an edge connects two
parts that appear in the same order. Output is the degree histogram
(how many parts have degree d).

Scale shape: the pair generation is a self-join of lineitem on
``l_orderkey`` — safe because its output is sum over orders of
k·(k−1)/2 where k is lines-per-order, and k is BOUNDED (≤7 in
TPC-H-shaped data; bounded basket size generally). This is the
standard "join on a bounded-fanout key" pattern; for unbounded
baskets the guard is a per-order line cap (filter before join), the
same discipline as the shingle prefix filter in ``dedup.py``. The
projection dedups (part-pair) with a map-side-combinable distinct,
then degree and histogram are two more integer aggregations — every
shuffle carries keys+counts only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_lab_spark.registry import query
from mapreduce_lab_spark.sources.tables import load_table


def copurchase_degree_hist(lineitem: DataFrame) -> DataFrame:
    li = lineitem.select("l_orderkey", "l_partkey").distinct()
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(b, "l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2")
        )
        .distinct()
    )
    # Each undirected edge contributes degree to both endpoints.
    degrees = (
        pairs.select(F.col("p1").alias("part"))
        .unionAll(pairs.select(F.col("p2").alias("part")))
        .groupBy("part")
        .agg(F.count("*").alias("degree"))
    )
    return (
        degrees.groupBy("degree")
        .agg(F.count("*").alias("n_parts"))
    )


@query(
    "copurchase_degree_hist",
    oracle="""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
        SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
        FROM li a JOIN li b USING (l_orderkey)
        WHERE a.l_partkey < b.l_partkey
    ),
    degrees AS (
        SELECT part, count(*) AS degree
        FROM (SELECT p1 AS part FROM pairs
              UNION ALL SELECT p2 AS part FROM pairs)
        GROUP BY part
    )
    SELECT degree, count(*) AS n_parts FROM degrees GROUP BY degree
    """,
)
def q_copurchase_degree_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    return copurchase_degree_hist(load_table(spark, sf_dir, "lineitem"))

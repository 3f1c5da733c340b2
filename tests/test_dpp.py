"""Dynamic partition pruning: joining a day-partitioned fact against a
filtered dim must prune fact PARTITIONS at runtime — the mechanism
that turns a 100 TB scan into a 2-day scan when the dim filter is
selective. Static pruning (literal predicates in PartitionFilters) is
covered in test_sources_sinks; this pins the DYNAMIC case where the
qualifying days are only known after the dim is evaluated."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_lab_spark.sources.tables import load_table


def test_dynamic_partition_pruning_on_day_partitioned_fact(spark, sf_dir, tmp_path):
    d = str(tmp_path / "events_by_day")
    events = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    events.write.partitionBy("day").parquet(d)

    fact = spark.read.parquet(d)
    all_days = [r["day"] for r in fact.select("day").distinct().collect()]
    # Dim: 2 qualifying days, discovered only by evaluating a filter —
    # the fact side cannot be statically pruned.
    dim = spark.createDataFrame(
        [(day, 1 if day in all_days[:2] else 0) for day in all_days],
        "day STRING, wanted INT",
    )
    joined = fact.join(dim.where(F.col("wanted") == 1), "day").groupBy("day").count()

    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    got = {r["day"]: r["count"] for r in joined.collect()}
    want = {
        r["day"]: r["n"]
        for r in fact.where(F.col("day").isin(all_days[:2]))
        .groupBy("day").agg(F.count("*").alias("n")).collect()
    }
    assert got == want

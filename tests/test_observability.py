"""Pipeline observability: ``df.observe`` collects dataset metrics as
a side effect of the ONE pass the query already makes — the mechanism
a 100 TB job uses for row-count/quality counters without a second
scan (the Spark-native analog of the reference's jobcount probe,
plugin/jobcount). Metrics must agree exactly with a separately
computed aggregate."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from mapreduce_lab_spark.functions.numeric import to_units
from mapreduce_lab_spark.sources.tables import load_table


def test_observe_metrics_match_direct_aggregates(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    obs = Observation("scan_metrics")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("rows_scanned"),
        F.sum(to_units("l_quantity", 100)).alias("qty_units"),
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("returned"),
    )
    # The observed frame feeds a real downstream aggregation; metrics
    # ride that single job.
    result = observed.groupBy("l_returnflag").count().collect()
    got = obs.get
    want = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(to_units("l_quantity", 100)).alias("q"),
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("r"),
    ).collect()[0]
    assert got["rows_scanned"] == want["n"]
    assert got["qty_units"] == want["q"]
    assert got["returned"] == want["r"]
    assert sum(r["count"] for r in result) == want["n"]


def test_observe_counters_survive_filters_downstream(spark, sf_dir):
    # Observe BEFORE a filter: the counters see the pre-filter stream,
    # so a job can report rows-dropped without a second scan.
    orders = load_table(spark, sf_dir, "orders")
    obs = Observation("prefilter")
    kept = (
        orders.observe(obs, F.count(F.lit(1)).alias("rows_in"))
        .where(F.col("o_orderstatus") == "O")
    )
    n_kept = kept.count()
    n_total = orders.count()
    assert obs.get["rows_in"] == n_total
    assert n_kept < n_total

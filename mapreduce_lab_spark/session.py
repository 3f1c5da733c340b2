"""SparkSession factory tuned for this engine.

Local test profile: single JVM, ``local[N]`` threads. The settings
below are chosen so the SAME logical plans scale to a real cluster:
AQE handles runtime re-planning (partition coalescing, skew-join
splitting), shuffle partitions match parallelism instead of the
legacy 200 default, and Arrow is enabled for every pandas exchange
so Pandas-UDF operators stay vectorized.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "mapreduce_lab_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-aware defaults.

    Every knob here matters at 100 TB, not just locally:

    - ``spark.sql.adaptive.enabled`` + skew-join handling: runtime
      re-planning fixes skewed shuffle partitions that static planning
      cannot see (Zipfian word keys, hot join keys).
    - ``spark.sql.shuffle.partitions``: sized to the executor-core
      count; AQE coalesces down when partitions are small, so
      overshooting is cheap while undershooting serializes reducers.
    - Arrow for all Python exchange paths (Pandas UDFs, toPandas).
    - UTC session timezone so timestamp semantics are stable across
      driver/executor locales (and match the DuckDB oracle).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = DEFAULT_SHUFFLE_PARTITIONS
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

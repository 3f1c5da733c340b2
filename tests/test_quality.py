"""Scale-posture and semantics tests for the data-quality family."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_lab_spark.operators.quality import (
    q_dq_expectations_orders,
    q_snapshot_diff_orders,
    q_table_fingerprints,
    snapshot_diff,
)
from mapreduce_lab_spark.plans import inspect


def test_dq_expectations_single_pass(spark, sf_dir):
    # All single-table constraints must ride one aggregate over one
    # scan of orders; only the FK check may add a second orders scan
    # (distinct keys) + the customer side. More scans = a per-
    # constraint job, the anti-pattern this operator exists to avoid.
    df = q_dq_expectations_orders(spark, sf_dir)
    plan = inspect.formatted_plan(df)
    assert len(inspect.scan_read_schemas(df)) <= 3, plan
    assert inspect.has_partial_aggregation(df)
    rows = {r["constraint"]: r for r in df.collect()}
    assert len(rows) == 6
    # The synthetic tables are clean: every constraint passes.
    assert all(r["passed"] for r in rows.values()), rows


def test_snapshot_diff_shuffles_hashes_not_rows(spark, sf_dir):
    # The join input must be projected to (key, 60-bit hash) BEFORE
    # the exchange: diffing wide snapshots moves 16 bytes/row. The
    # scan itself must only read the compared columns.
    df = q_snapshot_diff_orders(spark, sf_dir)
    for cols in inspect.scan_read_schemas(df):
        assert set(cols) <= {"o_orderkey", "o_totalprice", "o_orderstatus"}, cols
    plan = inspect.formatted_plan(df)
    # No payload column survives into the join: priority/date/custkey
    # never appear anywhere in the physical plan.
    assert "o_orderpriority" not in plan and "o_custkey" not in plan, plan


def test_snapshot_diff_classification(spark):
    old = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], ["k", "row_hash"]
    )
    new = spark.createDataFrame(
        [(2, 20), (3, 31), (4, 40)], ["k", "row_hash"]
    )
    got = {r["k"]: r["change_type"] for r in snapshot_diff(old, new, "k").collect()}
    assert got == {1: "delete", 3: "update", 4: "insert"}


def test_fingerprint_is_order_and_partitioning_independent(spark, sf_dir):
    base = q_table_fingerprints(spark, sf_dir)
    want = {r["table_name"]: (r["n_rows"], r["fingerprint"]) for r in base.collect()}

    # Recompute with a hostile layout: different partition count and a
    # shuffled row order must yield the identical checksum.
    from mapreduce_lab_spark.operators.quality import _fingerprint
    from mapreduce_lab_spark.sources.tables import load_table
    from mapreduce_lab_spark.functions.numeric import to_units

    part = (
        load_table(spark, sf_dir, "part")
        .repartition(7, "p_brand")
        .sortWithinPartitions(F.desc("p_partkey"))
    )
    fp = _fingerprint(
        part,
        "part",
        F.concat_ws(
            "|",
            F.col("p_partkey").cast("string"),
            F.col("p_name"),
            F.col("p_brand"),
            F.col("p_type"),
            F.col("p_size").cast("string"),
            to_units("p_retailprice", 100).cast("string"),
        ),
    ).collect()[0]
    assert (fp["n_rows"], fp["fingerprint"]) == want["part"]
    # And it detects a single-cell change.
    mutated = part.withColumn(
        "p_size",
        F.when(F.col("p_partkey") == 17, F.col("p_size") + 1).otherwise(F.col("p_size")),
    )
    fp2 = _fingerprint(
        mutated,
        "part",
        F.concat_ws(
            "|",
            F.col("p_partkey").cast("string"),
            F.col("p_name"),
            F.col("p_brand"),
            F.col("p_type"),
            F.col("p_size").cast("string"),
            to_units("p_retailprice", 100).cast("string"),
        ),
    ).collect()[0]
    assert fp2["fingerprint"] != fp["fingerprint"]


def test_cdc_apply_semantics(spark):
    """MERGE semantics on a hand-built case: delete removes, update
    replaces, insert appends, untouched rows survive unchanged."""
    from mapreduce_lab_spark.operators.quality import cdc_apply

    snap = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string"
    )
    changes = spark.createDataFrame(
        [(2, "delete", None), (3, "update", "C"), (4, "insert", "d")],
        "k int, change_type string, v string",
    )
    got = sorted(tuple(r) for r in cdc_apply(snap, changes, "k").collect())
    assert got == [(1, "a"), (3, "C"), (4, "d")]


def test_cdc_apply_broadcasts_touched_keys(spark, sf_dir):
    """The anti join's touched-key side is change-batch-sized: it must
    broadcast so the snapshot never shuffles."""
    from mapreduce_lab_spark.operators.quality import q_cdc_apply_orders
    from mapreduce_lab_spark.plans import inspect

    df = q_cdc_apply_orders(spark, sf_dir)
    plan = inspect.formatted_plan(df)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_conformal_coverage_honors_the_guarantee(spark, sf_dir):
    """Split-conformal marginal guarantee: held-out coverage must sit
    at or above 1 - alpha minus finite-sample slack (pinned at 0.85
    for alpha=0.10 on the iid synthetic split)."""
    from mapreduce_lab_spark.operators.classify import (
        q_conformal_keep_threshold,
    )

    r = q_conformal_keep_threshold(spark, sf_dir).collect()[0]
    assert r.alpha_pct == 10
    assert r.k == (r.n_cal + 1) * 90 // 100 + (1 if ((r.n_cal + 1) * 90) % 100 else 0)
    assert r.n_pass <= r.n_eval
    assert r.eval_coverage >= 0.85, r


def test_conformal_fallback_row_when_calibration_too_small(
    spark, sf_dir, tmp_path
):
    """ADVICE r11: with n_cal <= 8 at alpha=0.10, k = ceil((n_cal+1)*.9)
    exceeds n_cal, no order statistic exists, and the query used to
    emit ZERO rows — indistinguishable from 'no data'. It must now
    emit the keep-everything fallback row (threshold = min int64,
    n_pass = n_eval), and the DuckDB oracle must agree exactly."""
    import os

    import pyarrow.parquet as pq

    from mapreduce_lab_spark import registry
    from mapreduce_lab_spark.operators.classify import (
        q_conformal_keep_threshold,
    )
    from mapreduce_lab_spark.testing import compare, duckdb_connect

    d = tmp_path / "tiny_lake"
    d.mkdir()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        src = pq.read_table(os.path.join(sf_dir, f"{t}.parquet"))
        out = src.slice(0, 7) if t == "documents" else src.schema.empty_table()
        pq.write_table(out, str(d / f"{t}.parquet"))

    res = q_conformal_keep_threshold(spark, str(d))
    rows = res.collect()
    assert len(rows) == 1, rows
    r = rows[0]
    assert 0 <= r.n_cal <= 8 and r.k > r.n_cal, r
    assert r.threshold_score == -(1 << 63)
    assert r.n_pass == r.n_eval  # keep everything
    con = duckdb_connect(str(d))
    try:
        diff = compare(
            "conformal_fallback",
            res,
            con,
            registry.oracles()["conformal_keep_threshold"],
        )
        assert diff.ok, diff.detail
    finally:
        con.close()

"""Micro-cases for the inferential-statistics lane: a hand-solvable
regression and a perfectly-independent contingency table."""

from __future__ import annotations

from mapreduce_lab_spark.operators.stats import (
    chi_square_lang_source,
    ols_trend_by_type,
)


def test_ols_recovers_a_perfect_line(spark):
    # value = 1.00 + 0.50 * day (in dollars): slope 50 cents/day,
    # intercept 100 cents. Two events per day pin the daily MEAN.
    rows = []
    for d in range(10):
        y = 1.0 + 0.5 * d
        rows += [
            (f"2024-01-{d + 1:02d} 01:00:00", "click", y),
            (f"2024-01-{d + 1:02d} 02:00:00", "click", y),
        ]
    df = spark.createDataFrame(rows, "ts string, event_type string, value double").select(
        F_ts("ts"), "event_type", "value"
    )
    out = ols_trend_by_type(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_days"] == 10
    assert abs(r["slope_cents_per_day"] - 50.0) < 1e-6
    assert abs(r["intercept_cents"] - 100.0) < 1e-6


def F_ts(col):
    from pyspark.sql import functions as F

    return F.to_timestamp(col).alias("ts")


def test_chi_square_zero_for_independent_table(spark):
    # lang x source perfectly independent: every contribution is 0.
    rows = [
        (lang, src)
        for lang in ("en", "de")
        for src in ("a", "b")
        for _ in range(10)
    ]
    df = spark.createDataFrame(rows, "lang string, source string")
    out = chi_square_lang_source(df).collect()
    assert len(out) == 4
    for r in out:
        assert r["observed"] == 10
        assert r["expected"] == 10.0
        assert r["chi2_contrib"] == 0.0


def test_chi_square_flags_dependence(spark):
    # en only from a, de only from b: maximal dependence; chi2 total
    # for a 2x2 with n=20 and perfect separation is n = 20.
    rows = [("en", "a")] * 10 + [("de", "b")] * 10
    df = spark.createDataFrame(rows, "lang string, source string")
    out = chi_square_lang_source(df).collect()
    total = sum(r["chi2_contrib"] for r in out)
    assert abs(total - 20.0) < 1e-3


def test_diff_in_diff_hand_case(spark):
    from mapreduce_lab_spark.operators.stats import diff_in_diff_revenue

    # treated: pre mean 100, post mean 250 (+150)
    # control: pre mean 50,  post mean 100 (+50)   -> DiD = +100
    rows = [
        ("1-URGENT", "1997-01-01", 100.0),
        ("1-URGENT", "1997-01-02", 100.0),
        ("1-URGENT", "1998-02-01", 200.0),
        ("1-URGENT", "1998-02-02", 300.0),
        ("5-LOW", "1997-01-01", 50.0),
        ("5-LOW", "1998-02-01", 100.0),
        ("3-MEDIUM", "1997-06-01", 999.0),  # other groups ignored
    ]
    df = spark.createDataFrame(
        rows, "o_orderpriority string, o_orderdate string, o_totalprice double"
    ).selectExpr("o_orderpriority", "to_timestamp(o_orderdate) AS o_orderdate", "o_totalprice")
    r = diff_in_diff_revenue(df).collect()[0]
    assert r["t_pre"] == 100.0 and r["t_post"] == 250.0
    assert r["c_pre"] == 50.0 and r["c_post"] == 100.0
    assert abs(r["did"] - 100.0) < 1e-9


def test_bootstrap_se_tracks_classical_se(spark, sf_dir):
    """The Poisson-bootstrap SE of the mean must sit near the
    classical sigma/sqrt(n) on the real corpus (within 2x both ways —
    B=16 replicates is noisy but not order-of-magnitude noisy), and
    the normal interval must bracket the mean."""
    import math

    from mapreduce_lab_spark.operators.stats import (
        q_bootstrap_mean_ci_revenue,
    )
    from mapreduce_lab_spark.sources.tables import load_table

    from pyspark.sql import functions as F

    rows = {r.event_type: r for r in q_bootstrap_mean_ci_revenue(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    classical = {
        r.event_type: (r.sd / math.sqrt(r.n), r.n)
        for r in ev.groupBy("event_type")
        .agg(F.stddev("value").alias("sd"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert rows, "no event types"
    for et, r in rows.items():
        se_ref, n = classical[et]
        assert r.n_events == n
        assert r.ci_lo < r.mean_value < r.ci_hi
        assert se_ref / 2 <= r.boot_se <= se_ref * 2, (
            f"{et}: boot {r.boot_se} vs classical {se_ref}"
        )


def test_bootstrap_weights_are_deterministic(spark, sf_dir):
    from mapreduce_lab_spark.operators.stats import (
        q_bootstrap_mean_ci_revenue,
    )

    a = sorted(map(tuple, q_bootstrap_mean_ci_revenue(spark, sf_dir).collect()))
    b = sorted(map(tuple, q_bootstrap_mean_ci_revenue(spark, sf_dir).collect()))
    assert a == b


def test_bootstrap_zero_weight_replicate_guard(spark, sf_dir, tmp_path):
    """ADVICE r11: on a tiny group, a replicate's Poisson weight sum
    is 0 with probability e^-n — wx/w was double/0 (NULL in Spark,
    build-configurable in DuckDB), silently nulling the whole group
    row. With greatest(w,1) on both sides the row survives with the
    empty replicate contributing mean 0, and the engines agree. The
    1-event-per-type slice deterministically hits w=0 on several
    replicates (verified against the hash CDF directly)."""
    import os

    import pyarrow.parquet as pq

    from mapreduce_lab_spark import registry
    from mapreduce_lab_spark.operators.stats import (
        q_bootstrap_mean_ci_revenue,
    )
    from mapreduce_lab_spark.testing import compare, duckdb_connect

    d = tmp_path / "tiny_lake"
    d.mkdir()
    ev = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    df = ev.to_pandas().sort_values("event_id").groupby("event_type").head(1)
    import pyarrow as pa

    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        if t == "events":
            pq.write_table(
                pa.Table.from_pandas(df, schema=ev.schema, preserve_index=False),
                str(d / "events.parquet"),
            )
        else:
            schema = pq.read_schema(os.path.join(sf_dir, f"{t}.parquet"))
            pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))

    res = q_bootstrap_mean_ci_revenue(spark, str(d))
    rows = res.collect()
    assert len(rows) == 5
    for r in rows:
        # no silently-nulled group rows
        assert r.boot_se is not None and r.ci_lo is not None, r
    con = duckdb_connect(str(d))
    try:
        diff = compare(
            "bootstrap_tiny",
            res,
            con,
            registry.oracles()["bootstrap_mean_ci_revenue"],
        )
        assert diff.ok, diff.detail
    finally:
        con.close()

"""Micro-cases for the governance census and distributed selection.

The registry parity sweep already checks both queries against DuckDB
at the fixture scale; these pin the SEMANTICS on hand-checkable
frames — l-diversity's homogeneous-class detection, and the exact
k-th-order-statistic contract of the histogram-refinement selection
(including the tie case, where n_le > k is correct).
"""

from __future__ import annotations

from mapreduce_lab_spark.operators.profiling import (
    QUANTILE_PCTS,
    distributed_exact_quantiles,
    grouped_exact_median,
    l_diversity_census,
)


def test_l_diversity_flags_homogeneous_class(spark):
    # Class (nation 1, band 0): 3 rows, ONE segment -> l = 1.
    # Class (nation 2, band 0): 2 rows, TWO segments -> l = 2.
    rows = [
        (1, 100.0, "AUTO"),
        (1, 200.0, "AUTO"),
        (1, 300.0, "AUTO"),
        (2, 100.0, "AUTO"),
        (2, 200.0, "HOUSE"),
    ]
    df = spark.createDataFrame(rows, "c_nationkey int, c_acctbal double, c_mktsegment string")
    out = {r["l"]: r for r in l_diversity_census(df).collect()}
    assert out[1]["n_classes"] == 1 and out[1]["n_rows"] == 3
    assert out[2]["n_classes"] == 1 and out[2]["n_rows"] == 2
    assert abs(out[1]["row_share"] - 0.6) < 1e-9


def test_exact_quantiles_known_values(spark):
    # Values 1.00 .. 20.00: k = ceil(pct * 20 / 100), value = k dollars.
    df = spark.createDataFrame(
        [(float(i),) for i in range(1, 21)], "l_extendedprice double"
    )
    got = {r["pct"]: r for r in distributed_exact_quantiles(df).collect()}
    n = 20
    for pct in QUANTILE_PCTS:
        k = (n * pct + 99) // 100
        assert got[pct]["k"] == k
        assert got[pct]["value"] == float(k)
        assert got[pct]["n_le"] == k  # no ties here


def test_exact_quantiles_ties_and_rank_invariant(spark):
    # 10 copies of 5.00 and 10 copies of 9.00: the median (k=10) is
    # 5.00 and n_le = 10; p75 (k=15) is 9.00 with n_le = 20 (> k,
    # the documented tie case).
    df = spark.createDataFrame(
        [(5.0,)] * 10 + [(9.0,)] * 10, "l_extendedprice double"
    )
    got = {r["pct"]: r for r in distributed_exact_quantiles(df).collect()}
    assert got[50]["value"] == 5.0 and got[50]["n_le"] == 10
    assert got[75]["value"] == 9.0 and got[75]["n_le"] == 20
    for pct in QUANTILE_PCTS:
        assert got[pct]["n_le"] >= got[pct]["k"]


def test_grouped_median_per_group(spark):
    # group A: 1..9 dollars (median 5.00, k=5); group B: 10,20,30
    # (median 20.00, k=2).
    rows = [("A", float(i)) for i in range(1, 10)] + [
        ("B", 10.0),
        ("B", 20.0),
        ("B", 30.0),
    ]
    df = spark.createDataFrame(rows, "o_orderpriority string, o_totalprice double")
    got = {r["priority"]: r for r in grouped_exact_median(df).collect()}
    assert got["A"]["k"] == 5 and got["A"]["value"] == 5.0 and got["A"]["n_le"] == 5
    assert got["B"]["k"] == 2 and got["B"]["value"] == 20.0 and got["B"]["n_le"] == 2


def test_t_closeness_uniform_vs_skewed(spark):
    from mapreduce_lab_spark.operators.profiling import t_closeness_census

    # Uniform: every class carries the global 50/50 segment mix -> all
    # classes land in the t<0.1 band.
    rows = [
        (n, float(b * 1000 + 10), seg)
        for n in (1, 2)
        for b in (0, 1)
        for seg in ("AUTO", "HOUSE")
        for _ in range(5)
    ]
    df = spark.createDataFrame(rows, "c_nationkey int, c_acctbal double, c_mktsegment string")
    out = {r["t_band"]: r for r in t_closeness_census(df).collect()}
    assert set(out) == {"t<0.1"}
    # Skew one class to 100% AUTO: its TVD from the (now ~56/44)
    # global mix is large -> a leaky band appears.
    rows += [(3, 10.0, "AUTO")] * 10
    df2 = spark.createDataFrame(rows, "c_nationkey int, c_acctbal double, c_mktsegment string")
    bands = {r["t_band"] for r in t_closeness_census(df2).collect()}
    assert "0.4+ (leaky)" in bands

"""Semantics pins for the round-11 analytics additions: market-basket
association rules (support/confidence/lift over order baskets) and the
CUPED variance-reduced experiment readout."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from mapreduce_lab_spark.operators.basket import (
    MAX_BASKET,
    TOP_RULES,
    association_rules,
    q_basket_pair_census,
)
from mapreduce_lab_spark.operators.stats import cuped_adjusted_revenue


def _write(path: str, name: str, cols: dict) -> None:
    os.makedirs(path, exist_ok=True)
    pq.write_table(pa.table(cols), os.path.join(path, f"{name}.parquet"))


def test_association_rules_constructed(spark, tmp_path):
    """Baskets {1,2}, {1,2}, {1,3}, {2}: pair (1,2) co-occurs twice
    (passes MIN_PAIR_SUPPORT=2); (1,3) once (filtered). n=4 baskets,
    n_1=3, n_2=3, n_12=2 -> support 0.5, conf both 2/3, lift
    2*4/(3*3) = 8/9."""
    d = str(tmp_path / "lake")
    orders = [10, 10, 11, 11, 12, 12, 13]
    parts = [1, 2, 1, 2, 1, 3, 2]
    _write(
        d,
        "lineitem",
        {
            "l_orderkey": pa.array(orders, pa.int64()),
            "l_partkey": pa.array(parts, pa.int64()),
        },
    )
    li = spark.read.parquet(os.path.join(d, "lineitem.parquet"))
    rows = association_rules(li).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.part_a, r.part_b, r.n_ab) == (1, 2, 2)
    assert r.support_ppm == 500_000
    assert r.conf_ab_ppm == 666_666
    assert r.conf_ba_ppm == 666_666
    assert r.lift_ppm == 888_888


def test_association_rules_skew_guard(spark, tmp_path):
    """A giant basket above MAX_BASKET items contributes no pairs."""
    d = str(tmp_path / "lake")
    big = list(range(MAX_BASKET + 1))
    orders = [99] * len(big) + [1, 1, 2, 2]
    parts = big + [7, 8, 7, 8]
    _write(
        d,
        "lineitem",
        {
            "l_orderkey": pa.array(orders, pa.int64()),
            "l_partkey": pa.array([int(p) for p in parts], pa.int64()),
        },
    )
    li = spark.read.parquet(os.path.join(d, "lineitem.parquet"))
    rows = association_rules(li).collect()
    assert [(r.part_a, r.part_b) for r in rows] == [(7, 8)]


def test_association_rules_real_corpus_bounds(spark, sf_dir):
    from mapreduce_lab_spark.sources.tables import load_table

    rows = association_rules(load_table(spark, sf_dir, "lineitem")).collect()
    assert len(rows) <= TOP_RULES
    lifts = [r.lift_ppm for r in rows]
    assert lifts == sorted(lifts, reverse=True), "ranked by lift desc"
    for r in rows:
        assert r.n_ab >= 2
        assert 0 < r.support_ppm <= 1_000_000
        assert 0 < r.conf_ab_ppm <= 1_000_000
        assert 0 < r.conf_ba_ppm <= 1_000_000


def test_basket_census_matches_join_workload(spark, sf_dir):
    c = q_basket_pair_census(spark, sf_dir).collect()[0]
    assert c.n_baskets > 0
    assert c.n_capped_baskets == 0, "synthetic baskets are small"
    assert c.max_basket <= MAX_BASKET
    assert c.pair_workload >= 0


def test_cuped_reduces_variance_when_correlated(spark, tmp_path):
    """Users whose pre and post revenue are strongly correlated:
    CUPED must cut the post-period variance in both arms while
    leaving arm means interpretable (same order of magnitude)."""
    d = str(tmp_path / "lake")
    # 40 users; user u buys 100+u dollars in pre and the same amount
    # plus small arm effect in post -> corr(x, y) ~ 1.
    import datetime

    uids, ts, types, vals = [], [], [], []
    t0 = datetime.datetime(2024, 1, 1)
    for u in range(40):
        uids += [u, u]
        ts += [t0, t0 + datetime.timedelta(days=10)]
        types += ["purchase", "purchase"]
        vals += [100.0 + u, 100.0 + u + (5.0 if u % 2 else 0.0)]
    _write(
        d,
        "events",
        {
            "event_id": pa.array(range(len(uids)), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(uids, pa.int64()),
            "event_type": pa.array(types, pa.string()),
            "value": pa.array(vals, pa.float64()),
            "props": pa.array(["{}"] * len(uids), pa.string()),
        },
    )
    ev = spark.read.parquet(os.path.join(d, "events.parquet"))
    rows = {r.grp: r for r in cuped_adjusted_revenue(ev).collect()}
    assert set(rows) == {0, 1}
    for grp, r in rows.items():
        assert r.n_users == 20
        assert r.var_ratio_ppm < 100_000, (
            f"arm {grp}: CUPED should cut >90% of variance on a "
            f"corr~1 covariate, got ratio {r.var_ratio_ppm} ppm"
        )
    # arm means preserve the +5 effect direction after adjustment
    assert rows[1].mean_rev_cuped > rows[0].mean_rev_cuped


def test_cuped_real_corpus_sane(spark, sf_dir):
    from mapreduce_lab_spark.sources.tables import load_table

    rows = cuped_adjusted_revenue(load_table(spark, sf_dir, "events")).collect()
    assert [r.grp for r in rows] == [0, 1]
    for r in rows:
        assert r.n_users > 0
        assert 0 < r.var_ratio_ppm <= 1_100_000, (
            "CUPED on a weak covariate should not inflate variance "
            "much past 1.0"
        )

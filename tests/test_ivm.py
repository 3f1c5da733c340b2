"""Join-view incremental maintenance: result parity is covered by the
oracle suite; this pins that the delta algebra is non-vacuous (every
one of the four base/delta quadrants contributes rows at test scale —
otherwise the query silently degenerates to a plain join) and that
the delta terms alone equal view_new − view_base."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_lab_spark.operators.profiling import (
    IVM_LINES_SPLIT,
    IVM_ORDERS_SPLIT,
    ivm_join_revenue,
)
from mapreduce_lab_spark.sources.tables import load_table


def _quadrants(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ob = o.where(F.col("o_orderdate") < IVM_ORDERS_SPLIT)
    od = o.where(F.col("o_orderdate") >= IVM_ORDERS_SPLIT)
    lb = li.where(F.col("l_shipdate") < IVM_LINES_SPLIT)
    ld = li.where(F.col("l_shipdate") >= IVM_LINES_SPLIT)
    return o, li, ob, od, lb, ld


def test_all_four_quadrants_contribute(spark, sf_dir):
    _, _, ob, od, lb, ld = _quadrants(spark, sf_dir)
    for name, os_, ls in [
        ("base-base", ob, lb),
        ("delta-base", od, lb),
        ("base-delta", ob, ld),
        ("delta-delta", od, ld),
    ]:
        n = os_.join(ls, os_.o_orderkey == ls.l_orderkey).count()
        assert n > 0, f"quadrant {name} is empty — delta algebra untested"


def test_delta_terms_equal_view_difference(spark, sf_dir):
    # The refresh contract: summing ONLY the three delta terms must
    # equal view(all) − view(base⋈base), priority by priority.
    o, li, ob, od, lb, ld = _quadrants(spark, sf_dir)

    def view(os_, ls):
        return {
            r["o_orderpriority"]: r["u"]
            for r in os_.join(ls, os_.o_orderkey == ls.l_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.sum(
                    F.round(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
                    ).cast("long")
                ).alias("u")
            )
            .collect()
        }

    full = view(o, li)
    base = view(ob, lb)
    deltas = [view(od, lb), view(ob, ld), view(od, ld)]
    for pri in full:
        delta_sum = sum(d.get(pri, 0) for d in deltas)
        assert full[pri] - base.get(pri, 0) == delta_sum, pri

    got = {
        r["o_orderpriority"]: r["n_lines"]
        for r in ivm_join_revenue(o, li).collect()
    }
    want = {
        r["o_orderpriority"]: r["n"]
        for r in o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority").agg(F.count("*").alias("n")).collect()
    }
    assert got == want

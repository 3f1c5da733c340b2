"""Scale-posture pins for the round-9 layout / governance /
statistics lanes: column pruning at the scan, map-side-combinable
first stages, and no global-sort file assignment."""

from __future__ import annotations

import pytest

from mapreduce_lab_spark import registry
from mapreduce_lab_spark.plans.inspect import (
    has_partial_aggregation,
    scan_read_schemas,
)

registry.load_all()
_Q = registry.queries()

PRUNING = {
    # the Morton census needs exactly the two interleaved dimensions
    "zorder_layout_census": {"l_partkey", "l_suppkey"},
    # the histogram + truth passes need only the measured column
    "selectivity_histogram_report": {"l_extendedprice"},
    # the QI triple and nothing else
    "k_anonymity_census": {"c_nationkey", "c_mktsegment", "c_acctbal"},
    # forecast backtest: the series key, the calendar, the measure
    "seasonal_naive_mae": {"o_orderpriority", "o_orderdate", "o_totalprice"},
    # the inverted index touches text + doc id only
    "postings_compression_estimate": {"doc_id", "text"},
}


@pytest.mark.parametrize("name", sorted(PRUNING))
def test_scan_reads_only_needed_columns(spark, sf_dir, name):
    df = _Q[name](spark, sf_dir)
    schemas = scan_read_schemas(df)
    assert schemas, f"{name}: no file scan found in plan"
    for cols in schemas:
        extra = set(cols) - PRUNING[name]
        assert not extra, f"{name}: scan reads {sorted(extra)}"


@pytest.mark.parametrize("name", sorted(PRUNING))
def test_first_wide_stage_is_map_side_combinable(spark, sf_dir, name):
    assert has_partial_aggregation(_Q[name](spark, sf_dir)), name


def test_zorder_census_has_no_global_sort(spark, sf_dir):
    # file assignment is equal-width value ranges — an equal-count
    # ntile would pull the table through one partition.
    from mapreduce_lab_spark.plans.inspect import formatted_plan

    plan = formatted_plan(_Q["zorder_layout_census"](spark, sf_dir))
    assert "WindowExec" not in plan and "windowspecdefinition" not in plan

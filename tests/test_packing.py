"""Semantics pins for the sequence-packing lane: constructed corpora
with known token counts, boundary straddles, and the census/summary
consistency invariants."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from mapreduce_lab_spark.operators.packing import (
    SEQ_BUDGET,
    doc_token_spans,
    q_sequence_packing_census,
    q_sequence_packing_efficiency,
)


def _write_docs(path: str, rows: list[tuple[int, str]]) -> None:
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    os.makedirs(path, exist_ok=True)
    pq.write_table(tbl, os.path.join(path, "documents.parquet"))


def test_spans_are_contiguous_and_ordered(spark, tmp_path):
    # token counts 3, 1 (empty text -> [''] -> 1 token), 5
    rows = [(1, "a b c"), (2, ""), (3, "x " * 4 + "x")]
    d = str(tmp_path / "lake")
    _write_docs(d, rows)
    spans = {
        r.doc_id: (r.tc, r.start, r.end)
        for r in doc_token_spans(
            spark.read.parquet(os.path.join(d, "documents.parquet"))
        ).collect()
    }
    assert spans[1] == (3, 0, 3)
    assert spans[2] == (1, 3, 4)
    assert spans[3] == (5, 4, 9)


def test_straddling_doc_is_split_and_counted(spark, tmp_path):
    # doc 1 fills most of sequence 0; doc 2 straddles into sequence 1
    n1 = SEQ_BUDGET - 10
    rows = [(1, "w " * (n1 - 1) + "w"), (2, "y " * 39 + "y")]
    d = str(tmp_path / "lake")
    _write_docs(d, rows)
    census = {
        r.window_id: r for r in q_sequence_packing_census(spark, d).collect()
    }
    assert set(census) == {0, 1}
    assert census[0].n_docs == 2 and census[0].n_tokens == SEQ_BUDGET
    assert census[0].n_carried_in == 0
    assert census[1].n_docs == 1 and census[1].n_tokens == 30
    assert census[1].n_carried_in == 1  # doc 2 continues into seq 1
    eff = q_sequence_packing_efficiency(spark, d).collect()[0]
    assert eff.n_docs == 2
    assert eff.total_tokens == n1 + 40
    assert eff.n_sequences == 2
    assert eff.pad_tokens == 2 * SEQ_BUDGET - (n1 + 40)
    assert eff.n_split_docs == 1


def test_incremental_delta_touches_only_the_tail(spark, sf_dir):
    """The IVM property the incremental contract exists for: every
    census row the append changes sits at or after the base corpus's
    final (partial) sequence — fully-packed prefix sequences are
    untouched, so appends never repack the corpus."""
    from pyspark.sql import functions as F

    from mapreduce_lab_spark.operators.packing import (
        q_sequence_packing_incremental,
    )
    from mapreduce_lab_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    mx = docs.agg(F.max("doc_id")).collect()[0][0]
    k = (mx // 10) * 7
    base_total = (
        docs.where(F.col("doc_id") <= k)
        .select(F.size(F.split(F.trim("text"), r"\s+")).alias("tc"))
        .agg(F.sum("tc"))
        .collect()[0][0]
    )
    changed = q_sequence_packing_incremental(spark, sf_dir).collect()
    assert changed, "split must change at least the tail sequence"
    first_mutable = base_total // SEQ_BUDGET
    assert all(r.window_id >= first_mutable for r in changed), (
        sorted(r.window_id for r in changed)[:5],
        first_mutable,
    )


def test_census_and_summary_agree_on_real_corpus(spark, sf_dir):
    census = q_sequence_packing_census(spark, sf_dir).collect()
    eff = q_sequence_packing_efficiency(spark, sf_dir).collect()[0]
    # every window id present exactly once, contiguous from 0
    ids = sorted(r.window_id for r in census)
    assert ids == list(range(eff.n_sequences))
    # token mass conserved; all but the last window are exactly full
    assert sum(r.n_tokens for r in census) == eff.total_tokens
    full = [r for r in census if r.window_id < eff.n_sequences - 1]
    assert all(r.n_tokens == SEQ_BUDGET for r in full)
    # carried-in never exceeds one continuation per boundary
    assert all(r.n_carried_in <= 1 for r in census)


def test_greedy_bins_never_overflow_and_cover_every_doc(spark, sf_dir):
    from mapreduce_lab_spark.operators.packing import greedy_pack_bins
    from mapreduce_lab_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    bins = greedy_pack_bins(docs).collect()
    n_docs = docs.count()
    assert sum(r.n_docs for r in bins) == n_docs, "every doc packed exactly once"
    for r in bins:
        assert r.n_tokens <= SEQ_BUDGET, f"bin overflow: {r}"
        assert r.pad_tokens == SEQ_BUDGET - r.n_tokens
        # capacity bound: a class of width U holds at most B div U docs
        assert r.n_docs <= SEQ_BUDGET // r.wclass


def test_greedy_shelf_packing_semantics_constructed(spark, tmp_path):
    """Docs of lengths 1, 2, 300, 600: classes 1, 2, 512, 512; the
    oversize doc truncates to the budget; the width-512 class has
    capacity 1 so each of its docs gets its own bin."""
    from mapreduce_lab_spark.operators.packing import greedy_pack_bins

    rows = [
        (1, "a"),                 # el 1  -> class 1
        (2, "a b"),               # el 2  -> class 2
        (3, "w " * 299 + "w"),    # el 300 -> class 512
        (4, "y " * 599 + "y"),    # el 600 -> truncated to 512, class 512
    ]
    d = str(tmp_path / "lake")
    _write_docs(d, rows)
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    got = {
        (r.wclass, r.bin_id): (r.n_docs, r.n_tokens)
        for r in greedy_pack_bins(docs).collect()
    }
    assert got[(1, 0)] == (1, 1)
    assert got[(2, 0)] == (1, 2)
    # class 512 has capacity 1: docs 3 and 4 get their own bins
    assert got[(512, 0)] == (1, 300)
    assert got[(512, 1)] == (1, 512)  # truncated to the budget
    assert len(got) == 4


def test_strategy_compare_trade_holds(spark, sf_dir):
    from mapreduce_lab_spark.operators.packing import (
        q_sequence_packing_strategy_compare,
    )

    rows = {
        r.strategy: r
        for r in q_sequence_packing_strategy_compare(spark, sf_dir).collect()
    }
    cc, gn = rows["concat_chunk"], rows["greedy_nosplit"]
    assert gn.n_split_docs == 0, "no-split lane must not split"
    assert cc.n_truncated_docs == 0, "concat-chunk never truncates"
    assert gn.n_sequences >= cc.n_sequences, "padding costs sequences"
    assert cc.fill_ratio >= gn.fill_ratio, "concat-chunk fills tighter"
    assert 0 < gn.fill_ratio <= 1 and 0 < cc.fill_ratio <= 1

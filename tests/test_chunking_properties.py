"""Property-based invariants for the chunking operator.

The oracle-parity test pins chunking against DuckDB on the synthetic
corpus; these properties pin the SEMANTICS on adversarial token
counts (hypothesis-generated), where off-by-ones live: coverage
(every token appears in some chunk), overlap (consecutive chunks
share exactly size-stride tokens), and no-redundant-tail (no chunk is
a suffix of its predecessor).
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from tests.fuzzbudget import examples

from mapreduce_lab_spark.operators.chunking import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    chunk_documents,
)


def _chunks_for(spark, n_tokens: int) -> list[tuple[int, list[str]]]:
    text = " ".join(f"t{i}" for i in range(n_tokens))
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = chunk_documents(docs).collect()
    return sorted((r["chunk_idx"], r["chunk_text"].split(" ")) for r in rows)


@settings(max_examples=examples(25), deadline=None)
@given(n=st.integers(min_value=0, max_value=400))
def test_chunking_invariants(spark, n):
    out = _chunks_for(spark, n)
    if n == 0:
        assert out == []
        return
    toks = [f"t{i}" for i in range(n)]
    # 1. Coverage: the union of chunks is exactly the token multiset
    #    positions [i*stride, i*stride+size) — every token covered.
    covered = set()
    for idx, chunk in out:
        start = idx * CHUNK_STRIDE
        assert chunk == toks[start : start + CHUNK_TOKENS], (n, idx)
        covered.update(range(start, start + len(chunk)))
    assert covered == set(range(n)), (n, sorted(covered - set(range(n))))
    # 2. Chunk indexes are 0..k-1 dense (no gaps).
    assert [i for i, _ in out] == list(range(len(out)))
    # 3. Every chunk except the last is full-size; the last is >0.
    sizes = [len(c) for _, c in out]
    assert all(s == CHUNK_TOKENS for s in sizes[:-1])
    assert sizes[-1] > 0
    # 4. No chunk is fully contained in its predecessor (the tail
    #    rule): each chunk past the first extends coverage.
    ends = [i * CHUNK_STRIDE + len(c) for i, c in out]
    assert all(b > a for a, b in zip(ends, ends[1:])), ends


# --- content-defined chunking -----------------------------------------------


def _cdc_rows(spark, docs):
    from mapreduce_lab_spark.operators.chunking import cdc_chunks

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    return cdc_chunks(df).collect()


def test_cdc_partitions_every_token_exactly_once(spark):
    """Chunk ranges must tile [1, n] with no gap or overlap."""
    text = " ".join(f"w{i % 37}x{i % 11}" for i in range(300))
    rows = sorted(_cdc_rows(spark, [(1, text)]), key=lambda r: r["chunk_idx"])
    assert rows, "no chunks emitted"
    expect_start = 1
    for r in rows:
        assert r["start_pos"] == expect_start
        assert r["chunk_tokens"] >= 1
        expect_start += r["chunk_tokens"]
    assert expect_start == 301
    assert [r["chunk_idx"] for r in rows] == list(range(len(rows)))


def test_cdc_boundaries_survive_prefix_insertion(spark):
    """THE content-defined property: prepending tokens to a document
    changes only a bounded prefix of chunk hashes — every chunk whose
    window lies beyond the edit re-emerges with an identical hash
    (fixed-stride chunking shifts and re-hashes everything instead)."""
    base = " ".join(f"tok{i * 7 % 101}v{i % 13}" for i in range(400))
    edited = "zzz aaa qqq " + base
    h_base = {r["chunk_hash"] for r in _cdc_rows(spark, [(1, base)])}
    h_edit = {r["chunk_hash"] for r in _cdc_rows(spark, [(1, edited)])}
    shared = h_base & h_edit
    # All but the first few boundary-straddling chunks must survive.
    assert len(shared) >= len(h_base) - 3, (len(shared), len(h_base))


def test_cdc_single_token_and_empty_docs(spark):
    rows = _cdc_rows(spark, [(1, "solo"), (2, ""), (3, "   ")])
    assert [(r["doc_id"], r["chunk_idx"], r["chunk_tokens"]) for r in rows] == [
        (1, 0, 1)
    ]


def test_cdc_dedup_finds_shared_block_at_different_offsets(spark):
    """A boilerplate block embedded at different token offsets in two
    docs must still produce at least one shared chunk hash."""
    from mapreduce_lab_spark.operators.chunking import CDC_WINDOW  # noqa: F401

    block = " ".join(f"shared{i % 19}b{i % 7}" for i in range(120))
    doc_a = "pre1 pre2 " + block + " post1"
    doc_b = " ".join(f"other{i}" for i in range(9)) + " " + block
    rows_a = {r["chunk_hash"] for r in _cdc_rows(spark, [(1, doc_a)])}
    rows_b = {r["chunk_hash"] for r in _cdc_rows(spark, [(2, doc_b)])}
    assert rows_a & rows_b, "no chunk hash shared across offset-shifted copies"

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


@settings(max_examples=25, deadline=None)
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

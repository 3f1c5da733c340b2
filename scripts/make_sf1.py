"""Generate a 10x replica of sf0.1 (~sf1: 6M lineitem) OUTSIDE the
read-only testdata tree, for bench scaling runs.

Each fact/dim copy i in 0..9 offsets its primary AND foreign keys by
i * OFFSET so referential structure is preserved exactly (a join that
matched in sf0.1 matches once per copy, never across copies). Two
columns are additionally DECORRELATED across copies so the dedup /
similarity families measure scaling rather than a replication
artifact:

- ``documents.text`` for copy i > 0 gets (copy, doc-bucket,
  position)-salted tag tokens woven in every 4th word, so shingles /
  13-grams decorrelate across copies WITHOUT any single token gaining
  dominant frequency mass. (The first cut of this script wove the
  SAME ``w<i>`` token between every word; that token then dominated
  every document's simhash bit vote and 45k of 50k docs collapsed to
  ONE fingerprint — a degenerate corpus that turned the simhash
  pair-join quadratic. Good stress test, wrong default; see
  docs/SCALE.md round-4 sweep notes.)
- ``embeddings.embedding`` components shift by i * 0.001, so exact
  duplicate vectors do not appear across copies while cluster
  structure survives.

region/nation are fixed dimensions and copy through unchanged.
Deterministic (pure column arithmetic on seed-42 inputs, no RNG).

Usage: python scripts/make_sf1.py [outdir] [copies]
       (default /tmp/sfdata/sf1, 10 copies = ~sf1; 100 copies = ~sf10)

copies up to ~1000 stays safe: keys offset by i * 1e8 fit int64, and
documents stream one copy at a time through a ParquetWriter so memory
is bounded by one sf0.1 copy regardless of the target scale.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfdata/sf1"
COPIES = int(sys.argv[2]) if len(sys.argv) > 2 else 10
OFF = 100_000_000  # larger than any sf0.1 key

PLAIN = {"region", "nation"}

# table -> key columns to offset per copy
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def _weave(text: str, i: int, doc_id: int) -> str:
    """Insert a (copy, doc, position)-unique tag before every 4th
    word. Each tag token occurs exactly ONCE in the corpus (weight 1,
    shared with no other document), so simhash votes stay
    content-driven — cross-doc fingerprint correlation mirrors the
    base corpus — while most 3-shingle windows and every 13-gram of
    copy i contain a tag, killing cross-copy near-dup candidates.
    LETTER-ONLY tags: the engine tokenizer splits on non-letters
    (Go unicode.IsLetter parity), so a digit-bearing tag like
    ``w1x42p8`` collapses to the tokens ``w``/``x``/``p`` — which
    then DO dominate every document's token mass. (That is exactly
    how the first two cuts of this weave collapsed thousands of docs
    to one simhash fingerprint; any token mass shared across
    documents biases all their simhash bits the same way.)"""

    def enc(n: int) -> str:
        s = ""
        n += 1
        while n:
            n, r = divmod(n, 26)
            s += chr(ord("a") + r)
        return s

    words = text.split(" ")
    out = []
    for k, w in enumerate(words):
        if k % 4 == 0:
            out.append(f"q{enc(i)}{enc(doc_id)}{enc(k)}")
        out.append(w)
    return " ".join(out)


def replica_sql(table: str) -> str:
    cols = [
        r[0]
        for r in duckdb.sql(
            f"DESCRIBE SELECT * FROM '{SRC}/{table}.parquet'"
        ).fetchall()
    ]
    parts = []
    for i in range(COPIES):
        sel = []
        for c in cols:
            if c in KEYED[table]:
                sel.append(f"{c} + {i * OFF} AS {c}")
            elif table == "embeddings" and c == "embedding" and i > 0:
                sel.append(
                    f"list_transform(embedding, x -> x + CAST({i} * 0.001 AS FLOAT))"
                    f" AS embedding"
                )
            else:
                sel.append(c)
        parts.append(
            f"SELECT {', '.join(sel)} FROM '{SRC}/{table}.parquet'"
        )
    return " UNION ALL ".join(parts)


def make_documents() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = duckdb.sql(f"SELECT * FROM '{SRC}/documents.parquet'").df()
    writer = None
    total = 0
    try:
        for i in range(COPIES):
            d = src.copy()
            d["doc_id"] = d["doc_id"] + i * OFF
            if i > 0:
                d["text"] = [
                    _weave(t, i, int(did)) for t, did in zip(d["text"], d["doc_id"])
                ]
                d["n_chars"] = d["text"].str.len().astype("int64")
            tbl = pa.Table.from_pandas(d, preserve_index=False)
            if writer is None:
                writer = pq.ParquetWriter(f"{OUT}/documents.parquet", tbl.schema)
            writer.write_table(tbl)
            total += len(d)
    finally:
        if writer is not None:
            writer.close()
    print(f"documents: {total} rows")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for t in sorted(PLAIN):
        duckdb.sql(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")
    for t in KEYED:
        if t == "documents":
            make_documents()
            continue
        duckdb.sql(
            f"COPY ({replica_sql(t)}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = duckdb.sql(f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()

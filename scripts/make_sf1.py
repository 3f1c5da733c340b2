"""Generate a 10x replica of sf0.1 (~sf1: 6M lineitem) OUTSIDE the
read-only testdata tree, for bench scaling runs.

Each fact/dim copy i in 0..9 offsets its primary AND foreign keys by
i * OFFSET so referential structure is preserved exactly (a join that
matched in sf0.1 matches once per copy, never across copies). Two
columns are additionally DECORRELATED across copies so the dedup /
similarity families measure scaling rather than a replication
artifact:

- ``documents.text`` for copy i > 0 gets a per-copy token woven
  between words (``' ' -> ' w<i> '``), so every shingle/13-gram of
  copy i contains the copy tag and near-dup candidates do not explode
  quadratically across copies.
- ``embeddings.embedding`` components shift by i * 0.001, so exact
  duplicate vectors do not appear across copies while cluster
  structure survives.

region/nation are fixed dimensions and copy through unchanged.
Deterministic (pure column arithmetic on seed-42 inputs, no RNG).

Usage: python scripts/make_sf1.py [outdir]   (default /tmp/sfdata/sf1)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfdata/sf1"
COPIES = 10
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
            elif table == "documents" and c == "text" and i > 0:
                sel.append(f"replace(text, ' ', ' w{i} ') AS text")
            elif table == "documents" and c == "n_chars" and i > 0:
                # keep the stored length consistent with the new text
                sel.append(f"CAST(len(replace(text, ' ', ' w{i} ')) AS BIGINT) AS n_chars")
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


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for t in sorted(PLAIN):
        duckdb.sql(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")
    for t in KEYED:
        duckdb.sql(
            f"COPY ({replica_sql(t)}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = duckdb.sql(f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()

"""Distributed BPE tokenizer training — learn merge rules from a corpus.

The missing piece of the training-data pipeline between text stats and
token counting: the tokenizer itself has to be TRAINED on corpus
statistics, and at 100 TB that training is a Spark job. This module
implements byte-pair-encoding merge learning (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units" — public
algorithm) in its scalable form:

- The corpus collapses to a WORD-FREQUENCY dictionary first (the one
  corpus-scale pass, a map-side-combinable groupBy). Classic BPE
  trains on this dict, not on raw text — the dict is bounded by
  vocabulary size (~10^7 rows at web scale), not corpus size.
- Per round: adjacent-pair counts weighted by word frequency
  (``arrays_zip(slice, slice)`` + explode — pure JVM), a 1-row
  deterministic argmax collect (count desc, pair asc — the same
  scalar-only driver round-trip as the k-means convergence check),
  and a greedy left-to-right in-word merge of the winning pair.
- The merge rewrite is a fold over the symbol array via the
  higher-order ``aggregate`` function — sequential within a word (as
  greedy BPE semantics require) but narrow and whole-stage-codegen
  across words: no Python in the loop, no shuffle in the rewrite.
- ``localCheckpoint`` per round truncates the K-deep lineage
  (same discipline as k-means / PageRank / connected components).

Fully ORACLED since round 12: the delimiter-prefix encoding plus a
list_reduce greedy fold (round 13; the round-12 replace() rewrite had
a prefix hazard — see the oracle commentary below) makes each merge
round plain SQL, so the whole trainer (and the train→encode pipeline)
unrolls as MATERIALIZED CTE rounds in DuckDB. The ALGORITHM
is additionally pinned by ``tests/test_bpe.py`` against an
independent pure-Python reference BPE on the same corpus (three
implementations agreeing, not two).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_lab_spark.functions.text import tokenize
from mapreduce_lab_spark.registry import query
from mapreduce_lab_spark.sources.tables import load_table

BPE_ROUNDS = 12
BPE_VOCAB_CAP = 5000  # most-frequent words kept for training
END_OF_WORD = "</w>"

_MERGE_SCHEMA = "round INT, left STRING, right STRING, pair_count BIGINT"


def _char_syms(word):
    """One symbol per CODE POINT plus the end-of-word marker.

    ``regexp_extract_all(word, '(?s).')`` iterates code points (Java
    regex ``.`` never matches half a surrogate pair), so
    supplementary-plane letters (mathematical alphanumerics, CJK
    extension B, emoji) stay whole symbols. The previous zero-width
    ``split(word, '(?!^)')`` cut BETWEEN the UTF-16 code units of such
    characters, seeding training with lone-surrogate mojibake symbols
    (pinned by the astral-plane test in tests/test_bpe.py).
    """
    return F.concat(
        F.regexp_extract_all(word, F.lit("(?s)."), 0),
        F.array(F.lit(END_OF_WORD)),
    )


def _merge_pair(syms, left: str, right: str):
    """Greedy left-to-right replacement of adjacent (left, right) by
    their concatenation, as a JVM-side fold over the symbol array."""
    merged = left + right

    def step(acc, x):
        hit = acc["has_prev"] & (acc["prev"] == F.lit(left)) & (x == F.lit(right))
        return F.when(
            hit,
            F.struct(
                F.concat(acc["out"], F.array(F.lit(merged))).alias("out"),
                F.lit("").alias("prev"),
                F.lit(False).alias("has_prev"),
            ),
        ).otherwise(
            F.struct(
                F.when(
                    acc["has_prev"], F.concat(acc["out"], F.array(acc["prev"]))
                ).otherwise(acc["out"]).alias("out"),
                x.alias("prev"),
                F.lit(True).alias("has_prev"),
            )
        )

    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit("").alias("prev"),
        F.lit(False).alias("has_prev"),
    )
    finish = lambda acc: F.when(  # noqa: E731
        acc["has_prev"], F.concat(acc["out"], F.array(acc["prev"]))
    ).otherwise(acc["out"])
    return F.aggregate(syms, init, step, finish)


def _pair_counts(state: DataFrame) -> DataFrame:
    """(left, right, pair_count) over adjacent symbol pairs, weighted
    by word frequency. Map-side combinable."""
    n = F.size("syms")
    pairs = state.select(
        "n",
        F.explode(
            F.arrays_zip(
                F.slice("syms", 1, n - 1).alias("l"),
                F.slice("syms", 2, n - 1).alias("r"),
            )
        ).alias("p"),
    )
    return pairs.groupBy(
        F.col("p.l").alias("left"), F.col("p.r").alias("right")
    ).agg(F.sum("n").alias("pair_count"))


def bpe_train_merges(
    documents: DataFrame,
    rounds: int = BPE_ROUNDS,
    vocab_cap: int = BPE_VOCAB_CAP,
) -> DataFrame:
    """Learn ``rounds`` BPE merges from a documents frame; returns
    (round, left, right, pair_count), one row per learned merge in
    order. Deterministic: ties in pair count break lexicographically,
    the vocabulary cap breaks count ties by word."""
    spark = documents.sparkSession
    wc = (
        documents.select(F.explode(tokenize(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(vocab_cap)
    )
    state = wc.select(
        "n", _char_syms(F.col("word")).alias("syms")
    ).localCheckpoint()

    learned: list[tuple[int, str, str, int]] = []
    for r in range(rounds):
        best = (
            _pair_counts(state)
            .orderBy(F.desc("pair_count"), "left", "right")
            .limit(1)
            .collect()
        )
        if not best or best[0]["pair_count"] < 2:
            break
        left, right, n_pair = best[0]["left"], best[0]["right"], best[0]["pair_count"]
        learned.append((r, left, right, n_pair))
        state = state.select(
            "n", _merge_pair(F.col("syms"), left, right).alias("syms")
        ).localCheckpoint()
    return spark.createDataFrame(learned, _MERGE_SCHEMA)


def bpe_encode_token_lengths(
    documents: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """Apply a FIXED learned merge list to a corpus and report tokens
    per document — the inference side of the tokenizer, same JVM fold,
    zero shuffle until the final stats rollup."""
    words = documents.select(
        "doc_id", F.explode(tokenize(F.col("text"))).alias("word")
    )
    out = words.select("doc_id", _char_syms(F.col("word")).alias("syms"))
    for left, right in merges:
        out = out.select("doc_id", _merge_pair(F.col("syms"), left, right).alias("syms"))
    return out.groupBy("doc_id").agg(
        F.sum(F.size("syms")).alias("n_tokens"),
        F.count("*").alias("n_words"),
    )


# --- round-12/13: the unrolled DuckDB twin --------------------------------------
#
# BPE training WAS the documented rows-only iterative-argmax class —
# until the round-12 observation that a merge round is expressible in
# plain SQL under a DELIMITER-PREFIX encoding: a word's symbol
# sequence is stored as chr(31)||sym per symbol (no trailing
# delimiter; symbols are corpus letters + '</w>' so chr(31) can never
# occur inside one). With that, the whole trainer unrolls as
# BPE_ROUNDS MATERIALIZED CTE rounds (pair census from the split
# string -> (count desc, left, right) argmax -> greedy rewrite), the
# same trick as the PageRank/Markov/lattice-Lloyd oracles.
#
# The REWRITE is a list_reduce greedy fold, not a replace().
# Round 12 shipped replace(s, chr(31)||l||chr(31)||r, chr(31)||l||r),
# which is WRONG: with no trailing boundary the pattern also fires
# when the right symbol is a proper PREFIX of the following symbol —
# on corpus {ab x10, xab x2, xac/xad/xae/xaf} the round-3 merge (x,a)
# corrupted (x)(ab</w>) into the single symbol (xab</w>), diverging
# from the Spark trainer (ADVICE r12, pinned as the prefix-hazard
# regression in tests/test_bpe.py). RE2 has no lookahead, so the fix
# is the same greedy left-to-right fold the Spark side runs:
# string_split(s, chr(31)) yields ['', sym1, sym2, ...] — the leading
# '' seeds list_reduce's accumulator — and each step either merges
# (acc || x) when the accumulator's LAST symbol is exactly l and x is
# exactly r, or appends (acc || chr(31) || x). ends_with(acc,
# chr(31)||l) is an EXACT last-symbol test because chr(31) cannot
# occur inside a symbol; a just-merged symbol l||r can never re-match
# as l (r is non-empty), so non-overlapping leftmost scan semantics
# fall out: "a a a a" -> "aa aa", "a a a" -> "aa a", and (x)(ab</w>)
# under (x,a) stays unmerged — byte-for-byte the Spark fold.
#
# The early-stop contract (pair_count < 2) is WHERE c >= 2 on each
# argmax; rounds after a stop propagate empty merge rows through
# LEFT-JOIN pass-through rewrites, so the union output matches the
# break exactly (and the empty lake yields zero rows on both
# engines). The pure-Python reference pin in tests/test_bpe.py stays
# as the third implementation.

_D = "chr(31)"


def _fold_rewrite_sql(src: str) -> str:
    """One greedy merge round over a delimiter-prefixed symbol string,
    as a DuckDB list_reduce fold (see module commentary: replace() is
    NOT equivalent — prefix hazard). NULL-pair rounds pass through."""
    return (
        f"CASE WHEN m.l IS NULL THEN {src}\n"
        f"                ELSE list_reduce(string_split({src}, {_D}),\n"
        f"                       (acc, x) -> CASE WHEN ends_with(acc, {_D} || m.l)"
        f" AND x = m.r\n"
        f"                                   THEN acc || x\n"
        f"                                   ELSE acc || {_D} || x END) END"
    )


def _bpe_syms_sql(word: str) -> str:
    """Delimiter-prefixed symbol string for a word column: one chr(31)
    before every code point, then the end-of-word marker."""
    return (
        f"{_D} || array_to_string(string_split({word}, ''), {_D})"
        f" || {_D} || '{END_OF_WORD}'"
    )


def _bpe_round_sql(r: int) -> str:
    return f"""
    p{r} AS MATERIALIZED (
      SELECT syms[i] AS l, syms[i + 1] AS r, CAST(sum(n) AS BIGINT) AS c
      FROM (SELECT n, list_slice(string_split(s, {_D}), 2, 1000000) AS syms
            FROM w{r - 1}),
           LATERAL (SELECT unnest(generate_series(1, len(syms) - 1)) AS i) g
      GROUP BY 1, 2
    ), m{r} AS MATERIALIZED (
      SELECT {r - 1} AS round, l, r, c FROM p{r}
      WHERE c >= 2 ORDER BY c DESC, l, r LIMIT 1
    ), w{r} AS MATERIALIZED (
      SELECT n, {_fold_rewrite_sql("s")} AS s
      FROM w{r - 1} LEFT JOIN m{r} m ON TRUE
    )"""


def _bpe_train_prefix(rounds: int) -> str:
    """Shared CTE chain: tokenize -> capped word dict -> w0 -> rounds."""
    return f"""
    WITH toks AS MATERIALIZED (
      SELECT unnest(regexp_split_to_array(text, '[^\\p{{L}}]+')) AS word
      FROM documents
    ), wc AS MATERIALIZED (
      SELECT word, count(*) AS n FROM toks WHERE word <> ''
      GROUP BY word ORDER BY n DESC, word LIMIT {BPE_VOCAB_CAP}
    ), w0 AS MATERIALIZED (
      SELECT n, {_bpe_syms_sql("word")} AS s FROM wc
    ),{",".join(_bpe_round_sql(r) for r in range(1, rounds + 1))}"""


def _bpe_train_oracle(rounds: int = BPE_ROUNDS) -> str:
    unions = "\nUNION ALL\n".join(
        f"SELECT CAST(round AS INT) AS round, l AS left, r AS right,"
        f" c AS pair_count FROM m{r}"
        for r in range(1, rounds + 1)
    )
    return _bpe_train_prefix(rounds) + "\n" + unions


def _bpe_encode_oracle(rounds: int = 6) -> str:
    enc = []
    for r in range(1, rounds + 1):
        enc.append(f"""
    enc{r} AS MATERIALIZED (
      SELECT doc_id, {_fold_rewrite_sql("s")} AS s
      FROM enc{r - 1} LEFT JOIN m{r} m ON TRUE
    )""")
    return (
        _bpe_train_prefix(rounds)
        + f""",
    dwords AS MATERIALIZED (
      SELECT doc_id, unnest(regexp_split_to_array(text, '[^\\p{{L}}]+'))
                 AS word
      FROM documents
    ), enc0 AS MATERIALIZED (
      SELECT doc_id, {_bpe_syms_sql("word")} AS s
      FROM dwords WHERE word <> ''
    ),{",".join(enc)}
    SELECT doc_id,
           CAST(sum(len(string_split(s, {_D})) - 1) AS BIGINT) AS n_tokens,
           count(*) AS n_words
    FROM enc{rounds} GROUP BY doc_id"""
    )


@query("bpe_train_merges", oracle=_bpe_train_oracle())
def q_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first BPE_ROUNDS merge rules learned from the documents
    corpus — fully oracled since round 12 via the delimiter-prefix
    replace() unroll (see module commentary above); additionally
    pinned against a pure-Python reference BPE in tests/test_bpe.py."""
    return bpe_train_merges(load_table(spark, sf_dir, "documents"))


@query("bpe_token_counts", oracle=_bpe_encode_oracle())
def q_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts under a tokenizer trained on the
    corpus itself (6 merge rounds) — the train→encode round trip as
    one registered pipeline, fully oracled since round 12 (the DuckDB
    twin replays train AND encode with the same unrolled chain).
    Deterministic end to end; the merge list is tiny driver state
    (the learned rules), broadcast into the encode folds."""
    docs = load_table(spark, sf_dir, "documents")
    merges = [
        (m["left"], m["right"])
        for m in bpe_train_merges(docs, rounds=6).orderBy("round").collect()
    ]
    return bpe_encode_token_lengths(docs, merges)

"""BPE merge learning vs an independent pure-Python reference
implementation (Sennrich-style), plus the encode side and the
determinism/empty-input contracts that the rows-only driver check
can't see."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from mapreduce_lab_spark.operators.bpe import (
    END_OF_WORD,
    bpe_encode_token_lengths,
    bpe_train_merges,
)

CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wide wider widest newest low",
]


def _py_bpe(texts, rounds):
    """Reference BPE on a word-frequency dict: count adjacent pairs
    weighted by word count, merge the (count desc, pair asc)-best,
    greedy left-to-right."""
    wc = Counter(w for t in texts for w in t.split())
    vocab = {tuple(list(w) + [END_OF_WORD]): n for w, n in wc.items()}
    merges = []
    for r in range(rounds):
        pairs = Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        best_count = max(pairs.values())
        cand = sorted(p for p, n in pairs.items() if n == best_count)
        pair, n_pair = cand[0], best_count
        if n_pair < 2:
            break
        merges.append((r, pair[0], pair[1], n_pair))
        new_vocab = {}
        for syms, n in vocab.items():
            out, prev = [], None
            for x in syms:
                if prev == pair[0] and x == pair[1]:
                    out.append(pair[0] + pair[1])
                    prev = None
                elif prev is None:
                    prev = x
                else:
                    out.append(prev)
                    prev = x
            if prev is not None:
                out.append(prev)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def _docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id LONG, text STRING"
    )


def test_merges_match_reference_bpe(spark):
    got = [
        (r["round"], r["left"], r["right"], r["pair_count"])
        for r in bpe_train_merges(_docs(spark), rounds=8).orderBy("round").collect()
    ]
    want = _py_bpe(CORPUS, 8)
    assert got == want


def test_greedy_overlap_semantics(spark):
    # 'aaaa' + merge (a,a): greedy left-to-right yields aa, aa, </w> —
    # NOT aa, a, a (lazy) or a, aa, a (right-biased).
    docs = spark.createDataFrame([(0, "aaaa aaaa")], "doc_id LONG, text STRING")
    merges = bpe_train_merges(docs, rounds=1).collect()
    assert [(m["left"], m["right"]) for m in merges] == [("a", "a")]
    enc = bpe_encode_token_lengths(docs, [("a", "a")]).collect()
    # each word: aa, aa, </w> = 3 symbols; 2 words -> 6
    assert enc[0]["n_tokens"] == 6 and enc[0]["n_words"] == 2


def test_encode_compresses_monotonically(spark, sf_dir):
    from mapreduce_lab_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(40)
    merges = [
        (m["left"], m["right"])
        for m in bpe_train_merges(docs, rounds=6).orderBy("round").collect()
    ]
    assert merges, "no merges learned from real documents"
    base = bpe_encode_token_lengths(docs, []).agg(F.sum("n_tokens")).collect()[0][0]
    enc = bpe_encode_token_lengths(docs, merges).agg(F.sum("n_tokens")).collect()[0][0]
    # Every applied merge strictly reduces total symbol count by the
    # number of replaced occurrences, so the encoded corpus is smaller.
    assert enc < base


def test_empty_corpus_yields_empty_merge_table(spark):
    docs = spark.createDataFrame([], "doc_id LONG, text STRING")
    out = bpe_train_merges(docs, rounds=4)
    assert out.count() == 0
    assert [f.name for f in out.schema] == ["round", "left", "right", "pair_count"]


# ADVICE r12 falsifier: after rounds (a,b) then (ab,</w>), the words
# xab contain the symbol sequence (x)(ab</w>); the round-3 merge (x,a)
# — won by the four xac/xad/xae/xaf words — must NOT touch them. The
# round-12 replace()-based oracle rewrite (no trailing boundary)
# corrupted (x)(ab</w>) into the single symbol (xab</w>) here; the
# list_reduce greedy fold may not.
HAZARD_CORPUS = ["ab"] * 10 + ["xab"] * 2 + ["xac", "xad", "xae", "xaf"]


def test_train_oracle_greedy_fold_on_prefix_hazard_corpus(spark):
    import duckdb

    from mapreduce_lab_spark.operators.bpe import _bpe_train_oracle

    text = " ".join(HAZARD_CORPUS)
    docs = spark.createDataFrame([(0, text)], "doc_id LONG, text STRING")
    got = [
        (r["round"], r["left"], r["right"], r["pair_count"])
        for r in bpe_train_merges(docs).orderBy("round").collect()
    ]
    # Spark vs independent pure-Python reference.
    assert got == _py_bpe([text], 12)
    # The merge the hazard is about: round 2 (0-based) is (x, a) and
    # its count must be 4 (the xac/xad/xae/xaf words only), not 6.
    assert got[2] == (2, "x", "a", 4), got
    # DuckDB oracle vs Spark, same corpus.
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.execute("INSERT INTO documents VALUES (0, ?)", [text])
    want = sorted(tuple(r) for r in con.execute(_bpe_train_oracle()).fetchall())
    con.close()
    assert sorted(got) == want


def test_encode_oracle_greedy_fold_on_prefix_hazard_corpus(spark):
    import duckdb

    from mapreduce_lab_spark.operators.bpe import _bpe_encode_oracle

    # Split the hazard corpus over three docs so per-doc counts differ.
    texts = [" ".join(HAZARD_CORPUS[:7]), " ".join(HAZARD_CORPUS[7:12]),
             " ".join(HAZARD_CORPUS[12:])]
    rows = list(enumerate(texts))
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    merges = [
        (m["left"], m["right"])
        for m in bpe_train_merges(docs, rounds=6).orderBy("round").collect()
    ]
    got = sorted(
        (r["doc_id"], r["n_tokens"], r["n_words"])
        for r in bpe_encode_token_lengths(docs, merges).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = sorted(tuple(r) for r in con.execute(_bpe_encode_oracle()).fetchall())
    con.close()
    assert got == want


def test_char_syms_keeps_astral_plane_code_points_whole(spark):
    """Supplementary-plane letters (two UTF-16 code units) must become
    ONE symbol, not two lone-surrogate halves: the split position is
    lookbehind-guarded against landing inside a surrogate pair."""
    from mapreduce_lab_spark.operators.bpe import _char_syms

    word = "\U0001D51Ea\U0001D51F"  # 𝔞 a 𝔟 — fraktur letters are category L
    syms = spark.range(1).select(_char_syms(F.lit(word)).alias("s")).collect()[0]["s"]
    assert syms == ["\U0001D51E", "a", "\U0001D51F", "</w>"], syms

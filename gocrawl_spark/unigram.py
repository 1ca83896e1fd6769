"""Unigram-LM tokenizer — substring-seeded vocab, Viterbi encode,
hard-EM re-estimation (Kudo 2018; the SentencePiece `--model_type=
unigram` family), completing the subword trio beside bpe.py
(frequency-scored merges) and wordpiece.py (likelihood-scored merges
+ greedy encode).

Deterministic contract (both engines, any parallelism):

- SEED VOCAB: every substring of length 1..max_piece_len of every
  pre-tokenizer word (textstats.BPE_ISH_PATTERN), occurrence-weighted
  by word count, counted with OVERLAPS (position enumeration, not
  regex). All single characters are kept for coverage; multi-char
  pieces are ranked (count DESC, piece ASC) and cut at vocab_size.
  Piece score = round(ln(c / C), 6) with C the BIGINT sum over the
  selected vocab — the one transcendental is rounded immediately so
  engine ulp differences cannot propagate.
- VITERBI ENCODE: per word, the max-score segmentation under the
  current scores; path score accumulates LEFT-TO-RIGHT (prefix sums),
  ties broken by preferring the LONGER final piece at every DP cell —
  equivalently, the segmentation whose reversed piece-length sequence
  is lexicographically greatest among max-score paths (the property
  the DuckDB twin's exhaustive-enumeration argmax reproduces). A word
  containing any character outside the vocab encodes to [UNK] whole
  (wordpiece.UNK convention).
- HARD-EM STEP: one Viterbi E-step (piece usage counts over the
  corpus, word-count weighted) + M-step re-score; pieces Viterbi never
  uses drop out — the pruning dynamic of the full EM trainer in one
  auditable round.

Scale shape: seed counting is pure codegen (posexplode positions ×
piece lengths → one groupBy; O(words × len × max_piece_len) rows,
map-side combined). Viterbi runs once per DISTINCT word (Arrow-batched
pandas UDF, vocab broadcast as a closure dict — Heaps-law small);
documents reassemble by equi-join + ordered flatten, exactly
wordpiece.encode_greedy's plan. The EM rollup is one piece-keyed
groupBy. No driver-side corpus state anywhere.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gocrawl_spark import bpe, textstats
from gocrawl_spark.wordpiece import UNK


def substring_counts(
    words: DataFrame, max_piece_len: int = 4
) -> DataFrame:
    """(piece, c): occurrence-weighted substring counts over the
    distinct-word table (word, cnt) — overlapping occurrences counted
    via position enumeration. Pure codegen: explode start positions,
    explode lengths, substring, one groupBy."""
    pos = F.explode(F.sequence(F.lit(1), F.length("word"))).alias("i")
    ln = F.explode(F.sequence(F.lit(1), F.lit(max_piece_len))).alias("l")
    ex = words.select("word", "cnt", pos).select("word", "cnt", "i", ln)
    return (
        ex.filter(F.col("i") + F.col("l") - 1 <= F.length("word"))
        .select(F.expr("substring(word, i, l)").alias("piece"), "cnt")
        .groupBy("piece")
        .agg(F.sum("cnt").cast("long").alias("c"))
    )


def seed_vocab(
    docs: DataFrame,
    vocab_size: int = 16,
    max_piece_len: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """(piece, c, score): the seed unigram vocabulary — all single
    characters (coverage) plus the top multi-char substrings by
    (c DESC, piece ASC) up to `vocab_size` total, scored
    round(ln(c / C), 6) with C = Σc over the selected set."""
    sc = substring_counts(bpe.word_counts(docs, text_col), max_piece_len)
    singles = sc.filter(F.length("piece") == 1)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("c"), F.asc("piece"))
    n_singles = singles.count()
    multi = (
        sc.filter(F.length("piece") > 1)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= max(0, vocab_size - n_singles))
        .drop("_rk")
    )
    sel = singles.unionByName(multi)
    tot = sel.agg(F.sum("c").alias("_tot"))
    return (
        sel.crossJoin(F.broadcast(tot))
        .select(
            "piece",
            "c",
            F.round(
                F.log(F.col("c").cast("double") / F.col("_tot").cast("double")),
                6,
            ).alias("score"),
        )
    )


def viterbi_word(word: str, scores: dict, max_len: int):
    """Max-score segmentation of one word; ties prefer the longer
    final piece at every cell (reversed-length-sequence max). Returns
    None when some position cannot be covered by any piece."""
    n = len(word)
    # dp[j] = (score, rev_lens tuple, toks tuple) best for word[:j]
    dp = [None] * (n + 1)
    dp[0] = (0.0, (), ())
    for j in range(1, n + 1):
        best = None
        for plen in range(min(max_len, j), 0, -1):
            i = j - plen
            if dp[i] is None:
                continue
            piece = word[i:j]
            s = scores.get(piece)
            if s is None:
                continue
            cand = (
                dp[i][0] + s,
                (plen,) + dp[i][1],
                dp[i][2] + (piece,),
            )
            if best is None or (cand[0], cand[1]) > (best[0], best[1]):
                best = cand
        dp[j] = best
    if dp[n] is None:
        return None
    return list(dp[n][2])


def encode_viterbi(
    docs: DataFrame,
    vocab: DataFrame | list,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, tokens array<string>): Viterbi-encode every document
    under the (piece, score) vocabulary. Same distributed shape as
    wordpiece.encode_greedy: the DP runs once per DISTINCT word
    (Arrow-batched, vocab broadcast as a closure dict), documents
    reassemble via equi-join + one ordered flatten."""
    if isinstance(vocab, DataFrame):
        rows = vocab.select("piece", "score").collect()
        scores = {r["piece"]: float(r["score"]) for r in rows}
    else:
        scores = {p: float(s) for p, s in vocab}
    max_len = max((len(p) for p in scores), default=1)

    pre = F.regexp_extract_all(
        F.col(text_col), F.lit(f"({textstats.BPE_ISH_PATTERN})"), 1
    )
    exploded = docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(pre).alias("i", "word")
    )
    words = exploded.select("word").distinct()

    @F.pandas_udf("array<string>")
    def seg(ws: pd.Series) -> pd.Series:
        cache: dict = {}
        out = []
        for w in ws:
            got = cache.get(w)
            if got is None:
                got = viterbi_word(w, scores, max_len)
                if got is None:
                    got = [UNK]
                cache[w] = got
            out.append(got)
        return pd.Series(out)

    table = words.select("word", seg(F.col("word")).alias("toks"))
    return (
        exploded.join(table, "word")
        .groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "toks"))),
                    lambda x: x["toks"],
                )
            ).alias("tokens")
        )
    )


def em_step(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """(piece, c, score): one hard-EM round — Viterbi-segment the
    corpus under `vocab`, count piece usage (word-count weighted),
    re-score round(ln(c'/C'), 6). Pieces the Viterbi never uses drop
    out (the pruning dynamic of the full unigram trainer). [UNK]
    emissions are counted like any piece, so coverage gaps surface in
    the output rather than vanishing."""
    rows = vocab.select("piece", "score").collect()
    scores = {r["piece"]: float(r["score"]) for r in rows}
    max_len = max((len(p) for p in scores), default=1)

    words = bpe.word_counts(docs, text_col)

    @F.pandas_udf("array<string>")
    def seg(ws: pd.Series) -> pd.Series:
        out = []
        for w in ws:
            got = viterbi_word(w, scores, max_len)
            out.append(got if got is not None else [UNK])
        return pd.Series(out)

    used = (
        words.select("cnt", F.explode(seg(F.col("word"))).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("cnt").cast("long").alias("c"))
    )
    tot = used.agg(F.sum("c").alias("_tot"))
    return used.crossJoin(F.broadcast(tot)).select(
        "piece",
        "c",
        F.round(
            F.log(F.col("c").cast("double") / F.col("_tot").cast("double")), 6
        ).alias("score"),
    )


__all__ = [
    "substring_counts",
    "seed_vocab",
    "viterbi_word",
    "encode_viterbi",
    "em_step",
]

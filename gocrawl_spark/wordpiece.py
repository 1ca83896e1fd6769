"""WordPiece tokenizer — likelihood-scored merges + BERT greedy encode.

The second of the two dominant subword families (Schuster & Nakajima
2012; Wu et al. 2016; the BERT tokenizer), next to bpe.py's
frequency-scored trainer. Two differences, both implemented exactly:

- TRAINING picks the adjacent pair maximizing the corpus-likelihood
  gain ``score(a,b) = count(ab) / (count(a) * count(b))`` rather than
  the raw pair count — rare-but-predictive pairs merge before frequent
  incidental ones. The rewrite step is byte-identical to BPE's
  (bpe.apply_merge), so the whole trainer reuses that machinery.
- ENCODING is greedy longest-match-first over the final piece vocab
  (BERT's WordPiece inference): repeatedly take the longest vocab
  piece prefixing the remainder; continuation pieces display with the
  ``##`` prefix; a word containing any unmatchable character encodes
  to ``[UNK]`` whole. This is deliberately NOT the training
  segmentation replay — greedy inference over the vocab is the
  algorithm BERT ships, and the two can differ.

Determinism: the score is a single IEEE division of exact BIGINTs
(both factors < 2^53, so the double is engine-identical); argmax ties
break on (score DESC, lft, rgt). The greedy matcher is a pure function
of (word, vocab). The DuckDB twins unroll the trainer exactly like the
BPE oracle and follow a precomputed longest-match jump table through a
recursive CTE.

Scale shape: identical to bpe.py — training state is O(distinct
words), one pair-count aggregation + one codegen'd rewrite per merge,
driver traffic is one scalar row per merge; at real vocab sizes use
:func:`train_state_batched` (the bpe.train_state_batched twin: top-B
mutually non-interacting pairs per sweep, one map-lookup rewrite —
~B× fewer sequential Spark jobs, sequential semantics preserved by
the disjointness rule, see its docstring); greedy encode runs once
per DISTINCT word (Arrow-batched, vocab broadcast as a closure set)
and documents reassemble by an equi-join, so the 100 TB corpus pays a
lookup join, not a per-token Python loop.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gocrawl_spark import bpe, textstats

UNK = "[UNK]"


def unary_counts(words: DataFrame) -> DataFrame:
    """(sym, c): corpus-wide occurrence count of each live symbol,
    weighted by word count — the denominator terms of the WordPiece
    score. One low-cardinality groupBy, folds map-side."""
    return (
        words.select(F.explode("syms").alias("sym"), "cnt")
        .groupBy("sym")
        .agg(F.sum("cnt").alias("c"))
    )


def pair_scores(words: DataFrame) -> DataFrame:
    """(lft, rgt, pair_count, score): every adjacent pair with its
    likelihood gain score = pair_count / (c_lft * c_rgt). The product
    stays exact in BIGINT and below 2^53, so the one double division
    is bit-identical across engines. Two joins against the tiny unary
    table (broadcast by AQE)."""
    pc = bpe.pair_counts(words)
    uc = unary_counts(words)
    return (
        pc.join(uc.select(F.col("sym").alias("lft"), F.col("c").alias("_cl")), "lft")
        .join(uc.select(F.col("sym").alias("rgt"), F.col("c").alias("_cr")), "rgt")
        .select(
            "lft",
            "rgt",
            F.col("c").alias("pair_count"),
            (
                F.col("c").cast("double")
                / (F.col("_cl") * F.col("_cr")).cast("double")
            ).alias("score"),
        )
    )


def train_state(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
) -> tuple[list[tuple[int, str, str, int, float]], DataFrame]:
    """Run the WordPiece trainer; returns (merges, final symbol table).
    merges = [(rank, lft, rgt, pair_count, score)] in merge order,
    argmax by (score DESC, lft, rgt). Same per-iteration plan as
    bpe.train_state (one aggregation + one codegen'd rewrite +
    localCheckpoint); only the ranking expression differs."""
    cur = bpe.init_symbols(bpe.word_counts(docs, text_col)).localCheckpoint()
    merges: list[tuple[int, str, str, int, float]] = []
    for rank in range(int(n_merges)):
        best = (
            pair_scores(cur)
            .orderBy(F.desc("score"), "lft", "rgt")
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b = best[0]["lft"], best[0]["rgt"]
        merges.append(
            (rank, a, b, int(best[0]["pair_count"]), float(best[0]["score"]))
        )
        cur = bpe.apply_merge(cur, a, b).localCheckpoint()
    return merges, cur


def train_state_batched(
    docs: DataFrame,
    n_merges: int = 8,
    batch: int = 8,
    text_col: str = "text",
    overfetch: int = 4,
) -> tuple[list[tuple[int, str, str, int, float]], DataFrame, int]:
    """Batched-sweep WordPiece trainer — the same driver-latency fix as
    :func:`bpe.train_state_batched`: each sweep scores pairs ONCE,
    pulls the top candidates, greedily selects ≤ ``batch`` mutually
    non-interacting pairs (``bpe.select_nonoverlapping`` — no symbol of
    one pick appears in another pick, nor any pick's merged output),
    and applies them in one map-lookup rewrite.

    The likelihood score survives batching under the SAME disjointness
    rule that makes counts safe for BPE: score(c,d) = count(cd) /
    (count(c)·count(d)), and merging (a,b) with {a,b,ab} ∩ {c,d,cd} = ∅
    changes neither the (c,d) adjacency count (fusing "a b" elsewhere
    can't create or destroy a "c d" adjacency) nor the unary counts of
    c or d (only a- and b-occurrences are consumed). So applying the
    batch in one rewrite is exactly the sequential application in rank
    order; across sweeps scores are recomputed from scratch. Recorded
    (pair_count, score) are the sweep-start values. Returns
    (merges, final symbol table, n_sweeps)."""
    cur = bpe.init_symbols(bpe.word_counts(docs, text_col)).localCheckpoint()
    merges: list[tuple[int, str, str, int, float]] = []
    sweeps = 0
    while len(merges) < int(n_merges):
        want = int(n_merges) - len(merges)
        take = min(int(batch), want)
        cand = (
            pair_scores(cur)
            .orderBy(F.desc("score"), "lft", "rgt")
            .limit(max(int(overfetch) * take, 16))
            .collect()
        )
        sweeps += 1
        if not cand:
            break
        picked = bpe.select_nonoverlapping(
            [
                (r["lft"], r["rgt"], (int(r["pair_count"]), float(r["score"])))
                for r in cand
            ],
            take,
        )
        for lft, rgt, (c, s) in picked:
            merges.append((len(merges), lft, rgt, c, s))
        cur = bpe.apply_merge_batch(
            cur, [(a, b) for a, b, _ in picked]
        ).localCheckpoint()
    return merges, cur, sweeps


def train_batched(
    docs: DataFrame,
    n_merges: int = 8,
    batch: int = 8,
    text_col: str = "text",
    overfetch: int = 4,
) -> DataFrame:
    """Batched-sweep variant of :func:`train` — same output schema
    (rank, lft, rgt, pair_count, score); see
    :func:`train_state_batched` for the semantics contract."""
    merges, symbols, _ = train_state_batched(
        docs, n_merges, batch, text_col, overfetch
    )
    symbols.unpersist()
    df = docs.sparkSession.createDataFrame(
        merges, "rank int, lft string, rgt string, pair_count long, score double"
    )
    return df.select(
        "rank", "lft", "rgt", "pair_count", F.round("score", 9).alias("score")
    )


def train(
    docs: DataFrame, n_merges: int = 8, text_col: str = "text"
) -> DataFrame:
    """(rank, lft, rgt, pair_count, score) merge list as a DataFrame;
    score rounded to 9 dp for cross-engine display stability (ranking
    happened on the raw double)."""
    merges, symbols = train_state(docs, n_merges, text_col)
    symbols.unpersist()
    df = docs.sparkSession.createDataFrame(
        merges, "rank int, lft string, rgt string, pair_count long, score double"
    )
    return df.select(
        "rank", "lft", "rgt", "pair_count", F.round("score", 9).alias("score")
    )


def vocab_pieces(
    docs: DataFrame,
    merges: list[tuple],
    text_col: str = "text",
) -> list[str]:
    """The encode vocabulary: every single character occurring in the
    corpus piece stream, plus one merged token per training step —
    chars stay in the vocab even when training merged them away
    everywhere (BERT vocabs keep all base units). Driver-side list:
    Heaps-law small (chars + n_merges entries)."""
    chars = (
        bpe.init_symbols(bpe.word_counts(docs, text_col))
        .select(F.explode("syms").alias("s"))
        .distinct()
        .collect()
    )
    out = sorted({r["s"] for r in chars} | {m[1] + m[2] for m in merges})
    return out


def segment_word(word: str, vocab: set, max_len: int) -> list[str]:
    """BERT greedy longest-match-first for one word: at each position
    take the LONGEST vocab piece prefixing the remainder; continuation
    pieces get the ``##`` display prefix; any unmatchable position
    collapses the whole word to [UNK]."""
    out: list[str] = []
    pos, n = 0, len(word)
    while pos < n:
        end = min(n, pos + max_len)
        hit = None
        for e in range(end, pos, -1):
            cand = word[pos:e]
            if cand in vocab:
                hit = cand
                break
        if hit is None:
            return [UNK]
        out.append(hit if pos == 0 else "##" + hit)
        pos += len(hit)
    return out


def segment_table(words: DataFrame, pieces: list[str]) -> DataFrame:
    """(word, toks): greedy WordPiece segmentation of each DISTINCT
    word in `words` — Arrow-batched pandas UDF with an LRU word cache,
    the vocab broadcast as a closure set. The matcher cost is paid
    once per distinct word regardless of corpus size."""
    vocab = set(pieces)
    max_len = max((len(p) for p in pieces), default=1)

    @F.pandas_udf("array<string>")
    def seg(ws: pd.Series) -> pd.Series:
        cache: dict = {}
        out = []
        for w in ws:
            got = cache.get(w)
            if got is None:
                got = segment_word(w, vocab, max_len)
                cache[w] = got
            out.append(got)
        return pd.Series(out)

    return words.select("word", seg(F.col("word")).alias("toks"))


def encode_greedy(
    docs: DataFrame,
    pieces: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, tokens array<string>): greedy WordPiece encode of every
    document. The matcher runs once per DISTINCT word (Arrow-batched
    pandas UDF, vocab broadcast as a closure set), documents reassemble
    via an equi-join + one per-doc ordered flatten — bpe.encode_corpus'
    plan with the segmentation swapped for the greedy matcher."""
    pre = F.regexp_extract_all(
        F.col(text_col), F.lit(f"({textstats.BPE_ISH_PATTERN})"), 1
    )
    exploded = docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(pre).alias("i", "word")
    )
    table = segment_table(exploded.select("word").distinct(), pieces)
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


def coverage(
    docs: DataFrame,
    pieces: list[str],
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-language coverage of a FIXED WordPiece vocabulary over a
    (possibly out-of-domain) corpus — the tokenizer-card audit a vocab
    trained on one language mix owes every other: (lang, n_words,
    n_unk_words, n_pieces, unk_rate, pieces_per_word). A word with any
    position unmatchable by the vocab encodes to [UNK] whole (BERT's
    rule) and counts one piece.

    Scale shape: same as encode_greedy — the matcher runs once per
    DISTINCT word, the (lang, word) stream joins the Heaps-small
    segmentation table (broadcast by AQE), and everything folds
    map-side to #langs rows. No per-doc reassembly at all."""
    pre = F.regexp_extract_all(
        F.col(text_col), F.lit(f"({textstats.BPE_ISH_PATTERN})"), 1
    )
    exploded = docs.select(
        F.col(lang_col).alias("lang"), F.explode(pre).alias("word")
    )
    table = segment_table(exploded.select("word").distinct(), pieces)
    unk = (F.col("toks") == F.array(F.lit(UNK))).cast("long")
    j = exploded.join(table, "word")
    return j.groupBy("lang").agg(
        F.count("*").alias("n_words"),
        F.sum(unk).alias("n_unk_words"),
        F.sum(F.size("toks").cast("long")).alias("n_pieces"),
        F.round(F.sum(unk) / F.count("*"), 6).alias("unk_rate"),
        F.round(
            F.sum(F.size("toks").cast("long")) / F.count("*"), 6
        ).alias("pieces_per_word"),
    )


_PAT = re.compile(textstats.BPE_ISH_PATTERN)

__all__ = [
    "unary_counts",
    "pair_scores",
    "train",
    "train_state",
    "vocab_pieces",
    "segment_word",
    "train_batched",
    "train_state_batched",
    "encode_greedy",
    "segment_table",
    "coverage",
    "UNK",
]

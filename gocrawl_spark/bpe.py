"""Distributed BPE tokenizer training over a document corpus.

The classic byte-pair-encoding trainer (Sennrich et al. 2016), shaped
for Spark: the corpus is first compressed to a (word, count) table —
the ONLY data-scale shuffle — and every merge iteration then runs on
that distinct-word table, which is orders of magnitude smaller than
the corpus (Heaps' law). Per iteration:

  1. pair counts: explode each word's adjacent symbol pairs weighted
     by the word count, one groupBy (map-side partial agg);
  2. argmax: TakeOrdered(1) by (count DESC, left, right) — a single
     scalar to the driver, never the table;
  3. merge: greedy left-to-right rewrite of every word's symbol array
     — a pure codegen'd `aggregate` lambda, no Python in the loop.

Scale shape: iteration cost is O(distinct words), independent of
corpus bytes after step 0; the word table persists across iterations
and the rewrite is shuffle-free. This mirrors how production BPE
trainers distribute (word-count compression first), not a toy
per-document scan.

``encode`` applies a learned merge table with the standard min-rank
loop as an Arrow-batched pandas UDF (the per-piece merge order is
data-dependent, so it is genuinely not expressible as a fixed-depth
column expression); the merge table is a tiny driver-side dict baked
into the UDF closure — the Spark analogue of a broadcast vocab.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gocrawl_spark import textstats


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt): pre-tokenizer pieces (textstats.BPE_ISH_PATTERN)
    counted corpus-wide — the Heaps-law compression every distributed
    BPE trainer starts from. Only ``text_col`` is scanned; document
    identity plays no part in the count contract."""
    pieces = F.regexp_extract_all(
        F.col(text_col), F.lit(f"({textstats.BPE_ISH_PATTERN})"), 1
    )
    return (
        docs.select(F.explode(pieces).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def init_symbols(words: DataFrame) -> DataFrame:
    """(word, syms, cnt): split each word into single-character
    symbols — the BPE base vocabulary."""
    return words.select(
        "word", F.split("word", "").alias("syms"), "cnt"
    )


def pair_counts(words: DataFrame) -> DataFrame:
    """(lft, rgt, c): adjacent-symbol pair counts weighted by word
    count. arrays_zip of the array against its own 1-shifted slice —
    all JVM-side, one aggregation shuffle."""
    n = F.size("syms")
    pairs = F.arrays_zip(
        F.slice("syms", 1, n - 1).alias("lft"),
        F.slice("syms", 2, n - 1).alias("rgt"),
    )
    return (
        words.filter(n >= 2)
        .select(F.explode(pairs).alias("p"), "cnt")
        .groupBy(F.col("p.lft").alias("lft"), F.col("p.rgt").alias("rgt"))
        .agg(F.sum("cnt").alias("c"))
    )


def apply_merge(words: DataFrame, a: str, b: str) -> DataFrame:
    """Greedy left-to-right merge of adjacent (a, b) in every word's
    symbol array, as one codegen'd `aggregate` fold: append each
    symbol unless the accumulator ends in `a` and the symbol is `b`,
    in which case replace the tail with the merged token. Overlapping
    runs (a == b) resolve left-to-right exactly like the sequential
    scan."""
    merged = F.lit(a + b)

    def step(acc, x):
        hit = (
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b))
            # a freshly-merged tail must not re-match as plain `a`
            # when a == b: the fold below never produces one equal to
            # `a` unless b == '' (impossible for char symbols)
        )
        return F.when(
            hit,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    syms = F.aggregate(
        "syms", F.array().cast("array<string>"), step
    )
    return words.select("word", syms.alias("syms"), "cnt")


def train(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Learn `n_merges` BPE merges; returns a DataFrame
    (rank, lft, rgt, pair_count) in merge order. Ties break
    deterministically by (count DESC, lft, rgt). Only one scalar row
    crosses to the driver per iteration."""
    merges, symbols = train_state(docs, n_merges, text_col)
    symbols.unpersist()
    return docs.sparkSession.createDataFrame(
        merges, "rank int, lft string, rgt string, pair_count long"
    )


def train_state(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Run the trainer and return (merges, final symbol table).
    The symbol table (word, syms, cnt) is the corpus vocabulary in its
    fully-merged state — the lookup table `encode_corpus` joins
    against."""
    cur = init_symbols(word_counts(docs, text_col)).persist()
    cur.count()
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(int(n_merges)):
        best = (
            pair_counts(cur)
            .orderBy(F.desc("c"), "lft", "rgt")
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, c = best[0]["lft"], best[0]["rgt"], int(best[0]["c"])
        merges.append((rank, a, b, c))
        nxt = apply_merge(cur, a, b).persist()
        nxt.count()
        cur.unpersist()
        cur = nxt
    return merges, cur


def vocab_ids(symbols: DataFrame) -> DataFrame:
    """(token, id): dense deterministic ids over the distinct tokens
    of a trained symbol table, ordered by token string — the vocab
    file of the trained tokenizer. Tiny by construction (base chars +
    one token per merge), so it broadcasts."""
    from pyspark.sql import Window

    toks = symbols.select(
        F.explode("syms").alias("token")
    ).distinct()
    w = Window.orderBy("token")
    return toks.select(
        "token", (F.row_number().over(w) - 1).cast("int").alias("id")
    )


def encode_corpus(
    docs: DataFrame,
    symbols: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, ids): encode the corpus by JOINING each document's
    pre-tokenizer pieces against the trained symbol table — for
    corpus text, BPE encode IS a vocabulary lookup (training already
    rewrote every distinct word to its final segmentation), so the
    100 TB plan is an equi-join + one per-doc reassembly shuffle, no
    merge loop anywhere near the data. Out-of-vocabulary text (a
    serving path, not a corpus pass) is what the pandas-UDF `encode`
    is for.

    Scale shape: the symbol table is Heaps-law small vs the corpus —
    Spark's AQE will broadcast it; token→id mapping uses the even
    smaller vocab as a literal map (chars + merges), keeping the
    whole plan codegen'd. Documents with zero pieces drop out (inner
    join), matching the SQL twin."""
    pieces = F.regexp_extract_all(
        F.col(text_col), F.lit(f"({textstats.BPE_ISH_PATTERN})"), 1
    )
    exploded = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(pieces).alias("i", "word"),
    )
    joined = exploded.join(symbols.select("word", "syms"), "word")
    toks = joined.groupBy("doc_id").agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "syms"))),
                lambda x: x["syms"],
            )
        ).alias("tokens")
    )
    vocab = {
        r["token"]: r["id"] for r in vocab_ids(symbols).collect()
    }
    vmap = F.map_from_entries(
        F.array(
            *[
                F.struct(F.lit(t).alias("k"), F.lit(i).alias("v"))
                for t, i in sorted(vocab.items())
            ]
        )
    )
    ids = F.transform("tokens", lambda t: F.element_at(vmap, t))
    return toks.select("doc_id", ids.alias("ids"))


def encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, tokens): encode each document with a learned merge
    list via the standard min-rank merge loop per pre-tokenizer
    piece. Arrow-batched pandas UDF with an LRU piece cache — the
    loop depth is data-dependent so a fixed column expression can't
    express it; the merge table is a small closure dict (broadcast
    semantics)."""
    ranks = {(a, b): i for i, (a, b) in enumerate(merges)}
    pat = re.compile(textstats.BPE_ISH_PATTERN)

    def bpe_word(word: str, cache: dict) -> list[str]:
        got = cache.get(word)
        if got is not None:
            return got
        syms = list(word)
        while len(syms) > 1:
            best_i, best_r = -1, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_r is None or r < best_r):
                    best_i, best_r = i, r
            if best_r is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        cache[word] = syms
        return syms

    @F.pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        cache: dict = {}
        out = []
        for t in texts:
            toks: list[str] = []
            for w in pat.findall(t or ""):
                toks.extend(bpe_word(w, cache))
            out.append(toks)
        return pd.Series(out)

    return docs.select(
        F.col(id_col).alias("doc_id"), enc(F.col(text_col)).alias("tokens")
    )


__all__ = [
    "word_counts",
    "init_symbols",
    "pair_counts",
    "apply_merge",
    "train",
    "train_state",
    "vocab_ids",
    "encode_corpus",
    "encode",
]

"""Distributed BPE trainer/encoder vs a pure-Python Sennrich replay."""

import re
from collections import Counter

import pytest

from gocrawl_spark import bpe, textstats

PAT = re.compile(textstats.BPE_ISH_PATTERN)


def _py_train(texts, n_merges):
    words = Counter()
    for t in texts:
        words.update(PAT.findall(t or ""))
    vocab = {w: list(w) for w in words}
    merges = []
    for rank in range(n_merges):
        pairs = Counter()
        for w, syms in vocab.items():
            c = words[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (a, b), c = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, a, b, c))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == a
                    and syms[i + 1] == b
                ):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(120)


def test_train_matches_python_replay(spark, docs):
    texts = [r["text"] for r in docs.select("text").collect()]
    want, vocab = _py_train(texts, 10)
    got = [
        (r["rank"], r["lft"], r["rgt"], r["pair_count"])
        for r in bpe.train(docs, n_merges=10).orderBy("rank").collect()
    ]
    assert got == want
    # the rewritten symbol tables agree too
    spark_vocab = {
        r["word"]: list(r["syms"])
        for r in _rewrite_all(docs, [(a, b) for _, a, b, _ in got]).collect()
    }
    assert spark_vocab == vocab


def _rewrite_all(docs, merges):
    words = bpe.init_symbols(bpe.word_counts(docs))
    for a, b in merges:
        words = bpe.apply_merge(words, a, b)
    return words


def test_apply_merge_overlapping_run(spark):
    df = spark.createDataFrame(
        [("aaa", ["a", "a", "a"], 1), ("abab", ["a", "b", "a", "b"], 1)],
        "word string, syms array<string>, cnt long",
    )
    got = {r["word"]: list(r["syms"])
           for r in bpe.apply_merge(df, "a", "a").collect()}
    assert got["aaa"] == ["aa", "a"]
    assert got["abab"] == ["a", "b", "a", "b"]
    got2 = {r["word"]: list(r["syms"])
            for r in bpe.apply_merge(df, "a", "b").collect()}
    assert got2["abab"] == ["ab", "ab"]


def test_encode_corpus_join_equals_merge_loop(spark, docs):
    merges_full, symbols = bpe.train_state(docs, n_merges=10)
    merges = [(a, b) for _, a, b, _ in merges_full]
    vocab = {r["token"]: r["id"]
             for r in bpe.vocab_ids(symbols).collect()}
    got = {r["doc_id"]: list(r["ids"])
           for r in bpe.encode_corpus(docs, symbols).collect()}
    loop = {r["doc_id"]: [vocab[t] for t in r["tokens"]]
            for r in bpe.encode(docs, merges).collect()
            if r["tokens"]}
    assert got == loop
    # vocab ids are dense 0..|V|-1 in token order
    assert sorted(vocab.values()) == list(range(len(vocab)))
    assert [t for t, _ in sorted(vocab.items(), key=lambda kv: kv[1])] \
        == sorted(vocab)


def test_encode_roundtrip_and_merge_respect(spark, docs):
    texts = [r["text"] for r in docs.select("text").collect()]
    merges_full, _ = _py_train(texts, 10)
    merges = [(a, b) for _, a, b, _ in merges_full]
    enc = {r["doc_id"]: list(r["tokens"])
           for r in bpe.encode(docs, merges).collect()}
    for r in docs.select("doc_id", "text").collect():
        toks = enc[r["doc_id"]]
        # lossless: concatenated tokens rebuild the piece stream
        assert "".join(toks) == "".join(PAT.findall(r["text"] or ""))
    # every emitted token is a char or derivable from the merge list
    derivable = {a + b for a, b in merges}
    for toks in enc.values():
        for t in toks:
            assert len(t) == 1 or t in derivable

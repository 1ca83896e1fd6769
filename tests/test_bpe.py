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


def test_select_nonoverlapping_greedy_rules():
    ranked = [
        ("a", "b", 9),   # pick
        ("b", "c", 8),   # skip: shares 'b'
        ("c", "d", 7),   # pick
        ("ab", "x", 6),  # skip: 'ab' is pick 1's merged output
        ("e", "f", 5),   # pick
        ("g", "h", 4),   # over the batch cap
    ]
    assert bpe.select_nonoverlapping(ranked, 3) == [
        ("a", "b", 9), ("c", "d", 7), ("e", "f", 5)
    ]
    # batch=1 degenerates to plain argmax
    assert bpe.select_nonoverlapping(ranked, 1) == [("a", "b", 9)]
    assert bpe.select_nonoverlapping([], 4) == []
    # a later pair whose merged output equals an earlier INPUT is skipped
    assert bpe.select_nonoverlapping(
        [("ab", "c", 9), ("a", "b", 8), ("x", "y", 7)], 3
    ) == [("ab", "c", 9), ("x", "y", 7)]


def test_apply_merge_batch_equals_sequential(spark):
    rows = [
        ("abcd", ["a", "b", "c", "d"], 3),  # picks adjacent in one word
        ("dcba", ["d", "c", "b", "a"], 2),
        ("aab", ["a", "a", "b"], 5),
        ("aaa", ["a", "a", "a"], 1),        # overlapping run, a==a pair
        ("cdcd", ["c", "d", "c", "d"], 4),
        ("xyz", ["x", "y", "z"], 1),        # untouched
    ]
    df = spark.createDataFrame(
        rows, "word string, syms array<string>, cnt long"
    )
    for pairs in ([("a", "b"), ("c", "d")], [("a", "a"), ("c", "d")]):
        batched = {r["word"]: list(r["syms"])
                   for r in bpe.apply_merge_batch(df, pairs).collect()}
        seq = df
        for a, b in pairs:
            seq = bpe.apply_merge(seq, a, b)
        sequential = {r["word"]: list(r["syms"]) for r in seq.collect()}
        assert batched == sequential, pairs
        # non-interacting merges commute: reversed order agrees too
        rev = df
        for a, b in reversed(pairs):
            rev = bpe.apply_merge(rev, a, b)
        assert {r["word"]: list(r["syms"]) for r in rev.collect()} \
            == sequential
    assert bpe.apply_merge_batch(df, []) is df


def test_train_batched_equals_sequential_disjoint_corpus(spark):
    # disjoint alphabets per word: no two top pairs can interact, so
    # one batched sweep must reproduce the sequential merge list
    # EXACTLY, pair_counts included (non-interacting merges leave each
    # other's counts invariant).
    texts = ["ab " * 7 + "cd " * 4 + "ef " * 3, "ab cd ef gh ij"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    want = [
        (r["rank"], r["lft"], r["rgt"], r["pair_count"])
        for r in bpe.train(docs, n_merges=5).orderBy("rank").collect()
    ]
    merges, syms, sweeps = bpe.train_state_batched(docs, n_merges=5, batch=5)
    syms.unpersist()
    assert merges == want
    assert sweeps == 1  # 5 merges, ONE pair-count job + ONE rewrite


def test_train_batched_batch1_is_sequential_on_real_docs(spark, docs):
    want_merges, want_syms = bpe.train_state(docs, n_merges=6)
    got_merges, got_syms, sweeps = bpe.train_state_batched(
        docs, n_merges=6, batch=1
    )
    assert got_merges == want_merges
    assert sweeps == 6
    a = {r["word"]: list(r["syms"]) for r in want_syms.collect()}
    b = {r["word"]: list(r["syms"]) for r in got_syms.collect()}
    want_syms.unpersist()
    got_syms.unpersist()
    assert a == b


def test_train_batched_fewer_driver_roundtrips(spark, docs):
    # the point of batching: >=5x fewer sweeps (driver round-trips)
    # than sequential for a 32-merge budget on real text
    merges, syms, sweeps = bpe.train_state_batched(
        docs, n_merges=32, batch=16, overfetch=8
    )
    syms.unpersist()
    assert len(merges) == 32
    assert sweeps * 5 <= 32, sweeps
    # ranks dense, merged tokens well-formed
    assert [m[0] for m in merges] == list(range(32))
    assert all(m[3] > 0 for m in merges)


# ---------------------------------------------------------------- wordpiece


def _py_wp_train(texts, n_merges):
    """Pure-Python WordPiece replay: likelihood argmax, same rewrite."""
    words = Counter()
    for t in texts:
        words.update(PAT.findall(t or ""))
    vocab = {w: list(w) for w in words}
    merges = []
    for rank in range(n_merges):
        pairs, unary = Counter(), Counter()
        for w, syms in vocab.items():
            c = words[w]
            for s in syms:
                unary[s] += c
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (a, b), c = min(
            pairs.items(),
            key=lambda kv: (
                -(kv[1] / (unary[kv[0][0]] * unary[kv[0][1]])),
                kv[0][0], kv[0][1],
            ),
        )
        merges.append((rank, a, b, c))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def test_wp_train_matches_python_replay(spark, docs):
    from gocrawl_spark import wordpiece as wp

    texts = [r["text"] for r in docs.select("text").collect()]
    expect = _py_wp_train(texts, 6)
    got = [(r["rank"], r["lft"], r["rgt"], r["pair_count"])
           for r in wp.train(docs, 6).collect()]
    assert got == expect


def test_wp_likelihood_beats_frequency(spark):
    """(q,u) is the rarest pair but q and u occur ONLY together ->
    score = 1/(1*1) = 1 beats the frequent-but-promiscuous (a,b)
    (3/25); plain BPE picks (a,b) by raw count."""
    from gocrawl_spark import wordpiece as wp

    rows = [(1, "aba bab ab ba qu")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    wp_first = wp.train(df, 1).collect()[0]
    assert (wp_first["lft"], wp_first["rgt"]) == ("q", "u")
    assert wp_first["score"] == 1.0
    bpe_first = bpe.train(df, 1).collect()[0]
    assert (bpe_first["lft"], bpe_first["rgt"]) == ("a", "b")


def test_wp_train_batched_equals_sequential_disjoint_corpus(spark):
    # disjoint alphabets per word (same corpus shape as the BPE twin):
    # no two top pairs share a symbol, so one batched sweep must
    # reproduce the sequential merge list EXACTLY — scores included
    # (merging (a,b) leaves both the adjacency count and the unary
    # counts of every symbol-disjoint pair invariant).
    from gocrawl_spark import wordpiece as wp

    texts = ["ab " * 7 + "cd " * 4 + "ef " * 3, "ab cd ef gh ij"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    want = [
        (r["rank"], r["lft"], r["rgt"], r["pair_count"], r["score"])
        for r in wp.train(docs, n_merges=5).orderBy("rank").collect()
    ]
    merges, syms, sweeps = wp.train_state_batched(docs, n_merges=5, batch=5)
    syms.unpersist()
    got = [(r, a, b, c, round(s, 9)) for r, a, b, c, s in merges]
    assert got == want
    assert sweeps == 1  # 5 merges, ONE pair-score job + ONE rewrite


def test_wp_train_batched_batch1_is_sequential_on_real_docs(spark, docs):
    from gocrawl_spark import wordpiece as wp

    want_merges, want_syms = wp.train_state(docs, n_merges=6)
    got_merges, got_syms, sweeps = wp.train_state_batched(
        docs, n_merges=6, batch=1
    )
    want_syms.unpersist()
    got_syms.unpersist()
    assert got_merges == want_merges
    assert sweeps >= 6


def test_wp_train_batched_fewer_driver_roundtrips(spark, docs):
    from gocrawl_spark import wordpiece as wp

    merges, syms, sweeps = wp.train_state_batched(
        docs, n_merges=32, batch=16, overfetch=8
    )
    syms.unpersist()
    assert len(merges) == 32
    assert sweeps <= 6  # >=5x fewer sweeps than the 32 sequential jobs
    # every sweep's picks are internally non-interacting
    assert len({(m[1], m[2]) for m in merges}) == 32


def test_wp_greedy_encode_prefix_unk_and_divergence(spark):
    from gocrawl_spark import wordpiece as wp

    # vocab crafted so greedy inference DIFFERS from any merge replay:
    # 'abc' matched whole even though training merged nothing
    pieces = ["a", "b", "c", "ab", "abc", "bc"]
    assert wp.segment_word("abcbc", set(pieces), 3) == ["abc", "##bc"]
    assert wp.segment_word("abab", set(pieces), 3) == ["ab", "##ab"]
    assert wp.segment_word("axb", set(pieces), 3) == [wp.UNK]

    docs = spark.createDataFrame(
        [(1, "abcbc axb"), (2, "")], "doc_id long, text string")
    got = {r["doc_id"]: r["tokens"]
           for r in wp.encode_greedy(docs, pieces).collect()}
    assert got == {1: ["abc", "##bc", wp.UNK]}  # empty doc drops

    # determinism across parallelism
    big = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(80)
    merges, _ = wp.train_state(big, 4)
    vv = wp.vocab_pieces(big, merges)
    a = sorted(map(tuple, wp.encode_greedy(big.repartition(1), vv).collect()))
    b = sorted(map(tuple, wp.encode_greedy(big.repartition(8), vv).collect()))
    assert a == b


def test_unigram_viterbi_word_semantics():
    """Max-score segmentation wins; exact ties prefer the longer FINAL
    piece; uncoverable words return None."""
    from gocrawl_spark.unigram import viterbi_word

    scores = {"a": -2.0, "b": -2.0, "ab": -1.5, "abab": -3.0}
    # 'abab': ab+ab = -3.0 equals abab = -3.0 -> tie; a+b+ab etc. worse.
    # longer final piece wins the tie: the single piece 'abab'
    assert viterbi_word("abab", scores, 4) == ["abab"]
    # clear max-score case: ab+ab (-3.0) beats a+b+a+b (-8.0)
    assert viterbi_word("ab", scores, 4) == ["ab"]
    # tie inside a longer word: 'ababab' -> ab+abab vs abab+ab vs ab*3
    # (-4.5): ab+abab and abab+ab tie at -4.5 w/ ab*3; longest final
    # piece wins -> ab + abab
    assert viterbi_word("ababab", scores, 4) == ["ab", "abab"]
    # unknown character -> None (caller emits [UNK])
    assert viterbi_word("abz", scores, 4) is None


def test_unigram_seed_and_em(spark):
    """Seed vocab keeps every single char, cuts multis at vocab_size;
    one EM step drops never-used pieces and re-normalizes scores."""
    import math

    from gocrawl_spark import unigram as ug

    docs = spark.createDataFrame(
        [(0, "abab ab cdx"), (1, "ababab cdcdx abc"), (2, "ab abab cdx bcd")],
        "doc_id long, text string",
    )
    vocab = ug.seed_vocab(docs, vocab_size=12, max_piece_len=4)
    rows = {r["piece"]: (r["c"], r["score"]) for r in vocab.collect()}
    assert len(rows) == 12
    for ch in "abcdx":
        assert ch in rows
    total = sum(c for c, _ in rows.values())
    c_ab = rows["ab"][0]
    assert abs(rows["ab"][1] - round(math.log(c_ab / total), 6)) < 1e-9
    em = {r["piece"]: r["c"] for r in ug.em_step(docs, vocab).collect()}
    # Viterbi never emits single 'a' or 'd' under these scores
    assert "a" not in em and "d" not in em
    assert em["ab"] > 0 and em["cdx"] > 0


def test_wp_coverage_unk_and_fertility(spark):
    from gocrawl_spark import wordpiece as wp

    train = spark.createDataFrame(
        [(1, "abc abc ab")], "doc_id long, text string"
    )
    merges, _ = wp.train_state(train, 2)
    pieces = wp.vocab_pieces(train, merges)
    corpus = spark.createDataFrame(
        [
            (1, "en", "abc ab a"),
            (2, "zz", "xyz abc"),  # 'xyz' has chars outside the vocab
        ],
        "doc_id long, lang string, text string",
    )
    got = {r["lang"]: r for r in wp.coverage(corpus, pieces).collect()}
    en, zz = got["en"], got["zz"]
    assert (en["n_words"], en["n_unk_words"]) == (3, 0)
    assert en["unk_rate"] == 0.0
    # zz: 'xyz' -> [UNK] (one piece), 'abc' segments normally
    assert (zz["n_words"], zz["n_unk_words"]) == (2, 1)
    assert zz["unk_rate"] == 0.5
    for r in (en, zz):
        assert r["pieces_per_word"] == round(r["n_pieces"] / r["n_words"], 6)

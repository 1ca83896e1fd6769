"""Training-data-pipeline operators: textstats, dedup, similarity,
search, multimodal. Small deterministic inputs; semantic assertions
(the engine-vs-DuckDB hash equivalence is covered by the driver gate
and tools/compare_oracle.py)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from gocrawl_spark import dedup, multimodal, search, similarity, textstats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "The quick brown fox jumps over the lazy dog near the river bank today", "en"),
        (2, "quick brown fox jumps over the lazy dog near the river bank today", "en"),  # near-dup of 1
        (3, "der hund und die katze sind nicht mit dem vogel ein team", "de"),
        (4, "le chat est dans la maison et les oiseaux sont pour dans", "fr"),
        (5, "completely different text about spark query engines and shuffles", "en"),
        (6, "The quick brown fox jumps over the lazy dog near the river bank today", "en"),  # exact dup of 1
        (7, "", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


# ---------------------------------------------------------------- textstats


def test_token_counts(spark, docs):
    out = {
        r["doc_id"]: (r["n"], r["b"])
        for r in docs.select(
            "doc_id",
            textstats.token_count("text").alias("n"),
            textstats.bpeish_count("text").alias("b"),
        ).collect()
    }
    assert out[1][0] == 14
    assert out[7] == (0, 0)
    # bpe-ish counts punctuation-free words identically here
    assert out[5][0] == 9


def test_quality_score_bounds_and_ordering(spark, docs):
    rows = {
        r["doc_id"]: r["q"]
        for r in docs.select("doc_id", textstats.quality_score("text").alias("q")).collect()
    }
    assert all(0.0 <= v <= 1.0 for v in rows.values())
    assert rows[7] == pytest.approx(0.2)  # empty: only the punct term
    assert rows[1] > rows[7]


def test_predict_lang_markers(spark, docs):
    rows = {
        r["doc_id"]: r["p"]
        for r in docs.select("doc_id", textstats.predict_lang("text").alias("p")).collect()
    }
    assert rows[1] == "en"
    assert rows[3] == "de"
    assert rows[4] == "fr"
    assert rows[7] == "und"


def test_shingles_and_fingerprint(spark):
    df = spark.createDataFrame([(1, "a b c d e f"), (2, "a b")], "id long, text string")
    sh = {
        r["id"]: r["s"]
        for r in df.select("id", textstats.shingles("text", 5).alias("s")).collect()
    }
    assert sh[1] == ["a b c d e", "b c d e f"]
    assert sh[2] == ["a b"]  # shorter than k → one whole-doc shingle
    fp = {
        r["id"]: r["f"]
        for r in df.select("id", textstats.fingerprint("text", 5).alias("f")).collect()
    }
    assert fp[1] == min(
        hashlib.md5(b"a b c d e").hexdigest(), hashlib.md5(b"b c d e f").hexdigest()
    )


# ------------------------------------------------------------------- dedup


def test_redact_pii(spark):
    rows = [
        (1, "Mail bob.smith+x@corp.example.co.uk or call +1 (555) 010-1234 now"),
        (2, "server at 192.168.0.17 responded"),
        (3, "no pii in this sentence at all"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    c = textstats.pii_counts("text")
    got = {
        r["id"]: r
        for r in df.select(
            "id",
            textstats.redact_pii("text").alias("red"),
            c["email"].alias("e"), c["ip"].alias("i"), c["phone"].alias("p"),
        ).collect()
    }
    assert got[1]["red"] == "Mail <EMAIL> or call <PHONE> now"
    assert (got[1]["e"], got[1]["p"]) == (1, 1)
    assert got[2]["red"] == "server at <IP> responded"
    assert got[2]["i"] == 1
    assert got[3]["red"] == rows[2][1] and got[3]["e"] == got[3]["i"] == got[3]["p"] == 0


def test_gopher_gate(spark):
    long_good = " ".join(f"word{i}" for i in range(60))
    symbol_soup = " ".join("!!;;..,," for _ in range(60))
    rows = [(1, long_good), (2, "too short"), (3, symbol_soup)]
    df = spark.createDataFrame(rows, "id long, text string")
    st = textstats.gopher_stats("text")
    got = {
        r["id"]: r
        for r in df.select(
            "id", st["n_words"].alias("n"), st["frac_alpha"].alias("fa"),
            textstats.gopher_keep(st).alias("keep"),
        ).collect()
    }
    assert got[1]["keep"] is True and got[1]["n"] == 60
    assert got[2]["keep"] is False  # below min_words
    assert got[3]["keep"] is False and got[3]["fa"] == 0.0  # symbol soup


def test_compression_ratio_gate(spark):
    import random

    random.seed(7)
    prose = ("The committee reviewed seventeen distinct proposals before "
             "narrowing the field to a shortlist of three candidates.")
    boiler = "spam " * 200
    # random CJK codepoints: near-incompressible multi-byte UTF-8
    noise = "".join(chr(random.randint(0x4E00, 0x9FFF)) for _ in range(40))
    rows = [(1, prose), (2, boiler), (3, noise), (4, "")]
    df = spark.createDataFrame(rows, "id long, text string")
    r = textstats.compression_ratio_udf()
    got = {
        x["id"]: x
        for x in df.select(
            "id",
            r("text").alias("ratio"),
        ).withColumn(
            "keep", textstats.compression_keep(F.col("ratio"))
        ).collect()
    }
    assert got[2]["ratio"] < 0.25 and got[2]["keep"] is False  # boilerplate
    assert got[3]["ratio"] > 0.95 and got[3]["keep"] is False  # noise
    assert got[1]["keep"] is True  # prose sits between
    assert got[4]["ratio"] is None  # empty → NULL
    # deterministic across runs/parallelism (None sorts first)
    a = df.select(r("text").alias("x")).collect()
    b = df.repartition(4).select(r("text").alias("x")).collect()
    assert sorted((row["x"] for row in a), key=lambda v: (v is not None, v or 0)) == \
           sorted((row["x"] for row in b), key=lambda v: (v is not None, v or 0))


def test_repetition_stats(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta"),
        (2, "spam spam spam spam spam spam spam"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in textstats.repetition_stats(df, k=2).collect()}
    assert got[2]["top_ngram_frac"] == 1.0  # every 2-gram is "spam spam"
    assert got[1]["top_ngram_frac"] < 0.3
    assert got[1]["distinct_frac"] == 1.0  # all 2-grams unique


def test_c4_clean_rules(spark):
    """Each published C4 rule kills exactly its target: no terminal
    punctuation, <5 words, 'javascript' (line level); 'lorem ipsum',
    '{', <3 sentences after cleaning (page level)."""
    good = ("One good sentence sits right here today.\n"
            "Another good sentence lands right here now!\n"
            "A third good sentence closes the page out.")
    rows = [
        (1, good),
        (2, good + "\nno terminal punctuation on this line"),
        (3, good + "\nEnable javascript to view this page now."),
        (4, good + "\nShort line."),
        (5, good + "\nlorem ipsum dolor sit amet consectetur adipiscing."),
        (6, good + "\nconst x = {a: 1};"),
        (7, "Only two sentences survive in this page body.\n"
            "The second good sentence lands right here now!"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    st = textstats.c4_clean("text")
    got = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", st["text"].alias("clean"),
            st["n_lines"].alias("n_lines"), st["n_kept"].alias("n_kept"),
            textstats.c4_page_keep("text", st["text"]).alias("keep"),
        ).collect()
    }
    assert got[1]["n_kept"] == 3 and got[1]["keep"] is True
    assert got[1]["clean"] == good
    # line rules: the extra line dies, the three good ones survive
    for i in (2, 3, 4):
        assert got[i]["n_lines"] == 4 and got[i]["n_kept"] == 3
        assert got[i]["keep"] is True
    # page rules: lorem-ipsum / brace kill kept pages; <3 sentences too
    assert got[5]["n_kept"] == 4 and got[5]["keep"] is False
    assert got[6]["keep"] is False
    assert got[7]["n_kept"] == 2 and got[7]["keep"] is False


def test_line_dedup_drops_cross_document_boilerplate(spark):
    docs = spark.createDataFrame(
        [(1, "unique opening line\nCopyright Example Corp.\nbody text alpha"),
         (2, "Copyright  example corp.\nbody text beta\nSubscribe now!"),
         (3, "Subscribe now!\nCopyright Example Corp."),
         (4, "all mine\nonly here")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in dedup.line_dedup(docs).collect()}
    # normalization (case + whitespace squeeze) unifies the copyright
    # variants; both boilerplate lines span >=2 docs and die everywhere
    assert got[1]["text"] == "unique opening line\nbody text alpha"
    assert got[2]["text"] == "body text beta"
    assert got[3]["text"] == "" and got[3]["n_kept"] == 0
    assert got[3]["n_lines"] == 2
    # a doc with no shared lines is untouched
    assert got[4]["text"] == "all mine\nonly here" and got[4]["n_kept"] == 2


def test_contamination_ngram_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta")],
        "bench_id long, bench_text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "intro words then alpha beta gamma delta epsilon zeta eta theta verbatim"),
            (2, "alpha beta gamma but the rest diverges entirely from the benchmark item"),
        ],
        "doc_id long, text string",
    )
    got = dedup.contamination(docs, bench, k=8).collect()
    assert [(r["doc_id"], r["bench_id"]) for r in got] == [(1, 100)]
    assert got[0]["n_hits"] == 1  # the single verbatim 8-gram


def test_exact_dedup(spark, docs):
    groups = dedup.exact_dup_groups(docs).collect()
    assert len(groups) == 1
    assert groups[0]["n_docs"] == 2
    assert groups[0]["canonical_id"] == 1
    survivors = {r["doc_id"] for r in dedup.exact_dedup(docs).collect()}
    assert 1 in survivors and 6 not in survivors
    assert len(survivors) == 6


def test_minhash_udf_matches_expression(spark, docs):
    expr = docs.select(
        "doc_id", dedup.minhash_signature("text", 8, 3).alias("sig")
    ).collect()
    udf = docs.select(
        "doc_id", dedup.minhash_signature_udf(8, 3)(F.col("text")).alias("sig")
    ).collect()
    assert {r["doc_id"]: r["sig"] for r in expr} == {r["doc_id"]: r["sig"] for r in udf}


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in dedup.minhash_pairs(docs, threshold=0.4).collect()
    }
    assert (1, 6) in pairs and pairs[(1, 6)] == 1.0  # exact dup
    assert (1, 2) in pairs  # near dup (first word dropped)
    assert all(a < b for a, b in pairs)


def test_ngram_jaccard(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, k=3, threshold=0.5).collect()
    }
    assert pairs[(1, 6)] == 1.0
    assert 0.5 <= pairs[(1, 2)] < 1.0
    assert (1, 5) not in pairs


def test_simhash_near_dups(spark, docs):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in dedup.simhash_pairs(docs).collect()}
    assert pairs[(1, 6)] == 0  # identical text → identical simhash
    assert (1, 2) in pairs  # one-word edit → tiny hamming distance
    assert (1, 5) not in pairs


# -------------------------------------------------------------- similarity


@pytest.fixture(scope="module")
def vectors(spark):
    import math

    rows = []
    for i in range(40):
        angle = (i % 8) * math.pi / 16  # 8 directions, 5 vectors each
        rows.append((i, [math.cos(angle), math.sin(angle), float(i % 3) * 0.01, 0.5]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_topk_self_similarity(spark, vectors):
    out = similarity.brute_topk(vectors, vectors.filter(F.col("vec_id") == 0), k=5).collect()
    assert len(out) == 5
    assert [r["rank"] for r in out] == [1, 2, 3, 4, 5]
    # nearest neighbors of direction-0 vectors are other direction-0 vectors
    top = out[0]
    assert top["neighbor_id"] % 8 in (0, 1)
    assert all(0 <= r["score"] <= 1.0 for r in out)


def test_ivf_matches_brute_on_probed_cells(spark, vectors):
    qs = vectors.filter(F.col("vec_id") < 3)
    brute = similarity.brute_topk(vectors, qs, k=3).collect()
    ivf = similarity.ivf_topk(vectors, qs, k=3, n_centroids=8, nprobe=8).collect()
    # nprobe == n_centroids → IVF degenerates to exact search
    key = lambda rows: {(r["query_id"], r["rank"]): r["neighbor_id"] for r in rows}
    assert key(brute) == key(ivf)


def test_cosine_dup_pairs(spark, vectors):
    pairs = similarity.cosine_dup_pairs(vectors, threshold=0.999).collect()
    assert pairs  # same-direction same-i%3 vectors are near-identical
    assert all(r["id_a"] < r["id_b"] for r in pairs)


def test_pq_codebook_rows_encode_to_themselves(spark):
    # distinct sub-vectors per row — row c is at L2 distance 0 from
    # codebook entry c in every subspace, so it must encode to [c]*m
    rows = [(i, [float(i), 10.0 + i, 20.0 + i, 30.0 + i]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cb = similarity.pq_codebooks(df, m=4, ksub=4)
    assert len(cb) == 4 and len(cb[0]) == 4
    codes = {r["vec_id"]: list(r["codes"]) for r in similarity.pq_encode(df, cb).collect()}
    for c in range(4):
        assert codes[c] == [c, c, c, c]
    # a tied subspace (identical entries) resolves to the LOWEST entry
    tied = [(i, [0.5, float(i)]) for i in range(4)]
    tdf = spark.createDataFrame(tied, "vec_id long, embedding array<float>")
    tcb = similarity.pq_codebooks(tdf, m=2, ksub=3)
    tcodes = {r["vec_id"]: list(r["codes"]) for r in similarity.pq_encode(tdf, tcb).collect()}
    assert all(cs[0] == 0 for cs in tcodes.values())  # constant dim ties → 0


def test_pq_topk_approximates_brute(spark, vectors):
    cb = similarity.pq_codebooks(vectors, m=4, ksub=8)
    queries = vectors.filter("vec_id < 3")
    pq = similarity.pq_topk(vectors, queries, cb, k=10)
    brute = similarity.brute_topk(vectors, queries, k=10)
    pq_sets = {
        q: {r["neighbor_id"] for r in rows}
        for q, rows in _group(pq.collect(), "query_id").items()
    }
    brute_sets = {
        q: {r["neighbor_id"] for r in rows}
        for q, rows in _group(brute.collect(), "query_id").items()
    }
    # quantized distance is approximate; require nonempty overlap per
    # query (deterministic — this pins the pipeline, not a recall SLA)
    for q in brute_sets:
        assert pq_sets[q] & brute_sets[q]
    # and the ADC score of a vector against itself-as-code is minimal:
    # every query's own codebook-coded form scores 0 against... itself
    # is excluded; instead check scores are non-negative and sorted
    for q, rows in _group(pq.collect(), "query_id").items():
        scores = [r["score"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert all(s >= 0 for s in scores) and scores == sorted(scores)


def _group(rows, key):
    out = {}
    for r in rows:
        out.setdefault(r[key], []).append(r)
    return out


def test_lsh_topk_recall(spark, vectors):
    qs = vectors.filter(F.col("vec_id") == 0)
    out = similarity.lsh_topk(vectors, qs, k=5, dim=4, n_planes=2).collect()
    assert out, "bucketed search should find same-direction collisions"
    assert all(r["query_id"] == 0 for r in out)


def test_blocked_dup_pairs_subset_of_exact_and_no_cartesian(spark, vectors):
    """The blocked near-dup path must (a) return a subset of the exact
    all-pairs result with identical scores, (b) find the trivial
    same-direction duplicates, and (c) contain no nested-loop/cartesian
    join in its physical plan — the round-1 review flagged the exact
    form being wired as the operator."""
    blocked_df = similarity.blocked_dup_pairs(
        vectors, threshold=0.999, bands=4, planes_per_band=2, dim=4
    )
    exact = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in similarity.cosine_dup_pairs(vectors, threshold=0.999).collect()
    }
    blocked = {(r["id_a"], r["id_b"]): r["score"] for r in blocked_df.collect()}
    assert blocked, "banded LSH should recover near-identical pairs"
    assert set(blocked) <= set(exact)
    assert all(exact[k] == v for k, v in blocked.items())
    plan = blocked_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_rademacher_planes_deterministic():
    import hashlib

    m = similarity.rademacher_planes(4, 3)
    assert m.shape == (4, 3)
    assert set(m.flatten().tolist()) <= {1.0, -1.0}
    bit = int(hashlib.md5(b"2#3").hexdigest()[0], 16) & 1
    assert m[3, 2] == (1.0 if bit else -1.0)


# ------------------------------------------------------------------ search


def test_temperature_weights_flattens_head(spark):
    from gocrawl_spark import curation

    # en: 2 docs x 8 tokens = 16; de: 1 doc x 4 tokens
    rows = [(1, "a b c d e f g h", "en"), (2, "a b c d e f g h", "en"),
            (3, "a b c d", "de")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r["stratum"]: r for r in curation.temperature_weights(
        df, tau=0.5, by="lang", budget_tokens=100).collect()}
    import math
    pw_en, pw_de = math.sqrt(16.0), math.sqrt(4.0)
    tot = pw_en + pw_de
    assert got["en"]["weight"] == round(pw_en / tot, 6)
    assert got["de"]["weight"] == round(pw_de / tot, 6)
    assert got["de"]["sample_epochs"] == round(
        round(pw_de / tot, 6) * 100.0 / 4, 6)
    # τ<1 up-samples the tail: de's share (1/3) beats its raw token
    # share (4/20); τ=1 reproduces raw shares
    assert got["de"]["weight"] > 4 / 20
    raw = {r["stratum"]: r["weight"] for r in curation.temperature_weights(
        df, tau=1.0, by="lang").collect()}
    assert raw["en"] == round(16 / 20, 6) and raw["de"] == round(4 / 20, 6)


def test_project_embeddings_jl_preserves_similarity(spark):
    """JL contract: 64→16 md5-Rademacher projection keeps pairwise
    cosine structure (Achlioptas 2003) — loose absolute error on
    average, strong rank correlation; and the fold is the replayable
    sequential sum of vec·plane/√k."""
    import numpy as np

    from gocrawl_spark import similarity

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").limit(60)
    orig = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    proj = {r["id"]: np.array(r["proj"], dtype=np.float64)
            for r in similarity.project_embeddings(emb, out_dim=16).collect()}
    # replay one row exactly
    planes = similarity.rademacher_planes(64, 16)
    vid = sorted(orig)[0]
    want = []
    for j in range(16):
        s = 0.0
        for i in range(64):
            s += orig[vid][i] * planes[i, j]
        want.append(round(s / 4.0, 6))
    assert proj[vid].tolist() == want

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    ids = sorted(orig)[:40]
    pairs = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1:i + 4]]
    co = np.array([cos(orig[a], orig[b]) for a, b in pairs])

    def err(k):
        pk = {r["id"]: np.array(r["proj"], dtype=np.float64)
              for r in similarity.project_embeddings(
                  emb, out_dim=k).collect()}
        ck = np.array([cos(pk[a], pk[b]) for a, b in pairs])
        return float(np.mean(np.abs(co - ck)))

    # JL: distortion shrinks ~1/sqrt(k); near-orthogonal synthetic
    # vectors sit at the worst case, so bound loosely and pin the
    # monotone improvement instead
    e8, e32 = err(8), err(32)
    assert e32 < e8
    assert e32 < 0.35


def test_significant_terms_jlh(spark):
    # 10 docs: 4 match 'spark'; 'shuffle' appears in 3 of the 4 fg
    # docs and 1 bg doc (strongly significant); 'common' in all docs
    # (fgPct == bgPct → excluded); 'rare' in 2 fg docs only but below
    # min_doc_count=3
    rows = [
        (1, "spark shuffle common rare"),
        (2, "spark shuffle common rare"),
        (3, "spark shuffle common"),
        (4, "spark common"),
        (5, "shuffle common"),
    ] + [(i, "common filler") for i in range(6, 11)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["term"]: r for r in search.significant_terms(
        df, "spark", text_col="text", id_col="doc_id",
        k=10, min_doc_count=3).collect()}
    assert "common" not in out          # no lift → excluded
    assert "rare" not in out            # min_doc_count gate
    assert "filler" not in out          # zero fg
    sh = out["shuffle"]
    assert (sh["fg_count"], sh["bg_count"]) == (3, 4)
    fgp, bgp = 3 / 4, 4 / 10
    assert sh["score"] == round((fgp - bgp) * (fgp / bgp), 6)
    # the query term itself is maximally significant and ranks first
    assert max(out.values(), key=lambda r: r["score"])["term"] == "spark"


def test_match_topk(spark, docs):
    out = search.match_topk(docs, "fox dog", text_col="text", id_col="doc_id", k=10).collect()
    ids = [r["id"] for r in out]
    assert set(ids) == {1, 2, 6}
    assert out[0]["score"] == 2.0


def test_multi_match_boost(spark, docs):
    out = search.multi_match_topk(
        docs, "en fox", fields={"text": 1.0, "lang": 5.0}, id_col="doc_id", k=10
    ).collect()
    scores = {r["id"]: r["score"] for r in out}
    assert scores[7] == 5.0  # lang match only, boosted
    assert scores[1] == 6.0  # fox (1) + lang en (5)


def test_match_operator_and(spark):
    rows = [
        ("a", "fox and hound together"),  # both terms
        ("b", "fox fox fox fox alone"),   # one term, higher TF
    ]
    df = spark.createDataFrame(rows, "id string, content string")
    anded = [(r["id"], r["score"]) for r in
             search.match_topk(df, "fox hound", operator="and").collect()]
    assert anded == [("a", 2.0)]  # b excluded despite larger TF sum
    ored = {r["id"] for r in search.match_topk(df, "fox hound").collect()}
    assert ored == {"a", "b"}


def test_match_phrase_requires_adjacency(spark):
    rows = [
        ("a", "the quick brown fox"),            # exact phrase
        ("b", "quick and also brown then fox"),  # all terms, not adjacent
        ("c", "quick brown fox quick brown fox"),  # phrase twice
        ("d", "nothing relevant here"),
    ]
    df = spark.createDataFrame(rows, "id string, content string")
    got = [(r["id"], r["score"]) for r in
           search.match_phrase_topk(df, "Quick Brown Fox", k=10).collect()]
    assert got == [("c", 2.0), ("a", 1.0)]  # b and d excluded
    # phrase longer than the doc → no match, no error
    assert search.match_phrase_topk(
        df.limit(1), "the quick brown fox jumps over everything else entirely today ok"
    ).count() == 0


def test_bool_query_semantics(spark):
    """ES bool occurrence contexts: must gates + scores, should adds
    score without gating (msm=0 when must present), must_not excludes,
    filter gates without scoring; filter-only matches keep score 0."""
    rows = [
        (1, "alpha beta gamma", "news", 5),
        (2, "alpha alpha delta", "blog", 7),
        (3, "beta delta", "news", 9),       # no alpha -> must fails
        (4, "alpha beta", "spam", 3),       # must_not source=spam
        (5, "alpha beta beta", "news", 99),  # outside range filter
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string, rank long")
    got = search.bool_topk(
        df,
        {
            "must": [{"match": {"text": "alpha"}}],
            "should": [{"match": {"text": "beta"}}],
            "must_not": [{"term": {"source": "spam"}}],
            "filter": [{"range": {"rank": {"gte": 4, "lte": 10}}}],
        },
        id_col="doc_id", k=10,
    ).collect()
    scores = {r["id"]: r["score"] for r in got}
    # doc1: alpha(1) + beta(1) = 2; doc2: alpha(2) + beta(0) = 2
    assert scores == {1: 2.0, 2: 2.0}
    # ordering: tie broken by id asc
    assert [r["id"] for r in got] == [1, 2]

    # should-only query: minimum_should_match defaults to 1
    got2 = search.bool_topk(
        df, {"should": [{"match": {"text": "delta"}}]}, id_col="doc_id", k=10
    ).collect()
    assert {r["id"] for r in got2} == {2, 3}

    # filter-only: matches everything in range with score 0
    got3 = search.bool_topk(
        df, {"filter": [{"range": {"rank": {"lt": 6}}}]}, id_col="doc_id", k=10
    ).collect()
    assert {(r["id"], r["score"]) for r in got3} == {(1, 0.0), (4, 0.0)}


def test_bool_nested_and_extended_leaves(spark):
    """Nested {"bool": ...} clauses compile recursively; a non-matching
    sub-bool contributes 0 score even when its should clauses matched;
    terms/exists/prefix/match_all/match_phrase leaves work inside any
    occurrence context."""
    rows = [
        (1, "alpha beta gamma", "news",  "en"),
        (2, "alpha delta quick brown fox", "blog", None),
        (3, "beta quick brown fox", "news",  "fr"),
        (4, "alpha quick fox brown", "newswire", "en"),  # terms not adjacent
        (5, "alpha beta", "spam", "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string, lang string")

    # should = [nested bool(must=match alpha, must_not=term spam),
    #           match_phrase "quick brown fox"] with msm=1
    got = search.bool_topk(
        df,
        {
            "should": [
                {"bool": {
                    "must": [{"match": {"text": "alpha"}}],
                    "must_not": [{"term": {"source": "spam"}}],
                }},
                {"match_phrase": {"text": "Quick Brown Fox"}},
            ],
        },
        id_col="doc_id", k=10,
    ).collect()
    scores = {r["id"]: r["score"] for r in got}
    # 1: alpha(1); 2: alpha(1)+phrase(1)=2; 3: phrase(1); 4: alpha only
    # (not adjacent); 5: sub-bool fails must_not -> no match, no score
    assert scores == {1: 1.0, 2: 2.0, 3: 1.0, 4: 1.0}

    # terms + exists + prefix + match_all across contexts
    got2 = search.bool_topk(
        df,
        {
            "must": [{"match_all": {}}],
            "filter": [
                {"terms": {"source": ["news", "newswire", "blog"]}},
                {"exists": {"field": "lang"}},
                {"prefix": {"source": "news"}},
            ],
        },
        id_col="doc_id", k=10,
    ).collect()
    # doc2 lang NULL fails exists; doc2/blog + doc5/spam fail prefix
    assert {(r["id"], r["score"]) for r in got2} == {(1, 1.0), (3, 1.0), (4, 1.0)}

    # nested sub-bool that matches with score (should inside must)
    got3 = search.bool_topk(
        df,
        {
            "must": [
                {"bool": {"should": [
                    {"match": {"text": "gamma"}},
                    {"match": {"text": "delta"}},
                ]}},
            ],
        },
        id_col="doc_id", k=10,
    ).collect()
    assert {(r["id"], r["score"]) for r in got3} == {(1, 1.0), (2, 1.0)}

    # NULL field values must behave as non-matches (ES: a doc missing
    # the field doesn't match), not poison the should-count / must_not
    # conjunction with SQL NULL. doc 2 has lang NULL: the should prefix
    # over lang is simply false for it, and must_not(term lang=en)
    # KEEPS it.
    got4 = search.bool_topk(
        df,
        {
            "should": [
                {"match": {"text": "alpha"}},
                {"prefix": {"lang": "e"}},
            ],
            "must_not": [{"term": {"lang": "fr"}}],
        },
        id_col="doc_id", k=10,
    ).collect()
    ids4 = {r["id"]: r["score"] for r in got4}
    assert 2 in ids4 and ids4[2] == 1.0  # alpha only; NULL lang harmless
    assert 3 not in ids4                 # lang=fr excluded by must_not

    # nested bool honors an embedded minimum_should_match
    got5 = search.bool_topk(
        df,
        {
            "must": [
                {"bool": {
                    "should": [
                        {"match": {"text": "alpha"}},
                        {"match": {"text": "beta"}},
                        {"match_phrase": {"text": "quick brown fox"}},
                    ],
                    "minimum_should_match": 2,
                }},
            ],
        },
        id_col="doc_id", k=10,
    ).collect()
    # 1: alpha+beta; 2: alpha+phrase; 3: beta+phrase; 4: alpha only;
    # 5: alpha+beta
    assert {r["id"] for r in got5} == {1, 2, 3, 5}


def test_substring_spans(spark):
    """ExactSubstr window-hash spans: shared k-word runs merge into
    one span of run_len + k - 1 words; docs shorter than k emit no
    windows; within_doc=True also counts same-document repeats."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        # shares doc 1's full 10-word run, padded both sides
        (2, "xx alpha beta gamma delta epsilon zeta eta theta iota kappa yy"),
        (3, "one two three four five six seven eight"),   # = doc 5 prefix
        (4, "short doc"),                                  # < k words
        (5, "one two three four five six seven eight nine"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in
           dedup.substring_spans(df, k=8).collect()}
    assert got[1] == {"doc_id": 1, "total_windows": 3, "dup_windows": 3,
                      "dup_runs": 1, "max_span_words": 10}
    assert got[2]["dup_windows"] == 3 and got[2]["total_windows"] == 5
    assert got[3] == {"doc_id": 3, "total_windows": 1, "dup_windows": 1,
                      "dup_runs": 1, "max_span_words": 8}
    assert got[4] == {"doc_id": 4, "total_windows": 0, "dup_windows": 0,
                      "dup_runs": 0, "max_span_words": 0}

    # within_doc: a doc that repeats its own window is duplicated even
    # with no cross-doc collision
    solo = spark.createDataFrame(
        [(9, "w1 w2 w3 w4 w5 w6 w7 w8 filler w1 w2 w3 w4 w5 w6 w7 w8")],
        "doc_id long, text string",
    )
    cross = dedup.substring_spans(solo, k=8).collect()[0]
    assert cross["dup_windows"] == 0
    within = dedup.substring_spans(solo, k=8, within_doc=True).collect()[0]
    assert within["dup_windows"] == 2 and within["dup_runs"] == 2


def test_lm_perplexity_hand_computed(spark):
    """Add-one bigram LM on a 3-doc corpus: every probability is
    hand-checkable. unigrams a:4 b:3, bigrams 'a b':3 'b a':1, V=2."""
    import math
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "a")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in
           textstats.lm_perplexity(df).collect()}
    p_ab = (3 + 1) / (4 + 2)   # 2/3
    p_ba = (1 + 1) / (3 + 2)   # 0.4
    assert got[1]["n_trans"] == 3
    assert got[1]["sum_logp"] == round(
        math.log(p_ab) + math.log(p_ba) + math.log(p_ab), 6)
    assert got[2] == {"doc_id": 2, "n_trans": 1,
                      "sum_logp": round(math.log(p_ab), 6), "ppl": 1.5}
    # one-word doc: no transitions, sentinel zeros
    assert got[3] == {"doc_id": 3, "n_trans": 0, "sum_logp": 0.0, "ppl": 0.0}
    # repetitive text is more predictable than lexical soup
    big = spark.createDataFrame(
        [(1, "spam ham " * 30), (2, "q w e r t y u i o p a s d f g h j k l z")],
        "doc_id long, text string",
    )
    ppl = {r["doc_id"]: r["ppl"] for r in textstats.lm_perplexity(big).collect()}
    assert ppl[1] < ppl[2]
    # external reference LM (the CCNet setup): OOV transitions fall
    # back to pure smoothing mass, p = α/(0 + α·V)
    train = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string")
    oov = spark.createDataFrame([(9, "x y")], "doc_id long, text string")
    got_oov = textstats.lm_perplexity(oov, train=train).collect()[0]
    assert got_oov["n_trans"] == 1 and got_oov["ppl"] == 2.0  # 1/(0+1·2)


def test_lm_kn_perplexity_hand_computed(spark):
    """Interpolated Kneser-Ney on the same 3-doc corpus: bigram types
    'a b':3 'b a':1 → T=2, V=2, denom=4; ctx a:(c1=3,n1f=1),
    b:(c1=1,n1f=1); cont a:1, b:1; D=0.75."""
    import math
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "a")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in
           textstats.lm_kn_perplexity(df).collect()}
    p_ba = 2.25 / 3 + (0.75 * 1 / 3) * (2 / 4)   # p(b|a) = 0.875
    p_ab = 0.25 / 1 + (0.75 * 1 / 1) * (2 / 4)   # p(a|b) = 0.625
    assert got[1]["n_trans"] == 3
    assert got[1]["sum_logp"] == round(
        math.log(p_ba) + math.log(p_ab) + math.log(p_ba), 6)
    assert got[2]["ppl"] == round(1 / p_ba, 6)  # 1.142857
    assert got[3] == {"doc_id": 3, "n_trans": 0, "sum_logp": 0.0, "ppl": 0.0}
    # KN's point: continuation probability, not raw frequency — and
    # the discounted seen mass plus backoff always sums below 1
    assert 0.0 < p_ba < 1.0 and 0.0 < p_ab < 1.0
    # external reference LM: unseen CONTEXT backs off to pure
    # continuation probability (x unseen → p = (0+1)/(T+V) = 1/4);
    # seen context + unseen continuation keeps the λ·p_cont mass
    train = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string")
    oov = spark.createDataFrame(
        [(9, "x y"), (10, "a z")], "doc_id long, text string")
    got2 = {r["doc_id"]: r["ppl"] for r in
            textstats.lm_kn_perplexity(oov, train=train).collect()}
    assert got2[9] == 4.0                      # 1 / 0.25
    assert got2[10] == round(1 / ((0.75 * 1 / 2) * (1 / 4)), 6)  # 10.666667
    # repetitive text still scores more predictable than lexical soup
    big = spark.createDataFrame(
        [(1, "spam ham " * 30), (2, "q w e r t y u i o p a s d f g h j k l z")],
        "doc_id long, text string",
    )
    ppl = {r["doc_id"]: r["ppl"]
           for r in textstats.lm_kn_perplexity(big).collect()}
    assert ppl[1] < ppl[2]


def test_lm_kn3_perplexity_hand_computed(spark):
    """Chen & Goodman trigram recursion on a corpus small enough to
    compute by hand: trigram types abc:2 bca:1 cab:1 abd:1; bigram
    types ab:3 bc:2 ca:1 bd:1 → T2=4, V=4, denom=8."""
    import math
    train = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "a b d")], "doc_id long, text string")
    pc_c = (1 + 1) / 8                                   # cont(c)=1
    p2_cb = 0.25 / 2 + (0.75 * 2) / 2 * pc_c             # 0.3125
    p3 = 1.25 / 3 + (0.75 * 2) / 3 * p2_cb               # seen "a b c"
    probe = spark.createDataFrame(
        [(10, "a b c"),     # seen trigram path
         (11, "x b c"),     # unseen (w1,w2) context → backoff to p2
         (12, "x y z"),     # unseen w2 too → pure continuation
         (13, "a b")],      # < 3 words → sentinel
        "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in
           textstats.lm_kn3_perplexity(probe, train=train).collect()}
    assert got[10]["sum_logp"] == round(math.log(p3), 6)
    assert got[11]["sum_logp"] == round(math.log(p2_cb), 6)
    assert got[12]["ppl"] == 8.0                         # 1/(1/8)
    assert got[13] == {"doc_id": 13, "n_trans": 0,
                       "sum_logp": 0.0, "ppl": 0.0}
    # the trigram order pays exactly where bigram context is
    # ambiguous but trigram context is deterministic: after "b" the
    # next word is c or e equally, after "a b" it is always c
    amb = spark.createDataFrame(
        [(1, "a b c " * 10), (2, "d b e " * 10)],
        "doc_id long, text string")
    q = spark.createDataFrame([(9, "a b c")], "doc_id long, text string")
    tri = textstats.lm_kn3_perplexity(q, train=amb).collect()[0]["ppl"]
    bi = textstats.lm_kn_perplexity(q, train=amb).collect()[0]["ppl"]
    assert tri < bi


def test_lm_moore_lewis_selection(spark):
    """Cross-entropy difference: docs resembling the target slice
    score LOWER than off-domain docs; the common-word doc cancels
    toward 0; no-transition docs get the sentinel triple."""
    rows = [
        (1, "the cat sat on the mat"),       # in-domain
        (2, "the cat ate on the mat"),       # near-domain
        (3, "quantum flux torsion manifold spectra"),  # off-domain
        (4, "the the the the"),              # common words everywhere
        (5, "single"),                       # no transitions
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    target = df.filter("doc_id IN (1, 2)")
    got = {r["doc_id"]: r.asDict() for r in
           textstats.lm_moore_lewis(df, target).collect()}
    assert got[1]["ml_score"] < got[3]["ml_score"]
    assert got[2]["ml_score"] < got[3]["ml_score"]
    # ce consistency: ml = ce_in − ce_out after rounding (±1 ulp@6dp)
    for d in (1, 2, 3, 4):
        assert abs(got[d]["ml_score"]
                   - round(got[d]["ce_in"] - got[d]["ce_out"], 6)) <= 1e-6
    assert got[5] == {"doc_id": 5, "n_trans": 0, "ce_in": 0.0,
                      "ce_out": 0.0, "ml_score": 0.0}


def test_shuffle_shards_and_packing(spark, tmp_path):
    """Deterministic training delivery: the (shard, pos) permutation is
    a pure function of (id, seed) — identical across parallelism and
    independent draws per seed; pack_sequences cuts each shard's token
    stream at exact budget boundaries; write_training_shards files
    reproduce the same in-shard order without a rank column."""
    from gocrawl_spark import curation

    docs = spark.createDataFrame(
        [(i, ("w" + str(i) + " ") * (5 + i % 7)) for i in range(60)],
        "doc_id long, text string",
    )
    a = sorted(curation.shuffle_shards(docs, 4).select(
        "doc_id", "shard", "pos").collect())
    b = sorted(curation.shuffle_shards(docs.repartition(7), 4).select(
        "doc_id", "shard", "pos").collect())
    assert a == b  # parallelism-independent permutation
    c = sorted(curation.shuffle_shards(docs, 4, seed="other").select(
        "doc_id", "shard", "pos").collect())
    assert a != c  # a new seed draws a different permutation
    # pos is a dense 1..n rank within each shard
    from collections import defaultdict
    by_shard = defaultdict(list)
    for r in a:
        by_shard[r["shard"]].append(r["pos"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_shard.values())

    packed = curation.pack_sequences(docs, budget=16, n_shards=4).collect()
    ranked = {r["doc_id"]: r for r in
              curation.shuffle_shards(docs, 4).collect()}
    # replay each shard in pos order: starts must be the running sum
    stream = defaultdict(list)
    for r in packed:
        stream[r["shard"]].append((ranked[r["doc_id"]]["pos"], r))
    for shard, rows in stream.items():
        run = 0
        for _pos, r in sorted(rows):
            assert (r["seq"], r["offset"]) == (run // 16, run % 16)
            run += r["n_tokens"]

    # file delivery: partition dirs hold the same docs, key-sorted
    out = str(tmp_path / "shards")
    curation.write_training_shards(docs, out, 4)
    back = spark.read.parquet(out)
    assert back.count() == 60
    got_shards = {r["doc_id"]: r["shard"] for r in back.collect()}
    want_shards = {r["doc_id"]: r["shard"] for r in a}
    assert got_shards == want_shards


def test_minhash_index_incremental_equals_batch(spark, docs, tmp_path):
    """The incremental index's accumulated pairs over ANY ingest split
    must equal one-shot minhash_pairs on the whole corpus (the md5
    minhash is deterministic, old×old is never re-joined)."""
    import pytest as _pytest

    full = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 2 == 0, F.concat("text", F.lit(" near dup tail")))
        .otherwise(F.col("text")),
    )
    batch = {(r["id_a"], r["id_b"], r["est_jaccard"]) for r in
             dedup.minhash_pairs(full, num_hashes=16, k=2, bands=4,
                                 threshold=0.2).collect()}
    idx = dedup.MinHashIndex(spark, str(tmp_path / "mhidx"),
                             num_hashes=16, k=2, bands=4, threshold=0.2)
    got = set()
    for part in (full.filter("doc_id % 3 = 0"), full.filter("doc_id % 3 = 1"),
                 full.filter("doc_id % 3 = 2")):
        got |= {(r["id_a"], r["id_b"], r["est_jaccard"])
                for r in idx.ingest(part).collect()}
    assert got == batch and batch  # non-trivial corpus
    # param mismatch on reopen is refused
    with _pytest.raises(ValueError, match="not comparable"):
        dedup.MinHashIndex(spark, str(tmp_path / "mhidx"), num_hashes=32,
                           k=2, bands=4)


def test_blocklist_filter(spark):
    """UT1 domain blocklist: exact host and subdomains die; lookalike
    suffixes (notdom.com vs dom.com) survive; the list path and the
    DataFrame (big-blocklist) path agree."""
    from gocrawl_spark import curation

    rows = [
        (1, "https://dom.com/x"),            # exact
        (2, "https://a.b.dom.com/y"),        # subdomain
        (3, "https://notdom.com/z"),         # suffix lookalike — keep
        (4, "https://safe.org/w"),           # keep
        (5, "https://Sub.DOM.com/v"),        # case-insensitive subdomain
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    kept_list = {r["doc_id"] for r in
                 curation.blocklist_filter(df, ["dom.com"]).collect()}
    assert kept_list == {3, 4}
    bl = spark.createDataFrame([("dom.com",)], "domain string")
    kept_df = {r["doc_id"] for r in
               curation.blocklist_filter(df, bl).collect()}
    assert kept_df == kept_list


def test_lm_buckets_exact_vs_approx(spark):
    """Per-group tertile split: exact ntile form vs the scale-path
    threshold form agree on a corpus with distinct ppl values; bucket
    sizes differ by ≤1 within each group."""
    docs = spark.createDataFrame(
        [(i, " ".join("tok%d" % ((i * 7 + j) % 23) for j in range(12)),
          "en" if i % 3 else "fr") for i in range(45)],
        "doc_id long, text string, lang string",
    )
    exact = textstats.lm_buckets(docs)
    sizes = {(r["lang"], r["bucket"]): r["n"] for r in
             exact.groupBy("lang", "bucket").agg(F.count("*").alias("n")).collect()}
    for lang in ("en", "fr"):
        vals = [sizes.get((lang, b), 0) for b in ("head", "middle", "tail")]
        assert max(vals) - min(vals) <= 1
    approx = textstats.lm_buckets_approx(docs).withColumnRenamed("bucket", "b2")
    joined = exact.join(approx, ["doc_id", "lang", "ppl"])
    n_agree = joined.filter(F.col("bucket") == F.col("b2")).count()
    assert n_agree == 45


def test_bm25_ranks_rarer_terms_higher(spark, docs):
    out = search.bm25_topk(docs, "spark the", text_col="text", id_col="doc_id", k=10).collect()
    assert out[0]["id"] == 5  # 'spark' is rare → doc 5 wins despite no 'the'
    assert all(r["score"] > 0 for r in out)


def test_curate_pipeline(spark, docs):
    """Curation = langid filter ∘ quality gate ∘ exact-dedup survivors
    in one pipeline (curation.py)."""
    from gocrawl_spark import curation

    out = {r["doc_id"]: r for r in curation.curate(docs, langs=("en",), min_quality=0.0).collect()}
    assert 1 in out and 6 not in out  # 6 is an exact dup of 1; min id survives
    assert 3 not in out and 4 not in out  # de/fr filtered
    assert 7 not in out  # empty text → 'und'
    assert set(out) == {1, 2, 5}
    assert all(r["n_tokens"] > 0 and 0.0 <= r["quality"] <= 1.0 for r in out.values())


def test_curate_pipeline_neardup(spark, docs):
    """near_dup= chains the MinHash-LSH → connected-components →
    canonical-only end-game after the exact pass (curation.py): doc 2
    (near-dup of 1, not an exact dup) is dropped too, and the chain
    runs over the exact survivors only."""
    from gocrawl_spark import curation

    out = {
        r["doc_id"]: r
        for r in curation.curate(
            docs,
            langs=("en",),
            min_quality=0.0,
            near_dup={"num_hashes": 16, "k": 5, "bands": 4, "threshold": 0.5},
        ).collect()
    }
    assert set(out) == {1, 5}  # 2 now dropped as near-dup of 1; 6 by exact pass
    assert all(r["n_tokens"] > 0 for r in out.values())


# -------------------------------------------------------------- multimodal


def test_media_pipeline_deterministic(spark, docs):
    media = multimodal.synth_media(spark, docs.select("doc_id", "text"), "video")
    feats = multimodal.extract_features(media, frame_stride_ms=1000)
    rows = feats.collect()
    assert len(rows) == docs.count()
    by_id = {r["media_id"]: r for r in rows}
    again = {r["media_id"]: r for r in multimodal.extract_features(media).collect()}
    for mid, r in by_id.items():
        assert again[mid]["payload_sha"] == r["payload_sha"]
        assert len(r["feat"]) == multimodal.FEAT_DIM
        assert r["frames_sampled"] >= 1
    stats = multimodal.media_stats(feats).collect()
    assert stats[0]["n_media"] == len(rows)


def test_png_wav_header_roundtrip():
    body = b"\x01\x02" * 50
    png = multimodal.build_png(320, 200, body)
    assert multimodal.parse_png_header(png) == (320, 200)
    assert len(png) == 57 + len(body)
    wav = multimodal.build_wav(b"\x00" * 32000)  # 2 s @ 16 kB/s
    assert multimodal.parse_wav_header(wav) == 2000
    assert len(wav) == 44 + 32000
    jpg = multimodal.build_jpeg(320, 200, body)
    assert multimodal.parse_jpeg_header(jpg) == (320, 200)
    assert len(jpg) == 55 + len(body)
    # non-container bytes parse to None, never raise
    assert multimodal.parse_png_header(b"junk") is None
    assert multimodal.parse_wav_header(b"junk") is None
    assert multimodal.parse_png_header(wav) is None
    assert multimodal.parse_wav_header(png) is None
    assert multimodal.parse_jpeg_header(png) is None
    assert multimodal.parse_jpeg_header(b"\xff\xd8\xff\xd9") is None
    # truncation before the SOF0 dimensions parses to None, never raises
    assert multimodal.parse_jpeg_header(jpg[:25]) is None


def test_media_metadata_parsed_from_real_bytes(spark, docs):
    """extract_features must recover width/height/duration by parsing
    the payload headers, matching the metadata synth_media encoded."""
    for modality in ("image", "audio"):
        media = multimodal.synth_media(spark, docs.select("doc_id", "text"), modality)
        feats = multimodal.extract_features(media)
        meta = {r["media_id"]: r for r in media.collect()}
        for r in feats.collect():
            m = meta[r["media_id"]]
            assert r["width"] == m["width"]
            assert r["height"] == m["height"]
            assert r["duration_ms"] == m["duration_ms"]


def test_media_real_decode_is_gated(spark, docs):
    """NotImplementedError is reserved for GENUINELY compressed
    payloads (PNG entropy coding) — uncompressed containers decode."""
    media = multimodal.synth_media(spark, docs.select("doc_id", "text").limit(1), "image")
    feats = multimodal.extract_features(media, fake_decode=False)
    with pytest.raises(Exception, match="NotImplementedError|decode"):
        feats.collect()


def test_media_real_decode_uncompressed(spark, docs):
    """fake_decode=False is a REAL decode for BMP/PPM/PCM-WAV: the
    engine-side statistics equal a plain-Python decode of the same
    payload, per media row, and the feature vector derives from the
    decoded values (not the digest)."""
    import numpy as np

    d2 = docs.select("doc_id", "text").limit(6)
    for modality in ("bmp", "ppm", "audio"):
        media = multimodal.synth_media(spark, d2, modality)
        payloads = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
        stats = {r["media_id"]: r for r in multimodal.decode_media(media).collect()}
        feats = {r["media_id"]: r for r in
                 multimodal.extract_features(media, fake_decode=False).collect()}
        for mid, payload in payloads.items():
            codec, vals = multimodal._decoded_values(payload)
            r = stats[mid]
            assert r["codec"] == codec
            assert r["n_values"] == vals.size
            assert r["value_sum"] == int(vals.sum(dtype=np.int64))
            assert r["value_min"] == int(vals.min())
            assert r["value_max"] == int(vals.max())
            if codec in ("bmp", "ppm"):
                ch = vals.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                assert (r["sum_c0"], r["sum_c1"], r["sum_c2"]) == tuple(
                    int(x) for x in ch
                )
            else:
                assert r["sum_c0"] is None
            # features come from the real values (float32 storage),
            # and differ from the digest-derived fake path
            assert feats[mid]["feat"] == pytest.approx(
                multimodal._real_features(vals), abs=1e-5
            )
            assert feats[mid]["feat"] != pytest.approx(
                multimodal._fake_features(payload), abs=1e-3
            )


def test_bmp_ppm_roundtrip():
    import hashlib

    seed = hashlib.md5(b"roundtrip").digest()
    w, h = 8, 4  # stride 24 — already 4-aligned
    pix = (seed * (3 * w * h // 16 + 1))[: 3 * w * h]
    bmp = multimodal.build_bmp(w, h, pix)
    assert multimodal.parse_bmp_header(bmp) == (w, h)
    dec = multimodal.decode_bmp_pixels(bmp)
    rows = [pix[i * 24 : (i + 1) * 24] for i in range(h)]
    assert dec == b"".join(reversed(rows))  # bottom-up file → top-down
    # non-4-aligned width: padding added on build, stripped on decode
    w2 = 5
    stride2 = (3 * w2 + 3) // 4 * 4
    pad_rows = b"".join(
        (seed * 2)[: 3 * w2].ljust(stride2, b"\x00") for _ in range(3)
    )
    b2 = multimodal.build_bmp(w2, 3, pad_rows)
    assert len(multimodal.decode_bmp_pixels(b2)) == 3 * w2 * 3
    ppm = multimodal.build_ppm(w, h, pix)
    assert multimodal.parse_ppm_header(ppm) == (w, h)
    assert multimodal.decode_ppm_pixels(ppm) == pix
    wav = multimodal.build_wav(seed * 4)
    assert multimodal.decode_wav_samples(wav) == seed * 4
    # sniffing routes each container to its decoder
    assert multimodal.sniff_codec(bmp) == "bmp"
    assert multimodal.sniff_codec(ppm) == "ppm"
    assert multimodal.sniff_codec(wav) == "pcm_wav"
    assert multimodal.sniff_codec(multimodal.build_png(4, 4, b"x")) == "png"
    assert multimodal.sniff_codec(b"junk") == "opaque"


def test_es_aggs_terms_and_metrics(spark, sf_dir):
    from gocrawl_spark import search

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = search.es_aggs(
        ev,
        {"by_type": {"terms": {"field": "event_type", "size": 2},
                     "aggs": {"max_value": {"max": {"field": "value"}}}}},
    ).collect()
    assert len(out) == 2
    assert out[0]["doc_count"] >= out[1]["doc_count"]
    assert {"key", "doc_count", "max_value"} <= set(out[0].asDict())
    # bare metric agg
    n = search.es_aggs(ev, {"n": {"value_count": {"field": "event_id"}}}).collect()[0]["n"]
    assert n == ev.count()
    # bare multi-valued metric (percentiles gained support in r4)
    p = search.es_aggs(
        ev, {"v_pct": {"percentiles": {"field": "value", "percents": [50]}}}
    ).collect()[0]
    assert p["v_pct_p50"] > 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        search.es_aggs(ev, {"x": {"median_absolute_deviation": {"field": "value"}}})


def test_ivf_persisted_index_partition_prunes(spark, sf_dir, tmp_path):
    """The persisted IVF index (partitioned by centroid_id) must be
    probed with partition pruning — the broadcast probe side drives a
    dynamic partition-pruning filter into the index scan, so a probe
    reads ~nprobe/n_centroids of the corpus — and must return exactly
    the in-memory ivf_topk result."""
    from pyspark.sql import functions as F

    from gocrawl_spark import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = str(tmp_path / "ivf_index")
    sim.ivf_write_index(emb, idx, n_centroids=16)
    q = emb.filter(F.col("vec_id") < 5)
    mem = sim.ivf_topk(emb, q, k=10, n_centroids=16, nprobe=4)
    per = sim.ivf_topk(emb, q, k=10, n_centroids=16, nprobe=4, index_path=idx)
    assert sorted(map(tuple, per.collect())) == sorted(map(tuple, mem.collect()))
    plan = per._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_search_knn_section(spark, sf_dir, tmp_path):
    """ES `knn` retrieval: top-k by rounded cosine through the IVF
    probe path; num_candidates maps to the probe width; with an
    index_path the probe partition-prunes the persisted index scan;
    hybrid knn+query SUMS scores over the union of hit sets."""
    from pyspark.sql import functions as F

    from gocrawl_spark import search
    from gocrawl_spark import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.select(F.col("vec_id").alias("id"), "embedding")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 7).head()["embedding"]]

    # knn-only: the query vector's own row ranks first at cosine 1.0
    res = search.es_search(
        base,
        {"knn": {"field": "embedding", "query_vector": qv, "k": 5,
                 "n_centroids": 16, "nprobe": 4}, "size": 5},
    )
    hits = res["hits"].collect()
    assert len(hits) == 5 and res["total"].head()["total"] == 5
    assert hits[0]["id"] == 7 and hits[0]["score"] == 1.0
    assert [h["score"] for h in hits] == sorted(
        (h["score"] for h in hits), reverse=True
    )

    # nprobe = n_centroids degrades to exact brute top-k
    exact = sim.brute_topk(emb, emb.filter(F.col("vec_id") == 7), k=5)
    res_all = search.es_search(
        base,
        {"knn": {"field": "embedding", "query_vector": qv, "k": 5,
                 "n_centroids": 16, "nprobe": 16}, "size": 5},
    )
    got_ids = [h["id"] for h in res_all["hits"].collect() if h["id"] != 7]
    want_ids = [r["neighbor_id"] for r in exact.collect()]
    assert got_ids == want_ids[: len(got_ids)]

    # num_candidates budget: large budget → all cells probed (exact)
    n = base.count()
    res_budget = search.es_search(
        base,
        {"knn": {"field": "embedding", "query_vector": qv, "k": 5,
                 "n_centroids": 16, "num_candidates": int(n)}, "size": 5},
    )
    assert [h["id"] for h in res_budget["hits"].collect()] == [
        h["id"] for h in res_all["hits"].collect()
    ]

    # persisted index: identical hits, partition-pruned scan
    idx = str(tmp_path / "knn_index")
    sim.ivf_write_index(emb, idx, n_centroids=16)
    knn_df = search.knn_topk(
        base,
        {"field": "embedding", "query_vector": qv, "k": 5,
         "n_centroids": 16, "nprobe": 4, "index_path": idx},
    )
    plan = knn_df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    assert [r["id"] for r in knn_df.collect()] == [h["id"] for h in hits]

    # hybrid: scores sum over the union; a doc in both sets scores
    # higher than its knn score alone
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    both = docs.join(emb, F.col("doc_id") == F.col("vec_id")).select(
        F.col("doc_id").alias("id"), "text", "embedding"
    )
    hy = search.es_search(
        both,
        {"query": {"match": {"text": "the"}},
         "knn": {"field": "embedding", "query_vector": qv, "k": 5,
                 "n_centroids": 16, "nprobe": 4}, "size": 10},
    )
    hymap = {h["id"]: h["score"] for h in hy["hits"].collect()}
    if 7 in hymap:
        assert hymap[7] >= 1.0
    # unsupported compositions raise
    with pytest.raises(ValueError, match="knn"):
        search.es_search(
            base,
            {"knn": {"field": "embedding", "query_vector": qv, "k": 5},
             "sort": [{"id": "asc"}]},
        )


def test_ivfpq_persisted_index_prunes_and_matches(spark, sf_dir, tmp_path):
    """The persisted IVF-PQ index (codes partitioned by centroid_id)
    returns exactly the in-memory composition's result and the probe
    partition-prunes the code scan like the IVF index does."""
    from pyspark.sql import functions as F

    from gocrawl_spark import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cb = sim.pq_codebooks(emb, m=4, ksub=8)
    idx = str(tmp_path / "ivfpq_index")
    sim.ivfpq_write_index(emb, idx, cb, n_centroids=16)
    q = emb.filter(F.col("vec_id") < 5)
    mem = sim.ivfpq_topk(emb, q, cb, k=10, n_centroids=16, nprobe=4)
    per = sim.ivfpq_topk(
        emb, q, cb, k=10, n_centroids=16, nprobe=4, index_path=idx
    )
    assert sorted(map(tuple, per.collect())) == sorted(map(tuple, mem.collect()))
    plan = per._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_emb_dup_recall_query(spark, sf_dir):
    """The recall eval query reports |blocked ∩ exact| / |exact| —
    the banding curve made visible (VERDICT r2 item 4)."""
    import __spark_entry__ as E

    row = E.queries()["emb_dup_recall"](spark, sf_dir).collect()[0]
    assert row["n_common"] <= min(row["n_exact"], row["n_blocked"])
    assert 0.0 <= row["recall"] <= 1.0
    assert abs(row["recall"] - row["n_common"] / row["n_exact"]) < 1e-3


def test_connected_components_merges_transitive_pairs(spark):
    """A~B, B~C must land in ONE cluster even though A~C was never a
    pair; disjoint evidence stays disjoint; labels are the component
    min and identical at any partitioning."""
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 7), (10, 11)], "id_a long, id_b long"
    )
    got = {
        (r["id"], r["cluster_id"])
        for r in dedup.connected_components(pairs).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (7, 1), (10, 10), (11, 10)}
    got8 = {
        (r["id"], r["cluster_id"])
        for r in dedup.connected_components(pairs.repartition(8)).collect()
    }
    assert got8 == got
    clusters = {
        (r["doc_id"], r["cluster_id"], r["cluster_size"], r["is_canonical"])
        for r in dedup.dup_clusters(pairs).collect()
    }
    assert clusters == {
        (1, 1, 4, True),
        (2, 1, 4, False),
        (3, 1, 4, False),
        (7, 1, 4, False),
        (10, 10, 2, True),
        (11, 10, 2, False),
    }


def test_connected_components_long_chain(spark):
    """A path graph is the worst case for label propagation (diameter
    sweeps): a 12-node chain must still collapse to one cluster."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long"
    )
    rows = dedup.connected_components(pairs).collect()
    assert {r["cluster_id"] for r in rows} == {0} and len(rows) == 13


def test_sample_stratified_deterministic_pure_function(spark, sf_dir):
    """Membership is a pure hash of (doc_id, seed): identical at any
    partitioning, monotone in the fraction, empty at 0, full at 1, and
    a different seed draws a genuinely different sample."""
    from gocrawl_spark import curation

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang"
    )
    frac = {"en": 0.25, "zh": 0.5}
    s1 = {r["doc_id"] for r in curation.sample_stratified(docs, "lang", frac).collect()}
    s2 = {
        r["doc_id"]
        for r in curation.sample_stratified(docs.repartition(16), "lang", frac).collect()
    }
    assert s1 == s2 and 0 < len(s1) < docs.count()
    assert curation.sample_stratified(docs, "lang", {}, default=0.0).count() == 0
    assert (
        curation.sample_stratified(docs, "lang", {}, default=1.0).count()
        == docs.count()
    )
    # en is downsampled hardest; non-listed strata kept whole
    by_lang = {
        r["lang"]: r["n"]
        for r in curation.sample_stratified(docs, "lang", frac)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    full = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by_lang["en"] < full["en"] and by_lang["de"] == full["de"]
    # wider fraction is a superset (same hash, higher threshold)
    s_wide = {
        r["doc_id"]
        for r in curation.sample_stratified(docs, "lang", {"en": 0.5, "zh": 0.5}).collect()
    }
    assert s1 <= s_wide
    s_other = {
        r["doc_id"]
        for r in curation.sample_stratified(docs, "lang", frac, seed="other").collect()
    }
    assert s_other != s1


# ---------------------------------------------------------------- semdedup


def test_semdedup_prunes_near_dups_keeps_outlier(spark, vectors):
    from gocrawl_spark import similarity as sim

    out = sim.semdedup(vectors, threshold=0.999, n_centroids=8)
    rows = {r["vec_id"]: r for r in out.collect()}
    assert set(rows) == set(range(40))  # every vector gets a verdict
    # same-direction same-(i%3) vectors are near-identical (cos>=0.999):
    # within each cell exactly one of each dup class survives
    kept = [v for v, r in rows.items() if r["keep"]]
    dropped = [v for v, r in rows.items() if not r["keep"]]
    assert dropped, "threshold 0.999 must prune the exact-direction dups"
    # every dropped vector has a kept dominator in its cell with
    # centroid_sim <= its own (the paper's keep-the-outlier rule)
    for v in dropped:
        cell = rows[v]["centroid_id"]
        doms = [
            r
            for k, r in rows.items()
            if r["centroid_id"] == cell
            and (
                r["centroid_sim"] < rows[v]["centroid_sim"]
                or (r["centroid_sim"] == rows[v]["centroid_sim"] and k < v)
            )
        ]
        assert doms, f"dropped {v} has no higher-priority cellmate"
    # deterministic at any parallelism
    again = {
        r["vec_id"]: r["keep"]
        for r in sim.semdedup(
            vectors.repartition(7), threshold=0.999, n_centroids=8
        ).collect()
    }
    assert again == {v: r["keep"] for v, r in rows.items()}


def test_semdedup_pairwise_is_cell_equijoin(spark, vectors):
    """The within-cell pairwise stage (the quadratic risk) must be an
    equi-join keyed on centroid_id — never a cartesian product over the
    corpus. (BroadcastNestedLoopJoin against the ≤n_centroids-row
    centroid table is the intentional IVF assignment pattern and is
    allowed, same as ann_ivf.)"""
    from gocrawl_spark import similarity as sim

    out = sim.semdedup(vectors, threshold=0.999, n_centroids=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the x-y pair join carries the priority+cosine predicate and must
    # key on centroid_id (shuffle or broadcast hash, AQE may pick either)
    assert any(
        f"{j} [centroid_id" in plan
        for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    )


def test_semdedup_threshold_monotone(spark, vectors):
    from gocrawl_spark import similarity as sim

    loose = {
        r["vec_id"] for r in sim.semdedup(vectors, 0.4, 8).filter("keep").collect()
    }
    tight = {
        r["vec_id"] for r in sim.semdedup(vectors, 0.9999, 8).filter("keep").collect()
    }
    assert loose <= tight  # lower threshold prunes at least as much


# ---------------------------------------------------------------- DSIR


def test_dsir_weights_favor_target_like_docs(spark, docs):
    from gocrawl_spark import curation

    corpus = docs.filter(F.col("doc_id") != 7)  # drop the empty doc
    target = corpus.filter(F.col("lang") == "en")
    w = {r["doc_id"]: r["weight"] for r in curation.dsir_weights(corpus, target).collect()}
    # English docs (in-target) outrank the German/French ones
    assert min(w[1], w[2], w[5], w[6]) > max(w[3], w[4])
    # exact dup of doc 1 gets the identical weight
    assert w[1] == w[6]
    # selection is ranked and deterministic across parallelism
    sel = curation.dsir_select(corpus, target, n=3).collect()
    assert [r["rank"] for r in sel] == [1, 2, 3]
    sel2 = curation.dsir_select(corpus.repartition(5), target, n=3).collect()
    assert [(r["doc_id"], r["weight"]) for r in sel] == [
        (r["doc_id"], r["weight"]) for r in sel2
    ]


def test_dsir_hashed_features_bag_semantics(spark):
    from gocrawl_spark import curation

    df = spark.createDataFrame(
        [(1, "a b a"), (2, "a b"), (3, "")], "doc_id long, text string"
    )
    out = df.select(
        "doc_id", curation.hashed_ngram_buckets("text", 64).alias("f")
    ).collect()
    by_id = {r["doc_id"]: r["f"] for r in out}
    # doc 1: 3 unigrams + 2 bigrams; doc 2: 2 + 1; doc 3: none
    assert len(by_id[1]) == 5 and len(by_id[2]) == 3 and by_id[3] == []
    assert all(0 <= b < 64 for b in by_id[1])


def test_dsir_log_ratios_total_over_feature_space(spark, docs):
    """The exported ratio table defines a ratio for EVERY hashed bucket
    (add-1 smoothing is total), so out-of-corpus text scored against it
    standalone always finds its rows."""
    from gocrawl_spark import curation

    corpus = docs.filter(F.col("doc_id") != 7)
    target = corpus.filter(F.col("lang") == "en")
    ratios = curation.dsir_log_ratios(corpus, target, buckets=64)
    rows = ratios.collect()
    assert len(rows) == 64
    assert {r["bucket"] for r in rows} == set(range(64))
    assert all(r["log_ratio"] is not None for r in rows)
    # a bucket absent from BOTH corpora carries the pure smoothing
    # ratio log(1/(tt+B)) - log(1/(rt+B)) = log((rt+B)/(tt+B))
    import math

    feats = corpus.select(
        F.explode(curation.hashed_ngram_buckets("text", 64)).alias("b"))
    raw_seen = {r["b"] for r in feats.distinct().collect()}
    tgt_feats = target.select(
        F.explode(curation.hashed_ngram_buckets("text", 64)).alias("b"))
    rt = feats.count()
    tt = tgt_feats.count()
    empty = set(range(64)) - raw_seen
    if empty:
        b = next(iter(empty))
        expect = round(math.log((rt + 64) / (tt + 64)), 6)
        got = next(r["log_ratio"] for r in rows if r["bucket"] == b)
        assert abs(got - expect) < 1e-6


def test_dsir_sample_gumbel_topk(spark, docs):
    from gocrawl_spark import curation

    corpus = docs.filter(F.col("doc_id") != 7)
    target = corpus.filter(F.col("lang") == "en")
    s = curation.dsir_sample(corpus, target, n=4, seed="s1").collect()
    assert [r["rank"] for r in s] == [1, 2, 3, 4]
    # key = weight + gumbel(doc_id, seed): replayable bit-for-bit
    s2 = curation.dsir_sample(corpus.repartition(6), target, n=4, seed="s1").collect()
    assert [(r["doc_id"], r["key"]) for r in s] == [
        (r["doc_id"], r["key"]) for r in s2
    ]
    # a different seed draws a different noise realization
    s3 = curation.dsir_sample(corpus, target, n=4, seed="s2").collect()
    assert [(r["doc_id"], r["key"]) for r in s] != [
        (r["doc_id"], r["key"]) for r in s3
    ]
    # near-zero temperature degenerates to argmax-k = dsir_select order
    cold = curation.dsir_sample(corpus, target, n=4, temperature=1e-6).collect()
    sel = curation.dsir_select(corpus, target, n=4).collect()
    assert [r["doc_id"] for r in cold] == [r["doc_id"] for r in sel]


# ---------------------------------------------------------------- k-means


def test_kmeans_centroids_deterministic_and_tighter(spark, vectors):
    from gocrawl_spark import similarity as sim

    c2 = sim.kmeans_centroids(vectors, k=8, dim=4, iters=2)
    rows = {r["centroid_id"]: r["centroid_vec"] for r in c2.collect()}
    assert set(rows) == set(range(8))
    assert all(len(v) == 4 for v in rows.values())
    # replayable bit-for-bit at another parallelism
    again = {
        r["centroid_id"]: r["centroid_vec"]
        for r in sim.kmeans_centroids(vectors.repartition(7), k=8, dim=4, iters=2).collect()
    }
    assert again == rows
    # training must not hurt the mean assignment similarity vs the seed
    def mean_sim(cents):
        a = sim.ivf_assign(vectors, 8, centroids=cents)
        joined = a.join(
            cents.withColumnRenamed("centroid_vec", "cv"), "centroid_id"
        )
        return joined.select(
            F.avg(sim.cosine(F.col("embedding"), F.col("cv"))).alias("s")
        ).collect()[0]["s"]

    seed = sim.ivf_centroids(vectors, 8)
    assert mean_sim(c2) >= mean_sim(seed) - 1e-9


def test_kmeans_empty_cell_keeps_previous_centroid(spark):
    from gocrawl_spark import similarity as sim

    # 4 identical vectors: after assignment every vector lands in cell 0
    # (ties break on centroid_id), so cells 1-3 go empty and must keep
    # their (identical) seed centroids instead of producing nulls
    rows = [(i, [1.0, 0.0]) for i in range(4)]
    v = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    c = sim.kmeans_centroids(v, k=4, dim=2, iters=1)
    got = {r["centroid_id"]: r["centroid_vec"] for r in c.collect()}
    assert set(got) == {0, 1, 2, 3}
    assert all(v == [1.0, 0.0] for v in got.values())


def test_tfidf_keywords(spark, docs):
    corpus = docs.filter(F.col("doc_id") != 7)
    out = textstats.tfidf_keywords(corpus, top_k=3)
    rows = [r for r in out.collect()]
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # ranks are 1..k per doc, scores non-increasing
    for d, rs in by_doc.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert all(a["tfidf"] >= b["tfidf"] for a, b in zip(rs, rs[1:]))
    # a term appearing in every doc has idf 0 → never a keyword;
    # doc 5's distinctive terms float to the top
    terms5 = {r["term"] for r in by_doc[5]}
    assert terms5 & {"spark", "shuffles", "engines", "query", "completely"}
    # stopwords and short words never appear
    assert all(len(r["term"]) >= 3 and r["term"] not in textstats.STOPWORDS for r in rows)
    # deterministic across parallelism
    again = {(r["doc_id"], r["rank"], r["term"]) for r in
             textstats.tfidf_keywords(corpus.repartition(5), top_k=3).collect()}
    assert again == {(r["doc_id"], r["rank"], r["term"]) for r in rows}


def test_winnow_guarantee_and_tiebreak(spark):
    """The winnowing guarantee: two documents sharing a passage of
    ≥ window+k-1 (= 8) words select at least one common fingerprint
    hash; a sub-window doc yields its single min; selection is
    deterministic across parallelism."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words
    rows = [
        (1, f"one two three {shared} four five six"),
        (2, f"{shared} totally different tail words here"),
        (3, "tiny doc"),  # < k words → single whole-doc shingle
        (4, "unrelated content about graphs and joins entirely"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = textstats.winnow_fingerprints(df, k=5, window=4)
    fps = {}
    for r in out.collect():
        fps.setdefault(r["doc_id"], set()).add(r["hash"])
    assert fps[1] & fps[2], "shared 8-word passage must share a fingerprint"
    assert not (fps[4] & fps[1])
    assert len(fps[3]) == 1  # one window, one min
    # positions are in-range and the selection replays bit-for-bit
    again = {
        (r["doc_id"], r["pos"], r["hash"])
        for r in textstats.winnow_fingerprints(df.repartition(3), k=5, window=4).collect()
    }
    assert again == {(r["doc_id"], r["pos"], r["hash"]) for r in out.collect()}


def test_winnow_pairs_finds_shared_passages(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, f"intro words {shared} closing remarks here"),
        (2, f"{shared} and then something else entirely follows"),
        (3, "no overlap with anything else in this corpus at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]): r["n_shared"]
           for r in textstats.winnow_pairs(df, min_shared=2).collect()}
    assert (1, 2) in got and got[(1, 2)] >= 2
    assert not any(3 in k for k in got)


# ---------------------------------------------- host-scoped curation ops


def test_line_dedup_host_scopes_boilerplate_to_the_host(spark):
    from gocrawl_spark import curation  # noqa: F401  (shared import style)

    docs = spark.createDataFrame(
        [
            (1, "a.com", "Footer of A\nbody alpha\nshared quote line"),
            (2, "a.com", "Footer of A\nbody beta"),
            (3, "a.com", "Footer of A\nbody gamma"),
            (4, "a.com", "Footer of A\nbody delta"),
            (5, "b.com", "Footer of B\nbody epsilon\nshared quote line"),
            (6, "b.com", "Footer of B\nbody zeta"),
        ],
        "doc_id long, source string, text string",
    )
    got = {
        r["doc_id"]: r
        for r in dedup.line_dedup_host(docs, min_docs=2, min_frac=0.25).collect()
    }
    # the per-host footers repeat in 100% of their host's docs -> cut
    assert got[2]["text"] == "body beta"
    assert got[6]["text"] == "body zeta"
    # 'shared quote line' spans two docs but on DIFFERENT hosts: the
    # host-scoped rule keeps it (1 doc per host each) while the
    # corpus-global line_dedup drops it
    assert got[1]["text"] == "body alpha\nshared quote line"
    assert got[5]["text"] == "body epsilon\nshared quote line"
    global_got = {r["doc_id"]: r for r in dedup.line_dedup(docs, min_docs=2).collect()}
    assert global_got[1]["text"] == "body alpha"
    # n_lines counts the input, n_kept the survivors
    assert got[1]["n_lines"] == 3 and got[1]["n_kept"] == 2


def test_line_dedup_host_min_frac_gate(spark):
    # 2 of 10 docs share a line: >= min_docs=2 but < ceil(0.25*10)=3,
    # so the frac gate keeps it; with min_frac=0 it dies
    rows = [(i, "h.com", f"body {i}" + ("\nrare shared" if i < 2 else ""))
            for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    frac = {r["doc_id"]: r for r in
            dedup.line_dedup_host(docs, min_docs=2, min_frac=0.25).collect()}
    nofrac = {r["doc_id"]: r for r in
              dedup.line_dedup_host(docs, min_docs=2, min_frac=0.0).collect()}
    assert frac[0]["text"] == "body 0\nrare shared"
    assert nofrac[0]["text"] == "body 0"


def test_host_stats_rollup_and_keep_gate(spark):
    from gocrawl_spark import curation

    good = ("This is a perfectly reasonable sentence that has the "
            "usual mix of stopwords and content for a web page.") * 3
    docs = spark.createDataFrame(
        [
            (1, "mirror.com", good, "en"),
            (2, "mirror.com", good, "en"),          # byte-copy of 1
            (3, "mirror.com", good + " extra", "en"),
            (4, "fine.com", good, "en"),
            (5, "fine.com", good + " more words", "de"),
            (6, "junk.com", "$$$ !!! ###", "en"),
        ],
        "doc_id long, source string, text string, lang string",
    )
    got = {r["host"]: r for r in curation.host_stats(docs).collect()}
    m = got["mirror.com"]
    assert m["n_docs"] == 3 and m["n_langs"] == 1
    assert m["dup_rate"] == pytest.approx(1 - 2 / 3, abs=1e-6)
    f = got["fine.com"]
    assert f["dup_rate"] == 0.0 and f["n_langs"] == 2 and f["keep"] is True
    # junk.com: symbol soup scores low quality -> cut wholesale
    assert got["junk.com"]["keep"] is False
    # mirror.com: dup_rate 0.333 <= 0.5 and decent quality -> kept;
    # tighten the gate and it dies
    assert m["keep"] is True
    tight = {r["host"]: r for r in
             curation.host_stats(docs, max_dup_rate=0.2).collect()}
    assert tight["mirror.com"]["keep"] is False
    # token totals are exact integer sums
    assert f["n_tokens"] == (
        docs.filter("source = 'fine.com'")
        .select(F.sum(textstats.token_count("text"))).first()[0]
    )


def test_clf_score_inference_contract(spark):
    from gocrawl_spark import curation

    docs = spark.createDataFrame(
        [(1, "hello"), (2, "hello world"), (3, "")],
        "doc_id long, text string",
    )
    # all-ones weights: every feature contributes +1, mean = 1,
    # score = sigmoid(1) for any non-empty doc
    ones = spark.range(1024).select(
        F.col("id").cast("int").alias("bucket"), F.lit(1.0).alias("weight")
    )
    got = {r["doc_id"]: r for r in
           curation.clf_score(docs, ones, buckets=1024).collect()}
    sig1 = round(1 / (1 + __import__("math").exp(-1.0)), 6)
    assert got[1]["n_feats"] == 1 and got[1]["score"] == pytest.approx(sig1)
    # 'hello world' -> 2 unigrams + 1 bigram = 3 occurrences, mean 1
    assert got[2]["n_feats"] == 3 and got[2]["score"] == pytest.approx(sig1)
    # featureless doc scores sigmoid(bias)=0.5 and keeps at >= 0.5
    assert got[3]["n_feats"] == 0 and got[3]["score"] == 0.5
    assert got[3]["keep"] is True
    # md5 stand-in weights reproduce the hand computation end-to-end
    w = curation.hash_weights(spark, buckets=1024, seed="quality-clf")
    got_h = curation.clf_score(docs, w, buckets=1024).collect()
    bucket = int(hashlib.md5(b"hello").hexdigest()[:8], 16) % 1024
    wt = round(
        int(hashlib.md5(f"quality-clf:{bucket}".encode()).hexdigest()[:8], 16)
        / 2**32 * 2 - 1, 6)
    import math
    expect = round(1 / (1 + math.exp(-round(wt, 6))), 6)
    one = {r["doc_id"]: r for r in got_h}[1]
    assert one["score"] == pytest.approx(expect, abs=2e-6)


def test_mixture_select_matches_naive_window(spark):
    from pyspark.sql import Window as W

    from gocrawl_spark import curation

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    quotas = {"en": 900, "de": 1, "fr": 10**9, "es": 0}
    got = curation.mixture_select(docs, quotas)
    # naive form: per-lang global ordered cumsum over the same key
    t = docs.select(
        "doc_id", "lang",
        textstats.token_count("text").alias("n_tokens"),
        curation.shuffle_key("doc_id").alias("_k"),
    )
    w = (W.partitionBy("lang").orderBy("_k", "doc_id")
         .rowsBetween(W.unboundedPreceding, -1))
    quota_expr = F.create_map(
        *[x for l, v in quotas.items() for x in (F.lit(l), F.lit(v))]
    )
    naive = (
        t.filter(F.col("lang").isin(*quotas))
        .withColumn("cb", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .select("doc_id", "lang", "n_tokens",
                (F.col("cb") < quota_expr[F.col("lang")]).alias("keep"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))
    rows = got.collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    # es: zero quota keeps nothing; fr: huge quota keeps everything
    assert not any(r["keep"] for r in by_lang["es"])
    assert all(r["keep"] for r in by_lang["fr"])
    # de: quota 1 keeps exactly the straddler (first doc in key order)
    assert sum(r["keep"] for r in by_lang["de"]) == 1
    # en: kept tokens stop at the straddler — tokens-before < quota
    kept_en = sum(r["n_tokens"] for r in by_lang["en"] if r["keep"])
    assert kept_en >= 900
    # zh is absent from quotas -> excluded entirely
    assert "zh" not in by_lang and docs.filter("lang = 'zh'").count() > 0


def test_fuzzy_topk_expands_typos(spark):
    docs = spark.createDataFrame(
        [
            (1, "table scan table scan"),
            (2, "the sable was scanned"),
            (3, "completely unrelated words here"),
            (4, "tble appears verbatim"),
        ],
        "doc_id long, text string",
    )
    # 'tble' -> table (ins), tble (exact); NOT sable (prefix 't' gate)
    exp = search.fuzzy_expansions(
        docs, "tble", text_col="text", fuzziness=1, prefix_length=1
    ).collect()
    terms = {r["term"]: r["distance"] for r in exp}
    assert terms == {"table": 1, "tble": 0}
    got = search.fuzzy_topk(
        docs, "tble scann", text_col="text", id_col="doc_id", k=10,
        fuzziness=1, prefix_length=1,
    ).collect()
    scores = {r["id"]: r["score"] for r in got}
    # doc1: table x2 + scan x2 = 4; doc4: tble x1; doc2/3: nothing
    # ('scanned' is distance 3, 'sable' fails the prefix gate)
    assert scores == {1: 4.0, 4: 1.0}
    assert [r["id"] for r in got] == [1, 4]


def test_fuzzy_prefix_length_clamps_at_term_length(spark):
    docs = spark.createDataFrame(
        [(1, "cat cats coat dog")], "doc_id long, text string"
    )
    # prefix_length 10 > len('cat'): ES clamps at the term length, so
    # longer candidates sharing the full 3-char prefix still expand
    exp = search.fuzzy_expansions(
        docs, "cat", text_col="text", fuzziness=1, prefix_length=10
    ).collect()
    terms = {r["term"]: r["distance"] for r in exp}
    assert terms == {"cat": 0, "cats": 1}
    # and an ordinary in-range prefix still gates as before
    exp2 = search.fuzzy_expansions(
        docs, "cat", text_col="text", fuzziness=2, prefix_length=2
    ).collect()
    assert {r["term"] for r in exp2} == {"cat", "cats"}  # 'coat' fails 'ca'


def test_fuzzy_expansions_cap_is_deterministic(spark):
    rows = [(i, f"word w{i:03d}x filler") for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    exp = search.fuzzy_expansions(
        docs, "w000x", text_col="text", fuzziness=1, prefix_length=1,
        max_expansions=5,
    ).collect()
    # many vocab terms at distance 1; the cap keeps the 5 smallest
    # (distance, term) — w000x itself first, then lexicographic
    assert [r["term"] for r in exp] == [
        "w000x", "w001x", "w002x", "w003x", "w004x"
    ]


def test_highlight_topk_wraps_earliest_match(spark):
    docs = spark.createDataFrame(
        [
            (1, "Intro words first, then the batch window opens for Batch jobs."),
            (2, "window " + "x" * 200),
            (3, "nothing relevant in this one"),
        ],
        "doc_id long, text string",
    )
    got = {r["id"]: r for r in search.highlight_topk(
        docs, "window batch", text_col="text", id_col="doc_id", k=10
    ).collect()}
    # doc3 never matches; doc1 scores 3 (batch x2 + window x1)
    assert 3 not in got and got[1]["score"] == 3.0
    # earliest occurrence wins ('batch' at char 28 < 'window' at 34),
    # original casing preserved, span wrapped
    assert "<em>batch</em> window" in got[1]["snippet"]
    # match at the string head: window starts at pos 1, lead is empty
    assert got[2]["snippet"].startswith("<em>window</em>")
    # fragment is bounded: lead<=30 chars + pre/post + 80-char window
    assert len(got[2]["snippet"]) <= 80 + len("<em></em>")


def test_cluster_representatives_elect_by_score(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    clusters = dedup.dup_clusters(pairs)
    scores = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (10, 0.5), (11, 0.4)],
        "doc_id long, score double",
    )
    got = {r["doc_id"]: r for r in
           dedup.cluster_representatives(clusters, scores).collect()}
    # cluster {1,2,3}: 2 and 3 tie on score, smaller id wins -> 2
    assert got[2]["is_kept"] is True
    assert got[1]["is_kept"] is False and got[3]["is_kept"] is False
    # min-id canonical (1) loses to the higher-quality member
    assert got[1]["cluster_id"] == 1 and got[1]["cluster_size"] == 3
    # cluster {10,11}: 10 wins on score
    assert got[10]["is_kept"] is True and got[11]["is_kept"] is False
    # exactly one survivor per cluster
    kept = [r for r in got.values() if r["is_kept"]]
    assert sorted(r["cluster_id"] for r in kept) == [1, 10]


def test_write_token_shards_round_trip(spark, tmp_path):
    import numpy as np

    from gocrawl_spark import curation

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "tok")
    curation.write_token_shards(docs, out, n_shards=4, vocab_size=32768)
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert {f.name for f in back.schema.fields} == {
        "doc_id", "n_ids", "tokens", "shard"
    }
    # blob decodes to exactly tokenize_ids' sequence, uint32 LE
    ids = {r["doc_id"]: list(r["ids"])
           for r in curation.tokenize_ids(docs, 32768).collect()}
    for r in back.collect():
        dec = np.frombuffer(r["tokens"], dtype="<u4").tolist()
        assert dec == ids[r["doc_id"]]
        assert r["n_ids"] == len(dec)
        # every id respects the hashed vocab bound
        assert all(0 <= i < 32768 for i in dec)
    # shard assignment matches the shuffle_shards contract: the
    # loader streaming shard dirs sees the same permutation
    sh = {r["doc_id"]: r["shard"]
          for r in curation.shuffle_shards(docs, 4).select("doc_id", "shard").collect()}
    got_sh = {r["doc_id"]: r["shard"] for r in back.collect()}
    assert got_sh == sh


def test_split_corpus_stable_membership(spark):
    from gocrawl_spark import curation

    fr = {"train": 0.75, "val": 0.125, "test": 0.125}
    small = spark.range(200).withColumnRenamed("id", "doc_id")
    big = spark.range(400).withColumnRenamed("id", "doc_id")
    s1 = {r["doc_id"]: r["split"]
          for r in curation.split_corpus(small, fr).collect()}
    s2 = {r["doc_id"]: r["split"]
          for r in curation.split_corpus(big, fr).collect()}
    # hash split: growing the corpus never moves existing docs
    assert all(s2[d] == s
               for d, s in s1.items())
    # all three bands are populated and fractions are roughly honored
    from collections import Counter
    c = Counter(s2.values())
    assert set(c) == {"train", "val", "test"}
    assert c["train"] > c["val"] and c["train"] > c["test"]
    # a different seed draws an independent split
    s3 = {r["doc_id"]: r["split"]
          for r in curation.split_corpus(big, fr, seed="other").collect()}
    assert any(s3[d] != s2[d] for d in s3)


def test_split_decontaminated_flags_cross_split_leaks(spark):
    from gocrawl_spark import curation

    def band(i):
        u = int(hashlib.md5(f"{i}:split".encode()).hexdigest()[:8], 16) / 2**32
        return "train" if u < 0.75 else ("val" if u < 0.875 else "test")

    ids = list(range(200))
    train_ids = [i for i in ids if band(i) == "train"]
    held_ids = [i for i in ids if band(i) != "train"]
    leak_train, leak_held = train_ids[0], held_ids[0]
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = []
    for i in (leak_train, leak_held):
        rows.append((i, shared))
    clean_train = train_ids[1]
    rows.append((clean_train, "totally different words that never repeat anywhere else at all"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in curation.split_decontaminated(
        docs, {"train": 0.75, "val": 0.125, "test": 0.125}
    ).collect()}
    # the engine's split matches the hand md5 bands
    assert got[leak_train]["split"] == "train"
    assert got[leak_held]["split"] in ("val", "test")
    # the train-side copy of a heldout doc is tainted; heldout never is
    assert got[leak_train]["tainted"] is True
    assert got[leak_held]["tainted"] is False
    assert got[clean_train]["tainted"] is False


def test_pack_token_sequences_replays_concat(spark):
    from gocrawl_spark import curation

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    L, S = 64, 4
    got = {(r["shard"], r["seq"]): list(r["ids"])
           for r in curation.pack_token_sequences(
               docs, seqlen=L, n_shards=S).collect()}
    # replay: per shard, concat ids in (key, doc_id) order, chunk by L
    ids_of = {r["doc_id"]: list(r["ids"])
              for r in curation.tokenize_ids(docs, 32768).collect()}
    import hashlib as _h
    by_shard = {}
    for d in ids_of:
        key = _h.md5(f"{d}:gocrawl".encode()).hexdigest()
        sh = int(key[:8], 16) % S
        by_shard.setdefault(sh, []).append((key, d))
    expect = {}
    for sh, docs_k in by_shard.items():
        stream = []
        for key, d in sorted(docs_k):
            stream.extend(ids_of[d])
        for s in range(0, (len(stream) + L - 1) // L):
            expect[(sh, s)] = stream[s * L:(s + 1) * L]
    assert got == expect
    # every window except each shard's last is exactly L long
    for sh in by_shard:
        seqs = sorted(s for (g, s) in got if g == sh)
        for s in seqs[:-1]:
            assert len(got[(sh, s)]) == L


def test_pack_greedy_bins_invariants_and_replay(spark):
    from gocrawl_spark import curation

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    B, S = 200, 4
    rows = curation.pack_greedy_bins(docs, budget=B, n_shards=S).collect()
    # capacity: per (shard, bin) sum of unit tokens <= budget;
    # pos is the running offset within the bin
    bins = {}
    for r in rows:
        bins.setdefault((r["shard"], r["bin"]), []).append(
            (r["pos"], r["n_tokens"], r["doc_id"], r["chunk"])
        )
    for units in bins.values():
        units.sort()
        fill = 0
        for pos, t, _, _ in units:
            assert pos == fill
            fill += t
        assert fill <= B
    # no truncation: a doc with n <= B appears as exactly one chunk-0 unit
    import hashlib as _h
    n_of = {r["doc_id"]: r["n"] for r in docs.selectExpr(
        "doc_id", "size(split(trim(text), '\\\\s+')) as n").collect()
        if r["n"] > 0}
    got_chunks = {}
    for r in rows:
        got_chunks.setdefault(r["doc_id"], []).append(
            (r["chunk"], r["n_tokens"]))
    for d, n in n_of.items():
        parts = sorted(got_chunks[d])
        if n <= B:
            assert parts == [(0, n)]
        else:
            assert sum(t for _, t in parts) == n
            assert all(t == B for _, t in parts[:-1])
    # full replay of next-fit-decreasing per shard
    units_by_shard = {}
    for d, n in n_of.items():
        sh = int(_h.md5(f"{d}:gocrawl".encode()).hexdigest()[:8], 16) % S
        nch = (n + B - 1) // B
        for c in range(nch):
            t = B if c < nch - 1 else n - (nch - 1) * B
            units_by_shard.setdefault(sh, []).append((t, d, c))
    expect = {}
    for sh, us in units_by_shard.items():
        us.sort(key=lambda x: (-x[0], x[1], x[2]))
        b, fill = 0, 0
        for t, d, c in us:
            if fill and fill + t > B:
                b, fill = b + 1, 0
            expect[(sh, d, c)] = (b, fill, t)
            fill += t
    got = {(r["shard"], r["doc_id"], r["chunk"]):
           (r["bin"], r["pos"], r["n_tokens"]) for r in rows}
    assert got == expect


def test_pack_token_sequences_boundaries(spark):
    from gocrawl_spark import curation

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    L, S = 64, 4
    rows = curation.pack_token_sequences(
        docs, seqlen=L, n_shards=S, boundaries=True
    ).collect()
    got = {(r["shard"], r["seq"]): (list(r["ids"]), list(r["doc_starts"]))
           for r in rows}
    # replay the per-shard concat stream, recording doc-start offsets
    ids_of = {r["doc_id"]: list(r["ids"])
              for r in curation.tokenize_ids(docs, 32768).collect()}
    import hashlib as _h
    by_shard = {}
    for d in ids_of:
        key = _h.md5(f"{d}:gocrawl".encode()).hexdigest()
        sh = int(key[:8], 16) % S
        by_shard.setdefault(sh, []).append((key, d))
    for sh, docs_k in by_shard.items():
        stream, starts = [], []
        for key, d in sorted(docs_k):
            if ids_of[d]:
                starts.append(len(stream))
                stream.extend(ids_of[d])
        for s in range(0, (len(stream) + L - 1) // L):
            want_ids = stream[s * L:(s + 1) * L]
            want_st = [x - s * L for x in starts if s * L <= x < (s + 1) * L]
            assert got[(sh, s)] == (want_ids, want_st)
    # boundary list is sorted and within-window
    for (sh, s), (ids, st) in got.items():
        assert st == sorted(st)
        assert all(0 <= x < len(ids) for x in st)


def test_query_string_parser_shapes():
    """Lucene-subset parse: AND groups, OR splits, NOT, parens,
    field scoping, phrases, wildcards, default operator."""
    p = search.parse_query_string
    assert p({"query": "a AND b", "default_field": "t"}) == {
        "bool": {"must": [{"match": {"t": "a"}}, {"match": {"t": "b"}}]}
    }
    # default operator OR: bare adjacency -> should of matches
    assert p({"query": "a b", "default_field": "t"}) == {
        "bool": {"should": [{"match": {"t": "a"}}, {"match": {"t": "b"}}]}
    }
    assert p({"query": "a b", "default_field": "t",
              "default_operator": "AND"}) == {
        "bool": {"must": [{"match": {"t": "a"}}, {"match": {"t": "b"}}]}
    }
    assert p({"query": 'x AND NOT y', "default_field": "t"}) == {
        "bool": {"must": [{"match": {"t": "x"}}],
                 "must_not": [{"match": {"t": "y"}}]}
    }
    assert p({"query": 'lang:de OR title:"fast merge"',
              "default_field": "t"}) == {
        "bool": {"should": [{"match": {"lang": "de"}},
                            {"match_phrase": {"title": "fast merge"}}]}
    }
    assert p({"query": "sca*", "default_field": "t"}) == {
        "token_wildcard": {"t": "sca*"}
    }
    assert p({"query": "a AND (b OR c)", "default_field": "t"}) == {
        "bool": {"must": [
            {"match": {"t": "a"}},
            {"bool": {"should": [{"match": {"t": "b"}},
                                 {"match": {"t": "c"}}]}},
        ]}
    }
    import pytest as _pytest
    with _pytest.raises(ValueError):
        p({"query": "a)", "default_field": "t"})


def test_bool_wildcard_and_query_string_leaves(spark):
    rows = [
        (1, "alpha beta scanner", "news-a"),
        (2, "alpha scans scanned", "blog-b"),
        (3, "beta gamma", "news-b"),
        (4, "alpha beta", "spam"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    # raw wildcard: case-sensitive, * and ? on the keyword field
    got = search.bool_topk(
        df, {"filter": [{"wildcard": {"source": "news-?"}}]},
        id_col="doc_id", k=10,
    ).collect()
    assert sorted(r["id"] for r in got) == [1, 3]
    assert all(r["score"] == 0.0 for r in got)  # filter never scores
    # token wildcard via query_string: scores count matching tokens
    got2 = search.bool_topk(
        df,
        {"must": [{"query_string": {"query": "alpha AND scan*",
                                    "default_field": "text"}}]},
        id_col="doc_id", k=10,
    ).collect()
    scores = {r["id"]: r["score"] for r in got2}
    # doc1: alpha(1)+scanner(1)=2; doc2: alpha(1)+scans+scanned(2)=3
    assert scores == {1: 2.0, 2: 3.0}
    # NOT prunes, phrase matches consecutively
    got3 = search.bool_topk(
        df,
        {"must": [{"query_string": {
            "query": '"alpha beta" AND NOT gamma', "default_field": "text"}}]},
        id_col="doc_id", k=10,
    ).collect()
    assert sorted(r["id"] for r in got3) == [1, 4]


def test_es_aggs_histogram_fills_empty_buckets(spark):
    rows = [(1, 5), (2, 7), (3, 250), (4, 255)]
    df = spark.createDataFrame(rows, "id long, v long")
    out = search.es_aggs(
        df, {"h": {"histogram": {"field": "v", "interval": 100}}}
    ).collect()
    assert [(r["key"], r["doc_count"]) for r in out] == [
        (0.0, 2), (100.0, 0), (200.0, 2),
    ]


def test_es_aggs_nested_bucket_flatten(spark):
    rows = [
        ("en", "a", 10), ("en", "a", 20), ("en", "b", 30), ("en", "c", 1),
        ("de", "b", 5), ("de", "b", 6), ("de", "c", 7),
    ]
    df = spark.createDataFrame(rows, "lang string, src string, n long")
    out = search.es_aggs(
        df,
        {"by_lang": {"terms": {"field": "lang", "size": 2},
                     "aggs": {"sum_n": {"sum": {"field": "n"}},
                              "by_src": {"terms": {"field": "src", "size": 2},
                                         "aggs": {"max_n": {"max": {"field": "n"}}}}}}}
    ).collect()
    flat = [(r["key"], r["doc_count"], r["sum_n"], r["by_src_key"],
             r["by_src_doc_count"], r["by_src_max_n"]) for r in out]
    # outer: en(4) then de(3); inner top-2 per outer by (count desc, key)
    assert flat == [
        ("en", 4, 61, "a", 2, 20),
        ("en", 4, 61, "b", 1, 30),
        ("de", 3, 18, "b", 2, 6),
        ("de", 3, 18, "c", 1, 7),
    ]


def test_es_aggs_range_overlap_and_empty(spark):
    rows = [(1, 10), (2, 20), (3, 120), (4, 130), (5, 500)]
    df = spark.createDataFrame(rows, "id long, v long")
    spec = {
        "r": {
            "range": {
                "field": "v",
                "ranges": [
                    {"to": 100},
                    {"from": 100, "to": 200},
                    {"from": 110, "to": 600},
                    {"from": 200, "to": 300},
                ],
            },
            "aggs": {"sum_v": {"sum": {"field": "v"}}},
        }
    }
    out = [(r["key"], r["doc_count"], r["sum_v"])
           for r in search.es_aggs(df, spec).collect()]
    # declared order; docs 120/130 land in BOTH overlapping ranges;
    # 200-300 is empty but still emits (sum over no rows is null)
    assert out == [
        ("*-100", 2, 30),
        ("100-200", 2, 250),
        ("110-600", 3, 750),
        ("200-300", 0, None),
    ]


def test_bool_fuzzy_leaf_and_tilde_syntax(spark):
    rows = [
        (1, "the table holds data", "en"),
        (2, "a tables stack", "en"),
        (3, "tuble tuble tuble", "en"),   # distance-1 neighbor, 3 hits
        (4, "nothing relevant here", "en"),
        (5, "the table again", "de"),     # excluded by must_not
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = search.bool_topk(
        df,
        {
            "must": [{"fuzzy": {"text": {"value": "tble", "fuzziness": 1}}}],
            "must_not": [{"term": {"lang": "de"}}],
        },
        id_col="doc_id", k=10,
    ).collect()
    scores = {r["id"]: r["score"] for r in got}
    # expansions of 'tble' (prefix 't', lev<=1): table, tuble (not
    # tables: distance 2)
    assert scores == {1: 1.0, 3: 3.0}
    # Lucene tilde syntax routes through the same fuzzy leaf
    assert search.parse_query_string(
        {"query": "tble~ AND exact", "default_field": "text"}
    ) == {"bool": {"must": [
        {"fuzzy": {"text": {"value": "tble", "fuzziness": 1}}},
        {"match": {"text": "exact"}},
    ]}}
    assert search.parse_query_string(
        {"query": "word~2", "default_field": "t"}
    ) == {"fuzzy": {"t": {"value": "word", "fuzziness": 2}}}
    # zero expansions -> never-match, not match-all
    got2 = search.bool_topk(
        df, {"must": [{"fuzzy": {"text": "zzzqqq"}}]}, id_col="doc_id", k=10
    ).collect()
    assert got2 == []


def test_es_aggs_stats_and_percentiles(spark):
    rows = [("a", 10), ("a", 20), ("a", 30), ("b", 100)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {r["key"]: r for r in search.es_aggs(
        df,
        {"by_g": {"terms": {"field": "g", "size": 5},
                  "aggs": {"s": {"stats": {"field": "v"}},
                           "p": {"percentiles": {"field": "v",
                                                 "percents": [50]}}}}}
    ).collect()}
    a = out["a"]
    assert (a["s_count"], a["s_min"], a["s_max"], a["s_avg"], a["s_sum"]) \
        == (3, 10, 30, 20.0, 60)
    assert a["p_p50"] == 20.0
    assert out["b"]["p_p50"] == 100.0
    # bare multi-valued metric
    bare = search.es_aggs(df, {"vs": {"stats": {"field": "v"}}}).collect()[0]
    assert (bare["vs_count"], bare["vs_sum"]) == (4, 160)
    # range agg carries multi-valued metrics per bucket
    rng = search.es_aggs(
        df,
        {"r": {"range": {"field": "v", "ranges": [{"to": 50}, {"from": 50}]},
               "aggs": {"s": {"stats": {"field": "v"}}}}}
    ).collect()
    assert [(r["key"], r["doc_count"], r["s_sum"]) for r in rng] == [
        ("*-50", 3, 60), ("50-*", 1, 100),
    ]


def test_es_aggs_filters_buckets(spark):
    rows = [
        (1, "alpha beta", "en", 50),
        (2, "alpha", "de", 500),
        (3, "gamma", "en", 150),
    ]
    df = spark.createDataFrame(rows, "id long, text string, lang string, n long")
    out = [(r["key"], r["doc_count"], r["sum_n"]) for r in search.es_aggs(
        df,
        {"f": {"filters": {"filters": {
                   "has_alpha": {"match": {"text": "alpha"}},
                   "big": {"range": {"n": {"gte": 100}}},
                   "none": {"term": {"lang": "fr"}},
               }},
               "aggs": {"sum_n": {"sum": {"field": "n"}}}}}
    ).collect()]
    # declared order, overlap allowed (doc 2 in both), empty kept
    assert out == [
        ("has_alpha", 2, 550),
        ("big", 2, 650),
        ("none", 0, None),
    ]


def test_bool_regexp_and_ids_leaves(spark):
    rows = [(1, "x", "src1"), (2, "x", "src22"), (3, "x", "other")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = search.bool_topk(
        df, {"filter": [{"regexp": {"source": "src[0-9]+"}}]},
        id_col="doc_id", k=10,
    ).collect()
    # anchored: matches whole value only (src1, src22; not 'other')
    assert sorted(r["id"] for r in got) == [1, 2]
    got2 = search.bool_topk(
        df, {"filter": [{"ids": {"values": [2, 3]}}]}, id_col="doc_id", k=10
    ).collect()
    assert sorted(r["id"] for r in got2) == [2, 3]
    # regexp is NOT substring-matched
    got3 = search.bool_topk(
        df, {"filter": [{"regexp": {"source": "rc[0-9]"}}]},
        id_col="doc_id", k=10,
    ).collect()
    assert got3 == []


def test_es_search_request_body(spark):
    rows = [
        (1, "alpha beta alpha", "en", 10),
        (2, "alpha", "de", 100),
        (3, "beta beta", "en", 100),   # no alpha -> out of scope
        (4, "alpha beta", "en", 100),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, n long")
    out = search.es_search(
        df,
        {"query": {"bool": {"must": [{"match": {"text": "alpha"}}],
                            "filter": [{"range": {"n": {"gte": 50}}}]}},
         "aggs": {"by_lang": {"terms": {"field": "lang", "size": 5},
                              "aggs": {"sum_n": {"sum": {"field": "n"}}}}},
         "size": 1},
        id_col="doc_id",
    )
    # hits: docs 2 and 4 match (score 1.0 each), size=1 keeps id 2
    assert [(r["id"], r["score"]) for r in out["hits"].collect()] == [(2, 1.0)]
    assert out["total"].collect()[0]["total"] == 2
    # aggs run over the FILTERED scope (docs 2, 4), not the corpus
    aggs = [(r["key"], r["doc_count"], r["sum_n"])
            for r in out["aggs"].collect()]
    assert aggs == [("de", 1, 100), ("en", 1, 100)]
    # no aggs requested -> no aggs key; default match_all query
    out2 = search.es_search(df, {"size": 10}, id_col="doc_id")
    assert "aggs" not in out2
    assert out2["total"].collect()[0]["total"] == 4


def test_match_operator_and_and_fuzziness(spark):
    rows = [
        (1, "alpha beta gamma"),
        (2, "alpha alpha"),
        (3, "beta"),
        (4, "alpka beta"),  # typo of alpha
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # operator and: both terms required; score still sums TFs
    got = search.bool_topk(
        df,
        {"must": [{"match": {"text": {"query": "alpha beta",
                                      "operator": "and"}}}]},
        id_col="doc_id", k=10,
    ).collect()
    assert {r["id"]: r["score"] for r in got} == {1: 2.0}
    # fuzziness: each term expands against the vocab (alpka ~ alpha)
    got2 = search.bool_topk(
        df,
        {"must": [{"match": {"text": {"query": "alpha", "fuzziness": 1}}}]},
        id_col="doc_id", k=10,
    ).collect()
    assert sorted(r["id"] for r in got2) == [1, 2, 4]


def test_terms_agg_order_option(spark):
    rows = [("a", 1), ("a", 2), ("b", 10), ("c", 5), ("c", 6), ("c", 7)]
    df = spark.createDataFrame(rows, "g string, v long")
    spec_key = {"t": {"terms": {"field": "g", "size": 2,
                                "order": {"_key": "asc"}}}}
    assert [r["key"] for r in search.es_aggs(df, spec_key).collect()] \
        == ["a", "b"]
    spec_metric = {"t": {"terms": {"field": "g", "size": 3,
                                   "order": {"sum_v": "desc"}},
                         "aggs": {"sum_v": {"sum": {"field": "v"}}}}}
    assert [(r["key"], r["sum_v"])
            for r in search.es_aggs(df, spec_metric).collect()] \
        == [("c", 18), ("b", 10), ("a", 3)]


def test_es_aggs_composite_pagination(spark):
    rows = [("a", "x", 1), ("a", "y", 2), ("b", "x", 3),
            ("b", "y", 4), ("c", "x", 5)]
    df = spark.createDataFrame(rows, "g string, h string, v long")
    base = {"composite": {"size": 2, "sources": [
        {"g": {"terms": {"field": "g"}}},
        {"h": {"terms": {"field": "h"}}},
    ]}}
    page1 = search.es_aggs(df, {"c": dict(base)}).collect()
    assert [(r["g"], r["h"]) for r in page1] == [("a", "x"), ("a", "y")]
    spec2 = {"c": {"composite": {**base["composite"],
                                 "after": {"g": "a", "h": "y"}},
                   "aggs": {"sum_v": {"sum": {"field": "v"}}}}}
    page2 = search.es_aggs(df, spec2).collect()
    assert [(r["g"], r["h"], r["sum_v"]) for r in page2] \
        == [("b", "x", 3), ("b", "y", 4)]
    # pages tile the bucket space: walking to exhaustion sees all 5
    spec3 = {"c": {"composite": {**base["composite"],
                                 "after": {"g": "b", "h": "y"}}}}
    page3 = search.es_aggs(df, spec3).collect()
    assert [(r["g"], r["h"]) for r in page3] == [("c", "x")]


def test_es_aggs_top_hits(spark):
    rows = [("a", 1, 30), ("a", 2, 20), ("a", 3, 10),
            ("b", 4, 5), ("b", 5, 50)]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    out = search.es_aggs(
        df,
        {"t": {"terms": {"field": "g", "size": 2},
               "aggs": {"top": {"top_hits": {
                   "size": 2, "sort": [{"v": "desc"}],
                   "_source": ["id", "v"]}}}}}
    ).collect()
    flat = [(r["key"], r["doc_count"], r["top_rank"], r["id"], r["v"])
            for r in out]
    assert flat == [
        ("a", 3, 1, 1, 30),
        ("a", 3, 2, 2, 20),
        ("b", 2, 1, 5, 50),
        ("b", 2, 2, 4, 5),
    ]
    import pytest as _p
    with _p.raises(ValueError):
        search.es_aggs(df, {"t": {"terms": {"field": "g"},
            "aggs": {"h1": {"top_hits": {"_source": ["id"]}},
                     "h2": {"top_hits": {"_source": ["id"]}}}}})


def test_media_phash_pairs(spark):
    from gocrawl_spark import multimodal as mm

    # reposted copies use ids congruent mod 13 so the synthetic
    # payload (seed * (4 + doc_id % 13)) is byte-identical
    docs = spark.createDataFrame(
        [(i, f"unique text {i}") for i in range(20)]
        + [(i + 13, f"unique text {i}") for i in range(3)],
        "doc_id long, text string",
    )
    media = mm.synth_media(spark, docs, "video")
    feats = mm.extract_features(media)
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in mm.phash_pairs(feats).collect()}
    # every repost pairs with its source at hamming 0
    for i in range(3):
        assert got[(i * 10 + 3, (i + 13) * 10 + 3)] == 0
    # phash bits are the digest MSBs (pure column expr, no UDF)
    bits = {r["media_id"]: list(r["bits"])
            for r in mm.phash(feats).collect()}
    import hashlib
    one = feats.filter("media_id = 3").collect()[0]
    want = [1 if int(one["payload_sha"][2 * i], 16) >= 8 else 0
            for i in range(32)]
    assert bits[3] == want


def test_es_aggs_pipeline_cumsum_derivative(spark):
    rows = [(1, 5), (2, 7), (3, 250), (4, 255), (5, 260)]
    df = spark.createDataFrame(rows, "id long, v long")
    out = search.es_aggs(
        df,
        {"h": {"histogram": {"field": "v", "interval": 100},
               "aggs": {"cum": {"cumulative_sum": {"buckets_path": "_count"}},
                        "d": {"derivative": {"buckets_path": "_count"}}}}}
    ).collect()
    flat = [(r["key"], r["doc_count"], r["cum"], r["d"]) for r in out]
    # empty bucket 100 participates in the series (count 0)
    assert flat == [
        (0.0, 2, 2, None),
        (100.0, 0, 2, -2),
        (200.0, 3, 5, 3),
    ]
    import pytest as _p
    with _p.raises(ValueError):
        search.es_aggs(df, {"t": {"terms": {"field": "v"},
            "aggs": {"c": {"cumulative_sum": {"buckets_path": "_count"}}}}})


def test_es_aggs_tail2_kinds(spark):
    """extended_stats / rare_terms / multi_terms / date_range /
    missing — hand-checkable on a tiny frame."""
    rows = [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, None, 40)]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    es = search.es_aggs(df, {"s": {"extended_stats": {"field": "v"}}}).collect()[0]
    # n=4: sum 100, soq 3000, avg 25, var = 750 - 625 = 125
    assert (es["s_count"], es["s_sum"], es["s_sum_of_squares"]) == (4, 100, 3000)
    assert es["s_avg"] == 25.0 and es["s_variance"] == 125.0
    rare = search.es_aggs(df, {"r": {"rare_terms": {"field": "g"}}}).collect()
    assert [(r["key"], r["doc_count"]) for r in rare] == [("b", 1)]
    mt = search.es_aggs(df, {"m": {"multi_terms": {
        "terms": [{"field": "g"}, {"field": "v"}], "size": 2}}}).collect()
    assert [(r["g"], r["v"], r["doc_count"]) for r in mt] == [
        ("a", 10, 1), ("a", 20, 1)]
    miss = search.es_aggs(df, {"nog": {"missing": {"field": "g"},
        "aggs": {"mv": {"max": {"field": "v"}}}}}).collect()[0]
    assert (miss["key"], miss["doc_count"], miss["mv"]) == ("nog", 1, 40)
    ts = spark.createDataFrame(
        [(1, "2024-01-05 00:00:00"), (2, "2024-01-15 00:00:00")],
        "id long, t string").selectExpr("id", "timestamp(t) AS ts")
    dr = search.es_aggs(ts, {"w": {"date_range": {"field": "ts", "ranges": [
        {"to": "2024-01-10"}, {"from": "2024-01-10"}]}}}).collect()
    assert [(r["key"], r["doc_count"]) for r in dr] == [
        ("*-2024-01-10", 1), ("2024-01-10-*", 1)]


def test_es_aggs_histogram_and_terms_options(spark):
    import datetime as dt
    df = spark.createDataFrame(
        [(1, 12, "a"), (2, 130, "a"), (3, 130, None)],
        "id long, v long, g string")
    # offset grid + extended bounds + min_doc_count interplay
    h = search.es_aggs(df, {"h": {"histogram": {
        "field": "v", "interval": 100, "offset": 25,
        "extended_bounds": {"min": -100, "max": 300}}}}).collect()
    assert [(r["key"], r["doc_count"]) for r in h] == [
        (-175.0, 0), (-75.0, 1), (25.0, 0), (125.0, 2), (225.0, 0)]
    h2 = search.es_aggs(df, {"h": {"histogram": {
        "field": "v", "interval": 100, "min_doc_count": 2}}}).collect()
    assert [(r["key"], r["doc_count"]) for r in h2] == [(100.0, 2)]
    # terms missing param buckets nulls under the stand-in
    t = search.es_aggs(df, {"t": {"terms": {
        "field": "g", "missing": "(none)"}}}).collect()
    assert sorted((r["key"], r["doc_count"]) for r in t) == [
        ("(none)", 1), ("a", 2)]
    # fixed_interval epoch floor (not calendar truncation)
    ts = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 13)), (2, dt.datetime(2024, 1, 1, 14))],
        "id long, ts timestamp")
    fx = search.es_aggs(ts, {"h": {"date_histogram": {
        "field": "ts", "fixed_interval": "12h"}}}).collect()
    assert [(r["key"].hour, r["doc_count"]) for r in fx] == [(12, 2)]
    # weighted_avg: (12·1 + 130·3)/(1+3) = 100.5
    wdf = spark.createDataFrame([(12, 1), (130, 3)], "v long, w long")
    wa = search.es_aggs(wdf, {"wa": {"weighted_avg": {
        "value": {"field": "v"}, "weight": {"field": "w"}}}}).collect()[0]
    assert wa["wa"] == 100.5
    # percentile_ranks: exact % of values ≤ v
    pr = search.es_aggs(wdf, {"p": {"percentile_ranks": {
        "field": "v", "values": [12, 200]}}}).collect()[0]
    assert (pr["p_r12"], pr["p_r200"]) == (50.0, 100.0)


def test_es_aggs_auto_date_histogram_ladder(spark):
    import datetime as dt
    mk = lambda rows: spark.createDataFrame(rows, "id long, ts timestamp")
    # 6-minute span, buckets=8 → 1m tier (1s..30s tiers overflow)
    tight = mk([(i, dt.datetime(2024, 1, 1, 0, i // 2, i % 2 * 20))
                for i in range(12)])
    o = search.es_aggs(tight, {"h": {"auto_date_histogram": {
        "field": "ts", "buckets": 8}}}).collect()
    assert {r["interval"] for r in o} == {"1m"} and len(o) == 6
    assert all(r["doc_count"] == 2 for r in o)
    # same data, generous budget → finest tier that fits
    o2 = search.es_aggs(tight, {"h": {"auto_date_histogram": {
        "field": "ts", "buckets": 1000}}}).collect()
    assert {r["interval"] for r in o2} == {"1s"} and len(o2) == 12
    # multi-year span at small budget → calendar year tier
    years = mk([(i, dt.datetime(2019 + i, 6, 1)) for i in range(6)])
    o3 = search.es_aggs(years, {"h": {"auto_date_histogram": {
        "field": "ts", "buckets": 8}}}).collect()
    assert {r["interval"] for r in o3} == {"1y"} and len(o3) == 6


def test_es_search_after_postfilter_global(spark):
    rows = [(i, "en" if i % 3 else "fr", i * 10) for i in range(1, 13)]
    df = spark.createDataFrame(rows, "id long, lang string, n long")
    body = {"query": {"term": {"lang": "en"}},
            "sort": [{"n": "desc"}], "size": 3}
    p1 = search.es_search(df, body)["hits"].collect()
    assert [r["id"] for r in p1] == [11, 10, 8]
    cur = [p1[-1]["n"], p1[-1]["id"]]
    p2 = search.es_search(df, dict(body, search_after=cur))["hits"].collect()
    assert [r["id"] for r in p2] == [7, 5, 4]  # no overlap, continues
    # cursor ties broken by the auto id tiebreak: equal n, higher id wins next
    dup = spark.createDataFrame(
        [(1, "en", 5), (2, "en", 5), (3, "en", 5)], "id long, lang string, n long")
    q1 = search.es_search(dup, {"sort": [{"n": "desc"}], "size": 1})["hits"].collect()
    q2 = search.es_search(dup, {"sort": [{"n": "desc"}], "size": 1,
                                "search_after": [5, q1[0]["id"]]})["hits"].collect()
    assert (q1[0]["id"], q2[0]["id"]) == (1, 2)
    import pytest as _p
    with _p.raises(ValueError):  # cursor arity must match effective sort
        search.es_search(df, dict(body, search_after=[50]))
    # post_filter narrows hits, NOT total/aggs
    r = search.es_search(df, {
        "query": {"term": {"lang": "en"}},
        "post_filter": {"range": {"n": {"gte": 100}}},
        "size": 100,
        "aggs": {"m": {"max": {"field": "n"}}}})
    assert r["hits"].count() == 2 and r["total"].collect()[0][0] == 8
    assert r["aggs"].collect()[0]["m"] == 110  # query scope, not post
    # global agg escapes the query scope entirely
    g = search.es_search(df, {
        "query": {"term": {"lang": "fr"}},
        "aggs": {"g": {"global": {}, "aggs": {
            "c": {"value_count": {"field": "id"}}}}}})
    assert g["aggs"].collect()[0]["c"] == 12


def test_es_aggs_terms_options_and_adjacency(spark):
    rows = [(1, "x", "red hat"), (2, "x", "red shoe"), (3, "y", "red hat"),
            (4, "zz", "blue hat"), (5, "zz", "blue hat")]
    df = spark.createDataFrame(rows, "id long, g string, txt string")
    # include as exact-values list; exclude regex; min_doc_count
    t = search.es_aggs(df, {"t": {"terms": {
        "field": "g", "include": ["x", "y", "zz"], "exclude": "y|q"}}}).collect()
    assert sorted((r["key"], r["doc_count"]) for r in t) == [("x", 2), ("zz", 2)]
    t2 = search.es_aggs(df, {"t": {"terms": {
        "field": "g", "min_doc_count": 2}}}).collect()
    assert sorted(r["key"] for r in t2) == ["x", "zz"]
    # inner nested terms honors min_doc_count too
    n = search.es_aggs(df, {"o": {"terms": {"field": "g"},
        "aggs": {"i": {"terms": {"field": "txt", "min_doc_count": 2}}}}}).collect()
    inner = {(r["key"], r["i_key"]): r["i_doc_count"] for r in n}
    assert inner[("zz", "blue hat")] == 2
    assert ("x", "red hat") not in inner  # count 1 < min_doc_count
    # adjacency_matrix with a match leaf (token path) + custom separator
    adj = search.es_aggs(df, {"adj": {"adjacency_matrix": {
        "separator": "+",
        "filters": {"red": {"match": {"txt": "red"}},
                    "hat": {"match": {"txt": "hat"}}}}}}).collect()
    got = {r["key"]: r["doc_count"] for r in adj}
    assert got == {"red": 3, "hat": 4, "hat+red": 2}


def test_es_aggs_pipeline_moving_script_sibling_selector(spark):
    rows = [(1, 5), (2, 7), (3, 250), (4, 255), (5, 260), (6, 510)]
    df = spark.createDataFrame(rows, "id long, v long")
    out = search.es_aggs(df, {"h": {
        "histogram": {"field": "v", "interval": 100},
        "aggs": {
            "avg_v": {"avg": {"field": "v"}},
            "mv": {"moving_fn": {"buckets_path": "_count", "window": 2,
                                 "script": "MovingFunctions.unweightedAvg"}},
            "ratio": {"bucket_script": {
                "buckets_path": {"c": "_count", "a": "avg_v"},
                "script": "params.a / (params.c + 1)"}},
            "total": {"sum_bucket": {"buckets_path": "_count"}},
            "peak": {"max_bucket": {"buckets_path": "_count"}},
            "keep": {"bucket_selector": {
                "buckets_path": {"c": "_count"},
                "script": "params.c > 0"}},
        }}})
    flat = [(r["key"], r["doc_count"], r["mv"], r["ratio"], r["total"],
             r["peak"]) for r in out.collect()]
    # selector drops the filled empty buckets (100/300/400) AFTER the
    # moving window saw them; sibling aggs are series-wide constants
    assert flat == [
        (0.0, 2, None, 2.0, 6, 3),
        (200.0, 3, 1.0, 63.75, 6, 3),
        (500.0, 1, 0.0, 255.0, 6, 3),
    ]
    # shift=1 slides the window right so it ends at the current bucket
    shifted = search.es_aggs(df, {"h": {
        "histogram": {"field": "v", "interval": 100},
        "aggs": {"mv": {"moving_fn": {
            "buckets_path": "_count", "window": 2, "shift": 1,
            "script": "MovingFunctions.sum"}}}}})
    got = {r["key"]: r["mv"] for r in shifted.collect()}
    assert got[0.0] == 2 and got[100.0] == 2 and got[200.0] == 3
    # serial_diff lag 2 + sibling stats/percentiles over the series
    sd = search.es_aggs(df, {"h": {
        "histogram": {"field": "v", "interval": 100},
        "aggs": {"d2": {"serial_diff": {"buckets_path": "_count", "lag": 2}},
                 "st": {"stats_bucket": {"buckets_path": "_count"}},
                 "pb": {"percentiles_bucket": {"buckets_path": "_count",
                                               "percents": [50]}}}}}).collect()
    by = {r["key"]: r for r in sd}
    # series counts: [2,0,3,0,0,1] → lag-2 diffs from key 200 on
    assert by[200.0]["d2"] == 1 and by[300.0]["d2"] == 0 and by[0.0]["d2"] is None
    assert (by[0.0]["st_count"], by[0.0]["st_min"], by[0.0]["st_max"],
            by[0.0]["st_sum"]) == (6, 0, 3, 6)
    assert by[0.0]["st_avg"] == 1.0 and by[0.0]["pb_p50"] == 0.5
    import pytest as _p
    with _p.raises(ValueError):  # script syntax is allowlisted
        search.es_aggs(df, {"h": {
            "histogram": {"field": "v", "interval": 100},
            "aggs": {"x": {"bucket_script": {
                "buckets_path": {"c": "_count"},
                "script": "params.c; DROP TABLE docs"}}}}})
    with _p.raises(ValueError):  # unknown MovingFunctions entry
        search.es_aggs(df, {"h": {
            "histogram": {"field": "v", "interval": 100},
            "aggs": {"x": {"moving_fn": {
                "buckets_path": "_count", "window": 2,
                "script": "MovingFunctions.stdDev"}}}}})


def test_suggest_topk_prefix_and_ranking(spark):
    """Completion suggester: prefix slice of the vocab, doc-freq
    ranking, term tie-break, repeated in-doc terms counted once."""
    from gocrawl_spark import search

    docs = spark.createDataFrame(
        [
            (0, "cat cat cat dog"),      # 'cat' ×3 in one doc: df=1
            (1, "cat castle"),
            (2, "castle cart dog"),
            (3, "castle zebra"),
        ],
        "doc_id long, content string",
    )
    got = search.suggest_topk(docs, "ca", k=10).collect()
    assert [(r["term"], r["doc_freq"]) for r in got] == [
        ("castle", 3), ("cat", 2), ("cart", 1),
    ]
    # k cuts after ordering; ties broken on term asc
    got2 = search.suggest_topk(docs, "ca", k=2).collect()
    assert [r["term"] for r in got2] == ["castle", "cat"]
    assert search.suggest_topk(docs, "zz", k=5).count() == 0


def test_fim_transform_layouts(spark):
    """FIM reorder is lossless: PSM/SPM carry every original byte once,
    sentinels in the documented order; plain docs pass through."""
    from gocrawl_spark import curation

    docs = spark.createDataFrame(
        [(2, "abcdefghijkl"), (4, "abcdefghijkl"), (1, "abcdefghijkl"),
         (0, "")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in curation.fim_transform(docs).collect()}
    assert got[1]["fim_mode"] == "plain" and got[1]["fim_text"] == "abcdefghijkl"
    # doc 2: n=12, lo=min(12, 4+2)=6, hi=min(12, 8+2)=10 -> P=a..f M=g..j S=kl
    assert got[2]["fim_mode"] == "psm"
    assert got[2]["fim_text"] == "<fim_prefix>abcdef<fim_suffix>kl<fim_middle>ghij"
    # doc 4: lo=min(12,4+4)=8, hi=min(12,8+1)=9 -> P=a..h M=i S=jkl
    assert got[4]["fim_mode"] == "spm"
    assert got[4]["fim_text"] == "<fim_prefix><fim_suffix>jkl<fim_middle>abcdefghi"
    # reconstruction: stripping sentinels recovers a permutation that
    # contains every original char exactly once
    import re
    body = re.sub(r"<fim_(prefix|suffix|middle)>", "", got[2]["fim_text"])
    assert sorted(body) == sorted("abcdefghijkl")
    assert got[0]["fim_text"].startswith("<fim_prefix>")  # empty doc safe


def test_mlt_topk_semantics(spark):
    """more_like_this: the like-doc's rare terms drive similarity;
    common terms (high df, low idf) matter less; the like doc itself
    never appears; min_should_match gates thin overlaps."""
    from gocrawl_spark import search

    docs = spark.createDataFrame(
        [
            (1, "quantum entanglement spooky physics physics"),
            (2, "quantum entanglement experiments in physics"),
            (3, "spooky stories about entanglement"),
            (4, "cooking pasta with tomato sauce"),
            (5, "physics of cooking"),
        ],
        "doc_id long, content string",
    )
    got = search.mlt_topk(docs, 1, id_col="doc_id", k=10,
                          min_doc_freq=2, min_should_match_pct=50)
    rows = got.collect()
    ids = [r["id"] for r in rows]
    assert 1 not in ids            # like doc excluded
    assert ids[0] == 2             # shares quantum+entanglement+physics
    assert 4 not in ids            # no overlap at all
    # 50% gate: doc 5 shares only 'physics' (1 of >=3 selected terms)
    assert 5 not in ids
    assert all(r["score"] > 0 for r in rows)


def test_mlt_dsl_leaf(spark):
    """more_like_this as a bool-DSL leaf: expands to interesting-term
    matches with an integer minimum_should_match; works by like-id and
    by like-text; flows through es_search."""
    from gocrawl_spark import search

    docs = spark.createDataFrame(
        [
            (1, "quantum entanglement spooky physics physics"),
            (2, "quantum entanglement experiments in physics"),
            (3, "spooky stories about entanglement"),
            (4, "cooking pasta with tomato sauce"),
        ],
        "id long, content string",
    )
    body = {"query": {"more_like_this": {
        "fields": ["content"], "like": {"_id": 1},
        "min_doc_freq": 2, "minimum_should_match": "50%",
    }}, "size": 10}
    out = search.es_search(docs, body)
    ids = [r["id"] for r in out["hits"].collect()]
    assert 2 in ids and 4 not in ids
    assert 1 not in ids  # the like doc is excluded, as in ES
    # like-text form needs no corpus stats
    body2 = {"query": {"more_like_this": {
        "fields": ["content"], "like": "spooky entanglement",
        "minimum_should_match": "100%",
    }}, "size": 10}
    ids2 = [r["id"] for r in search.es_search(docs, body2)["hits"].collect()]
    assert 3 in ids2 and 4 not in ids2


def test_star_components_equal_min_label(spark):
    """Large-star/small-star CC ≡ min-label propagation on shapes that
    stress both: cliques, a diameter-200 path (the adversarial case
    the star variant exists for), crossing chains, singleton pairs."""
    from gocrawl_spark import dedup

    edges = []
    # two cliques (id ranges disjoint from the path)
    for i in range(5):
        for j in range(i + 1, 5):
            edges.append((1100 + i, 1100 + j))
            edges.append((1200 + i, 1200 + j))
    # long path 0-1-2-...-200
    edges += [(i, i + 1) for i in range(200)]
    # chain crossing into a clique
    edges += [(1104, 1300), (1300, 1301)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")

    star = {r["id"]: r["cluster_id"]
            for r in dedup.connected_components_star(pairs).collect()}
    prop = {r["id"]: r["cluster_id"]
            for r in dedup.connected_components(pairs, max_iter=250).collect()}
    assert star == prop
    assert star[200] == 0            # far end of the path reaches the min
    assert star[1301] == 1100        # crossing chain folds into clique min
    assert star[1204] == 1200


def test_es_search_collapse_and_rescore(spark):
    rows = [
        (1, "en", "spark spark spark"),
        (2, "en", "spark spark"),
        (3, "fr", "spark window batch"),
        (4, "fr", "spark"),
        (5, "de", "nothing here"),
    ]
    df = spark.createDataFrame(rows, "id long, lang string, text string")
    # collapse: best hit per lang under (_score desc, id asc), then
    # global top-k over the survivors
    c = search.es_search(df, {
        "query": {"match": {"text": "spark"}},
        "collapse": {"field": "lang"}, "size": 10})["hits"].collect()
    assert [(r["id"], r["lang"], r["score"]) for r in c] == [
        (1, "en", 3.0), (3, "fr", 1.0)]
    # rescore: phrase boost re-ranks inside the window only
    r = search.es_search(df, {
        "query": {"match": {"text": "spark"}},
        "rescore": {"window_size": 4, "query": {
            "rescore_query": {"match_phrase": {"text": "window batch"}},
            "query_weight": 1.0, "rescore_query_weight": 5.0}},
        "size": 3})["hits"].collect()
    assert [(x["id"], x["score"]) for x in r] == [(3, 6.0), (1, 3.0), (2, 2.0)]
    # a window smaller than the boosted doc's primary rank leaves it out
    r2 = search.es_search(df, {
        "query": {"match": {"text": "spark"}},
        "rescore": {"window_size": 2, "query": {
            "rescore_query": {"match_phrase": {"text": "window batch"}},
            "rescore_query_weight": 5.0}},
        "size": 3})["hits"].collect()
    assert [x["id"] for x in r2] == [1, 2]
    import pytest as _p
    with _p.raises(ValueError):
        search.es_search(df, {"sort": [{"lang": "asc"}],
                              "rescore": {"query": {"rescore_query": {}}}})
    with _p.raises(ValueError):
        search.es_search(df, {"collapse": {"field": "lang"},
                              "rescore": {"query": {"rescore_query": {}}}})


def test_percolate_and_or_semantics(spark):
    df = spark.createDataFrame(
        [
            (1, "spark window batch jobs"),
            (2, "the window frame"),
            (3, "batch only text"),
            (4, "nothing relevant here"),
        ],
        "doc_id long, text string",
    )
    queries = [
        ("q_and", "window batch", "and"),
        ("q_or", "window batch", "or"),
        ("q_one", "spark", "or"),
    ]
    got = {
        (r["query_id"], r["id"]): r["n_matched"]
        for r in search.percolate(df, queries, text_col="text", id_col="doc_id").collect()
    }
    # AND: both terms required — doc 1 only
    assert [k for k in got if k[0] == "q_and"] == [("q_and", 1)]
    assert got[("q_and", 1)] == 2
    # OR: any term — docs 1, 2, 3; n_matched counts distinct terms hit
    assert sorted(k[1] for k in got if k[0] == "q_or") == [1, 2, 3]
    assert got[("q_or", 1)] == 2 and got[("q_or", 2)] == 1
    assert sorted(k[1] for k in got if k[0] == "q_one") == [1]
    # repeated occurrences in a doc count once (distinct-term gate)
    df2 = spark.createDataFrame([(9, "window window window")], "doc_id long, text string")
    g2 = search.percolate(df2, [("q_and", "window batch", "and")], "text", "doc_id").collect()
    assert g2 == []
    with pytest.raises(ValueError):
        search.percolate(df, [("q", "x", "not")], "text", "doc_id")


def test_termvectors_statistics(spark):
    df = spark.createDataFrame(
        [
            (1, "spark spark window"),
            (2, "window batch"),
            (3, "spark elsewhere"),
        ],
        "doc_id long, text string",
    )
    rows = search.termvectors(df, [1, 2], text_col="text", id_col="doc_id").collect()
    got = {(r["id"], r["term"]): (r["term_freq"], r["doc_freq"], r["ttf"]) for r in rows}
    # only requested docs appear; stats are corpus-wide (doc 3 counts)
    assert set(r["id"] for r in rows) == {1, 2}
    assert got[(1, "spark")] == (2, 2, 3)
    assert got[(1, "window")] == (1, 2, 2)
    assert got[(2, "window")] == (1, 2, 2)
    assert got[(2, "batch")] == (1, 1, 1)
    assert (2, "spark") not in got


def test_chunk_windows_grid_and_tail_suppression(spark):
    from gocrawl_spark import curation

    # 10 single-letter pieces -> with chunk=4, overlap=2 (stride 2):
    # windows at 0,2,4,6 (4..8,6..10 full); offset 8 window [8,10) is
    # NOT fully contained in [6,10)? it IS contained -> suppressed.
    # nch = 1 + ceil((10-4)/2) = 4
    txt = " ".join("abcdefghij")
    df = spark.createDataFrame([(1, txt), (2, "a b c"), (3, "")],
                               "doc_id long, text string")
    out = curation.chunk_windows(df, chunk_tokens=4, overlap=2)
    rows = {(r["doc_id"], r["chunk"]): r for r in out.collect()}
    assert sorted(k for k in rows) == [(1, 0), (1, 1), (1, 2), (1, 3), (2, 0)]
    assert rows[(1, 0)]["chunk_text"] == "a b c d"
    assert rows[(1, 1)]["chunk_text"] == "c d e f"
    assert rows[(1, 3)]["chunk_text"] == "g h i j"
    assert rows[(1, 3)]["start_tok"] == 6 and rows[(1, 3)]["n_tokens"] == 4
    # short doc: one window, short
    assert rows[(2, 0)]["chunk_text"] == "a b c" and rows[(2, 0)]["n_tokens"] == 3
    # empty doc emits nothing (doc 3 absent above)

    # short TAIL emitted only when it adds tokens: 9 pieces, chunk=4,
    # stride=2 -> nch = 1+ceil(5/2)=4; last window [6,9) len 3
    df9 = spark.createDataFrame([(9, " ".join("abcdefghi"))], "doc_id long, text string")
    r9 = {r["chunk"]: r for r in curation.chunk_windows(df9, 4, 2).collect()}
    assert len(r9) == 4 and r9[3]["chunk_text"] == "g h i" and r9[3]["n_tokens"] == 3

    # overlap=0 degenerates to disjoint fixed windows
    r0 = {r["chunk"]: r["chunk_text"]
          for r in curation.chunk_windows(df9, 4, 0).collect()}
    assert r0 == {0: "a b c d", 1: "e f g h", 2: "i"}

    with pytest.raises(ValueError):
        curation.chunk_windows(df9, 4, 4)


def test_sq_quantization_clamp_degenerate_and_recall(spark):
    rows = [
        (0, [0.0, 1.0, 5.0]),
        (1, [1.0, 1.0, 0.0]),
        (2, [0.5, 1.0, 2.5]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    stats = similarity.sq_stats(emb)
    # dim0 spans [0,1], dim1 degenerate [1,1], dim2 [0,5]
    assert stats == [(0.0, 1.0), (1.0, 1.0), (0.0, 5.0)]
    codes = {r["vec_id"]: r["codes"] for r in similarity.sq_encode(emb, stats).collect()}
    assert codes[0] == [0, 0, 255]      # degenerate dim -> 0
    assert codes[1] == [255, 0, 0]
    assert codes[2] == [128, 0, 128]    # 0.5*255+0.5 floors to 128
    # out-of-range input clamps, never wraps
    oob = spark.createDataFrame([(9, [-1.0, 1.0, 9.0])],
                                "vec_id long, embedding array<double>")
    assert similarity.sq_encode(oob, stats).collect()[0]["codes"] == [0, 0, 255]

    # recall sanity on the real embeddings table: SQ top-10 recovers
    # most of the exact top-10 (64-dim, 500 vecs, int8 grid)
    real = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    st = similarity.sq_stats(real)
    cd = similarity.sq_encode(real, st)
    q = real.filter(F.col("vec_id") < 3)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in similarity.brute_topk(real, q, k=10).collect()}
    approx = {(r["query_id"], r["neighbor_id"])
              for r in similarity.sq_topk(cd, st, q, k=10).collect()}
    assert len(exact & approx) / len(exact) >= 0.8


def test_containment_asymmetric_vs_jaccard(spark):
    long = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lamda mu nu xi omicron pi rho sigma tau upsilon")
    short = "alpha beta gamma delta epsilon zeta"  # 6-word prefix
    df = spark.createDataFrame(
        [(1, long), (2, short), (3, "totally unrelated words here")],
        "doc_id long, text string")
    got = {(r["contained_id"], r["container_id"]): r["containment"]
           for r in dedup.containment_pairs(df, k=3, threshold=0.9).collect()}
    # short's 4 shingles all inside long -> containment 1.0 one way only
    assert got == {(2, 1): 1.0}
    # symmetric jaccard misses it at the same bar
    assert dedup.ngram_jaccard_pairs(df, k=3, threshold=0.9).count() == 0
    # the reverse direction appears once the threshold admits 4/18
    lo = {(r["contained_id"], r["container_id"])
          for r in dedup.containment_pairs(df, k=3, threshold=0.2).collect()}
    assert (1, 2) in lo and (2, 1) in lo and (3, 1) not in lo


# --- mirror_hosts (cross-host mirror detection) -----------------------------


def test_mirror_hosts_detects_replica_and_df_cut(spark):
    # m1/m2 mirror each other (4 shared + 1 unique each → J=4/6);
    # solo shares nothing; every host carries the same boilerplate
    # fingerprint "bp", which the max_fp_hosts=2 cut must drop —
    # without the cut solo would pair with both mirrors
    rows = (
        [("m1", f"pg{i}") for i in range(4)]
        + [("m2", f"pg{i}") for i in range(4)]
        + [("m1", "only1"), ("m2", "only2"), ("solo", "alone")]
        + [(h, "bp") for h in ("m1", "m2", "solo")]
    )
    pages = spark.createDataFrame(rows, "host string, fp string")
    out = dedup.mirror_hosts(pages, threshold=0.3, max_fp_hosts=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["host_a"], r["host_b"], r["shared"], r["n_a"], r["n_b"]) == (
        "m1", "m2", 4, 5, 5,
    )
    assert r["jaccard"] == pytest.approx(4 / 6)
    # no cut → the boilerplate digest links solo to both mirrors
    assert dedup.mirror_hosts(pages, threshold=0.0, max_fp_hosts=None).count() == 3


def test_mirror_hosts_deterministic_across_partitioning(spark):
    rows = [(f"h{i % 6}", f"pg{(i * 7) % 40}") for i in range(200)]
    pages = spark.createDataFrame(rows, "host string, fp string")
    a = sorted(map(tuple, dedup.mirror_hosts(pages, threshold=0.0).collect()))
    b = sorted(
        map(tuple, dedup.mirror_hosts(pages.repartition(13, "fp"), threshold=0.0).collect())
    )
    # (i*7)%40 stepping 6 splits the 6 hosts into two parity classes of
    # 3 that share all 20 fingerprints within-class, none across
    assert a == b and len(a) == 6


def test_readability_stats(spark):
    """Flesch/FK on a hand-computed sentence: 'The cat sat. It ran.'
    = 5 whitespace words, 2 sentences, 5 one-syllable words."""
    df = spark.createDataFrame([("The cat sat. It ran.",)], "text string")
    s = textstats.readability_stats("text")
    row = df.select(
        *(s[k].alias(k) for k in
          ("n_words", "n_sentences", "n_syllables", "flesch", "fk_grade"))
    ).collect()[0]
    assert (row["n_words"], row["n_sentences"], row["n_syllables"]) == (5, 2, 5)
    # 206.835 - 1.015*2.5 - 84.6*1 = 119.6975; 0.39*2.5 + 11.8 - 15.59 = -2.815
    assert abs(row["flesch"] - 119.6975) < 1e-6
    assert abs(row["fk_grade"] - (-2.815)) < 1e-6
    # 'beautiful' = eau+i+u? vowel groups: eau, i, u -> 3 syllables
    row2 = spark.createDataFrame([("beautiful",)], "text string").select(
        s["n_syllables"].alias("sy")).collect()[0]
    assert row2["sy"] == 3


def test_mojibake_stats_gate(spark):
    """Marker codepoints and C0 controls are counted; clean text passes
    the ppm gate, damaged short text fails it."""
    df = spark.createDataFrame(
        [("clean text with accents café naïve",),
         ("damaged Ã©tÃ© â€œquoteâ€ here",),
         ("ctl \x07\x01 bytes",)],
        "text string",
    )
    s = textstats.mojibake_stats("text")
    rows = df.select(
        "text", *(s[k].alias(k) for k in
                  ("n_mojibake", "n_ctrl", "mojibake_ppm", "is_clean"))
    ).collect()
    by = {r["text"][:5]: r for r in rows}
    assert by["clean"]["n_mojibake"] == 0 and by["clean"]["is_clean"]
    assert by["damag"]["n_mojibake"] == 4 and not by["damag"]["is_clean"]
    assert by["ctl \x07"]["n_ctrl"] == 2 and not by["ctl \x07"]["is_clean"]


def test_mine_bitext_mutual_margin(spark):
    """A true translation pair (near-identical vectors) is mined with a
    high margin; a one-directional attraction to a hub vector fails the
    mutual-top-1 requirement."""
    from gocrawl_spark import similarity

    src = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]),
         (2, [0.0, 1.0, 0.0, 0.0]),
         (4, [0.5, 0.5, 0.5, 0.5])],
        "vec_id long, embedding array<float>",
    )
    tgt = spark.createDataFrame(
        [(1, [0.99, 0.01, 0.0, 0.0]),   # pair of 0
         (3, [0.01, 0.99, 0.0, 0.0]),   # pair of 2
         (5, [0.5, 0.5, 0.49, 0.51]),   # pair of 4
         (7, [0.6, 0.45, 0.35, 0.25])],  # hub near 4 but not its top-1
        "vec_id long, embedding array<float>",
    )
    got = {
        (r["src_id"], r["tgt_id"]): r["margin"]
        for r in similarity.mine_bitext(
            src, tgt, k=2, margin_threshold=1.0
        ).collect()
    }
    assert set(got) == {(0, 1), (2, 3), (4, 5)}
    assert all(m >= 1.0 for m in got.values())
    # the crisp pairs stand out more against their neighborhoods than
    # the hub-adjacent one
    assert got[(0, 1)] > got[(4, 5)] and got[(2, 3)] > got[(4, 5)]

    # candidate path: with the COMPLETE candidate set the miner
    # accepts the same pairs (margins agree to the integer-rational
    # vs ÷k rounding, ≤1e-5)
    full_cand = (
        src.selectExpr("vec_id AS src_id")
        .crossJoin(tgt.selectExpr("vec_id AS tgt_id"))
    )
    got_cand = {
        (r["src_id"], r["tgt_id"]): r["margin"]
        for r in similarity.mine_bitext(
            src, tgt, k=2, margin_threshold=1.0, candidates=full_cand
        ).collect()
    }
    assert set(got_cand) == set(got)
    assert all(abs(got_cand[p] - got[p]) <= 1e-5 for p in got)
    # a pruned candidate table drops pairs it never proposed
    pruned = full_cand.filter("NOT (src_id = 0 AND tgt_id = 1)")
    got_pruned = {
        (r["src_id"], r["tgt_id"])
        for r in similarity.mine_bitext(
            src, tgt, k=2, margin_threshold=1.0, candidates=pruned
        ).collect()
    }
    assert (0, 1) not in got_pruned


def test_cdc_chunks_shift_stable(spark):
    """The defining CDC property: prepending text to a document shifts
    byte offsets but the chunk digests after the first content-defined
    boundary are IDENTICAL — fixed-size blocks would all change. Also:
    chunks tile the text exactly."""
    from pyspark.sql import functions as F

    from gocrawl_spark import dedup

    base = "".join(f"{i % 10}abcdefgh" for i in range(40))  # 360 chars
    docs = spark.createDataFrame(
        [(0, base), (1, "INSERTED-PREFIX-" + base)],
        "doc_id long, text string",
    )
    ch = dedup.cdc_chunks(docs)
    rows = ch.collect()
    a = [r for r in rows if r["doc_id"] == 0]
    b = [r for r in rows if r["doc_id"] == 1]
    # tiling: lengths sum to the text length, starts are contiguous
    assert sum(r["length"] for r in a) == len(base)
    assert sum(r["length"] for r in b) == len(base) + 16
    # shift stability: the digest SEQUENCES share everything after the
    # first content-defined boundary — a common suffix of all but the
    # leading chunk(s)
    da = [r["chunk_md5"] for r in sorted(a, key=lambda r: r["chunk_idx"])]
    db = [r["chunk_md5"] for r in sorted(b, key=lambda r: r["chunk_idx"])]
    suffix = 0
    while (
        suffix < min(len(da), len(db)) and da[-1 - suffix] == db[-1 - suffix]
    ):
        suffix += 1
    assert suffix >= len(da) - 2
    stats = dedup.cdc_dedup_stats(ch).collect()[0]
    assert stats["n_chunks"] == len(da) + len(db)
    assert stats["dedup_bp"] < 7000  # most bytes stored once


def test_prefix_filter_equals_full_join_with_fewer_candidates(spark, docs):
    """Prefix filtering returns EXACTLY the full inverted-index join's
    pairs (lossless pruning) while generating strictly fewer join-side
    index rows."""
    from pyspark.sql import functions as F

    from gocrawl_spark import dedup
    from gocrawl_spark.textstats import shingles as _sh

    full = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in dedup.ngram_jaccard_pairs(docs, k=2, threshold=0.4).collect()
    }
    pref = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in dedup.prefix_filter_pairs(docs, k=2, threshold=0.4).collect()
    }
    assert pref == full and len(full) > 0
    # the index the self-join runs on is a strict subset of the grams
    sets = docs.select(
        F.col("doc_id").alias("id"),
        F.array_distinct(_sh("text", 2)).alias("sh"),
    )
    n_full = sets.select(F.explode("sh")).count()
    n_prefix = sets.select(
        F.size("sh").alias("n"),
        (F.col("n") - F.expr("(400 * n + 999) DIV 1000") + 1).alias("p"),
    ).agg(F.sum("p")).collect()[0][0]
    assert n_prefix < n_full * 0.7


def test_pca_power_recovers_dominant_axis(spark):
    """PCA top component: on points spread along one fixed direction
    (plus tiny deterministic off-axis jitter), the power iteration
    recovers that direction — |cosine(axis, truth)| > 0.99 — and the
    projection separates the two ends of the spread. Covariance is
    exact integer math, so the matrix is symmetric by construction."""
    import math

    dim = 8
    truth = [1.0, 2.0, -1.5, 0.5, 0.0, 3.0, -2.0, 1.0]
    nrm = math.sqrt(sum(x * x for x in truth))
    truth = [x / nrm for x in truth]
    rows = []
    for t in range(-20, 21):
        vec = [t * 0.05 * truth[i] + 0.001 * ((t * (i + 3)) % 7 - 3)
               for i in range(dim)]
        rows.append((t + 20, vec))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    cov = similarity.pca_covariance(df)
    mat = {(r["i"], r["j"]): r["cov_num"] for r in cov.collect()}
    assert len(mat) == dim * dim
    assert all(mat[(i, j)] == mat[(j, i)] for i in range(dim) for j in range(dim))

    axis = similarity.pca_power_component(cov, sweeps=8)
    dot = sum(a * b for a, b in zip(axis, truth))
    na = math.sqrt(sum(a * a for a in axis))
    assert abs(dot) / na > 0.99
    # sign convention: the first max-|v| coordinate is +1 exactly
    mx = max(abs(x) for x in axis)
    first = next(x for x in axis if abs(x) == mx)
    assert first == mx

    proj = {r["vec_id"]: r["pc1"] for r in similarity.pca_project(df, axis).collect()}
    # monotone along the generating parameter t (up to overall sign)
    seq = [proj[i] for i in range(41)]
    assert seq == sorted(seq) or seq == sorted(seq, reverse=True)


def test_split_cluster_safe_no_straddle(spark):
    """Every near-dup pair lands in ONE split (the property the op
    exists for), docs without pair evidence split by their own id
    (identical to split_corpus), and the assignment survives
    repartitioning."""
    from gocrawl_spark import curation

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(40)], "doc_id long, text string"
    )
    # two chains (0-1-2, 10-11) + a pair (20, 21); rest singletons
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11), (20, 21)], "id_a long, id_b long"
    )
    fr = {"train": 0.5, "val": 0.25, "test": 0.25}
    out = curation.split_cluster_safe(docs, pairs, fracs=fr)
    got = {r["doc_id"]: (r["rep"], r["split"]) for r in out.collect()}
    assert got[0] == got[1] == got[2] and got[0][0] == 0
    assert got[10] == got[11] and got[10][0] == 10
    assert got[20] == got[21] and got[20][0] == 20
    plain = {
        r["doc_id"]: r["split"]
        for r in curation.split_corpus(docs, fracs=fr).collect()
    }
    for i in range(22, 40):
        assert got[i] == (i, plain[i])
    rep = {
        r["doc_id"]: (r["rep"], r["split"])
        for r in curation.split_cluster_safe(
            docs.repartition(7), pairs.repartition(3), fracs=fr
        ).collect()
    }
    assert rep == got


def test_contamination_bloom_equals_exact(spark, docs):
    """Bloom-gated decon returns EXACTLY the broadcast-join result (no
    false negatives by construction, FPs die in the exact join), and
    the probe is O(1-shard): each task materializes one shard's
    bitset, and the residue paying the exact join is far smaller than
    the corpus shingle stream."""
    bench = docs.filter(F.col("doc_id") % 40 == 7).select(
        F.col("doc_id").alias("bench_id"),
        F.substring("text", 10, 120).alias("bench_text"),
    )
    exact = sorted(
        map(tuple, dedup.contamination(docs, bench, k=8).collect())
    )
    acc = spark.sparkContext.accumulator(0)
    via_bloom = sorted(
        map(
            tuple,
            dedup.contamination_bloom(
                docs, bench, k=8, n_shards=4, m_bits=1 << 16, probe_acc=acc
            ).collect(),
        )
    )
    assert via_bloom == exact
    assert len(exact) > 0
    # every task's merged bitset is one shard: 2^16 bits = 8 KiB each
    assert acc.value > 0 and acc.value % (1 << 13) == 0


def test_bm25_maxscore_equals_full_scan(spark, docs):
    """Index-path MaxScore BM25 ≡ corpus-scan bm25_topk on the same
    query (lossless prune, identical fold order), the prune actually
    skips docs on a rare-term query, and prune=False (the pure
    index path) agrees too."""
    from gocrawl_spark import search

    full = [
        tuple(r)
        for r in search.bm25_topk(
            docs, "window batch spark", text_col="text", id_col="doc_id", k=10
        ).collect()
    ]
    p, ts, c = search.build_postings(docs, text_col="text", id_col="doc_id")
    acc = spark.sparkContext.accumulator(0)
    got = [
        tuple(r)
        for r in search.bm25_index_topk(
            p, ts, c, "window batch spark", k=10, pruned_acc=acc
        ).collect()
    ]
    assert got == full
    noprune = [
        tuple(r)
        for r in search.bm25_index_topk(
            p, ts, c, "window batch spark", k=10, prune=False
        ).collect()
    ]
    assert noprune == full
    # duplicated query term: each occurrence contributes, like
    # bm25_topk's per-position fold (the ES match semantics)
    dupq = "bank bank spark"
    gotd = [
        tuple(r)
        for r in search.bm25_index_topk(p, ts, c, dupq, k=5).collect()
    ]
    fulld = [
        tuple(r)
        for r in search.bm25_topk(
            docs, dupq, text_col="text", id_col="doc_id", k=5
        ).collect()
    ]
    assert gotd == fulld
    # rare+common corpus: docs holding only the common term can't
    # reach the rare-term seed threshold and are pruned in bulk
    big = spark.createDataFrame(
        [(0, "zebra apple orchard")]
        + [(i, "apple " * (1 + i % 3)) for i in range(1, 40)],
        "doc_id long, text string",
    )
    p2, ts2, c2 = search.build_postings(big, text_col="text", id_col="doc_id")
    acc2 = spark.sparkContext.accumulator(0)
    got2 = [
        tuple(r)
        for r in search.bm25_index_topk(
            p2, ts2, c2, "zebra apple", k=1, pruned_acc=acc2
        ).collect()
    ]
    full2 = [
        tuple(r)
        for r in search.bm25_topk(
            big, "zebra apple", text_col="text", id_col="doc_id", k=1
        ).collect()
    ]
    assert got2 == full2 and got2[0][0] == 0
    assert acc2.value > 20  # the apple-only docs never get fully scored


def test_script_profile_routing(spark):
    """Dominance flips with script share, ties break name-ascending,
    and script-free text routes to 'none' with share 0."""
    rows = [
        (0, "hello world plain latin text"),
        (1, "Привет мир Привет мир hi"),          # cyrillic-dominant
        (2, "你好 hi"),                            # 2 han vs 2 latin: tie
        (3, "12345 !?. "),                         # no scripted codepoints
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    prof = textstats.script_profile(F.col("text"))
    got = {
        r["doc_id"]: (r["dominant"], r["dominant_bp"], r["latin"], r["han"])
        for r in df.select(
            "doc_id", *[c.alias(n) for n, c in prof.items()]
        ).collect()
    }
    assert got[0][0] == "latin" and got[0][1] == 10000
    assert got[1][0] == "cyrillic" and 5000 < got[1][1] < 10000
    assert got[2][0] == "han" and got[2][2] == 2 and got[2][3] == 2
    assert got[3] == ("none", 0, 0, 0)


def test_prototype_select_balances_clusters(spark):
    """Hard mode keeps the cells' outliers round-robin: with 2 clear
    clusters and budget 4, each cluster contributes 2 picks and the
    per-cluster picks are its farthest-from-prototype members; easy
    mode inverts the within-cell choice."""
    import math

    rows = []
    # cluster around +e0 (ids 0..9, id 0 seeds centroid 0), spread by i
    for i in range(10):
        v = [1.0, 0.02 * i, 0.0, 0.0]
        nrm = math.sqrt(sum(x * x for x in v))
        rows.append((i, [x / nrm for x in v]))
    # cluster around +e2 (ids 10..19; id 1 is the other seed, so give
    # id 1 the +e2 direction to seed centroid 1 there)
    rows[1] = (1, [0.0, 0.0, 1.0, 0.0])
    for i in range(10, 20):
        v = [0.0, 0.02 * (i - 10), 1.0, 0.0]
        nrm = math.sqrt(sum(x * x for x in v))
        rows.append((i, [x / nrm for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    hard = similarity.prototype_select(df, n=4, n_centroids=2, mode="hard")
    got = [(r["vec_id"], r["centroid_id"], r["pick_rank"]) for r in hard.collect()]
    assert len(got) == 4
    by_cell = {}
    for vid, cid, _ in got:
        by_cell.setdefault(cid, []).append(vid)
    assert sorted(len(v) for v in by_cell.values()) == [2, 2]
    # hard picks are the max-angle members of each cell
    assert 9 in by_cell[0] and 19 in by_cell[1]

    easy = similarity.prototype_select(df, n=4, n_centroids=2, mode="easy")
    easy_ids = {r["vec_id"] for r in easy.collect()}
    assert 0 in easy_ids and 1 in easy_ids  # the prototypes themselves
    assert easy_ids.isdisjoint({9, 19})


def test_collocations_rank_fixed_phrases(spark):
    """A glued phrase ('hong kong': always together, rare parts)
    outranks a chance pairing of frequent words; the support floor
    drops hapax pairs entirely."""
    rows = [(i, "hong kong " + ("alpha beta " * 3) + "beta alpha") for i in range(6)]
    rows.append((99, "unique hapax"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r["w1"], r["w2"], r["c2"], r["pmi"])
        for r in textstats.collocations(df, min_count=5, k=10).collect()
    ]
    assert got[0][:2] == ("hong", "kong")
    pairs = {(a, b) for a, b, _, _ in got}
    assert ("unique", "hapax") not in pairs
    assert ("alpha", "beta") in pairs
    pmi = {(a, b): p for a, b, _, p in got}
    assert pmi[("hong", "kong")] > pmi[("alpha", "beta")]


def test_term_suggest_modes(spark):
    """missing mode stays quiet for in-vocab terms, popular mode only
    upgrades to more-frequent spellings, scoring prefers the closer
    candidate and freq breaks score ties."""
    from gocrawl_spark import search

    rows = [(i, "spark engine shuffle " + ("sparks " if i % 2 else "")) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # 'sparc' absent from vocab -> suggested; 'spark' present -> quiet
    got = search.term_suggest(df, "sparc spark", text_col="text", size=2).collect()
    by_term = {}
    for r in got:
        by_term.setdefault(r["term"], []).append((r["suggestion"], r["score"], r["freq"]))
    assert "spark" not in by_term
    sugg = by_term["sparc"]
    assert sugg[0][0] == "spark"          # d=1 beats d=2 'sparks'
    assert sugg[0][1] > sugg[1][1]
    # popular: 'sparks' (freq 5) < 'spark' (freq 10) -> only 'spark'-ward
    pop = search.term_suggest(
        df, "sparks", text_col="text", suggest_mode="popular", size=5
    ).collect()
    assert {r["suggestion"] for r in pop} == {"spark"}
    always = search.term_suggest(
        df, "spark", text_col="text", suggest_mode="always", size=5
    ).collect()
    assert {r["suggestion"] for r in always} >= {"sparks"}


def test_dismax_constant_score_boosting_leaves(spark):
    rows = [
        (1, "alpha alpha beta", "en", "news"),
        (2, "alpha gamma gamma gamma", "de", "blog"),
        (3, "beta beta", "en", "spam"),
        (4, "delta", "en", "news"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    # dis_max: best matching sub-score + tie_breaker * the others
    got = search.bool_topk(
        df,
        {"must": [{"dis_max": {"queries": [
            {"match": {"text": "alpha beta"}},
            {"match": {"text": "gamma"}},
        ], "tie_breaker": 0.5}}]},
        id_col="doc_id", k=10,
    ).collect()
    scores = {r["id"]: r["score"] for r in got}
    # doc1: m1=3, m2=0 -> 3.0; doc2: m1=1, m2=3 -> 3 + 0.5*1 = 3.5;
    # doc3: m1=2 -> 2.0; doc4: no sub-query matches -> excluded
    assert scores == {2: 3.5, 1: 3.0, 3: 2.0}
    # constant_score: flat boost, sub-query TF discarded
    got2 = search.bool_topk(
        df,
        {"must": [{"constant_score": {
            "filter": {"match": {"text": "alpha"}}, "boost": 1.7}}]},
        id_col="doc_id", k=10,
    ).collect()
    assert {r["id"]: r["score"] for r in got2} == {1: 1.7, 2: 1.7}
    # boosting: negative-matching docs demoted, never excluded
    got3 = search.bool_topk(
        df,
        {"must": [{"boosting": {
            "positive": {"match": {"text": "alpha"}},
            "negative": {"term": {"lang": "de"}},
            "negative_boost": 0.5}}]},
        id_col="doc_id", k=10,
    ).collect()
    assert {r["id"]: r["score"] for r in got3} == {1: 2.0, 2: 0.5}


def test_match_phrase_prefix_semantics(spark):
    rows = [
        (1, "fused vector kernel"),
        (2, "fused vector kern fused vector kersplat"),
        (3, "fused kernel vector"),
        (4, "vector kernel"),
        (5, "fused vector"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = search.bool_topk(
        df,
        {"must": [{"match_phrase_prefix": {"text": "fused vector ker"}}]},
        id_col="doc_id", k=10,
    ).collect()
    # head terms exact + closing token startswith 'ker'; score = windows
    assert {r["id"]: r["score"] for r in got} == {2: 2.0, 1: 1.0}
    # single-term phrase prefix = plain token-prefix count
    # ('ker' hits kernel once in docs 1/3/4, kern + kersplat in doc 2)
    got2 = search.bool_topk(
        df,
        {"must": [{"match_phrase_prefix": {"text": "ker"}}]},
        id_col="doc_id", k=10,
    ).collect()
    assert {r["id"]: r["score"] for r in got2} == {1: 1.0, 2: 2.0, 3: 1.0, 4: 1.0}


def test_es_search_diversified_sampler(spark):
    rows = [
        (1, "x x x", "a", "en"),
        (2, "x x", "a", "fr"),
        (3, "x", "b", "fr"),
        (4, "x", "c", "de"),
        (5, "y", "c", "de"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, src string, lang string"
    )
    out = search.es_search(
        df,
        {"query": {"match": {"text": "x"}},
         "aggs": {"s": {
             "diversified_sampler": {
                 "shard_size": 2, "field": "src", "max_docs_per_value": 1},
             "aggs": {"by_lang": {"terms": {"field": "lang"}}}}}},
        id_col="doc_id",
    )
    agg = out["aggs"].collect()
    # dedup by src keeps docs 1 (a, sc 3), 3 (b, sc 1), 4 (c, sc 1);
    # shard_size 2 keeps the top 2 by (score desc, id asc): docs 1, 3
    assert [(r["key"], r["doc_count"], r["s_doc_count"]) for r in agg] == [
        ("en", 1, 2), ("fr", 1, 2),
    ]


def test_es_search_significant_text(spark):
    rows = [
        (1, "q zzz alpha"), (2, "q zzz beta"), (3, "q zzz gamma"),
        (4, "alpha beta"), (5, "beta gamma"), (6, "alpha gamma"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = search.es_search(
        df,
        {"query": {"match": {"text": "q"}},
         "aggs": {"sig": {"significant_text": {
             "field": "text", "size": 5, "min_doc_count": 2}}}},
        id_col="doc_id",
    )
    got = [(r["term"], r["fg_count"], r["bg_count"], r["score"])
           for r in out["aggs"].collect()]
    # q and zzz: fgp=1 vs bgp=0.5 -> JLH (1-0.5)*(1/0.5) = 1.0; every
    # other term is NOT overrepresented in the foreground
    assert got == [("q", 3, 3, 1.0), ("zzz", 3, 3, 1.0)]


def test_es_aggs_bucket_sort_pages_buckets(spark):
    vals = [1, 1, 1, 101, 201, 202, 203, 301, 302]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v long"
    )
    out = search.es_aggs(
        df,
        {"h": {"histogram": {"field": "v", "interval": 100},
               "aggs": {"pg": {"bucket_sort": {
                   "sort": [{"_count": {"order": "desc"}}],
                   "from": 1, "size": 2}}}}},
    ).collect()
    # series by count desc (key-asc ties): (0,3),(200,3),(300,2),(100,1)
    # from=1 size=2 -> (200,3),(300,2), bucket_sort order preserved
    assert [(r["key"], r["doc_count"]) for r in out] == [(200.0, 3), (300.0, 2)]


def test_span_dedup_c4_semantics(spark):
    rows = [
        (1, "Alpha one. Beta two. Gamma three. Unique closing thought."),
        (2, "Opening remark here. Alpha one. Beta two. Gamma three."),
        (3, "Alpha one. Beta two. Gamma three."),
        (4, "Totally different. Nothing shared here. Stay put. Ok."),
        (5, "Too short. Just two."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["text"], r["n_sentences"], r["n_kept"])
           for r in dedup.span_dedup(df).collect()}
    # doc1 is the (doc_id, start)-first occurrence of the shared span
    # and keeps it; docs 2/3 lose exactly those three sentences; a doc
    # whose every sentence was duplicated keeps an empty text; <3
    # sentences -> no spans, untouched
    assert got == {
        1: ("Alpha one. Beta two. Gamma three. Unique closing thought.", 4, 4),
        2: ("Opening remark here.", 4, 1),
        3: ("", 3, 0),
        4: ("Totally different. Nothing shared here. Stay put. Ok.", 4, 4),
        5: ("Too short. Just two.", 2, 2),
    }
    # WITHIN-doc duplicate spans: later copy removed too
    df2 = spark.createDataFrame(
        [(9, "A one. B two. C three. Filler goes here. A one. B two. C three.")],
        "doc_id long, text string",
    )
    out2 = dedup.span_dedup(df2).collect()[0]
    assert out2["text"] == "A one. B two. C three. Filler goes here."
    assert (out2["n_sentences"], out2["n_kept"]) == (7, 4)
    # determinism across parallelism
    big = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(60)
    a = sorted(map(tuple, dedup.span_dedup(big.repartition(1)).collect()))
    b = sorted(map(tuple, dedup.span_dedup(big.repartition(8)).collect()))
    assert a == b


def test_curriculum_order_stages_and_determinism(spark):
    from gocrawl_spark import curation

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(200)
    out = curation.curriculum_order(docs, stages=4)
    rows = out.collect()
    assert len(rows) == 200
    # stages partition the corpus into contiguous quality ranges:
    # every stage-k doc has quality >= every stage-(k+1) doc
    by_stage = {}
    for r in rows:
        by_stage.setdefault(r["stage"], []).append(r["quality"])
    stages = sorted(by_stage)
    assert stages[0] == 0 and stages[-1] <= 3
    for a, b in zip(stages, stages[1:]):
        assert min(by_stage[a]) >= max(by_stage[b])
    # exact quartiles -> roughly balanced stages (ties may skew)
    for s in stages:
        assert len(by_stage[s]) >= 200 // 8
    # bit-equal across parallelism
    a = sorted(map(tuple,
        curation.curriculum_order(docs.repartition(1), stages=4).collect()))
    b = sorted(map(tuple,
        curation.curriculum_order(docs.repartition(8), stages=4).collect()))
    assert a == b


def test_hybrid_rrf_fusion_semantics(spark):
    lex = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "id long, rank int"
    )
    sem = spark.createDataFrame(
        [(3, 1), (4, 2)], "id long, rank int"
    )
    got = {r["id"]: r for r in search.hybrid_rrf(lex, sem, k=10).collect()}
    # doc 3 appears in both lists -> 1/63 + 1/61; absences report rank 0
    assert got[3]["rrf_score"] == round(1 / 63 + 1 / 61, 6)
    assert (got[3]["lex_rank"], got[3]["sem_rank"]) == (3, 1)
    assert got[1]["rrf_score"] == round(1 / 61, 6)
    assert (got[1]["lex_rank"], got[1]["sem_rank"]) == (1, 0)
    assert got[4]["rrf_score"] == round(1 / 62, 6)
    # fused order: overlap wins despite middling individual ranks
    order = [r["id"] for r in search.hybrid_rrf(lex, sem, k=10).collect()]
    assert order[0] == 3


def test_mixture_epochs_repeat_cap_and_deficit(spark):
    from gocrawl_spark import curation

    rows = [
        (1, "en", "a b c d e f g h i j"),      # en avail 10
        (2, "de", "a b"),                       # de avail 2
        (3, "fr", "a b c d e"),                 # fr avail 5
        (4, "xx", "ignored words here"),        # unweighted -> excluded
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {r["source"]: r for r in curation.mixture_epochs(
        docs, weights={"en": 2, "de": 1, "fr": 1}, budget=40, max_epochs=3
    ).collect()}
    assert set(got) == {"en", "de", "fr"}
    # en: target 20, avail 10 -> 2 epochs, fully covered
    assert (got["en"]["target_tokens"], got["en"]["epochs"],
            got["en"]["yield_tokens"], got["en"]["deficit"]) == (20, 2, 20, 0)
    # de: target 10, avail 2 -> ceil=5 capped at 3 -> yield 6, deficit 4
    assert (got["de"]["target_tokens"], got["de"]["epochs"],
            got["de"]["yield_tokens"], got["de"]["deficit"]) == (10, 3, 6, 4)
    # fr: target 10, avail 5 -> exactly 2 epochs
    assert (got["fr"]["epochs"], got["fr"]["deficit"]) == (2, 0)


def test_matryoshka_recall_monotone_and_exact_at_full_dim(spark):
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 3)
    out = {r["dim"]: r for r in similarity.matryoshka_recall(
        emb, q, dims=[16, 64], k=5).collect()}
    # full-dim truncation IS the full ranking -> recall exactly 1.0
    assert out[64]["recall"] == 1.0
    assert out[64]["n_common"] == out[64]["n_full"] == 15
    # shorter prefix can only do as well or worse
    assert out[16]["recall"] <= 1.0
    assert out[16]["n_full"] == 15


def test_char_entropy_hand_computed(spark):
    from gocrawl_spark.textstats import char_entropy

    rows = [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, ""), (5, "aab")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in char_entropy(df).collect()}
    assert out[1]["entropy_bits"] == 0.0 and out[1]["n_distinct_chars"] == 1
    assert out[2]["entropy_bits"] == 1.0
    assert out[3]["entropy_bits"] == 2.0
    assert out[4]["n_chars"] == 0 and out[4]["entropy_bits"] == 0.0
    # H(2/3, 1/3) = log2(3) - (2*log2(2))/3 ≈ 0.918296
    assert abs(out[5]["entropy_bits"] - 0.918296) < 1e-6


def test_doremi_weights_sum_and_uniform_fallback(spark):
    from gocrawl_spark.curation import doremi_weights

    rows = [
        (0, "the cat sat on the mat", "en"),
        (1, "the dog sat on the rug", "en"),
        (2, "der hund ist hier und da", "de"),
        (3, "le chat est ici et la", "fr"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = doremi_weights(df, df.filter("lang = 'en'")).collect()
    assert {r["grp"] for r in out} == {"en", "de", "fr"}
    total = sum(r["weight"] for r in out)
    assert abs(total - 1.0) < 1e-4
    # the en-trained reference beats the corpus proxy ONLY on en docs
    # (positive clipped excess), so the weight tilts fully toward the
    # target-like domain; off-target excess clips to 0
    w = {r["grp"]: r["weight"] for r in out}
    assert w["en"] == 1.0
    assert w["de"] == 0.0 and w["fr"] == 0.0
    # uniform fallback: reference == corpus -> every excess is 0
    uni = doremi_weights(df, df).collect()
    assert all(abs(r["weight"] - 1.0 / 3) < 1e-4 for r in uni)


def test_length_batches_grouping_and_pad_math(spark):
    from gocrawl_spark.curation import length_batches

    # one shard so the grouping is fully visible: 10 docs, lengths 1..10
    rows = [(i, " ".join(["w"] * (i + 1))) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = length_batches(df, batch_size=4, n_shards=1).collect()
    assert all(r["shard"] == 0 for r in out)
    by_batch = {r["batch"]: r for r in out}
    # 10 docs / batch_size 4 -> batches of 4, 4, 2
    assert [by_batch[b]["n_seqs"] for b in sorted(by_batch)] == [4, 4, 2]
    for r in out:
        assert r["padded"] == r["n_seqs"] * r["max_len"]
        assert r["sum_len"] <= r["padded"]
        assert 0.0 <= r["pad_frac"] < 1.0
    # batches are length-sorted: batch maxima are non-decreasing
    maxes = [by_batch[b]["max_len"] for b in sorted(by_batch)]
    assert maxes == sorted(maxes)
    # length grouping beats a round-robin grouping on total padding
    total_padded = sum(r["padded"] for r in out)
    # round-robin worst case: every batch pads to the global max
    assert total_padded < 4 * 10 + 4 * 10 + 2 * 10


def test_length_batches_deterministic_across_parallelism(spark):
    from gocrawl_spark.curation import length_batches

    rows = [(i, " ".join(["tok"] * (1 + (i * 7) % 23))) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, length_batches(df.repartition(1), 8, 4).collect()))
    b = sorted(map(tuple, length_batches(df.repartition(13), 8, 4).collect()))
    assert a == b


def test_ucb_schedule_hand_computed(spark):
    import math

    from gocrawl_spark import scheduler as sch

    # A: 3 obs, changes both intervals; B: 2 obs, no change; C: 1 obs
    hist = spark.createDataFrame(
        [("A", 0, 0), ("A", 1, 1), ("A", 2, 2),
         ("B", 0, 7), ("B", 1, 7),
         ("C", 0, 0)],
        "url string, generation int, page_ts int",
    )
    got = {r["url"]: r for r in sch.ucb_schedule(hist).collect()}
    assert set(got) == {"A", "B"}  # singleton arms drop
    n_total = 3.0  # (3-1) + (2-1) pulls
    assert got["A"]["mean_change"] == 1.0
    assert got["A"]["ucb"] == round(1.0 + math.sqrt(2 * math.log(n_total) / 2), 6)
    assert got["B"]["mean_change"] == 0.0
    assert got["B"]["ucb"] == round(math.sqrt(2 * math.log(n_total) / 1), 6)
    # the barely-observed static arm outranks the fully-known changer
    # only when its bonus dominates; here A (mean 1) still wins top_k=1
    top = sch.ucb_schedule(hist, top_k=1).collect()
    assert [r["url"] for r in top] == ["A"]


def test_ucb_bonus_floats_sparse_arms(spark):
    from gocrawl_spark import scheduler as sch

    # IDENTICAL mean change-rate 0.5 on both arms, so only the
    # sqrt(2 ln N / n) bonus can separate them: D is well observed
    # (11 obs, 5 changes / 10 intervals), E barely (3 obs, 1 change /
    # 2 intervals) — E must rank first on the bonus alone
    rows = [("D", g, g // 2) for g in range(11)]
    rows += [("E", 0, 0), ("E", 1, 3), ("E", 2, 3)]
    hist = spark.createDataFrame(rows, "url string, generation int, page_ts int")
    got = {r["url"]: r for r in sch.ucb_schedule(hist).collect()}
    assert got["D"]["mean_change"] == got["E"]["mean_change"] == 0.5
    assert got["E"]["ucb"] > got["D"]["ucb"]
    top = sch.ucb_schedule(hist, top_k=1).collect()
    assert [r["url"] for r in top] == ["E"]


def test_clf_roc_hand_computed(spark):
    from gocrawl_spark import curation

    scores = spark.createDataFrame(
        [(1, 0.9), (2, 0.8), (3, 0.8), (4, 0.3)], "doc_id long, score double"
    )
    labels = spark.createDataFrame(
        [(1, True), (2, False), (3, True), (4, False)],
        "doc_id long, label boolean",
    )
    out = {r["threshold"]: r for r in
           curation.clf_roc(scores, labels, thresholds=(0.5, 0.85)).collect()}
    # AUC: pairs (pos, neg): (.9,.8)=1, (.9,.3)=1, (.8,.8)=.5, (.8,.3)=1
    # => 3.5 / 4 = 0.875
    for r in out.values():
        assert r["auc"] == 0.875
    t5 = out[0.5]
    assert (t5["tp"], t5["fp"], t5["fn"], t5["tn"]) == (2, 1, 0, 1)
    assert t5["precision"] == 0.666667 and t5["recall"] == 1.0
    assert t5["f1"] == 0.8
    t85 = out[0.85]
    assert (t85["tp"], t85["fp"], t85["fn"], t85["tn"]) == (1, 0, 1, 2)
    assert t85["precision"] == 1.0 and t85["recall"] == 0.5


def test_clf_roc_degenerate_labels(spark):
    from gocrawl_spark import curation

    scores = spark.createDataFrame([(1, 0.9), (2, 0.1)], "doc_id long, score double")
    labels = spark.createDataFrame(
        [(1, True), (2, True)], "doc_id long, label boolean"
    )
    rows = curation.clf_roc(scores, labels, thresholds=(0.5,)).collect()
    assert rows[0]["auc"] == 0.0 and rows[0]["tn"] == 0
    # NULL labels are excluded, not counted as negatives
    labels3 = spark.createDataFrame(
        [(1, True), (2, False), (3, None)], "doc_id long, label boolean"
    )
    scores3 = spark.createDataFrame(
        [(1, 0.9), (2, 0.1), (3, 0.5)], "doc_id long, score double"
    )
    r3 = curation.clf_roc(scores3, labels3, thresholds=(0.5,)).collect()[0]
    assert (r3["tp"], r3["fp"], r3["fn"], r3["tn"]) == (1, 0, 0, 1)
    assert r3["auc"] == 1.0


def test_pipeline_funnel_hand_computed(spark):
    from gocrawl_spark import corpusstats as cs

    good = " ".join(f"word{i % 7}" for i in range(60))          # 60 tokens, passes gopher
    poison = "zebra quark nebula ostrich velvet cobalt meadow turbine"
    dirty = good + " " + poison                                  # 68 tokens, contaminated
    docs = spark.createDataFrame(
        [(1, good), (2, good), (3, "too short"), (4, dirty)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, poison)], "bench_id long, bench_text string"
    )
    out = {r["stage_no"]: r for r in cs.pipeline_funnel(docs, bench, k=8).collect()}
    assert [out[i]["stage"] for i in (1, 2, 3, 4)] == [
        "raw", "exact_dedup", "quality_gate", "decontaminated"
    ]
    # raw: 4 docs, 60+60+2+68 tokens
    assert (out[1]["n_docs"], out[1]["n_tokens"]) == (4, 190)
    # doc 2 is a byte-copy of doc 1 -> dropped
    assert (out[2]["n_docs"], out[2]["n_tokens"]) == (3, 130)
    # doc 3 fails the 50-word gopher floor
    assert (out[3]["n_docs"], out[3]["n_tokens"]) == (2, 128)
    # doc 4 shares an 8-gram with the benchmark -> dirty
    assert (out[4]["n_docs"], out[4]["n_tokens"]) == (1, 60)
    assert out[4]["doc_frac"] == 0.25
    assert out[4]["token_frac"] == round(60 / 190, 6)
    assert out[1]["doc_frac"] == 1.0 and out[1]["token_frac"] == 1.0


def test_cocitation_seeds_hand_computed(spark):
    from gocrawl_spark import graphrank

    edges = spark.createDataFrame(
        [(1, "seedA"), (1, "x.com"), (1, "y.com"),
         (2, "seedA"), (2, "seedB"), (2, "x.com"),
         (3, "y.com"),                      # no seed on this page
         (2, "x.com")],                     # duplicate edge collapses
        "src long, dst_host string",
    )
    seeds = spark.createDataFrame([("seedA",), ("seedB",)], "host string")
    got = {r["host"]: r for r in
           graphrank.cocitation_seeds(edges, seeds).collect()}
    assert set(got) == {"x.com", "y.com"}  # seeds excluded, page 3 mute
    assert (got["x.com"]["n_pages"], got["x.com"]["n_seed_hosts"]) == (2, 2)
    assert (got["y.com"]["n_pages"], got["y.com"]["n_seed_hosts"]) == (1, 1)
    top = graphrank.cocitation_seeds(edges, seeds, top_k=1).collect()
    assert [r["host"] for r in top] == ["x.com"]


def test_cocitation_seeds_fanout_cap(spark):
    from gocrawl_spark import graphrank

    # link-farm page cites the seed plus 50 hosts; the seed citation
    # is detected UNCAPPED, then cap=8 bounds the candidate fan-out
    # to the 8 host-ASC smallest
    rows = [(1, "seedA")] + [(1, f"h{i:02d}.com") for i in range(50)]
    edges = spark.createDataFrame(rows, "src long, dst_host string")
    seeds = spark.createDataFrame([("seedA",)], "host string")
    got = {r["host"] for r in
           graphrank.cocitation_seeds(edges, seeds, max_out=8).collect()}
    assert got == {f"h{i:02d}.com" for i in range(8)}
    got_all = {r["host"] for r in
               graphrank.cocitation_seeds(edges, seeds, max_out=50).collect()}
    assert len(got_all) == 50


def test_lm_para_prune_drops_gibberish_paragraph(spark):
    from gocrawl_spark import textstats

    common = " ".join(["alpha beta gamma delta"] * 6)
    docs = spark.createDataFrame(
        [(1, common + "\nxq1 qx1 zv1 vz1\n" + common),
         (2, common),
         (3, common + "\n\n  \n" + common),        # blank paras vanish
         (4, "\n \n")],                            # no real paragraphs at all
        "doc_id long, text string",
    )
    # measured under the self-trained LM: prose paragraphs score
    # ppl 1.263179, the gibberish one 4.5 — prune between them
    out = {r["doc_id"]: r for r in
           textstats.lm_para_prune(docs, max_ppl=3.0).collect()}
    # doc 1: gibberish middle paragraph dies, prose rejoins in order
    assert (out[1]["n_paras"], out[1]["n_kept"]) == (3, 2)
    assert out[1]["text"] == common + "\n" + common
    assert (out[2]["n_paras"], out[2]["n_kept"]) == (1, 1)
    # whitespace-only paragraphs are not paragraphs
    assert (out[3]["n_paras"], out[3]["n_kept"]) == (2, 2)
    assert out[3]["text"] == common + "\n" + common
    # a doc with no non-blank paragraphs still gets a row
    assert (out[4]["n_paras"], out[4]["n_kept"], out[4]["text"]) == (0, 0, "")


def test_lm_para_prune_short_paragraphs_never_punished(spark):
    from gocrawl_spark import textstats

    docs = spark.createDataFrame(
        [(1, "alpha beta alpha beta\nsolo")], "doc_id long, text string"
    )
    out = textstats.lm_para_prune(docs, max_ppl=0.001).collect()[0]
    # 1-word paragraph has no transitions: kept even at an absurd bar
    assert out["n_paras"] == 2 and out["n_kept"] == 1
    assert out["text"] == "solo"


def test_lm_para_prune_deterministic_across_parallelism(spark):
    from gocrawl_spark import textstats

    rows = [(i, " ".join(f"w{(i * 3 + j) % 11}" for j in range(30))
             + "\n" + " ".join(f"g{i}x{j}" for j in range(6)))
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, textstats.lm_para_prune(df.repartition(1), max_ppl=80.0).collect()))
    b = sorted(map(tuple, textstats.lm_para_prune(df.repartition(13), max_ppl=80.0).collect()))
    assert a == b


def test_refetch_waste_hand_computed(spark):
    from gocrawl_spark import scheduler as sch

    hist = spark.createDataFrame(
        # host X: url A seen 3 times never changing (2 wasted refetches),
        # url B changes each time (2 useful). host Y: first visits only.
        [("A", "X", 0, 5), ("A", "X", 1, 5), ("A", "X", 2, 5),
         ("B", "X", 0, 1), ("B", "X", 1, 2), ("B", "X", 2, 3),
         ("C", "Y", 0, 9)],
        "url string, host string, generation int, page_ts int",
    )
    got = {r["host"]: r for r in sch.refetch_waste(hist).collect()}
    x = got["X"]
    assert (x["n_urls"], x["n_refetches"], x["n_unchanged"]) == (2, 4, 2)
    assert x["waste_share"] == 0.5
    y = got["Y"]
    assert (y["n_urls"], y["n_refetches"], y["n_unchanged"]) == (1, 0, 0)
    assert y["waste_share"] == 0.0


def test_host_cap_elects_best_quality(spark):
    from gocrawl_spark import curation

    rich = ("the data and the table for it is that " * 12).strip()
    docs = spark.createDataFrame(
        [(1, "h1", rich), (2, "h1", "x y"), (3, "h1", rich + " extra"),
         (4, "h2", "solo")],
        "doc_id long, source string, text string",
    )
    out = curation.host_cap(docs, cap=2, host_col="source")
    got = {r["doc_id"]: r for r in out.collect()}
    # h1 keeps its 2 best-quality docs; the junk doc 2 is cut
    assert set(got) == {1, 3, 4}
    assert got[4]["host_rank"] == 1
    assert {got[1]["host_rank"], got[3]["host_rank"]} == {1, 2}
    # deterministic across parallelism
    a = sorted(map(tuple, curation.host_cap(docs.repartition(1), cap=2,
                                            host_col="source").collect()))
    b = sorted(map(tuple, curation.host_cap(docs.repartition(7), cap=2,
                                            host_col="source").collect()))
    assert a == b


def test_clf_train_single_sweep_hand_computed(spark):
    import hashlib

    from gocrawl_spark import curation

    # one doc, one feature, label positive: sigma0 = 0.5, residual
    # -0.5e6 micro, gradient -500000, update w = +round(0.5*500000)
    docs = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
    labels = spark.createDataFrame([(1, True)], "doc_id long, label boolean")
    out = curation.clf_train(docs, labels, sweeps=1, lr=0.5).collect()
    assert len(out) == 1
    bucket = int(hashlib.md5(b"hello").hexdigest()[:8], 16) % 1024
    assert out[0]["bucket"] == bucket
    assert out[0]["weight"] == 0.25


def test_clf_train_learns_separable_labels(spark):
    from gocrawl_spark import curation

    # two disjoint vocabularies, labels follow the vocabulary: the
    # trained scorer must separate them (untrained cannot)
    rows = [(i, "good fine nice clean solid " * 4, True) for i in range(30)]
    rows += [(100 + i, "junk spam trash noise mess " * 4, False) for i in range(30)]
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in rows], "doc_id long, text string"
    )
    labels = spark.createDataFrame(
        [(i, y) for i, _, y in rows], "doc_id long, label boolean"
    )
    w = curation.clf_train(docs, labels, sweeps=3, lr=0.5)
    roc = curation.clf_roc(
        curation.clf_score(docs, w), labels, thresholds=(0.5,)
    ).collect()[0]
    assert roc["auc"] == 1.0
    assert roc["tp"] == 30 and roc["tn"] == 30 and roc["fp"] == 0


def test_clf_train_deterministic_and_ignores_unlabeled(spark):
    from gocrawl_spark import curation

    rows = [(i, f"w{i % 9} common text body here number {i % 4}") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    labels = spark.createDataFrame(
        [(i, (i % 3 == 0) if i % 5 else None) for i in range(40)],
        "doc_id long, label boolean",
    )
    a = sorted(map(tuple, curation.clf_train(
        docs.repartition(1), labels, sweeps=2).collect()))
    b = sorted(map(tuple, curation.clf_train(
        docs.repartition(11), labels, sweeps=2).collect()))
    assert a == b
    # NULL-labeled docs contribute no gradient: training on the
    # labeled subset alone gives the identical weight table
    only = labels.filter("label is not null")
    c = sorted(map(tuple, curation.clf_train(docs, only, sweeps=2).collect()))
    assert a == c


def test_robots_drift_audit_hand_computed(spark):
    from gocrawl_spark import robots as rb

    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /private/\n"),
         ("b.com", "User-agent: *\nDisallow: /\nAllow: /public/\n")],
        "host string, rules string",
    )
    fetched = spark.createDataFrame(
        [("a.com", "https://a.com/ok"), ("a.com", "https://a.com/private/x"),
         ("b.com", "https://b.com/public/y"), ("b.com", "https://b.com/hidden"),
         ("c.com", "https://c.com/anything")],  # no robots row: allowed
        "host string, url string",
    )
    got = {r["host"]: r for r in rb.drift_audit(fetched, robots).collect()}
    assert (got["a.com"]["n_fetched"], got["a.com"]["n_disallowed"]) == (2, 1)
    assert got["a.com"]["disallowed_share"] == 0.5
    assert (got["b.com"]["n_fetched"], got["b.com"]["n_disallowed"]) == (2, 1)
    assert (got["c.com"]["n_fetched"], got["c.com"]["n_disallowed"]) == (1, 0)
    # the audit verdict is the fetch-time gate's verdict: gate keeps
    # exactly the rows the audit counts as allowed
    kept = rb.gate(fetched, robots).count()
    total_allowed = sum(
        r["n_fetched"] - r["n_disallowed"] for r in got.values()
    )
    assert kept == total_allowed


def test_bool_function_score_modes(spark):
    """function_score: score_mode multiply/max/avg/first combine over
    MATCHING functions only (no matching function → 1, as in ES);
    boost_mode sum/replace; max_boost clamps; min_score filters."""
    rows = [
        (1, "alpha alpha", "news", 100.0),
        (2, "alpha", "blog", 400.0),
        (3, "beta", "news", 50.0),   # query no-match
        (4, "alpha", "wire", 900.0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string, boost_val double"
    )

    def run(body):
        return {
            r["id"]: r["score"]
            for r in search.bool_topk(
                df, {"must": [{"function_score": body}]},
                id_col="doc_id", k=10,
            ).collect()
        }

    # multiply over matching fns; the news-filtered fn skips non-news
    got = run({
        "query": {"match": {"text": "alpha"}},
        "functions": [
            {"filter": {"term": {"source": "news"}}, "weight": 3.0},
            {"field_value_factor": {"field": "boost_val", "factor": 0.01}},
        ],
        "score_mode": "multiply",
    })
    # doc1: 2 × (3·1.0) = 6; doc2: 1 × 4 = 4; doc4: 1 × 9 = 9
    assert got == {1: 6.0, 2: 4.0, 4: 9.0}

    # max picks the best matching function; boost_mode=sum adds it
    got = run({
        "query": {"match": {"text": "alpha"}},
        "functions": [
            {"filter": {"term": {"source": "news"}}, "weight": 3.0},
            {"field_value_factor": {"field": "boost_val", "factor": 0.01}},
        ],
        "score_mode": "max", "boost_mode": "sum",
    })
    # doc1: 2 + max(3,1) = 5; doc2: 1 + 4 = 5; doc4: 1 + 9 = 10
    assert got == {1: 5.0, 2: 5.0, 4: 10.0}

    # first = first matching function in list order; replace drops the
    # query score; max_boost clamps the combined function score
    got = run({
        "query": {"match": {"text": "alpha"}},
        "functions": [
            {"filter": {"term": {"source": "news"}}, "weight": 3.0},
            {"field_value_factor": {"field": "boost_val", "factor": 0.01}},
        ],
        "score_mode": "first", "boost_mode": "replace", "max_boost": 5.0,
    })
    # doc1: first matching = 3; doc2: fvf 4; doc4: fvf 9 → clamp 5
    assert got == {1: 3.0, 2: 4.0, 4: 5.0}

    # no functions at all → combined 1.0; min_score filters matches
    got = run({
        "query": {"match": {"text": "alpha"}},
        "min_score": 1.5,
    })
    assert got == {1: 2.0}

    # avg over matching functions
    got = run({
        "query": {"match": {"text": "alpha"}},
        "functions": [
            {"filter": {"term": {"source": "news"}}, "weight": 3.0},
            {"field_value_factor": {"field": "boost_val", "factor": 0.01}},
        ],
        "score_mode": "avg", "boost_mode": "replace",
    })
    # doc1: (3+1)/2 = 2; doc2: 4/1 = 4; doc4: 9/1 = 9
    assert got == {1: 2.0, 2: 4.0, 4: 9.0}


def test_bool_span_near_semantics(spark):
    """span_near in_order: anchored ordered-subsequence windows with
    Lucene slop (intervening positions); 3-term chains fold greedily;
    in_order=false and non-span_term clauses raise."""
    rows = [
        (1, "a x b y c"),        # a..b gap1, b..c gap1 → total 2
        (2, "a b c"),            # adjacent
        (3, "c b a"),            # wrong order
        (4, "a x x x b c"),      # a..c spread 3 intervening
        (5, "a b"),              # missing c
        (6, "a c b a x c b"),    # windows: anchor@1 fails (c before b
                                 # consumed? greedy: a,c? need b first →
                                 # a@1: window a c b a → b@3, then c in
                                 # window? window len 3+slop
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def run(slop):
        return {
            r["id"]: r["score"]
            for r in search.bool_topk(
                df,
                {"must": [{"span_near": {
                    "clauses": [
                        {"span_term": {"text": "a"}},
                        {"span_term": {"text": "b"}},
                        {"span_term": {"text": "c"}},
                    ],
                    "slop": slop, "in_order": True,
                }}]},
                id_col="doc_id", k=10,
            ).collect()
        }

    assert run(0) == {2: 1.0}            # only the adjacent chain
    got2 = run(2)
    # slop 2: doc1 (2 intervening) matches, doc2 matches, doc4 (3) not
    assert got2[1] == 1.0 and got2[2] == 1.0
    assert 4 not in got2 and 3 not in got2 and 5 not in got2
    got3 = run(3)
    assert 4 in got3                      # 3 intervening fits slop 3

    import pytest as _pytest

    with _pytest.raises(ValueError, match="in_order"):
        search.bool_topk(
            df,
            {"must": [{"span_near": {
                "clauses": [{"span_term": {"text": "a"}},
                            {"span_term": {"text": "b"}}],
                "slop": 1,
            }}]},
            id_col="doc_id", k=5,
        )


def test_bool_terms_set_pinned_rank_feature(spark):
    """terms_set constant-msm form; pinned ordering ahead of organic;
    rank_feature log and sigmoid shapers."""
    rows = [
        (1, "alpha beta", 10.0),
        (2, "alpha", 99.0),
        (3, "beta gamma delta", 0.0),
        (4, "delta", 5.0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, feat double")

    # constant minimum_should_match
    got = {
        r["id"]: r["score"]
        for r in search.bool_topk(
            df,
            {"must": [{"terms_set": {"text": {
                "terms": ["alpha", "beta", "gamma"],
                "minimum_should_match": 2,
            }}}]},
            id_col="doc_id", k=10,
        ).collect()
    }
    assert got == {1: 2.0, 3: 2.0}

    # pinned: promoted ids first in list order, organic afterwards
    ids = [
        r["id"]
        for r in search.bool_topk(
            df,
            {"must": [{"pinned": {
                "ids": [4, 3],
                "organic": {"match": {"text": "alpha"}},
            }}]},
            id_col="doc_id", k=10,
        ).collect()
    ]
    assert ids == [4, 3, 1, 2]

    # rank_feature log: log10(scaling_factor + v); zero feature no match
    import math

    got = {
        r["id"]: r["score"]
        for r in search.bool_topk(
            df,
            {"must": [{"rank_feature": {
                "field": "feat", "log": {"scaling_factor": 1.0},
            }}]},
            id_col="doc_id", k=10,
        ).collect()
    }
    assert 3 not in got
    assert got[2] == round(math.log10(100.0), 6)

    # rank_feature sigmoid: v^e/(v^e+pivot^e)
    got = {
        r["id"]: r["score"]
        for r in search.bool_topk(
            df,
            {"must": [{"rank_feature": {
                "field": "feat",
                "sigmoid": {"pivot": 10.0, "exponent": 2.0},
            }}]},
            id_col="doc_id", k=10,
        ).collect()
    }
    assert got[1] == 0.5
    assert got[4] == round(25.0 / 125.0, 6)


def test_bool_intervals_and_combined_fields(spark):
    """intervals: ordered match rules with max_gaps ≡ span_near slop,
    any_of takes the best sub-count; combined_fields: term-centric
    boost-weighted TF sums across fields, and-operator gating."""
    rows = [
        (1, "alpha beta gamma alpha", "big data"),
        (2, "alpha x beta", "data"),
        (3, "beta gamma", "big alpha"),
        (4, "alpha b c beta", "z"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, title string")

    got = {
        r["id"]: r["score"]
        for r in search.bool_topk(
            df,
            {"must": [{"intervals": {"text": {"match": {
                "query": "alpha beta", "max_gaps": 1, "ordered": True,
            }}}}]},
            id_col="doc_id", k=10,
        ).collect()
    }
    # gap 0 (doc1) and gap 1 (doc2) match; gap 2 (doc4) does not
    assert got == {1: 1.0, 2: 1.0}

    got = {
        r["id"]: r["score"]
        for r in search.bool_topk(
            df,
            {"must": [{"intervals": {"text": {"any_of": {"intervals": [
                {"match": {"query": "alpha beta",
                           "max_gaps": 0, "ordered": True}},
                {"match": {"query": "beta gamma",
                           "max_gaps": 0, "ordered": True}},
            ]}}}}]},
            id_col="doc_id", k=10,
        ).collect()
    }
    assert got == {1: 1.0, 3: 1.0}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="ordered"):
        search.bool_topk(
            df,
            {"must": [{"intervals": {"text": {"match": {
                "query": "alpha beta", "max_gaps": 1,
            }}}}]},
            id_col="doc_id", k=10,
        )

    got = {
        r["id"]: r["score"]
        for r in search.bool_topk(
            df,
            {"must": [{"combined_fields": {
                "query": "alpha data",
                "fields": ["text", "title^2"],
                "operator": "and",
            }}]},
            id_col="doc_id", k=10,
        ).collect()
    }
    # doc1: alpha 2 (text) + data 2 (title×2) = 4; doc2: 1 + 2 = 3;
    # doc3/doc4 fail the and-gate (one term absent everywhere)
    assert got == {1: 4.0, 2: 3.0}


def test_bitext_filters_battery(spark):
    """Per-rule verdicts: integer ratio bounds, identical-copy flag,
    token-set overlap ppm, empty side, combined keep."""
    from gocrawl_spark import curation

    rows = [
        (1, "the quick brown fox", "le renard brun rapide"),        # keep
        (2, "hello world", "hello world"),                          # identical
        (3, "a b c d e f g h i j", "x y"),                          # ratio
        (4, "shared tokens here mostly", "shared tokens here too"), # overlap
        (5, "something", ""),                                       # empty
        (6, "Hello, WORLD!", "hello world"),                        # same tokens,
                                                                    # different raw
    ]
    df = spark.createDataFrame(rows, "pair_id long, src_text string, tgt_text string")
    got = {
        r["pair_id"]: r
        for r in curation.bitext_filters(df, max_overlap_ppm=500_000).collect()
    }
    assert got[1]["keep"] and got[1]["overlap_ppm"] == 0
    assert got[2]["identical"] and not got[2]["keep"]
    assert not got[3]["ratio_ok"] and not got[3]["keep"]
    # 3 shared of 5 distinct union = 600000 ppm > 500000
    assert got[4]["overlap_ppm"] == 600000 and not got[4]["keep"]
    assert got[5]["empty"] and not got[5]["ratio_ok"]
    # normalized tokens identical but raw strings differ: not
    # `identical`, but overlap 1e6 kills it
    assert not got[6]["identical"] and got[6]["overlap_ppm"] == 1000000
    assert not got[6]["keep"]


def test_judge_agreement_kappas(spark):
    """Cohen's κ against the textbook contingency formula; NULL
    verdicts drop from that pair only; Fleiss row covers complete
    items; perfect agreement → κ 1.0."""
    from gocrawl_spark import curation

    rows = [
        (1, True, True, True), (2, True, True, False),
        (3, False, False, False), (4, False, True, False),
        (5, True, True, True), (6, False, False, True),
        (7, True, False, None),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, ja boolean, jb boolean, jc boolean"
    )
    got = {
        (r["judge_a"], r["judge_b"]): r
        for r in curation.judge_agreement(df, ["ja", "jb", "jc"]).collect()
    }
    # (ja,jb): tt=3 tf=1 ft=1 ff=2 → po=5/7, pe=(4·4+3·3)/49, κ≈0.4167
    ab = got[("ja", "jb")]
    assert (ab["n_items"], ab["n_agree"], ab["kappa"]) == (7, 5, 0.416667)
    # jc NULL on doc 7 → those pairs see 6 items
    assert got[("ja", "jc")]["n_items"] == 6
    fl = got[("fleiss", "all")]
    assert fl["n_items"] == 6 and abs(fl["kappa"] - 0.325) < 1e-9

    same = spark.createDataFrame(
        [(1, True, True), (2, False, False), (3, True, True)],
        "doc_id long, a boolean, b boolean",
    )
    perfect = curation.judge_agreement(same, ["a", "b"]).collect()
    assert {r["kappa"] for r in perfect if r["judge_a"] == "a"} == {1.0}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="two judges"):
        curation.judge_agreement(same, ["a"])


def test_clf_reliability_bins(spark):
    """Rank-based equal-count bins; a perfectly-ranked score gives a
    step-function pos_ppm; bin edges are exact integer ranks."""
    from gocrawl_spark import curation

    scored = spark.createDataFrame(
        [(i, i / 100.0) for i in range(100)], "doc_id long, score double"
    )
    labels = spark.createDataFrame(
        [(i, i >= 50) for i in range(100)], "doc_id long, label boolean"
    )
    got = {
        r["bin"]: r
        for r in curation.clf_reliability(scored, labels, n_bins=5).collect()
    }
    assert all(got[b]["n"] == 20 for b in range(5))
    assert [got[b]["pos_ppm"] for b in range(5)] == [
        0, 0, 500000, 1000000, 1000000
    ]
    assert got[2]["min_score"] == 0.4 and got[2]["max_score"] == 0.59

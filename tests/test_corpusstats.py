"""Corpus-level statistical audits (corpusstats.py): Zipf regression
math, Heaps bucketing edges, distinct-n ratios, and the rank-selected
skew audit — all against hand-computed expectations."""

from __future__ import annotations

import math

import pytest

from gocrawl_spark import corpusstats as cs


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        (0, "alpha alpha alpha alpha beta beta"),
        (1, "alpha alpha beta gamma"),
        (2, "alpha alpha gamma delta"),
        (3, "delta epsilon"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_zipf_fit_hand_computed(tiny):
    row = cs.zipf_fit(tiny, top_n=10).collect()[0]
    # counts: alpha 8, beta 3, gamma 2, delta 2, epsilon 1
    assert row["n_types"] == 5
    assert row["n_tokens"] == 16
    assert row["fit_n"] == 5
    # same least-squares formula in pure python, rank order
    # (cnt DESC, word ASC): alpha,beta,delta,gamma,epsilon
    cnts = [8, 3, 2, 2, 1]
    xs = [math.log(r) for r in range(1, 6)]
    ys = [math.log(c) for c in cnts]
    n = 5.0
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert row["zipf_slope"] == pytest.approx(slope, abs=1e-6)
    assert row["zipf_intercept"] == pytest.approx((sy - slope * sx) / n, abs=1e-6)
    r2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert row["zipf_r2"] == pytest.approx(r2, abs=1e-6)
    assert slope < 0  # frequencies decay with rank


def test_heaps_curve_growth_and_buckets(tiny):
    rows = {r["checkpoint"]: r for r in cs.heaps_curve(tiny, checkpoints=3).collect()}
    # max_id=3 → bounds: 1, 2, 3; buckets: ceil(id*3/3) = id (id 0 → 1)
    assert [rows[k]["id_bound"] for k in (1, 2, 3)] == [1, 2, 3]
    # docs 0,1 in cp1; doc 2 in cp2; doc 3 in cp3
    assert [rows[k]["cum_docs"] for k in (1, 2, 3)] == [2, 3, 4]
    assert [rows[k]["cum_tokens"] for k in (1, 2, 3)] == [10, 14, 16]
    # first ids: alpha/beta 0, gamma 1, delta 2, epsilon 3
    assert [rows[k]["cum_types"] for k in (1, 2, 3)] == [3, 4, 5]
    # vocabulary growth is monotone by construction
    assert rows[1]["cum_types"] <= rows[2]["cum_types"] <= rows[3]["cum_types"]


def test_distinct_ngrams(spark):
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "x y z"), (3, "")],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in cs.distinct_ngrams(df).collect()}
    r1 = out[1]
    assert (r1["n1_total"], r1["distinct_1"]) == (3, round(2 / 3, 6))
    # bigrams: "a a", "a b" → 2 distinct of 2
    assert (r1["n2_total"], r1["distinct_2"]) == (2, 1.0)
    # trigram of a 3-word doc: one shingle
    assert (r1["n3_total"], r1["distinct_3"]) == (1, 1.0)
    assert out[2]["distinct_1"] == 1.0
    # empty text: zero unigrams, ratio 0
    assert (out[3]["n1_total"], out[3]["distinct_1"]) == (0, 0.0)


def test_key_skew_audit(spark):
    rows = [(i, "hot" if i < 6 else ("warm" if i < 8 else "cold")) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, k string")
    r = cs.key_skew_audit(df, "k").collect()[0]
    # counts: hot 6, warm 2, cold 2 → ranks (desc): hot, cold, warm
    assert (r["n_keys"], r["n_rows"], r["max_cnt"]) == (3, 10, 6)
    # p50: asc-rank ceil(0.5·3)=2 → desc rank 2 → cnt 2
    assert r["p50_cnt"] == 2
    # p99: asc-rank ceil(0.99·3)=3 → desc rank 1 → max
    assert r["p99_cnt"] == 6
    assert r["top_share"] == 0.6
    assert r["skew_ratio"] == 3.0


def test_length_histogram_buckets(spark):
    df = spark.createDataFrame(
        [(1, "en", 1), (2, "en", 2), (3, "en", 3), (4, "en", 4),
         (5, "de", 1023), (6, "de", 1024)],
        "doc_id long, lang string, n_chars int",
    )
    out = {(r["grp"], r["log2_bucket"]): r
           for r in cs.length_histogram(df).collect()}
    # bin lengths: 1→1, 2/3→2, 4→3, 1023→10, 1024→11 (power-of-two
    # boundary lands in the NEXT bucket — no float log ambiguity)
    assert out[("en", 1)]["n_docs"] == 1
    assert out[("en", 2)]["n_docs"] == 2
    assert out[("en", 3)]["n_docs"] == 1
    assert out[("de", 10)]["max_len"] == 1023
    assert out[("de", 11)]["min_len"] == 1024
    assert out[("en", 2)]["total_len"] == 5


def test_dist_drift(spark):
    a = spark.createDataFrame(
        [("en",)] * 3 + [("de",)] * 1, "k string")
    b = spark.createDataFrame(
        [("en",)] * 1 + [("fr",)] * 1, "k string")
    got = {r["key"]: r for r in cs.dist_drift(a, b, "k").collect()}
    en = got["en"]
    assert (en["n_a"], en["n_b"]) == (3, 1)
    assert (en["ppm_a"], en["ppm_b"]) == (750000, 500000)
    assert en["delta_ppm"] == 250000
    de = got["de"]
    assert (de["n_a"], de["n_b"], de["ppm_b"], de["delta_ppm"]) == (1, 0, 0, 250000)
    fr = got["fr"]
    assert (fr["n_a"], fr["ppm_a"], fr["ppm_b"]) == (0, 0, 500000)
    # empty snapshot: ppm pinned to 0, no division error
    empty = spark.createDataFrame([], "k string")
    g2 = {r["key"]: r for r in cs.dist_drift(a, empty, "k").collect()}
    assert g2["en"]["ppm_b"] == 0 and g2["en"]["delta_ppm"] == 750000


def test_hll_estimate_accuracy_and_merge(spark):
    """The deterministic HLL lands within the ~1.04/sqrt(m) error band
    on both regimes (linear counting and raw), and registers merge by
    bucket-max — union-then-register equals register-then-max-merge,
    the property that lets partial register tables combine across
    partitions/snapshots without re-reading values."""
    from pyspark.sql import functions as F

    from gocrawl_spark.corpusstats import hll_estimate, hll_registers

    df = spark.range(5000).select(
        F.concat(F.lit("u"), (F.col("id") % 2000).cast("string")).alias("v")
    )
    est = hll_estimate(hll_registers(df, "v", [], p=8), [], p=8).collect()[0]
    assert abs(est["estimate"] - 2000) / 2000 < 0.2  # 3σ at p=8 is ~20%
    small = spark.range(40).select(F.col("id").cast("string").alias("v"))
    est2 = hll_estimate(hll_registers(small, "v", [], p=8), [], p=8).collect()[0]
    assert abs(est2["estimate"] - 40) < 5
    # mergeability: split the input, register each half, max-merge
    a = hll_registers(df.filter(F.col("v") < "u5"), "v", [], p=8)
    b = hll_registers(df.filter(F.col("v") >= "u5"), "v", [], p=8)
    merged = (
        a.unionByName(b).groupBy("bucket").agg(F.max("rho").alias("rho"))
    )
    one_shot = hll_registers(df, "v", [], p=8)
    assert (
        merged.exceptAll(one_shot).count() == 0
        and one_shot.exceptAll(merged).count() == 0
    )


def test_corpus_overlap_identical_and_disjoint(spark):
    """Corpus-level MinHash: identical corpora estimate Jaccard 1
    (every permutation's min agrees); token-disjoint corpora estimate
    ~0; the exact path reports the true distinct-shingle Jaccard."""
    from gocrawl_spark import corpusstats as cs

    rows_a = [(i, f"alpha{i} beta{i} gamma{i} delta{i} eps{i} zeta{i}") for i in range(30)]
    rows_b = [(i, f"omega{i} psi{i} chi{i} phi{i} ups{i} tau{i}") for i in range(30)]
    a = spark.createDataFrame(rows_a, "doc_id long, text string")
    b = spark.createDataFrame(rows_b, "doc_id long, text string")

    same = cs.corpus_overlap(a, a, num_hashes=16, exact=True).collect()[0]
    assert same["matches"] == 16
    assert same["est_jaccard_ppm"] == 1_000_000
    assert same["exact_jaccard_ppm"] == 1_000_000
    assert same["n_inter"] == same["n_union"]

    diff = cs.corpus_overlap(a, b, num_hashes=16, exact=True).collect()[0]
    assert diff["n_inter"] == 0 and diff["exact_jaccard_ppm"] == 0
    assert diff["matches"] <= 1  # sketch noise at H=16, truth is 0

    # half-overlapping: exact jaccard = |A∩B|/|A∪B| = 15/45; the H=64
    # estimate lands within ±3 stddev (σ = sqrt(J(1-J)/64) ≈ 0.059)
    c = spark.createDataFrame(rows_a[:15] + rows_b[:30], "doc_id long, text string")
    half = cs.corpus_overlap(a, c, num_hashes=64, exact=True).collect()[0]
    true_j = half["exact_jaccard_ppm"] / 1e6
    est_j = half["est_jaccard_ppm"] / 1e6
    assert abs(est_j - true_j) < 0.18


def test_dup_ngram_mass_hand_computed(spark):
    # k=2 shingles; lang 'a': doc0 "x y x y" -> ["x y","y x","x y"],
    # doc1 "x y" -> ["x y"]  =>  "x y"×4? no: doc0 gives x y, y x, x y
    # so counts: "x y"=3, "y x"=1  (total 4, distinct 2, dup 1, mass 3)
    rows = [
        (0, "x y x y", "a"),
        (1, "x y", "a"),
        (2, "p q", "b"),
        (3, "r s", "b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {
        r["grp"]: r
        for r in cs.dup_ngram_mass(df, k=2).collect()
    }
    a = out["a"]
    assert a["total_grams"] == 4
    assert a["distinct_grams"] == 2
    assert a["dup_grams"] == 1
    assert a["dup_mass"] == 3
    assert a["frac_dup_grams"] == 0.5
    assert a["frac_dup_mass"] == 0.75
    b = out["b"]
    assert b["total_grams"] == 2 and b["dup_grams"] == 0
    assert b["frac_dup_mass"] == 0.0


def test_dup_ngram_mass_short_doc_fallback(spark):
    # a doc with < k words contributes its whole text as ONE gram
    # (the shingles_of_words fallback); empty docs contribute nothing
    rows = [(0, "solo", "a"), (1, "solo", "a"), (2, "", "a")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    row = cs.dup_ngram_mass(df, k=3).collect()[0]
    assert row["total_grams"] == 2
    assert row["distinct_grams"] == 1
    assert row["dup_mass"] == 2


def test_cms_upper_bound_and_exactness(spark):
    # skewed stream: key "k0" 30×, k1..k5 3× each
    rows = [("k0",)] * 30 + [(f"k{i}",) for i in range(1, 6) for _ in range(3)]
    df = spark.createDataFrame(rows, "host string")
    keys = df.select("host").distinct()
    exact = {r["host"]: r["c"] for r in df.groupBy("host").count()
             .withColumnRenamed("count", "c").collect()}
    # narrow sketch: collisions possible, but est >= exact ALWAYS
    sk = cs.cms_sketch(df, "host", depth=4, width=8)
    est = {r["key"]: r["est"]
           for r in cs.cms_estimate(sk, keys, "host", depth=4, width=8).collect()}
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact)
    # wide sketch: 6 keys into 4x1024 cells -> no collisions, est == exact
    sk2 = cs.cms_sketch(df, "host", depth=4, width=1024)
    est2 = {r["key"]: r["est"]
            for r in cs.cms_estimate(sk2, keys, "host", depth=4, width=1024).collect()}
    assert est2 == exact


def test_cms_mergeable_across_shards(spark):
    rows_a = [(f"k{i % 4}",) for i in range(40)]
    rows_b = [(f"k{i % 7}",) for i in range(70)]
    a = spark.createDataFrame(rows_a, "host string")
    b = spark.createDataFrame(rows_b, "host string")
    import pyspark.sql.functions as F

    whole = cs.cms_sketch(a.union(b), "host", depth=3, width=16)
    merged = (
        cs.cms_sketch(a, "host", depth=3, width=16)
        .union(cs.cms_sketch(b, "host", depth=3, width=16))
        .groupBy("r", "b")
        .agg(F.sum("c").cast("long").alias("c"))
    )
    assert sorted(map(tuple, whole.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_fetch_gini_hand_computed(spark):
    # counts: a=1, b=1, c=2, d=4 → asc ranks 1..4, Σ i·cᵢ = 25, T = 8
    rows = [("a",)] + [("b",)] + [("c",)] * 2 + [("d",)] * 4
    df = spark.createDataFrame(rows, "source string")
    r = cs.fetch_gini(df, "source").collect()[0]
    assert r["n_hosts"] == 4
    assert r["n_fetches"] == 8
    assert r["max_cnt"] == 4
    assert r["gini"] == pytest.approx(2 * 25 / (4 * 8) - 5 / 4, abs=1e-9)
    assert r["hhi"] == pytest.approx((1 + 1 + 4 + 16) / 64, abs=1e-9)
    # top ceil(4/10)=1 host by count → 4 of 8 fetches
    assert r["top_decile_share"] == pytest.approx(0.5, abs=1e-9)


def test_fetch_gini_uniform_is_zero(spark):
    rows = [(f"h{i}",) for i in range(10) for _ in range(3)]
    df = spark.createDataFrame(rows, "source string")
    r = cs.fetch_gini(df, "source").collect()[0]
    assert r["gini"] == pytest.approx(0.0, abs=1e-9)
    assert r["hhi"] == pytest.approx(0.1, abs=1e-9)
    assert r["top_decile_share"] == pytest.approx(0.1, abs=1e-9)


def test_report_card_medians_and_dups(spark):
    from gocrawl_spark import curation

    rows = [
        # en: token counts 1,2,3,4 → lower median at ceil(4/2)=2nd → 2
        (0, "one", "en", "h1"),
        (1, "one two", "en", "h1"),
        (2, "one two three", "en", "h2"),
        (3, "one two three four", "en", "h2"),
        # de: two byte-identical docs → dup_rate 0.5; median of [2,2] → 2
        (4, "ein zwei", "de", "h3"),
        (5, "ein zwei", "de", "h3"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    out = {r["lang"]: r for r in curation.report_card(df).collect()}
    en, de = out["en"], out["de"]
    assert en["n_docs"] == 4 and en["n_hosts"] == 2
    assert en["n_tokens"] == 10
    assert en["p50_doc_tokens"] == 2
    assert en["dup_rate"] == pytest.approx(0.0)
    assert en["short_frac"] == pytest.approx(1.0)  # all under 50 tokens
    assert de["n_docs"] == 2 and de["n_hosts"] == 1
    assert de["p50_doc_tokens"] == 2
    assert de["dup_rate"] == pytest.approx(0.5)
    assert de["mean_doc_tokens"] == pytest.approx(2.0)


def test_kmv_jaccard_estimate_and_exact(spark):
    """Bottom-k resemblance: exact twin is the true Jaccard; the
    estimate is n_both/k over the k smallest union hashes; disjoint
    sets give 0, identical sets give 1e6 ppm; the bottom-k plan is a
    TakeOrdered, not a global sort exchange."""
    from gocrawl_spark import corpusstats

    a = spark.createDataFrame([(i,) for i in range(100)], "u long")
    b = spark.createDataFrame([(i,) for i in range(50, 150)], "u long")
    r = corpusstats.kmv_jaccard(a, b, "u", k=32, exact=True).collect()[0]
    assert (r["n_a"], r["n_b"], r["n_inter"], r["n_union"]) == (100, 100, 50, 150)
    assert r["exact_jaccard_ppm"] == 333333
    assert r["k_used"] == 32
    # unbiased estimator, SE ≈ 1/√32 ≈ 0.18: accept a generous band
    assert 100000 <= r["est_jaccard_ppm"] <= 600000

    same = corpusstats.kmv_jaccard(a, a, "u", k=16).collect()[0]
    assert same["est_jaccard_ppm"] == 1000000
    c = spark.createDataFrame([(i,) for i in range(1000, 1100)], "u long")
    disj = corpusstats.kmv_jaccard(a, c, "u", k=16).collect()[0]
    assert disj["est_jaccard_ppm"] == 0

    # k larger than the union: k_used clamps, estimate becomes exact
    small_a = spark.createDataFrame([(1,), (2,), (3,)], "u long")
    small_b = spark.createDataFrame([(2,), (3,), (4,)], "u long")
    sm = corpusstats.kmv_jaccard(small_a, small_b, "u", k=64).collect()[0]
    assert (sm["k_used"], sm["n_both"]) == (4, 2)
    assert sm["est_jaccard_ppm"] == 500000

    plan = (
        corpusstats.kmv_jaccard(a, b, "u", k=32)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_dup_rate_curve_monotone_ingest(spark):
    """Exact-dup share accumulates correctly: a corpus whose second
    half repeats the first half climbs to 50% by the last checkpoint;
    a dup-free corpus stays at 0."""
    from gocrawl_spark import corpusstats

    rows = [(i, f"unique text {i}") for i in range(50)] + [
        (50 + i, f"unique text {i}") for i in range(50)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["checkpoint"]: r for r in corpusstats.dup_rate_curve(df).collect()}
    last = got[10]
    assert (last["cum_docs"], last["cum_uniques"], last["cum_dups"]) == (100, 50, 50)
    assert last["dup_ppm"] == 500000
    # early checkpoints (first half only) are dup-free
    assert got[5]["cum_dups"] == 0 and got[5]["dup_ppm"] == 0
    # cumulative counts never decrease
    docs_seq = [got[c]["cum_docs"] for c in range(1, 11)]
    assert docs_seq == sorted(docs_seq)

    clean = spark.createDataFrame(
        [(i, f"only once {i}") for i in range(40)], "doc_id long, text string"
    )
    out = corpusstats.dup_rate_curve(clean).collect()
    assert all(r["dup_ppm"] == 0 for r in out)

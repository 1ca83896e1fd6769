"""Corpus-level statistical audits for web-text pipelines.

A crawl corpus headed for LLM training gets audited before it gets
trained on: does the token distribution look like natural language
(Zipf), is the vocabulary still growing or has the crawl started
re-reading itself (Heaps), how internally repetitive are individual
documents (distinct-n), and — operationally — is any partition key hot
enough to wreck a shuffle (skew audit). The reference ships the crawl
and indexing machinery these audits run on (its metrics surface,
internal/metrics/metrics.go, stops at fetch/parse counters); the
corpus-statistics layer itself is part of this repo's
training-data-pipeline extension.

Everything here is built for the 100 TB shape:

* word/n-gram counting is a map-side-combining groupBy on the token —
  the only shuffle is keyed on the (bounded-vocabulary) token itself;
* Zipf regression folds over the TOP-N frequencies only (a TakeOrdered
  of N rows — never a global sort of the vocabulary);
* the Heaps curve needs one small aggregate per WORD (its first
  document), then a 10-row cumulative sum — integer-only, so the
  result is trivially engine-stable;
* the skew audit reduces the key-frequency table to rank-selected
  order statistics (integer ranks, not interpolated quantiles), so
  max/median/p99 are exact and deterministic at any parallelism.

Float discipline (cross-engine oracle contract): regression sums fold
left-to-right over rank-sorted arrays (F.aggregate ≡ DuckDB
list_reduce), every reported float rounds to 6 dp, and ratios divide
exactly once in the same operand order in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from gocrawl_spark.textstats import norm_words, shingles, shingles_of_words

__all__ = [
    "zipf_fit", "heaps_curve", "distinct_ngrams", "length_histogram",
    "key_skew_audit", "corpus_minhash", "corpus_overlap",
    "dup_ngram_mass", "cms_sketch", "cms_estimate", "fetch_gini",
    "pipeline_funnel", "kmv_jaccard", "dup_rate_curve",
]


def _fold(arr: Column) -> Column:
    """Left-to-right IEEE sum (DuckDB: list_reduce(list_prepend(0.0,…)))."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def word_freq_ranks(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt, rank) over the norm_words stream, rank by
    (cnt DESC, word ASC) — the Zipf table. The groupBy combines
    map-side; ranking is consumed via TakeOrdered-style limits by the
    callers, never a full-vocabulary sort."""
    return (
        docs.select(F.explode(norm_words(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("cnt"), F.asc("word"))),
        )
    )


def zipf_fit(docs: DataFrame, text_col: str = "text", top_n: int = 1000) -> DataFrame:
    """Least-squares fit of ln(freq) on ln(rank) over the ``top_n``
    most frequent words — the Zipf's-law audit (slope ≈ −1 for natural
    language; a corpus of boilerplate or spam drifts off).

    Returns ONE row: (n_types, n_tokens, fit_n, zipf_slope,
    zipf_intercept, zipf_r2), floats rounded to 6 dp.

    The five regression sums (Σx, Σy, Σxy, Σx², Σy²) each fold
    left-to-right over the rank-sorted point list, so the fit is
    bit-reproducible at any parallelism and in the DuckDB oracle.
    The single-partition window behind the rank only ever sees
    ``top_n`` survivors' worth of competition per partition boundary —
    vocabulary counting itself stays fully distributed.
    """
    wf = word_freq_ranks(docs, text_col)
    totals = wf.agg(
        F.count("*").alias("n_types"), F.sum("cnt").alias("n_tokens")
    )
    pts = (
        wf.filter(F.col("rank") <= top_n)
        .select(
            "rank",
            F.log(F.col("rank").cast("double")).alias("x"),
            F.log(F.col("cnt").cast("double")).alias("y"),
        )
        .agg(
            F.count("*").alias("fit_n"),
            F.array_sort(F.collect_list(F.struct("rank", "x", "y"))).alias("p")
        )
        .select(
            "fit_n",
            _fold(F.transform("p", lambda s: s["x"])).alias("sx"),
            _fold(F.transform("p", lambda s: s["y"])).alias("sy"),
            _fold(F.transform("p", lambda s: s["x"] * s["y"])).alias("sxy"),
            _fold(F.transform("p", lambda s: s["x"] * s["x"])).alias("sxx"),
            _fold(F.transform("p", lambda s: s["y"] * s["y"])).alias("syy"),
        )
    )
    n = F.col("fit_n").cast("double")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = n * F.col("syy") - F.col("sy") * F.col("sy")
    slope = cov / varx
    return totals.crossJoin(F.broadcast(pts)).select(
        "n_types",
        "n_tokens",
        "fit_n",
        F.round(slope, 6).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / n, 6).alias("zipf_intercept"),
        F.round(
            F.when(vary > 0, cov * cov / (varx * vary)).otherwise(F.lit(0.0)), 6
        ).alias("zipf_r2"),
    )


def heaps_curve(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoints: int = 10,
) -> DataFrame:
    """Vocabulary-growth curve V(n): cumulative distinct word types at
    ``checkpoints`` evenly spaced id thresholds — the Heaps'-law audit
    (types ≈ K·tokensᵝ; a flattening curve means the crawl is
    re-reading content it already has).

    Returns (checkpoint, id_bound, cum_docs, cum_tokens, cum_types) —
    all integers, engine-stable by construction. Per-word state is one
    MIN(id) aggregate (map-side combining); each word/doc then lands in
    its first covering checkpoint by pure integer math (bucket =
    ⌈id·checkpoints/max_id⌉ — the smallest k with id ≤ ⌊k·max_id/cp⌋),
    so there is NO non-equi join and no vocabulary broadcast; the
    cumulative step is a running sum over ``checkpoints`` rows only.
    """
    spark = docs.sparkSession
    cp = int(checkpoints)
    max_id = docs.agg(F.max(F.col(id_col)).alias("mx"))
    grid = (
        spark.range(1, cp + 1)
        .select(F.col("id").cast("int").alias("checkpoint"))
        .crossJoin(F.broadcast(max_id))
        .select(
            "checkpoint",
            F.expr(f"checkpoint * mx DIV {cp}").alias("id_bound"),
        )
    )

    def bucket(id_expr: str) -> Column:
        # ceil(id*cp/mx) in integer math, clamped to ≥ 1 for id = 0
        return F.greatest(
            F.lit(1), F.expr(f"({id_expr} * {cp} + mx - 1) DIV mx")
        ).alias("checkpoint")

    words = docs.select(
        F.col(id_col).alias("id"), F.explode(norm_words(text_col)).alias("word")
    )
    first = words.groupBy("word").agg(F.min("id").alias("first_id"))
    types_per = (
        first.crossJoin(F.broadcast(max_id))
        .groupBy(bucket("first_id"))
        .agg(F.count("*").alias("new_types"))
    )
    docs_per = (
        docs.select(
            F.col(id_col).alias("did"),
            F.size(norm_words(text_col)).alias("n_toks"),
        )
        .crossJoin(F.broadcast(max_id))
        .groupBy(bucket("did"))
        .agg(F.count("*").alias("new_docs"), F.sum("n_toks").alias("new_tokens"))
    )
    w = Window.orderBy("checkpoint").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        grid.join(types_per, "checkpoint", "left")
        .join(docs_per, "checkpoint", "left")
        .select(
            "checkpoint",
            "id_bound",
            F.sum(F.coalesce("new_docs", F.lit(0))).over(w).alias("cum_docs"),
            F.sum(F.coalesce("new_tokens", F.lit(0))).over(w).alias("cum_tokens"),
            F.sum(F.coalesce("new_types", F.lit(0))).over(w).alias("cum_types"),
        )
        .orderBy("checkpoint")
    )


def distinct_ngrams(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ns: tuple[int, ...] = (1, 2, 3),
) -> DataFrame:
    """Per-document distinct-n diversity: distinct n-grams / total
    n-grams for each n — the standard intra-document repetitiveness
    audit (low distinct-2/3 flags template spam and generation loops).
    Pure codegen'd array expressions over one tokenization; ratios
    round to 6 dp."""
    w = norm_words(text_col)
    cols = [F.col(id_col).alias("id")]
    for n in ns:
        grams = w if n == 1 else shingles_of_words(w, n)
        total = F.size(grams)
        cols.append(total.alias(f"n{n}_total"))
        cols.append(
            F.round(
                F.when(
                    total > 0,
                    F.size(F.array_distinct(grams)).cast("double") / total,
                ).otherwise(F.lit(0.0)),
                6,
            ).alias(f"distinct_{n}")
        )
    return docs.select(*cols)


def length_histogram(
    docs: DataFrame, by: str = "lang", len_col: str = "n_chars"
) -> DataFrame:
    """Log2-bucketed document-length histogram per ``by`` group — the
    dataset-card length audit (truncation risk at the long tail,
    fragment noise at the short one). bucket = ⌊log2 len⌋+1 computed as
    the BINARY-STRING length of the integer (``bin()`` in both Spark
    and DuckDB) — pure integer math, no float log edge cases at the
    power-of-two boundaries. One map-side-combining groupBy on a
    (group, bucket) key whose cardinality is |groups|·64 at most."""
    b = F.length(F.bin(F.col(len_col).cast("long"))).alias("log2_bucket")
    return (
        docs.groupBy(F.col(by).alias("grp"), b)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col(len_col).cast("long")).alias("total_len"),
            F.min(F.col(len_col).cast("long")).alias("min_len"),
            F.max(F.col(len_col).cast("long")).alias("max_len"),
        )
        .orderBy("grp", "log2_bucket")
    )


def key_skew_audit(df: DataFrame, key: str) -> DataFrame:
    """Shuffle-skew audit of a would-be partition key: ONE row of
    exact order statistics over the key-frequency table —

      (n_keys, n_rows, max_cnt, p50_cnt, p99_cnt, top_share,
       skew_ratio)

    p50/p99 are rank-selected counts (rank ceil(q·n) in count-DESC
    order — integers, no interpolation, so any engine agrees),
    top_share = max_cnt/n_rows and skew_ratio = max_cnt/p50_cnt round
    to 6 dp. skew_ratio is the number to watch before keying a join or
    aggregation on ``key``: the hot key's task runs ~that many times
    longer than the median task unless it's salted or AQE-split.

    The frequency table is one map-side-combining groupBy; the order
    statistics reduce it with a rank window whose single-partition
    stage only carries (key, cnt) pairs — n_keys rows, not n_rows.
    """
    freq = df.groupBy(F.col(key).alias("k")).agg(F.count("*").alias("cnt"))
    ranked = freq.withColumn(
        "r", F.row_number().over(Window.orderBy(F.desc("cnt"), F.asc("k")))
    )
    base = ranked.agg(
        F.count("*").alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
    )
    # rank of the q-quantile in DESC order: the element at ASC rank
    # ceil(q·n) sits at DESC rank n − ceil(q·n) + 1
    picks = ranked.crossJoin(F.broadcast(base.select("n_keys"))).select(
        F.when(
            F.col("r") == F.col("n_keys") - F.ceil(F.col("n_keys") * 0.5) + 1,
            F.col("cnt"),
        ).alias("p50"),
        F.when(
            F.col("r") == F.col("n_keys") - F.ceil(F.col("n_keys") * 0.99) + 1,
            F.col("cnt"),
        ).alias("p99"),
    ).agg(F.max("p50").alias("p50_cnt"), F.max("p99").alias("p99_cnt"))
    return base.crossJoin(F.broadcast(picks)).select(
        "n_keys",
        "n_rows",
        "max_cnt",
        "p50_cnt",
        "p99_cnt",
        F.round(F.col("max_cnt").cast("double") / F.col("n_rows"), 6).alias(
            "top_share"
        ),
        F.round(F.col("max_cnt").cast("double") / F.col("p50_cnt"), 6).alias(
            "skew_ratio"
        ),
    )


def dist_drift(a: DataFrame, b: DataFrame, key: str) -> DataFrame:
    """Categorical-distribution drift between two corpus snapshots —
    the dataset-card audit run before shipping a re-crawl: did the
    language (or source / content-type) mix move, and by how much per
    key? Total-variation distance is ``sum(delta_ppm) / 2`` over the
    output.

    Output, one row per key present in either snapshot: (key, n_a,
    n_b, ppm_a, ppm_b, delta_ppm) — shares in parts-per-million via
    integer DIV (n * 1e6 DIV total), so the numbers are exact and
    engine-independent; delta_ppm = |ppm_a - ppm_b|.

    Scale shape: each snapshot folds to #keys rows in ONE map-side-
    combined groupBy (the 100 TB corpus never shuffles on anything
    but the key); the two 1-row totals broadcast; the key-level
    full-outer join is #keys × #keys-sized. Empty snapshots yield
    ppm 0 rather than a division error.
    """
    def counted(df: DataFrame, n_col: str) -> DataFrame:
        return df.groupBy(F.col(key).alias("key")).agg(
            F.count("*").alias(n_col)
        )

    ca, cb = counted(a, "n_a"), counted(b, "n_b")
    ta = ca.agg(F.sum("n_a").alias("t_a"))
    tb = cb.agg(F.sum("n_b").alias("t_b"))
    ppm = lambda n, t: F.when(  # noqa: E731 — local alias
        F.col(t) > 0, F.expr(f"{n} * 1000000 DIV {t}")
    ).otherwise(F.lit(0)).cast("long")
    return (
        ca.join(cb, "key", "full_outer")
        .na.fill({"n_a": 0, "n_b": 0})
        .crossJoin(F.broadcast(ta))
        .crossJoin(F.broadcast(tb))
        .withColumn("ppm_a", ppm("n_a", "t_a"))
        .withColumn("ppm_b", ppm("n_b", "t_b"))
        .select(
            "key",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            "ppm_a",
            "ppm_b",
            F.abs(F.col("ppm_a") - F.col("ppm_b")).cast("long").alias("delta_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic HyperLogLog (Flajolet et al. 2007) — a from-scratch,
# engine-stable sketch. Spark's approx_count_distinct and DuckDB's
# approx sketches use different hash/register layouts, so they can
# never cross-verify; this one fixes the hash (first 16 md5 hex chars
# → uint64), the register layout, and the float op order, so the
# SAME estimate falls out of both engines bit-for-bit and at any
# parallelism. Use it where the exact distinct groupBy is the
# bottleneck: distinct URLs per host at 10^10-frontier scale is a
# shuffle of every URL; the sketch shuffles only m=2^p registers per
# group.
# ---------------------------------------------------------------------------


def hll_registers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    p: int = 8,
) -> DataFrame:
    """(group..., bucket, rho): HLL register table. bucket = low p bits
    of the md5-derived 64-bit hash; rho = 1 + leading-zero count of
    the remaining 64-p bits (capped at 62 so the 2^(62-rho) fold below
    stays in exact LONG range). Map-side-combining groupBy max —
    registers fold without ever collecting values."""
    g = list(group_cols or [])
    # uint64 from the first 16 md5 hex chars, split to keep everything
    # in non-negative LONG arithmetic: hi = first 15 hex chars (60
    # bits), lo = last char (4 bits)
    h_hi = F.conv(F.substring(F.md5(F.col(value_col)), 1, 15), 16, 10).cast(
        "long"
    )
    h_lo = F.conv(F.substring(F.md5(F.col(value_col)), 16, 1), 16, 10).cast(
        "long"
    )
    hashed = df.select(*g, h_hi.alias("h_hi"), h_lo.alias("h_lo"))
    bucket = (
        (F.col("h_hi") % F.lit(1 << (p - 4)).cast("long")) * 16 + F.col("h_lo")
    ).alias("bucket")
    # rho over the TOP 64-p bits of hi: shift right by (p-4) low bits
    rest = F.expr(f"h_hi DIV {1 << (p - 4)}")
    width = 64 - p
    # leading zeros of `rest` within `width` bits: width - bit_length;
    # bit_length via the base-2 string (exact integer op — float log2
    # at power-of-two boundaries is an engine-dependent ulp hazard)
    bitlen = F.when(
        rest > 0, F.length(F.conv(rest.cast("string"), 10, 2)).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    rho = F.least(
        (F.lit(width) - bitlen + 1).cast("long"), F.lit(62).cast("long")
    )
    prep = hashed.select(*g, bucket, rho.alias("rho"))
    return prep.groupBy(*g, "bucket").agg(F.max("rho").alias("rho"))


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str] | None = None,
    p: int = 8,
) -> DataFrame:
    """(group..., n_buckets, estimate): the HLL-with-small-range-
    correction estimate from a register table. The 2^-rho harmonic sum
    is EXACT arithmetic — 2^(62-rho) LONG terms summed as
    DECIMAL(38,0) (one per occupied bucket, 2^62 per empty bucket;
    DuckDB's BIGINT sum widens to HUGEINT the same way) — so no
    float-order drift exists; the single double division and the ln()
    of the linear-counting branch round to 6.

    Exact bit-length on LONGs, exact sums, one division: the whole
    estimator is reproducible across Spark, DuckDB, and any partition
    count."""
    g = list(group_cols or [])
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = registers.groupBy(*g).agg(
        F.count("*").cast("long").alias("n_buckets"),
        F.sum(
            F.expr(
                "cast(shiftleft(cast(1 as bigint), cast(62 - rho as int))"
                " as decimal(38,0))"
            )
        ).alias("_occ_sum"),
    )
    empty = (F.lit(m).cast("long") - F.col("n_buckets")).alias("_v")
    total = (
        F.col("_occ_sum")
        + empty.cast("decimal(38,0)") * F.lit(1 << 62).cast("decimal(38,0)")
    ).alias("_sum62")
    withs = agg.select(*g, "n_buckets", empty, total)
    raw = (
        F.lit(alpha * m * m)
        * F.lit(float(1 << 62))
        / F.col("_sum62").cast("double")
    )
    linear = F.lit(float(m)) * F.log(
        F.lit(float(m)) / F.col("_v").cast("double")
    )
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("_v") > 0), linear
    ).otherwise(raw)
    return withs.select(
        *g, "n_buckets", F.round(est, 6).alias("estimate")
    )


def corpus_minhash(
    docs: DataFrame,
    text_col: str = "text",
    num_hashes: int = 64,
    k: int = 5,
) -> DataFrame:
    """Corpus-LEVEL MinHash signature, one row per permutation:
    (h, minhash) where minhash = min over every shingle IN THE WHOLE
    CORPUS of md5('<h>#'<shingle>) — i.e. the MinHash signature of the
    corpus's shingle SET, not of any document. Two corpora's
    signatures estimate their shingle-set Jaccard (see
    :func:`corpus_overlap`), the dataset-card number for "how much
    does my new crawl overlap the last one / the training mix".

    Scale shape: the per-document signature is the existing Arrow UDF
    (dedup.minhash_signature_udf — embarrassingly parallel, never
    shuffles), and the corpus fold is min per permutation — summable,
    so map-side combine reduces every task's contribution to
    num_hashes rows. Total shuffle for 100 TB: num_hashes rows/task.
    """
    from gocrawl_spark import dedup

    sig = dedup.minhash_signature_udf(num_hashes=num_hashes, k=k)
    per_doc = docs.select(F.posexplode(sig(F.col(text_col))).alias("h", "mh"))
    return per_doc.groupBy("h").agg(F.min("mh").alias("minhash"))


def corpus_overlap(
    a: DataFrame,
    b: DataFrame,
    text_col: str = "text",
    num_hashes: int = 64,
    k: int = 5,
    exact: bool = False,
) -> DataFrame:
    """Shingle-set overlap between two corpora, one output row:
    (n_hashes, matches, est_jaccard_ppm[, n_inter, n_union,
    exact_jaccard_ppm]).

    The estimate is the standard MinHash identity — P[min_A = min_B] =
    J(A, B) — averaged over ``num_hashes`` md5 permutations; ppm uses
    integer DIV so the number is engine-exact. ``exact=True`` adds the
    true Jaccard over distinct shingle hashes: a full distinct+join
    over the corpus shingle space — the EVALUATION twin (what
    emb_dup_recall is to emb_dup_pairs), not the 100 TB path; the
    sketch path's total shuffle stays at num_hashes rows/task
    regardless of corpus size."""
    sa = corpus_minhash(a, text_col, num_hashes, k).withColumnRenamed(
        "minhash", "mh_a"
    )
    sb = corpus_minhash(b, text_col, num_hashes, k).withColumnRenamed(
        "minhash", "mh_b"
    )
    out = (
        sa.join(sb, "h")
        .agg(
            F.sum(
                F.when(F.col("mh_a") == F.col("mh_b"), 1).otherwise(0)
            ).cast("long").alias("matches")
        )
        .select(
            F.lit(num_hashes).cast("long").alias("n_hashes"),
            "matches",
            F.expr(f"matches * 1000000 DIV {num_hashes}").alias(
                "est_jaccard_ppm"
            ),
        )
    )
    if not exact:
        return out

    def sset(df: DataFrame) -> DataFrame:
        return (
            df.select(
                F.explode(shingles(F.col(text_col), k)).alias("sh")
            )
            .select(F.md5("sh").alias("s"))
            .distinct()
        )

    ja = sset(a).withColumn("_a", F.lit(1))
    jb = sset(b).withColumn("_b", F.lit(1))
    ex = (
        ja.join(jb, "s", "full_outer")
        .agg(
            F.sum(
                F.when(
                    F.col("_a").isNotNull() & F.col("_b").isNotNull(), 1
                ).otherwise(0)
            ).cast("long").alias("n_inter"),
            F.count("*").cast("long").alias("n_union"),
        )
        .select(
            "n_inter",
            "n_union",
            F.expr(
                "CASE WHEN n_union > 0 THEN n_inter * 1000000 DIV n_union"
                " ELSE 0 END"
            ).alias("exact_jaccard_ppm"),
        )
    )
    # both sides are single aggregate rows — metadata-sized join
    return out.crossJoin(ex)


def dup_ngram_mass(
    docs: DataFrame,
    by: str = "lang",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Corpus-level duplicated-n-gram audit per ``by`` group — the
    memorization-risk metric of Lee et al. 2022 ("Deduplicating
    Training Data Makes Language Models Better"): what fraction of the
    corpus's k-gram MASS (token occurrences) sits in k-grams that
    appear more than once corpus-wide, and what fraction of the
    DISTINCT k-gram vocabulary is duplicated. High dup-mass means the
    model will see (and can memorize) the same spans many times even
    after document-level dedup — the corpus-wide complement of the
    per-document ``distinct_ngrams`` audit.

    Returns one row per group:

      (grp, total_grams, distinct_grams, dup_grams, dup_mass,
       frac_dup_grams, frac_dup_mass)

    Scale shape: k-grams reduce to their md5 before the count, so the
    only shuffle is keyed on a fixed-width hash (map-side combine
    applies; the gram strings themselves never shuffle); the second
    aggregate is keyed on ``by`` (#groups rows). No doc×doc work, no
    driver-side state. Fractions are exact integer ratios divided once
    and rounded to 6 dp, so the output is engine-stable.
    """
    grams = (
        docs.select(
            F.col(by).alias("grp"),
            F.explode(shingles_of_words(norm_words(text_col), k)).alias("g"),
        )
        .filter(F.col("g") != "")
        .select("grp", F.md5("g").alias("h"))
        .groupBy("grp", "h")
        .agg(F.count("*").alias("c"))
    )
    dup = F.col("c") > 1
    return (
        grams.groupBy("grp")
        .agg(
            F.sum("c").cast("long").alias("total_grams"),
            F.count("*").cast("long").alias("distinct_grams"),
            F.sum(F.when(dup, 1).otherwise(0)).cast("long").alias("dup_grams"),
            F.sum(F.when(dup, F.col("c")).otherwise(0)).cast("long").alias("dup_mass"),
        )
        .select(
            "grp", "total_grams", "distinct_grams", "dup_grams", "dup_mass",
            F.round(F.col("dup_grams").cast("double") / F.col("distinct_grams"), 6).alias("frac_dup_grams"),
            F.round(F.col("dup_mass").cast("double") / F.col("total_grams"), 6).alias("frac_dup_mass"),
        )
    )


def cms_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) of a key stream
    — (r, b, c): counter c at bucket b of hash row r. The frequency
    sketch next to the cardinality one (:func:`hll_registers`): fixed
    ``depth × width`` counters however large the stream, mergeable by
    (r, b) sum across shards/rounds.

    Row hashes are md5("{r}:{key}") folded to a long exactly like the
    HLL hash (first 15 hex chars), so the sketch is engine- and
    partition-count-stable. One scan: each key explodes to its
    ``depth`` (row, bucket) cells, and the only shuffle keys on (r, b)
    — ≤ depth·width distinct values, so map-side combine collapses it
    to sketch size regardless of stream length.
    """
    cell = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("r"),
                    (
                        F.conv(
                            F.substring(
                                F.md5(
                                    F.concat(
                                        F.lit(f"{i}:"), F.col(key_col)
                                    )
                                ),
                                1,
                                15,
                            ),
                            16,
                            10,
                        ).cast("long")
                        % width
                    ).alias("b"),
                )
                for i in range(depth)
            ]
        )
    ).alias("cell")
    return (
        df.select(cell)
        .select("cell.r", "cell.b")
        .groupBy("r", "b")
        .agg(F.count("*").cast("long").alias("c"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-frequency estimates from a :func:`cms_sketch` — (key,
    est) with est = min over the sketch's ``depth`` rows of the
    counter at that key's bucket (the CMS upper bound: est ≥ true
    count always, with overestimate bounded by collisions). ``keys``
    is the candidate list (a prior round's top-k, a sample, a
    blocklist) — bounded, so the probe join broadcasts the ≤
    depth·width-row sketch; nothing driver-side."""
    probes = keys.select(
        F.col(key_col).alias("key"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("r"),
                        (
                            F.conv(
                                F.substring(
                                    F.md5(
                                        F.concat(
                                            F.lit(f"{i}:"), F.col(key_col)
                                        )
                                    ),
                                    1,
                                    15,
                                ),
                                16,
                                10,
                            ).cast("long")
                            % width
                        ).alias("b"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("cell"),
    ).select("key", "cell.r", "cell.b")
    j = probes.join(F.broadcast(sketch), ["r", "b"], "left")
    return j.groupBy("key").agg(
        F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("est")
    )


# ---------------------------------------------------------------------------
# Fetch-concentration audit (Gini / HHI over the per-host fetch counts)
# ---------------------------------------------------------------------------


def fetch_gini(df: DataFrame, key: str = "source") -> DataFrame:
    """ONE-row fetch-concentration audit of a crawl (or corpus) over
    its per-``key`` row counts — the politeness/diversity dual of
    `key_skew_audit`:

      (n_hosts, n_fetches, max_cnt, gini, hhi, top_decile_share)

    * gini — the Gini coefficient of the count distribution
      (0 = perfectly even crawl, →1 = one host got everything),
      computed exactly from ascending integer ranks:
      G = 2·Σᵢ i·cᵢ / (n·Σc) − (n+1)/n. Row-number ties are broken
      (cnt ASC, key ASC); equal counts make Σ i·cᵢ invariant to tie
      order, so the statistic is deterministic at any parallelism.
    * hhi — Herfindahl–Hirschman index Σ (cᵢ/T)², rank-free.
    * top_decile_share — share of all fetches landing on the top
      ceil(n/10) hosts by count (DESC rank, ties by key ASC).

    A healthy broad crawl under a politeness budget should sit at low
    gini/hhi; a trap-dominated or mirror-dominated crawl spikes all
    three. The reference exposes only global fetch counters
    (reference internal/metrics/metrics.go); the per-host
    concentration rollup is part of this repo's pipeline extension.

    Scale shape (10^10 fetches): the fetch log is scanned ONCE into a
    map-side-combining groupBy (≈ #hosts rows); the ascending rank AND
    the host count ride the SAME single window stage over that key
    table (row_number + a full-frame count share one sort — the
    #keys-sized single-partition contract of `key_skew_audit`), so the
    decile cut is an ordinary conditional sum inside the ONE final
    aggregate — no second pass, no self-join. All floats round to
    6 dp; numerators/denominators are exact integers up to the final
    division, so any engine agrees bit-for-bit.
    """
    freq = df.groupBy(F.col(key).alias("k")).agg(F.count("*").alias("cnt"))
    w = Window.orderBy(F.asc("cnt"), F.asc("k"))
    ranked = freq.select(
        "cnt",
        F.row_number().over(w).alias("r"),
        F.count("*")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("n"),
    )
    # top-decile: ASC rank r has DESC rank n−r+1; keep DESC rank ≤ ceil(n/10)
    in_dec = F.col("n") - F.col("r") + 1 <= F.ceil(F.col("n") / 10.0)
    base = ranked.agg(
        F.count("*").alias("n_hosts"),
        F.sum("cnt").alias("n_fetches"),
        F.max("cnt").alias("max_cnt"),
        F.sum(F.col("r").cast("double") * F.col("cnt")).alias("_src"),
        F.sum(F.col("cnt").cast("double") * F.col("cnt")).alias("_sc2"),
        F.sum(F.when(in_dec, F.col("cnt")).otherwise(F.lit(0))).alias("_dec_cnt"),
    )
    n = F.col("n_hosts").cast("double")
    t = F.col("n_fetches").cast("double")
    return base.select(
        "n_hosts",
        "n_fetches",
        "max_cnt",
        F.round(
            F.lit(2.0) * F.col("_src") / (n * t) - (n + 1.0) / n, 6
        ).alias("gini"),
        F.round(F.col("_sc2") / (t * t), 6).alias("hhi"),
        F.round(F.col("_dec_cnt").cast("double") / t, 6).alias(
            "top_decile_share"
        ),
    )


def pipeline_funnel(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    bench_id_col: str = "bench_id",
    bench_text_col: str = "bench_text",
) -> DataFrame:
    """Dataset-card yield funnel of the standard curation chain —
    how many documents and tokens survive each gate, cumulatively:

        raw → exact_dedup → quality_gate (Gopher) → decontaminated

    the per-stage accounting every corpus release publishes (C4,
    Gopher/MassiveText and RefinedWeb all report exactly this table;
    the reference's own metrics stop at global fetch/skip counters,
    internal/metrics/metrics.go). Stages apply in pipeline order, so
    row N counts docs passing gates 1..N. Returns
    (stage_no, stage, n_docs, n_tokens, doc_frac, token_frac) with
    fractions vs raw rounded to 6 dp (integer-count ratios — any
    engine agrees bit-for-bit).

    Gate semantics are the library's own, not re-derived: survivor =
    `dedup.text_key` min-id election (dedup.exact_dedup), quality =
    `textstats.gopher_keep`, contaminated = any verbatim k-gram shared
    with `benchmark` (dedup.contamination's broadcast shingle join,
    min_hits=1).

    Scale shape (10^10 docs): the corpus is scanned ONCE into per-doc
    flags — the Gopher gate is a codegen'd projection, the survivor
    flag is one text-key-partitioned window (the same shuffle
    exact_dedup pays), and the contamination probe is
    dedup.contamination's broadcast shingle join, whose OUTPUT (the
    dirty-id set, ~0.1-1% of docs for a real eval suite) joins back on
    the id — unhinted, so AQE broadcasts it when it is small and falls
    back to a shuffle join when an adversarial benchmark dirties half
    the corpus. Everything then folds in ONE final aggregate; the
    4-row output is a literal unpivot of that single row. No per-stage
    rescans, no driver-side loops.
    """
    from pyspark.sql import Window as W

    from gocrawl_spark import dedup, textstats

    st = textstats.gopher_stats(text_col)
    flagged = docs.select(
        F.col(id_col).alias("_id"),
        textstats.token_count(text_col).alias("_tok"),
        dedup.text_key(text_col).alias("_tk"),
        textstats.gopher_keep(st).alias("_q"),
    ).withColumn(
        "_surv",
        F.row_number().over(W.partitionBy("_tk").orderBy(F.asc("_id"))) == 1,
    )
    contaminated = (
        dedup.contamination(
            docs,
            benchmark,
            k=k,
            min_hits=1,
            id_col=id_col,
            text_col=text_col,
            bench_id_col=bench_id_col,
            bench_text_col=bench_text_col,
        )
        .select(F.col("doc_id").alias("_id"))
        .distinct()
        .withColumn("_dirty", F.lit(True))
    )
    flagged = flagged.join(contaminated, "_id", "left").withColumn(
        "_dirty", F.coalesce(F.col("_dirty"), F.lit(False))
    )

    def _leg(cond, tag):
        return [
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"_n{tag}"),
            F.sum(F.when(cond, F.col("_tok")).otherwise(0))
            .cast("long")
            .alias(f"_t{tag}"),
        ]

    s2 = F.col("_surv")
    s3 = s2 & F.col("_q")
    s4 = s3 & ~F.col("_dirty")
    one = flagged.agg(
        *_leg(F.lit(True), "1"), *_leg(s2, "2"), *_leg(s3, "3"), *_leg(s4, "4")
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("stage_no"),
                F.lit(name).alias("stage"),
                F.col(f"_n{i}").alias("n_docs"),
                F.col(f"_t{i}").alias("n_tokens"),
            )
            for i, name in [
                (1, "raw"),
                (2, "exact_dedup"),
                (3, "quality_gate"),
                (4, "decontaminated"),
            ]
        ]
    )
    return (
        one.select(F.explode(rows).alias("r"), F.col("_n1"), F.col("_t1"))
        .select(
            F.col("r.stage_no").alias("stage_no"),
            F.col("r.stage").alias("stage"),
            F.col("r.n_docs").alias("n_docs"),
            F.col("r.n_tokens").alias("n_tokens"),
            F.round(F.col("r.n_docs") / F.col("_n1").cast("double"), 6).alias(
                "doc_frac"
            ),
            F.round(F.col("r.n_tokens") / F.col("_t1").cast("double"), 6).alias(
                "token_frac"
            ),
        )
    )


def kmv_jaccard(
    a: DataFrame,
    b: DataFrame,
    col: str,
    k: int = 256,
    exact: bool = False,
) -> DataFrame:
    """Bottom-k (KMV) resemblance sketch between two ID sets — the
    set-cardinality twin of :func:`corpus_overlap` (which sketches
    shingle CONTENT similarity; this sketches membership of an
    explicit key column: URL-seen sets across generations, active
    users across windows, hosts across crawls).

    Broder's estimator: take the k smallest elements of A∪B under a
    uniform hash order (md5 hex — the engine-shared order the whole
    repo uses); the fraction of them belonging to A∩B is an unbiased
    Jaccard estimate with SE ≈ 1/√k. One row out: (k_used, n_both,
    est_jaccard_ppm[, n_a, n_b, n_inter, n_union, exact_jaccard_ppm]).

    Scale shape: each side reduces to ≤k (hash, flags) rows via a
    TakeOrdered-style per-partition bottom-k + driver merge — never a
    global sort — and a sketch is mergeable by construction (bottom-k
    of concatenated sketches). ``exact=True`` adds the true Jaccard
    via a full distinct + outer join: the EVALUATION twin, not the
    100 TB path. ppm values use integer DIV so both engines agree
    bit-for-bit.
    """
    ha = (
        a.select(F.col(col).cast("string").alias("v"))
        .distinct()
        .withColumn("h", F.md5("v"))
        .withColumn("in_a", F.lit(1))
        .withColumn("in_b", F.lit(0))
    )
    hb = (
        b.select(F.col(col).cast("string").alias("v"))
        .distinct()
        .withColumn("h", F.md5("v"))
        .withColumn("in_a", F.lit(0))
        .withColumn("in_b", F.lit(1))
    )
    merged = (
        ha.unionByName(hb)
        .groupBy("v", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    bottomk = merged.orderBy(F.asc("h"), F.asc("v")).limit(k)
    out = bottomk.agg(
        F.count(F.lit(1)).cast("long").alias("k_used"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("n_both"),
    ).select(
        "k_used",
        "n_both",
        F.expr(
            "CASE WHEN k_used > 0 THEN n_both * 1000000 DIV k_used"
            " ELSE 0 END"
        ).cast("long").alias("est_jaccard_ppm"),
    )
    if not exact:
        return out
    ex = merged.agg(
        F.sum("in_a").cast("long").alias("n_a"),
        F.sum("in_b").cast("long").alias("n_b"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("n_inter"),
        F.count(F.lit(1)).cast("long").alias("n_union"),
    ).select(
        "n_a",
        "n_b",
        "n_inter",
        "n_union",
        F.expr(
            "CASE WHEN n_union > 0 THEN n_inter * 1000000 DIV n_union"
            " ELSE 0 END"
        ).cast("long").alias("exact_jaccard_ppm"),
    )
    return out.crossJoin(ex)


def dup_rate_curve(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoints: int = 10,
) -> DataFrame:
    """Duplicate-rate growth curve — the crawl-freshness KPI next to
    :func:`heaps_curve`'s vocabulary view: at ``checkpoints`` evenly
    spaced id thresholds, how much of the corpus ingested SO FAR is an
    exact duplicate of something already held (by content md5). A
    rising curve says the frontier is feeding the crawler pages it
    already has — the document-level "re-reading the web" signal, the
    operational trigger for tightening the seen filter or the DUST
    rules.

    Returns (checkpoint, id_bound, cum_docs, cum_uniques, cum_dups,
    dup_ppm) — integers plus an integer-DIV ppm ratio, engine-stable
    by construction. Same shape as heaps_curve: one MIN(id) per
    distinct content hash (map-side combining groupBy on the md5 —
    content never shuffles), integer-math checkpoint bucketing (no
    non-equi join), and a ``checkpoints``-row cumulative window.
    """
    spark = docs.sparkSession
    cp = int(checkpoints)
    max_id = docs.agg(F.max(F.col(id_col)).alias("mx"))
    grid = (
        spark.range(1, cp + 1)
        .select(F.col("id").cast("int").alias("checkpoint"))
        .crossJoin(F.broadcast(max_id))
        .select(
            "checkpoint",
            F.expr(f"checkpoint * mx DIV {cp}").alias("id_bound"),
        )
    )

    def bucket(id_expr: str) -> Column:
        return F.greatest(
            F.lit(1), F.expr(f"({id_expr} * {cp} + mx - 1) DIV mx")
        ).alias("checkpoint")

    hashes = docs.select(
        F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("h")
    )
    first = hashes.groupBy("h").agg(F.min("id").alias("first_id"))
    uniques_per = (
        first.crossJoin(F.broadcast(max_id))
        .groupBy(bucket("first_id"))
        .agg(F.count("*").alias("new_uniques"))
    )
    docs_per = (
        hashes.crossJoin(F.broadcast(max_id))
        .groupBy(bucket("id"))
        .agg(F.count("*").alias("new_docs"))
    )
    w = Window.orderBy("checkpoint").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = (
        grid.join(uniques_per, "checkpoint", "left")
        .join(docs_per, "checkpoint", "left")
        .select(
            "checkpoint",
            "id_bound",
            F.sum(F.coalesce("new_docs", F.lit(0))).over(w)
            .cast("long").alias("cum_docs"),
            F.sum(F.coalesce("new_uniques", F.lit(0))).over(w)
            .cast("long").alias("cum_uniques"),
        )
    )
    return cum.select(
        "checkpoint",
        "id_bound",
        "cum_docs",
        "cum_uniques",
        (F.col("cum_docs") - F.col("cum_uniques")).alias("cum_dups"),
        F.expr(
            "CASE WHEN cum_docs > 0 THEN"
            " (cum_docs - cum_uniques) * 1000000 DIV cum_docs"
            " ELSE 0 END"
        ).cast("long").alias("dup_ppm"),
    ).orderBy("checkpoint")

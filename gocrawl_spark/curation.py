"""End-to-end training-data curation over a document corpus.

The single pipeline a pretraining-data run applies per shard, composed
from this package's primitives, all JVM-side built-ins until the final
projection (one scan, one shuffle for the dedup group):

    language-ID filter  →  quality gate  →  exact-dedup survivors

Scale shape: langid/quality are pure codegen'd expressions evaluated in
the scan (no shuffle, predicate applied before the dedup exchange);
the only shuffle keys on the content hash (high cardinality, balanced);
map-side partial aggregation reduces each duplicate class early. At
100 TB this is exactly the plan you want: filters first so the shuffle
carries only the kept fraction.

Near-dup variants (MinHash/SimHash/embedding blocking) chain after the
exact pass — see dedup.py / similarity.py; exact-first is the standard
ordering since it removes the cheap mass before banded candidate
generation pays per-pair cost.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gocrawl_spark import textstats


def curate(
    docs: DataFrame,
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    near_dup: dict | None = None,
) -> DataFrame:
    """Kept documents with their curation features:
    (doc_id, pred_lang, quality, n_tokens). A document survives when
    its predicted language is in `langs`, its quality score ≥
    `min_quality`, and it is the canonical (lowest-id) member of its
    exact-duplicate class.

    ``near_dup`` chains the full near-dup end-game after the exact
    pass: MinHash-LSH pairs among the survivors (kwargs forwarded to
    dedup.minhash_pairs, e.g. {"num_hashes": 16, "k": 5, "bands": 4,
    "threshold": 0.5}) → connected components → drop every
    non-canonical cluster member. Running it post-filter/post-exact is
    the standard ordering: the banded self-join only pays for the kept
    fraction."""
    feat = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_text"),
        textstats.predict_lang(text_col).alias("pred_lang"),
        F.round(textstats.quality_score(text_col), 6).alias("quality"),
        textstats.token_count(text_col).alias("n_tokens"),
    )
    kept = feat.filter(
        F.col("pred_lang").isin(list(langs)) & (F.col("quality") >= min_quality)
    )
    # exact dedup among the kept: canonical = min doc_id per normalized
    # content hash (same key as dedup.exact_dedup)
    key = F.md5(F.trim(F.regexp_replace(F.lower(F.col("_text")), r"\s+", " ")))
    w = Window.partitionBy(key).orderBy("doc_id")
    out = (
        kept.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if near_dup:
        from gocrawl_spark import dedup

        pairs = dedup.minhash_pairs(out, text_col="_text", **near_dup)
        losers = dedup.dup_clusters(pairs).filter(~F.col("is_canonical")).select(
            "doc_id"
        )
        out = out.join(losers, "doc_id", "left_anti")
    return out.select("doc_id", "pred_lang", "quality", "n_tokens")


def sample_stratified(
    docs: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    default: float = 1.0,
    id_col: str = "doc_id",
    seed: str = "gocrawl",
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample — the mix-rebalancing
    op of a pretraining pipeline (downsample the dominant language /
    source, keep all of the scarce ones).

    Keep a row iff u(id) < fraction(stratum), where u is a uniform
    [0,1) value carved from md5(id ":" seed) — no RNG state, so the
    sample is identical at any parallelism, on re-runs, and across
    engines (exactly reproducible training mixes; DuckDB mirrors the
    same expression). Unlike ``df.sample``, membership is a pure
    function of the ROW, not of partition layout. Everything is
    codegen'd expressions evaluated in the scan: the filter pushes
    down, no shuffle, no UDF. Nested strata = call again with another
    column; changing ``seed`` draws an independent sample."""
    u = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(seed))), 1, 8
        ),
        16,
        10,
    ).cast("long").cast("double") / F.lit(4294967296.0)
    frac = F.lit(float(default))
    for k, v in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == k, F.lit(float(v))).otherwise(frac)
    return docs.filter(u < frac)


def diff_corpus(
    a: DataFrame,
    b: DataFrame,
    key: str = "doc_id",
    content: str = "text",
) -> DataFrame:
    """Snapshot diff — the incremental-ingest primitive of a recurring
    pipeline: (key, change) with change ∈ added | removed | changed |
    unchanged, comparing snapshot ``a`` (old) to ``b`` (new) by content
    hash.

    Scale shape: each side is projected to (key, md5(content)) IN THE
    SCAN — the content bytes never reach the exchange; the only
    shuffle is the full-outer equi-join on the key (high cardinality,
    balanced), so the plan moves O(rows × 48 bytes) regardless of
    document size. At 100 TB with both snapshots bucketed on the key
    (storage.write_bucketed) even that exchange disappears."""
    ha = a.select(F.col(key), F.md5(F.col(content)).alias("_ha"))
    hb = b.select(F.col(key), F.md5(F.col(content)).alias("_hb"))
    change = (
        F.when(F.col("_ha").isNull(), "added")
        .when(F.col("_hb").isNull(), "removed")
        .when(F.col("_ha") != F.col("_hb"), "changed")
        .otherwise("unchanged")
    )
    return ha.join(hb, key, "full_outer").select(F.col(key), change.alias("change"))


def shuffle_key(id_col: str = "doc_id", seed: str = "gocrawl") -> "F.Column":
    """Deterministic global-shuffle sort key: md5(id ':' seed). A pure
    function of the row, so the training-order permutation is identical
    at any parallelism, on re-runs, and across engines; a new `seed`
    draws an independent permutation."""
    return F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(seed)))


def shard_col(key, n_shards: int) -> "F.Column":
    """Shard assignment from a shuffle key: first 8 hex chars → uint32
    mod n_shards. THE cross-engine shard contract — the DuckDB oracles
    mirror this expression byte-for-byte, so every caller
    (shuffle_shards, write_training_shards, pack_sequences) must share
    this one definition."""
    return F.pmod(
        F.conv(F.substring(key, 1, 8), 16, 10).cast("long"), n_shards
    ).cast("int")


def shuffle_shards(
    docs: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: str = "gocrawl",
) -> DataFrame:
    """Deterministic global shuffle into `n_shards` training shards —
    the delivery op of a pretraining pipeline (break source/time
    locality before the loader streams shards sequentially).

    shard = first-8-hex of the key mod n_shards; pos = rank within the
    shard by (key, id). Both are pure row functions + one per-shard
    sort, so the full (shard, pos) permutation is reproducible
    anywhere. Returns the input columns + (shard, pos).

    Scale shape: one hash-partitioned exchange on shard, then a
    per-shard sort (the window never sees more than one shard). Size
    n_shards ≥ a few × executor count so shards stay task-sized at
    10^10 docs; for delivery-to-disk prefer `write_training_shards`,
    which skips the rank entirely (files arrive key-sorted)."""
    key = shuffle_key(id_col, seed)
    shard = shard_col(key, n_shards)
    w = Window.partitionBy("shard").orderBy("_key", id_col)
    return (
        docs.withColumn("_key", key)
        .withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("_key")
    )


def curriculum_order(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stages: int = 10,
    seed: str = "gocrawl",
) -> DataFrame:
    """Quality-curriculum ordering for the training feed: documents
    are bucketed into ``stages`` exact quality quantiles and the
    loader streams stage 0 (highest quality) first, shuffled WITHIN
    each stage — curriculum learning's easy-first schedule with
    shuffle_shards' deterministic intra-stage permutation. Returns
    (doc_id, quality, stage, sort_key); consumers order by
    (stage, sort_key, doc_id).

    Scale shape: the stage-1 boundary scalars come from ONE exact
    percentile aggregation (stages−1 numbers, broadcast back as a
    1-row cross join); stage assignment is a codegen'd comparison
    count — no window, no global sort, no shuffle beyond the agg.
    The (stage, sort_key) pair DEFINES the global order, so no rank
    column ever materializes."""
    scored = docs.select(
        F.col(id_col).alias("doc_id"),
        F.round(textstats.quality_score(text_col), 6).alias("quality"),
    )
    ps = [i / stages for i in range(1, stages)]
    bounds = scored.agg(
        *[
            F.percentile("quality", F.lit(p)).alias(f"_b{i}")
            for i, p in enumerate(ps)
        ]
    )
    j = scored.crossJoin(F.broadcast(bounds))
    bucket = sum(
        (F.col("quality") >= F.col(f"_b{i}")).cast("int")
        for i in range(len(ps))
    )
    return j.select(
        "doc_id",
        "quality",
        (F.lit(stages - 1) - bucket).cast("int").alias("stage"),
        shuffle_key("doc_id", seed).alias("sort_key"),
    )


def write_training_shards(
    docs: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    seed: str = "gocrawl",
) -> None:
    """Write the `shuffle_shards` permutation as parquet partitioned by
    shard, rows key-sorted inside each file — the loader streams
    shard=K dirs in file order and sees the deterministic permutation
    without any rank column. One exchange (repartition by shard) + an
    in-task sort; no window, no driver hop."""
    key = shuffle_key(id_col, seed)
    shard = shard_col(key, n_shards)
    (
        docs.withColumn("_key", key)
        .withColumn("shard", shard)
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "_key", id_col)
        .drop("_key")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )


def pack_sequences(
    docs: DataFrame,
    budget: int,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "gocrawl",
) -> DataFrame:
    """GPT-style sequence packing plan: documents are concatenated in
    deterministic shuffle order within each shard and the token stream
    is cut into fixed-`budget` sequences — documents straddle cuts, as
    in standard pretraining packing. Emits per document:

      (doc_id, shard, n_tokens, seq, offset)

    where `seq` = sequence index (within the shard) where the document
    STARTS and `offset` its token offset inside that sequence:
    seq = floor(start / budget), offset = start % budget, with start =
    the running token count of all earlier documents in the shard's
    shuffle order. Tokens = whitespace tokens (textstats.token_count).

    Scale shape: one exchange on shard + a per-shard ordered window
    cumsum — the same layout as `shuffle_shards`; no global ordering
    bottleneck because packing is per-shard by construction (shards
    are independent training streams)."""
    key = shuffle_key(id_col, seed)
    shard = shard_col(key, n_shards)
    w = (
        Window.partitionBy("shard")
        .orderBy("_key", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long")
    return (
        docs.withColumn("_key", key)
        .withColumn("shard", shard)
        .withColumn("n_tokens", textstats.token_count(text_col).cast("long"))
        .withColumn("_start", start)
        .select(
            F.col(id_col),
            "shard",
            "n_tokens",
            F.floor(F.col("_start") / budget).cast("long").alias("seq"),
            F.pmod(F.col("_start"), F.lit(budget)).cast("long").alias("offset"),
        )
    )


def host_suffixes(host) -> "F.Column":
    """All label suffixes of a hostname: 'a.b.example.com' →
    [a.b.example.com, b.example.com, example.com, com] — the UT1/
    RefinedWeb blocklist match domain ('example.com' blocks every
    subdomain). Pure codegen'd split+slice, no UDF."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.array_join(F.slice(labels, i + 1, n - i), "."),
    )


def blocklist_filter(
    docs: DataFrame,
    blocked: DataFrame | list[str],
    url_col: str = "url",
) -> DataFrame:
    """UT1-style domain blocklist (the RefinedWeb adult/malware cut):
    drop every row whose URL host equals a blocked domain OR is a
    subdomain of one. `blocked` is a list (compiled to one boolean
    scan expression) or a one-column DataFrame for real blocklists
    (UT1 ships millions of domains).

    Scale shape (DataFrame path): suffixes explode over DISTINCT hosts
    only — O(hosts × labels), tiny next to the corpus — meet the
    blocklist in one equi semi-join, and the resulting blocked-host
    table anti-joins the corpus on the host expression (AQE broadcasts
    it; hosts ≪ rows). The corpus itself never explodes."""
    from gocrawl_spark.udfs import host_col

    host = host_col(url_col)
    if isinstance(blocked, list):
        pred = F.lit(False)
        for d in sorted(set(b.lower() for b in blocked)):
            pred = pred | (host == d) | host.endswith("." + d)
        return docs.filter(~pred)
    bl = blocked.select(F.lower(F.col(blocked.columns[0])).alias("_hsuf"))
    bad_hosts = (
        docs.select(host.alias("_host"))
        .distinct()
        .select("_host", F.explode(host_suffixes(F.col("_host"))).alias("_hsuf"))
        .join(bl, "_hsuf", "left_semi")
        .select("_host")
        .distinct()
    )
    return docs.join(bad_hosts, host == F.col("_host"), "left_anti")


# ---------------------------------------------------------------------------
# DSIR: data selection with importance resampling (hashed n-gram features)
# ---------------------------------------------------------------------------


def hashed_ngram_buckets(text_col, buckets: int = 1024) -> "F.Column":
    """Hashed unigram+bigram feature stream (DSIR's feature space,
    Xie et al. 2023, arXiv:2302.03169): every word and every adjacent
    word pair of norm_words(text), md5-hashed into ``buckets`` via the
    same first-8-hex-chars→uint32 contract as shard_col, so any engine
    rebuilds identical features. Returns array<int> with one entry per
    feature OCCURRENCE (multiplicity preserved — the bag, not the set).
    """
    w = textstats.norm_words(text_col)
    # bind w once (length-1-array trick, see textstats.shingles) so the
    # regex+split runs once per doc, not once per n-gram
    feats = F.transform(
        F.array(w),
        lambda ww: F.concat(
            ww,
            F.when(
                F.size(ww) >= 2,
                F.zip_with(
                    F.slice(ww, 1, F.size(ww) - 1),
                    F.slice(ww, 2, F.size(ww) - 1),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                ),
            ).otherwise(F.array().cast("array<string>")),
        ),
    ).getItem(0)
    return F.transform(feats, lambda f: shard_col(F.md5(f), buckets))


def dsir_log_ratios(
    corpus: DataFrame,
    target: DataFrame,
    buckets: int = 1024,
    text_col: str = "text",
) -> DataFrame:
    """Per-bucket log importance ratio log p_target(b) − log p_raw(b)
    with add-1 smoothing over the ``buckets``-cell hashed n-gram space.
    Output is exactly ``buckets`` rows — TOTAL over the feature space
    (add-1 smoothing defines the ratio for every cell, including
    buckets seen only in the target or in neither corpus), so the
    exported table scores out-of-corpus text correctly. Broadcastable
    however large the corpus; both count aggregations reduce map-side
    (groupBy on a low-cardinality int). Ratios round to 6 dp so the
    weight sums are engine-stable."""
    raw = (
        corpus.select(F.explode(hashed_ngram_buckets(text_col, buckets)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("rc"))
    )
    tgt = (
        target.select(F.explode(hashed_ngram_buckets(text_col, buckets)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("tc"))
    )
    # totals fold from the ≤buckets-row aggregates — the corpus and the
    # target are each scanned exactly ONCE for the whole ratio table
    rt = raw.agg(F.sum("rc").alias("rt"))
    tt = tgt.agg(F.sum("tc").alias("tt"))
    space = corpus.sparkSession.range(buckets).select(F.col("id").cast("int").alias("bucket"))
    return (
        space.join(raw, "bucket", "left")
        .join(tgt, "bucket", "left")
        .crossJoin(F.broadcast(rt))
        .crossJoin(F.broadcast(tt))
        .select(
            "bucket",
            F.round(
                F.log(F.coalesce(F.col("tc"), F.lit(0)) + F.lit(1))
                - F.log(F.col("tt") + F.lit(buckets))
                - F.log(F.coalesce(F.col("rc"), F.lit(0)) + F.lit(1))
                + F.log(F.col("rt") + F.lit(buckets)),
                6,
            ).alias("log_ratio"),
        )
    )


def dsir_weights(
    corpus: DataFrame,
    target: DataFrame,
    buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, weight): DSIR importance weight per document — the sum
    of its features' log ratios (≡ Σ_b count_x(b)·log_ratio(b)). The
    ratio table broadcasts onto the exploded feature stream, so the
    only wide shuffle keys on doc_id with map-side partial sums.
    Weights round to 4 dp (each addend has 1e-6 granularity)."""
    ratios = dsir_log_ratios(corpus, target, buckets, text_col)
    return (
        corpus.select(
            F.col(id_col), F.explode(hashed_ngram_buckets(text_col, buckets)).alias("bucket")
        )
        .join(F.broadcast(ratios), "bucket")
        .groupBy(id_col)
        .agg(F.round(F.sum("log_ratio"), 4).alias("weight"))
    )


def dsir_select(
    corpus: DataFrame,
    target: DataFrame,
    n: int,
    buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``n`` most target-like documents by DSIR importance weight
    (weight DESC, id ASC — deterministic at any parallelism). This is
    the heavy-tail-safe deterministic variant of the paper's Gumbel
    resampling: rank by the weight itself. Returns
    (doc_id, weight, rank)."""
    w = dsir_weights(corpus, target, buckets, id_col, text_col)
    # distributed top-k (TakeOrderedAndProject — per-partition heads,
    # driver merge of n rows), NOT a global single-partition window
    top = w.orderBy(F.desc("weight"), F.asc(id_col)).limit(n)
    wnd = Window.orderBy(F.desc("weight"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(wnd)).select(
        id_col, "weight", "rank"
    )


def dsir_sample(
    corpus: DataFrame,
    target: DataFrame,
    n: int,
    temperature: float = 1.0,
    buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "dsir",
) -> DataFrame:
    """DSIR's actual resampling form: Gumbel-top-k without replacement,
    P(pick) ∝ exp(weight / temperature). The Gumbel noise is a pure
    function of (doc_id, seed) — uniform u from the md5 first-8-hex
    contract, g = −ln(−ln u) — so the sample is identical at any
    parallelism and in any engine; a new ``seed`` draws an independent
    sample. temperature → 0 degenerates to dsir_select's argmax-k.
    Returns (doc_id, weight, key, rank)."""
    w = dsir_weights(corpus, target, buckets, id_col, text_col)
    u = (
        F.conv(F.substring(shuffle_key(id_col, seed), 1, 8), 16, 10).cast("double")
        + F.lit(1.0)
    ) / F.lit(4294967297.0)
    key = F.round(F.col("weight") / F.lit(temperature) - F.log(-F.log(u)), 6)
    keyed = w.withColumn("key", key)
    top = keyed.orderBy(F.desc("key"), F.asc(id_col)).limit(n)
    wnd = Window.orderBy(F.desc("key"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(wnd)).select(
        id_col, "weight", "key", "rank"
    )


def host_stats(
    docs: DataFrame,
    host_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    min_quality: float = 0.5,
    max_dup_rate: float = 0.5,
) -> DataFrame:
    """Per-host reputation rollup (the RefinedWeb/C4 site-level gate:
    hosts full of duplicated or low-quality pages get cut wholesale,
    before any per-document work). One row per host:

      (host, n_docs, n_tokens, n_langs, dup_rate, mean_quality, keep)

    dup_rate = 1 − distinct(md5(text))/n_docs within the host (share
    of pages that are byte-copies of another page on the same host —
    mirror trees, session-id aliases, soft-404 templates); keep =
    mean_quality ≥ `min_quality` AND dup_rate ≤ `max_dup_rate`.
    dup_rate rounds to 6 dp (pure integer ratio); mean_quality to 4 dp
    (an avg of 6-dp addends — same engine-stability contract as
    dsir_weights' round(sum, 4)).

    Scale shape (10^10 docs): ONE corpus scan; quality/token counts
    are codegen'd projections, the rollup is one groupBy on the host
    with map-side partial aggregation (output ≈ #hosts rows). The
    exact text-hash distinct uses Spark's two-phase distinct-agg
    expansion — keyed by (host, md5), so one giant mirror host spreads
    across the cluster rather than hot-spotting a single reducer. The
    result is small enough to broadcast back onto the corpus as the
    keep-filter join.
    """
    q6 = F.round(textstats.quality_score(text_col), 6)
    per_doc = docs.select(
        F.col(host_col).alias("host"),
        F.col(id_col).alias("_id"),
        F.col(lang_col).alias("_lang"),
        textstats.token_count(text_col).alias("_tok"),
        F.md5(F.col(text_col)).alias("_th"),
        q6.alias("_q"),
    )
    agg = per_doc.groupBy("host").agg(
        F.count("*").alias("n_docs"),
        F.sum("_tok").alias("n_tokens"),
        F.count_distinct("_lang").alias("n_langs"),
        F.count_distinct("_th").alias("_n_uniq"),
        F.round(F.avg("_q"), 4).alias("mean_quality"),
    )
    dup_rate = F.round(
        F.lit(1.0) - F.col("_n_uniq").cast("double") / F.col("n_docs"), 6
    )
    return agg.select(
        "host",
        "n_docs",
        "n_tokens",
        "n_langs",
        dup_rate.alias("dup_rate"),
        "mean_quality",
        (
            (F.col("mean_quality") >= F.lit(float(min_quality)))
            & (dup_rate <= F.lit(float(max_dup_rate)))
        ).alias("keep"),
    )


def hash_weights(
    spark, buckets: int = 1024, seed: str = "quality-clf"
) -> DataFrame:
    """Deterministic stand-in weight vector for `clf_score`: one row
    per hashed-feature bucket, weight = md5(seed ':' bucket) first 8
    hex chars → uint32 → uniform [−1, 1), rounded to 6 dp — the same
    md5-randomness contract as ann_lsh's Rademacher planes and
    dsir_sample's Gumbel noise, rebuildable bit-for-bit by any engine.
    In production you'd load REAL trained weights (fasttext / logreg
    export) into this same (bucket, weight) shape; every downstream
    plan is identical.
    """
    key = F.md5(F.concat_ws(":", F.lit(seed), F.col("id").cast("string")))
    u = F.conv(F.substring(key, 1, 8), 16, 10).cast("double") / F.lit(4294967296.0)
    return spark.range(buckets).select(
        F.col("id").cast("int").alias("bucket"),
        F.round(u * 2.0 - 1.0, 6).alias("weight"),
    )


def clf_score(
    corpus: DataFrame,
    weights: DataFrame,
    buckets: int = 1024,
    bias: float = 0.0,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Linear-classifier inference over the hashed unigram+bigram bag
    (fasttext-architecture quality/topic filtering, Joulin et al. 2016
    — the model CCNet/LLaMA-style pipelines use for "looks like a
    reference page" scoring): score = σ(bias + mean weight of the
    document's feature occurrences), keep = score ≥ `threshold`.
    `weights` is a (bucket, weight) table — trained weights in
    production, `hash_weights` in tests. Returns
    (doc_id, n_feats, score, keep); a featureless document scores
    σ(bias). The weight sum rounds to 6 dp before the sigmoid — the
    SAME granularity as the 6-dp weights, so float addition-order
    noise (~1e-13) can never straddle a rounding boundary — and the
    score to 6 dp.

    Scale shape (100 TB): the weight table is ≤ `buckets` rows —
    broadcast however large the corpus — so inference is feature
    explode → broadcast equi-join → ONE doc_id shuffle with map-side
    partial sums. No UDF, no driver hop; the sigmoid is a codegen'd
    scalar on the aggregated row, ~#docs rows.
    """
    feats = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.explode(hashed_ngram_buckets(text_col, buckets)).alias("bucket"),
    )
    agg = (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_feats"),
            F.round(F.sum("weight"), 6).alias("_s"),
        )
    )
    base = corpus.select(F.col(id_col).alias("doc_id"))
    x = F.lit(float(bias)) + F.coalesce(F.col("_s"), F.lit(0.0)) / F.greatest(
        F.coalesce(F.col("n_feats"), F.lit(0)).cast("double"), F.lit(1.0)
    )
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-x)), 6)
    return base.join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_feats", F.lit(0)).cast("int").alias("n_feats"),
        score.alias("score"),
        (score >= F.lit(float(threshold))).alias("keep"),
    )


def clf_train(
    docs: DataFrame,
    labels: DataFrame,
    buckets: int = 1024,
    sweeps: int = 3,
    lr: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "label",
) -> DataFrame:
    """Distributed logistic-regression training for the `clf_score`
    quality filter — full-batch gradient descent over the hashed
    unigram+bigram mean-pooled bag (the fasttext architecture,
    Joulin et al. 2016), the step FineWeb-Edu-style pipelines run to
    turn weak labels (a rule gate, an LLM judge) into a cheap
    corpus-scale scorer. Produces a (bucket, weight) table that plugs
    straight into `clf_score`; `hash_weights` is the untrained
    stand-in this replaces.

    Model matches clf_score's inference exactly: score_d =
    σ(mean weight of the doc's feature occurrences); per sweep the
    full-batch gradient of log-loss is

        grad_b = Σ_d (σ_d − y_d) / n_d   over occurrences of b in d
        w_b   ← w_b − lr · grad_b

    **Determinism contract (integer micro-units):** weights live as
    exact 1e-6 integers; the per-doc weight sum is a LONG sum (exact,
    order-free), σ_d is one rounded float op from exact integers, the
    per-occurrence gradient contribution rounds to an integer
    micro-unit BEFORE the exact long fold, and the update rounds
    lr·grad once. No floating accumulation anywhere — bit-equal at
    any parallelism and corpus size, and the DuckDB oracle replays
    the sweeps in the same integer arithmetic. Docs with no features
    contribute nothing (their σ is constant and their gradient has no
    bucket to land on). NULL labels are excluded (clf_roc's rule).

    Scale shape (10^10 docs): per sweep, ONE doc_id-keyed fold for
    scores (features explode in the scan, weights are a ≤`buckets`-row
    broadcast) and ONE bucket-keyed fold for the gradient (map-side
    combined, output ≤`buckets` rows collected to the driver — the
    k-means-centroid O(k·dim) pattern). `sweeps` is a small constant
    (full-batch GD converges fast on a 1024-dim mean-pooled model),
    so the driver loop is bounded like the Lloyd sweeps, not like a
    per-merge BPE loop.
    """
    spark = docs.sparkSession
    feats = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(hashed_ngram_buckets(text_col, buckets)).alias("bucket"),
    ).persist()
    lab = labels.select(
        F.col(id_col).alias("_id"),
        F.col(label_col).cast("boolean").alias("_y"),
    ).filter(F.col("_y").isNotNull())
    # integer micro-unit weight state, driver-side (≤ buckets entries)
    w_int: dict[int, int] = {}
    try:
        for _ in range(int(sweeps)):
            if w_int:
                wdf = spark.createDataFrame(
                    [(b, w) for b, w in sorted(w_int.items())],
                    "bucket int, w_int long",
                )
            else:
                wdf = spark.range(0).select(
                    F.col("id").cast("int").alias("bucket"),
                    F.col("id").alias("w_int"),
                )
            per_doc = (
                feats.join(F.broadcast(wdf), "bucket", "left")
                .groupBy("_id")
                .agg(
                    F.count("*").alias("_n"),
                    F.sum(F.coalesce("w_int", F.lit(0))).alias("_s_int"),
                )
            )
            sig = F.round(
                F.lit(1.0)
                / (
                    F.lit(1.0)
                    + F.exp(
                        -(
                            F.col("_s_int").cast("double")
                            / F.lit(1e6)
                            / F.col("_n").cast("double")
                        )
                    )
                ),
                6,
            )
            resid = per_doc.join(lab, "_id").select(
                "_id",
                "_n",
                # residual (σ − y) in exact micro-units: σ is 6 dp so
                # σ·1e6 is integral up to float representation — round
                # snaps it back to the exact integer
                F.round(
                    (sig - F.when(F.col("_y"), 1.0).otherwise(0.0)) * 1e6
                )
                .cast("long")
                .alias("_r_int"),
            )
            grad = (
                feats.join(resid, "_id")
                .select(
                    "bucket",
                    # per-occurrence contribution r/n, rounded to an
                    # integer micro-unit BEFORE the exact long fold
                    F.round(
                        F.col("_r_int").cast("double") / F.col("_n")
                    )
                    .cast("long")
                    .alias("_g"),
                )
                .groupBy("bucket")
                .agg(F.sum("_g").alias("_g_int"))
                .collect()
            )
            for row in grad:
                b = int(row["bucket"])
                delta = lr * row["_g_int"]
                # round half AWAY FROM ZERO — the SQL round() rule the
                # engine-side folds use; Python's round() is banker's
                # and would disagree on odd gradients at lr=0.5
                d_int = int(math.floor(abs(delta) + 0.5))
                w_int[b] = w_int.get(b, 0) - (d_int if delta >= 0 else -d_int)
    finally:
        feats.unpersist()
    rows = [(b, w / 1e6) for b, w in sorted(w_int.items())]
    if not rows:
        return spark.createDataFrame([], "bucket int, weight double")
    return spark.createDataFrame(rows, "bucket int, weight double")


def clf_roc(
    scores: DataFrame,
    labels: DataFrame,
    thresholds: tuple[float, ...] = (0.3, 0.4, 0.5, 0.6, 0.7),
    score_col: str = "score",
    label_col: str = "label",
    id_col: str = "doc_id",
) -> DataFrame:
    """Classifier-vs-labels evaluation report: exact ROC AUC plus a
    per-threshold confusion/PRF table — the calibration step a
    quality-filter pipeline runs before trusting `clf_score` to gate a
    corpus (e.g. scoring the fasttext-architecture classifier against
    the Gopher rule gate as weak labels, the cross-check both
    FineWeb-style and LLaMA-style pipelines report).

    AUC is the exact Mann-Whitney statistic with the standard 0.5 tie
    credit, computed from the SCORE FREQUENCY TABLE, never from doc
    pairs: group scores into (score, n_pos, n_neg) rows, order by
    score ASC, and fold

        AUC = Σ_s n_pos(s) · (cum_neg_below(s) + 0.5 · n_neg(s))
              / (P · N)

    Scores are already 6-dp-rounded by `clf_score`, so equal floats
    compare exactly; the numerator accumulates in exact integer
    half-units (decimal), so the statistic is bit-stable at any
    parallelism and corpus size. Rows whose label is NULL are
    EXCLUDED (unlabeled ≠ negative). Returns one row per threshold:
    (threshold, tp, fp, fn, tn, precision, recall, f1, auc) — ratios
    6 dp, 0.0 when the denominator is 0, `auc` constant across rows.
    Degenerate labels (P = 0 or N = 0) yield auc = 0.0.

    Scale shape (10^10 docs): one `id`-keyed join scores⋈labels, one
    map-side-combining groupBy to the ≈#distinct-scores frequency
    table (6-dp sigmoid scores → ≤10^6 distinct cells regardless of
    corpus size), then ONE single-partition window over that small
    table (the `key_skew_audit` contract) and a ≤|thresholds|-row
    broadcast cross join for the confusion sums — AUC folds inside
    the SAME per-threshold aggregate (its numerator is threshold-
    independent), so the frequency-table pipeline runs once. The
    corpus itself is touched exactly once per input side.
    """
    from pyspark.sql import Window as W

    j = scores.select(
        F.col(id_col).alias("_id"), F.col(score_col).alias("_s")
    ).join(
        labels.select(
            F.col(id_col).alias("_id"), F.col(label_col).cast("boolean").alias("_y")
        ),
        "_id",
    ).filter(F.col("_y").isNotNull())  # unlabeled docs are excluded, not negatives
    freq = j.groupBy("_s").agg(
        F.sum(F.when(F.col("_y"), 1).otherwise(0)).alias("_np"),
        F.sum(F.when(F.col("_y"), 0).otherwise(1)).alias("_nn"),
    )
    w = W.orderBy(F.asc("_s"))
    ranked = freq.select(
        "_s",
        "_np",
        "_nn",
        F.coalesce(
            F.sum("_nn").over(w.rowsBetween(W.unboundedPreceding, -1)), F.lit(0)
        ).alias("_cnb"),
    )
    thr = ranked.sparkSession.createDataFrame(
        [(float(t),) for t in thresholds], "threshold double"
    )
    # the Mann-Whitney numerator is threshold-independent, so folding
    # it INSIDE the per-threshold aggregate (every group sees every
    # score row once and computes the same value) costs nothing and
    # avoids a second pass over the frequency-table pipeline — without
    # this, a separate totals aggregate recomputes the whole
    # scores⋈labels subtree
    conf = (
        ranked.crossJoin(F.broadcast(thr))
        .groupBy("threshold")
        .agg(
            F.sum(F.when(F.col("_s") >= F.col("threshold"), F.col("_np")).otherwise(0))
            .cast("long")
            .alias("tp"),
            F.sum(F.when(F.col("_s") >= F.col("threshold"), F.col("_nn")).otherwise(0))
            .cast("long")
            .alias("fp"),
            F.sum(F.when(F.col("_s") < F.col("threshold"), F.col("_np")).otherwise(0))
            .cast("long")
            .alias("fn"),
            F.sum(F.when(F.col("_s") < F.col("threshold"), F.col("_nn")).otherwise(0))
            .cast("long")
            .alias("tn"),
            # Mann-Whitney numerator in EXACT half-units: each term
            # n_pos·(cum_neg + 0.5·n_neg) is a half-integer, so 2·term
            # is an integer — summed as decimal(38,0) it is exact and
            # order-free at any corpus size, where a double running sum
            # would lose bits past 2^52 and make the 6-dp round
            # parallelism-dependent
            F.sum(
                (
                    F.col("_np").cast("decimal(38,0)")
                    * (F.lit(2) * F.col("_cnb") + F.col("_nn")).cast(
                        "decimal(38,0)"
                    )
                )
            ).alias("_u2"),
        )
    )
    _P = F.col("tp") + F.col("fn")
    _N = F.col("fp") + F.col("tn")
    auc = F.when(
        (_P > 0) & (_N > 0),
        F.round(
            F.col("_u2").cast("double")
            / F.lit(2.0)
            / (_P.cast("double") * _N.cast("double")),
            6,
        ),
    ).otherwise(F.lit(0.0))
    z = F.lit(0.0)
    prec = F.when(
        F.col("tp") + F.col("fp") > 0,
        F.round(F.col("tp") / (F.col("tp") + F.col("fp")).cast("double"), 6),
    ).otherwise(z)
    rec = F.when(
        F.col("tp") + F.col("fn") > 0,
        F.round(F.col("tp") / (F.col("tp") + F.col("fn")).cast("double"), 6),
    ).otherwise(z)
    f1 = F.when(
        (F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn")) > 0,
        F.round(
            F.lit(2.0)
            * F.col("tp")
            / (F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn")).cast("double"),
            6,
        ),
    ).otherwise(z)
    return conf.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        "tn",
        prec.alias("precision"),
        rec.alias("recall"),
        f1.alias("f1"),
        auc.alias("auc"),
    )


def host_cap(
    docs: DataFrame,
    cap: int = 1000,
    host_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-host document cap with quality-ranked retention — the
    domain-diversity step web-corpus pipelines apply so one mega-host
    (a wiki mirror, a forum archive) cannot dominate the training
    mix: keep at most `cap` documents per host, electing the
    HIGHEST-QUALITY ones rather than an arbitrary subset. FineWeb's
    URL-dedup + per-domain limiting and MassiveText's per-domain
    subsampling are this operation; the host-reputation rollup
    (`host_quality_stats`) gates whole hosts, this bounds the
    survivors of hosts that pass.

    Ranking: (quality_score DESC, id ASC) — the same 6-dp
    `textstats.quality_score` the curation gates use, id tiebreak so
    the cut is deterministic at any parallelism. Returns the
    surviving rows as (doc_id, host, quality, host_rank), host_rank
    1-based in election order.

    Scale shape (10^10 docs): quality is a codegen'd projection in
    the scan; the election is ONE host-partitioned row_number window
    (sort-based, O(1) state per row) and the filter drops everything
    past the cap before any further stage sees it. A pathological
    mega-host makes one big sort partition — the standard AQE
    skew-split handles it, and no state accumulates per key (this is
    exactly the anchor_index pre-cut shape).
    """
    from pyspark.sql import Window as W

    from gocrawl_spark import textstats

    q6 = F.round(textstats.quality_score(text_col), 6)
    w = W.partitionBy("host").orderBy(F.desc("quality"), F.asc("doc_id"))
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(host_col).alias("host"),
            q6.alias("quality"),
        )
        .withColumn("host_rank", F.row_number().over(w))
        .filter(F.col("host_rank") <= cap)
    )


def split_corpus(
    docs: DataFrame,
    fracs: dict[str, float] | None = None,
    id_col: str = "doc_id",
    seed: str = "split",
) -> DataFrame:
    """Deterministic, exclusive train/val/test assignment: the id's
    md5-uniform u ∈ [0,1) (the sample_stratified randomness contract)
    lands in cumulative bands in the given dict order; the last band
    absorbs any rounding slack (fracs should sum to 1). A new `seed`
    draws an independent split; membership is a pure row function, so
    any engine, any parallelism, and any later re-run agree — and a
    document added tomorrow cannot move today's docs between splits
    (the property hash-splits have over global-count splits). Returns
    the input columns + `split`.

    Scale shape: one codegen'd projection in the scan — no shuffle,
    no state. Pair with dedup.contamination to scrub val/test n-grams
    back out of train.
    """
    fracs = fracs or {"train": 0.98, "val": 0.01, "test": 0.01}
    names = list(fracs)
    u = F.conv(
        F.substring(shuffle_key(id_col, seed), 1, 8), 16, 10
    ).cast("double") / F.lit(4294967296.0)
    col = None
    cum = 0.0
    for name in names[:-1]:
        cum += float(fracs[name])
        cond = u < F.lit(cum)
        col = F.when(cond, F.lit(name)) if col is None else col.when(cond, F.lit(name))
    col = F.lit(names[-1]) if col is None else col.otherwise(F.lit(names[-1]))
    return docs.withColumn("split", col)


def split_decontaminated(
    docs: DataFrame,
    fracs: dict[str, float] | None = None,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "split",
) -> DataFrame:
    """Hash split + eval scrub-back in one pass (GPT-3-style
    decontamination applied at split time): every train document
    sharing ≥1 verbatim k-gram with ANY val/test document is flagged
    `tainted` — quarantine or drop it before training, so the eval
    splits cannot leak into the training feed even via exact or
    near-boilerplate copies that landed on opposite sides of the hash
    split. Returns (doc_id, split, tainted); tainted is always False
    off-train.

    Scale shape: the split is a scan-side projection
    (:func:`split_corpus`); val/test is a small slice, so its DISTINCT
    shingle index broadcasts and the train side streams through one
    shingle equi-join map-side (dedup.contamination's plan) — the
    corpus never shuffles on content.
    """
    from gocrawl_spark import dedup as _dd

    sp = split_corpus(
        docs.select(F.col(id_col), F.col(text_col)), fracs, id_col, seed
    )
    train = sp.filter(F.col("split") == "train")
    held = sp.filter(F.col("split") != "train").select(
        F.col(id_col).alias("bench_id"), F.col(text_col).alias("bench_text")
    )
    hits = (
        _dd.contamination(train, held, k=k, id_col=id_col, text_col=text_col)
        .select("doc_id")
        .distinct()
        .withColumn("tainted", F.lit(True))
    )
    return (
        sp.select(F.col(id_col).alias("doc_id"), "split")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id", "split",
            F.coalesce("tainted", F.lit(False)).alias("tainted"),
        )
    )


def tokenize_ids(
    docs: DataFrame,
    vocab_size: int = 32768,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, ids): hashed-vocab token ids per document — the GPT-2
    pre-tokenizer piece stream (textstats.BPE_ISH_PATTERN: letter
    runs, digit runs, single punctuation) with
    id = uint32(md5(piece)) % vocab_size. The md5 hash is a
    deterministic stand-in for a learned BPE vocabulary (no trained
    merges ship here): swap it for a broadcast piece→id merge table
    and every downstream plan — packing, sharding, export — is
    unchanged. Pure codegen'd array transform in the scan: no
    shuffle, no UDF.
    """
    pieces = F.regexp_extract_all(
        F.col(text_col), F.lit(f"({textstats.BPE_ISH_PATTERN})"), 1
    )
    ids = F.transform(pieces, lambda p: shard_col(F.md5(p), vocab_size))
    return docs.select(F.col(id_col).alias("doc_id"), ids.alias("ids"))


def write_token_shards(
    docs: DataFrame,
    path: str,
    n_shards: int,
    vocab_size: int = 32768,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "gocrawl",
) -> None:
    """Binary training-feed delivery: each document's hashed-vocab ids
    packed little-endian uint32 into ONE `tokens` blob, written as
    parquet partitioned by training shard with rows key-sorted inside
    each file — the loader streams shard=K in file order, concatenates
    blobs, and sees the same deterministic permutation as
    `write_training_shards` (same key, same shard contract). The
    uint32-LE blob is the memmap-style feed format; parquet carries
    the framing (doc id + n_ids) so no sidecar .idx file is needed.

    Scale shape: tokenization is codegen'd in the scan; the only
    Python is the Arrow-batched int-array→bytes pack (export boundary,
    I/O-bound); one exchange (repartition by shard) + in-task sort,
    exactly the write_training_shards plan.
    """
    import numpy as np

    @F.pandas_udf("binary")
    def _pack(ids: pd.Series) -> pd.Series:
        return pd.Series(
            [np.asarray(v, dtype="<u4").tobytes() for v in ids]
        )

    toks = tokenize_ids(docs, vocab_size, id_col, text_col)
    (
        toks.select(
            "doc_id",
            F.size("ids").alias("n_ids"),
            _pack("ids").alias("tokens"),
        )
        .withColumn("_key", shuffle_key("doc_id", seed))
        .withColumn("shard", shard_col(F.col("_key"), n_shards))
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "_key", "doc_id")
        .drop("_key")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )


def pack_token_sequences(
    docs: DataFrame,
    seqlen: int = 2048,
    n_shards: int = 8,
    vocab_size: int = 32768,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "gocrawl",
    boundaries: bool = False,
) -> DataFrame:
    """Token-level sequence packing — the actual GPT training feed:
    concatenate every document's hashed-vocab ids in the deterministic
    shard order and cut fixed ``seqlen`` windows, documents straddling
    cuts (pack_sequences' doc-level plan, taken down to tokens).
    Returns (shard, seq, ids) with `ids` exactly the seqlen-sized
    window (the final window per shard may be short — mark/drop at
    the feed boundary).

    ``boundaries=True`` adds a ``doc_starts`` column: the sorted
    in-window offsets where a NEW document begins — the attention-
    mask reset positions trainers use to stop cross-document
    attention inside a packed sequence. A window with no document
    start (a long doc spanning it whole) gets an empty array; offset
    0 appears only when a document genuinely starts at the cut.
    Costs nothing extra: a slice already knows whether its absolute
    start equals its document's offset.

    Scale shape: NEVER explodes per token. Each doc computes its
    absolute token offset from ONE per-shard window cumsum (the
    pack_sequences pattern — no global-order reducer), then emits only
    its ≤ n/seqlen+1 (sequence, slice) chunks via a codegen'd
    `sequence()` generator + `slice`; reassembly is one
    (shard, seq)-keyed shuffle whose rows are already full slices.
    Work and shuffle bytes are O(corpus tokens), the minimum for this
    op, and everything is JVM-side.
    """
    toks = tokenize_ids(docs, vocab_size, id_col, text_col)
    key = shuffle_key("doc_id", seed)
    base = (
        toks.withColumn("_key", key)
        .withColumn("shard", shard_col(F.col("_key"), n_shards))
        .withColumn("_n", F.size("ids").cast("long"))
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("_key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = base.withColumn(
        "_off", F.coalesce(F.sum("_n").over(w), F.lit(0))
    ).filter(F.col("_n") > 0)
    L = F.lit(int(seqlen))
    s = F.explode(
        F.sequence(
            F.floor(F.col("_off") / L),
            F.floor((F.col("_off") + F.col("_n") - 1) / L),
        )
    ).alias("seq")
    chunks = off.select("shard", "_off", "_n", "ids", s)
    sa = F.greatest(F.col("_off"), F.col("seq") * L)
    ea = F.least(F.col("_off") + F.col("_n"), (F.col("seq") + 1) * L)
    sliced = chunks.select(
        "shard",
        "seq",
        sa.alias("_sa"),
        F.slice(
            "ids", (sa - F.col("_off") + 1).cast("int"), (ea - sa).cast("int")
        ).alias("_part"),
        (sa == F.col("_off")).alias("_is_start"),
    )
    parts = F.array_sort(
        F.collect_list(F.struct("_sa", "_part", "_is_start"))
    )
    aggs = [F.flatten(F.transform(parts, lambda x: x["_part"])).alias("ids")]
    if boundaries:
        starts = F.filter(parts, lambda x: x["_is_start"])
        aggs.append(
            F.transform(
                starts,
                lambda x: (x["_sa"] - F.col("seq") * L).cast("int"),
            ).alias("doc_starts")
        )
    return sliced.groupBy("shard", "seq").agg(*aggs)


def pack_greedy_bins(
    docs: DataFrame,
    budget: int = 2048,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "gocrawl",
) -> DataFrame:
    """Truncation-free greedy bin packing — the next-fit-decreasing
    member of the best-fit packing family (Ding et al. 2024, "Fewer
    Truncations Improve Language Modeling"): instead of concatenating
    and cutting (pack_token_sequences), documents are placed WHOLE
    into fixed-``budget`` bins so no document is split by a window
    cut. Only documents longer than the budget are pre-chunked into
    ≤ budget pieces. Per shard, units are ordered by
    (tokens DESC, doc_id, chunk) and packed next-fit: one open bin;
    a unit that doesn't fit closes it and opens the next.

    Emits one row per unit: (shard, doc_id, chunk, n_tokens, bin,
    pos) with `pos` the unit's token offset inside its bin.

    Scale shape: chunking and ordering are JVM-side; the sequential
    next-fit scan is inherently order-dependent, so it runs as ONE
    Arrow-batched pass per shard (state = a single open-bin counter)
    — shards are the parallel unit, so capacity scales by raising
    n_shards, exactly like the training feed itself. Deterministic:
    the order key is total, so outputs are bit-equal across
    parallelism.
    """
    B = int(budget)
    n = textstats.token_count(text_col).cast("long")
    base = (
        docs.select(F.col(id_col).alias("doc_id"), n.alias("_n"))
        .filter(F.col("_n") > 0)
        .withColumn(
            "shard", shard_col(shuffle_key("doc_id", seed), n_shards)
        )
    )
    nch = F.ceil(F.col("_n") / B).cast("long")
    units = base.select(
        "shard",
        "doc_id",
        "_n",
        nch.alias("_nch"),
        F.explode(F.sequence(F.lit(0).cast("long"), nch - 1)).alias("chunk"),
    )
    tok = F.when(
        F.col("chunk") < F.col("_nch") - 1, F.lit(B).cast("long")
    ).otherwise(F.col("_n") - (F.col("_nch") - 1) * B)
    units = units.select(
        "shard",
        "doc_id",
        F.col("chunk").cast("int").alias("chunk"),
        tok.alias("n_tokens"),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id", "chunk"],
            ascending=[False, True, True],
            kind="mergesort",
        )
        bins, poss = [], []
        b, fill = 0, 0
        for t in pdf["n_tokens"]:
            if fill and fill + t > B:
                b, fill = b + 1, 0
            bins.append(b)
            poss.append(fill)
            fill += int(t)
        return pdf.assign(
            bin=pd.Series(bins, index=pdf.index, dtype="int64"),
            pos=pd.Series(poss, index=pdf.index, dtype="int64"),
        )

    id_type = units.schema["doc_id"].dataType.simpleString()
    return units.groupBy("shard").applyInPandas(
        _pack,
        f"shard int, doc_id {id_type}, chunk int, n_tokens long, "
        "bin long, pos long",
    )


def chunk_windows(
    docs: DataFrame,
    chunk_tokens: int = 256,
    overlap: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping sliding-window chunks per document — the retrieval
    (RAG) feed twin of :func:`pack_token_sequences` (which packs for
    TRAINING and never crosses a window back). Windows cover pieces
    [i*stride, i*stride + chunk_tokens) with
    stride = chunk_tokens - overlap; a document emits

        1                                   if 0 < n <= chunk_tokens
        1 + ceil((n - chunk_tokens)/stride) otherwise

    windows, so the final short window is emitted only when it adds
    tokens the previous window does not already cover (a fully
    contained tail is suppressed), and an empty document emits no row.
    Chunk text is the window's pieces joined with single spaces — the
    whitespace-normalized form every embedding pipeline feeds anyway;
    byte-offset fidelity stays with the stored document.

    Returns (doc_id, chunk, start_tok, n_tokens, chunk_text), chunk
    numbering 0-based in token order.

    Scale shape: pure codegen'd scan projection — tokenize once,
    explode exactly n_chunks rows per doc (each row one `slice` of the
    already-materialized piece array), no shuffle, no UDF, no window.
    Work is O(corpus tokens × (1 + overlap/stride)), the replication
    inherent to overlapping chunks. Integer math only (`DIV`), so the
    chunk grid is bit-stable across engines and parallelism.
    """
    if not (0 <= overlap < chunk_tokens):
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}"
        )
    stride = chunk_tokens - overlap
    pieces = F.regexp_extract_all(
        F.col(text_col), F.lit(f"({textstats.BPE_ISH_PATTERN})"), 1
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"), pieces.alias("_p")
    ).withColumn("_n", F.size("_p").cast("long"))
    C, S = F.lit(int(chunk_tokens)), F.lit(int(stride))
    nch = (
        F.when(F.col("_n") <= 0, F.lit(0))
        .when(F.col("_n") <= C, F.lit(1))
        .otherwise(F.lit(1) + F.expr(f"(_n - {chunk_tokens} + {stride - 1}) DIV {stride}"))
    )
    rows = base.withColumn("_nch", nch).filter(F.col("_nch") > 0)
    i = F.explode(F.sequence(F.lit(0).cast("long"), F.col("_nch") - 1)).alias("chunk")
    start = F.col("chunk") * S
    ntok = F.least(C.cast("long"), F.col("_n") - start)
    return rows.select("doc_id", "_p", "_n", i).select(
        "doc_id",
        F.col("chunk").cast("int").alias("chunk"),
        start.cast("long").alias("start_tok"),
        ntok.alias("n_tokens"),
        F.array_join(
            F.slice("_p", (start + 1).cast("int"), ntok.cast("int")), " "
        ).alias("chunk_text"),
    )


def temperature_weights(
    docs: DataFrame,
    tau: float = 0.7,
    by: str = "lang",
    budget_tokens: int | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Temperature-based mixture sampling weights — the multilingual
    pretraining rule (XLM-R / mT5: p_i ∝ n_i^τ): strata with more
    tokens get more probability, but τ < 1 flattens the head so
    low-resource strata are up-sampled. Emits per stratum
    (by, n_docs, n_tokens, weight, sample_epochs?):

      weight        = n_i^τ / Σ_j n_j^τ            (rounded 6 dp)
      sample_epochs = weight · budget / n_i        (if budget given)

    epochs > 1 means the stratum repeats under the budget — the
    signal data-mixing reviews look at.

    Scale shape: ONE corpus scan with a map-side-combined groupBy on
    the stratum (≈ #strata rows out); the normalization constant is a
    window over that tiny aggregate, nowhere near data scale."""
    agg = (
        docs.groupBy(F.col(by).alias("stratum"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(textstats.token_count(text_col)).alias("n_tokens"),
        )
    )
    total = Window.partitionBy()
    pw = F.pow(F.col("n_tokens").cast("double"), F.lit(float(tau)))
    out = agg.select(
        "stratum",
        "n_docs",
        "n_tokens",
        F.round(pw / F.sum(pw).over(total), 6).alias("weight"),
    )
    if budget_tokens is not None:
        out = out.withColumn(
            "sample_epochs",
            F.round(
                F.col("weight") * F.lit(float(budget_tokens))
                / F.col("n_tokens"),
                6,
            ),
        )
    return out


def mixture_epochs(
    docs: DataFrame,
    weights: dict[str, int],
    budget: int,
    max_epochs: int = 4,
    source_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Data-constrained mixing recipe (Muennighoff et al. 2023: repeat
    scarce sources up to a cap rather than starving the mix): given
    integer mixing ``weights`` and a total token ``budget``, each
    source gets target = budget·w DIV Σw tokens; a source whose
    available tokens fall short repeats whole epochs —
    epochs = min(max_epochs, ceil(target/available)) — and yields
    min(target, available·epochs) tokens, the rest reported as
    deficit. Returns one row per weighted source: (source,
    avail_tokens, target_tokens, epochs, yield_tokens, deficit).
    All integer arithmetic (exact DIV/ceil), so the plan is
    engine-identical.

    Scale shape: ONE map-side-combined groupBy folds the corpus to
    #sources rows; everything after is constant-time arithmetic on
    that tiny frame. No window, no join, no driver data."""
    total_w = sum(int(w) for w in weights.values())
    if total_w <= 0:
        raise ValueError("weights must sum positive")
    avail = (
        docs.filter(F.col(source_col).isin(list(weights)))
        .groupBy(F.col(source_col).alias("source"))
        .agg(
            F.sum(textstats.token_count(text_col).cast("long")).alias(
                "avail_tokens"
            )
        )
    )
    w_expr = F.lit(0)
    for k, v in sorted(weights.items()):
        w_expr = F.when(F.col("source") == k, F.lit(int(v))).otherwise(w_expr)
    # exact integer DIV/ceil: the doubles below are exact for any
    # budget < 2^53 (one division each, floored immediately)
    target = F.floor(
        (F.lit(int(budget)) * w_expr.cast("long")) / F.lit(total_w)
    ).cast("long")
    epochs = F.least(
        F.lit(int(max_epochs)).cast("long"),
        F.floor(
            (target + F.col("avail_tokens") - 1) / F.col("avail_tokens")
        ).cast("long"),
    )
    yielded = F.least(target, F.col("avail_tokens") * epochs)
    return avail.select(
        "source",
        "avail_tokens",
        target.alias("target_tokens"),
        epochs.cast("int").alias("epochs"),
        yielded.alias("yield_tokens"),
        (target - yielded).alias("deficit"),
    )


def mixture_select(
    docs: DataFrame,
    quotas: dict[str, int],
    id_col: str = "doc_id",
    lang_col: str = "lang",
    text_col: str = "text",
    seed: str = "gocrawl",
) -> DataFrame:
    """Token-budget mixture selection (the "2B tokens per language"
    data-mixing step): within each language, documents are taken in
    the deterministic `shuffle_key` order until the cumulative token
    count reaches that language's quota; the document that straddles
    the boundary is included (keep ⇔ tokens-before-me < quota — the
    pack_sequences cut convention). Languages absent from `quotas`
    are excluded from the output. Returns
    (doc_id, lang, n_tokens, keep) — deterministic at any parallelism,
    on re-runs, and across engines.

    Scale shape (10^10 docs/language): the naive form is a
    per-language GLOBAL ordered cumsum — a one-reducer bottleneck.
    Instead the shuffle key's first 3 hex chars split each language
    into 4096 ordered buckets (key order ≡ bucket order, since the
    bucket is a key prefix): one map-side-combined groupBy gives
    per-(lang, bucket) token sums (≤ langs·4096 counter rows,
    O(counters) driver fold — the frontier pop_split precedent), the
    driver's prefix scan classifies every bucket keep-all / drop-all /
    boundary, and only the ONE boundary bucket per language (~1/4096
    of that language) pays an ordered window. Everything else is a
    broadcast-joined constant-time predicate.
    """
    spark = docs.sparkSession
    qdf = spark.createDataFrame(
        [(l, int(v)) for l, v in sorted(quotas.items())],
        "lang string, _quota long",
    )
    t = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(lang_col).alias("lang"),
        textstats.token_count(text_col).alias("n_tokens"),
        shuffle_key(id_col, seed).alias("_k"),
    ).withColumn("_b", F.conv(F.substring("_k", 1, 3), 16, 10).cast("int"))
    scoped = t.join(F.broadcast(qdf), "lang")
    sums = scoped.groupBy("lang", "_b").agg(F.sum("n_tokens").alias("_s")).collect()
    per_lang: dict[str, dict[int, int]] = {}
    for r in sums:
        per_lang.setdefault(r["lang"], {})[r["_b"]] = r["_s"]
    # prefix-scan: cut = first bucket whose prefix >= quota (drop-all
    # from there); bound = the unique bucket the quota lands inside
    meta_rows = []
    for lang, buckets in sorted(per_lang.items()):
        q = int(quotas[lang])
        cum, cut, bound, prefix = 0, 4096, -1, 0
        for b in sorted(buckets):
            s = buckets[b]
            if cum >= q:
                cut = min(cut, b)
            elif q < cum + s:
                bound, prefix = b, cum
            cum += s
        if cut == 4096 and cum >= q and bound >= 0:
            cut = bound + 1
        meta_rows.append((lang, cut, bound, prefix))
    meta = spark.createDataFrame(
        meta_rows or [("", 4096, -1, 0)],
        "lang string, _cut int, _bound int, _prefix long",
    )
    j = scoped.join(F.broadcast(meta), "lang")
    plain = j.filter(F.col("_b") != F.col("_bound")).withColumn(
        "keep", F.col("_b") < F.col("_cut")
    )
    w = (
        Window.partitionBy("lang", "_b")
        .orderBy("_k", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    boundary = j.filter(F.col("_b") == F.col("_bound")).withColumn(
        "keep",
        (F.col("_prefix") + F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        < F.col("_quota"),
    )
    return plain.unionByName(boundary).select("doc_id", "lang", "n_tokens", "keep")


__all__ = [
    "curate", "sample_stratified", "diff_corpus",
    "shuffle_key", "shard_col", "shuffle_shards", "curriculum_order",
    "mixture_epochs",
    "write_training_shards",
    "pack_sequences",
    "host_suffixes", "blocklist_filter",
    "hashed_ngram_buckets", "dsir_log_ratios", "dsir_weights", "dsir_select",
    "dsir_sample",
    "host_stats", "hash_weights", "clf_score", "clf_train", "clf_roc",
    "host_cap", "mixture_select",
    "tokenize_ids", "write_token_shards", "split_corpus",
    "split_decontaminated", "pack_token_sequences", "pack_greedy_bins",
    "chunk_windows", "temperature_weights", "doremi_weights",
    "length_batches", "report_card", "bitext_filters",
    "judge_agreement", "clf_reliability",
]


def fim_transform(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rate_mod: int = 2,
    spm_mod: int = 4,
) -> DataFrame:
    """Fill-in-the-middle pretraining transform (Bavarian et al. 2022,
    "Efficient Training of Language Models to Fill in the Middle"):
    selected documents split into (prefix, middle, suffix) and reorder
    with sentinel tokens —

    - PSM: ``<fim_prefix>P<fim_suffix>S<fim_middle>M``
    - SPM: ``<fim_prefix><fim_suffix>S<fim_middle>PM`` (the joined
      variant the paper recommends for inference-matching)

    Deterministic stand-in for the paper's random choices (engines and
    re-runs must agree bit-for-bit): a doc is transformed when
    ``id % rate_mod == 0`` (paper: 50% FIM rate at rate_mod=2),
    takes SPM when ``id % spm_mod == 0``, and the two split points are
    ``len/3 + id%5`` and ``2*len/3 + id%3`` (clamped) — id-dependent
    so splits vary across the corpus. Pure codegen'd substring
    arithmetic: one projection, zero shuffle, FIM at 100 TB costs a
    scan."""
    d, t = F.col(id_col), F.col(text_col)
    n = F.length(t).cast("long")
    # integer DIV, not float-divide-then-cast: engines must agree on
    # the split byte exactly (text_col must be a plain column name)
    p1 = F.least(n, F.expr(f"length({text_col}) DIV 3") + d % 5)
    p2 = F.least(n, F.expr(f"(2 * length({text_col})) DIV 3") + d % 3)
    lo = F.least(p1, p2)
    hi = F.greatest(p1, p2)
    prefix = F.substring(t, F.lit(1), lo)
    middle = F.substring(t, lo + 1, hi - lo)
    suffix = F.substring(t, hi + 1, n - hi)
    psm = F.concat(
        F.lit("<fim_prefix>"), prefix, F.lit("<fim_suffix>"), suffix,
        F.lit("<fim_middle>"), middle,
    )
    spm = F.concat(
        F.lit("<fim_prefix><fim_suffix>"), suffix,
        F.lit("<fim_middle>"), prefix, middle,
    )
    mode = (
        F.when(d % rate_mod != 0, F.lit("plain"))
        .when(d % spm_mod == 0, F.lit("spm"))
        .otherwise(F.lit("psm"))
    )
    out = (
        F.when(mode == "plain", t)
        .when(mode == "spm", spm)
        .otherwise(psm)
    )
    return docs.select(
        d.alias("doc_id"), mode.alias("fim_mode"), out.alias("fim_text")
    )


def split_cluster_safe(
    docs: DataFrame,
    pairs: DataFrame,
    fracs: dict[str, float] | None = None,
    id_col: str = "doc_id",
    seed: str = "split",
) -> DataFrame:
    """Leakage-safe train/val/test assignment: a document splits by
    its near-dup CLUSTER representative's hash — the min doc id of its
    connected component over ``pairs`` (docs with no dup evidence
    represent themselves) — so two near-duplicates can NEVER straddle
    splits. This closes the eval-contamination hole a per-doc hash
    split leaves open even after n-gram decontamination: a paraphrase
    of a training doc in the test split shares no exact shingle yet
    leaks the content. Returns the input columns + ``rep`` + ``split``
    (same banding contract as :func:`split_corpus`; a new ``seed``
    draws an independent split, and adding documents tomorrow cannot
    move today's clusters between splits).

    Scale shape: components run over the PAIR evidence only
    (O(dup-pairs), min-label propagation — never the corpus), one
    id-keyed left join attaches reps, and the banding is a codegen'd
    projection; the corpus shuffles once on its id."""
    from gocrawl_spark import dedup

    fracs = fracs or {"train": 0.98, "val": 0.01, "test": 0.01}
    names = list(fracs)
    cc = dedup.connected_components(pairs).select(
        F.col("id").alias(id_col), F.col("cluster_id").alias("_cc")
    )
    out = docs.join(cc, id_col, "left").withColumn(
        "rep", F.coalesce(F.col("_cc"), F.col(id_col))
    ).drop("_cc")
    u = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col("rep").cast("string"), F.lit(seed))),
            1, 8,
        ),
        16, 10,
    ).cast("double") / F.lit(4294967296.0)
    col = None
    cum = 0.0
    for name in names[:-1]:
        cum += float(fracs[name])
        cond = u < F.lit(cum)
        col = F.when(cond, F.lit(name)) if col is None else col.when(cond, F.lit(name))
    col = F.lit(names[-1]) if col is None else col.otherwise(F.lit(names[-1]))
    return out.withColumn("split", col)


def doremi_weights(
    corpus: DataFrame,
    target: DataFrame,
    by: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Domain-reweighting via excess loss — a deterministic one-round
    DoReMi (Xie et al. 2023, "Doremi: Optimizing Data Mixtures Speeds
    Up Language Model Pretraining"): the reference model is the
    Kneser-Ney bigram LM trained on the in-domain ``target`` slice,
    the proxy is the same estimator trained on the whole corpus, and a
    domain's weight is its average CLIPPED excess loss

        excess(d) = max(0, ce_proxy(d) − ce_reference(d))
                  = max(0, −ml_score(d))

    normalized across domains (uniform when every domain's excess is
    0 — nothing is harder under the proxy than the reference, so
    there is no signal to tilt toward). Domains whose documents the
    corpus-wide model finds hard relative to the in-domain model are
    upweighted — the paper's "learnable but not yet learned" signal,
    with the trained-proxy loop replaced by the closed-form LM pair so
    the output is engine-reproducible.

    Returns (grp, n_docs, avg_excess, weight), floats at 6 dp.

    Scale shape: exactly the two :func:`textstats.lm_moore_lewis` LM
    pipelines (vocab-sized joins, one #docs-row id join) plus one
    ``by``-keyed aggregate (#domains rows) and a #domains-row window
    for the normalization — nothing driver-side, no new corpus
    shuffle beyond the LM passes. Per-doc excess is computed from the
    6 dp-rounded ml_score, so the domain means agree across engines.
    """
    ml = textstats.lm_moore_lewis(corpus, target, id_col, text_col)
    ex = ml.join(
        corpus.select(F.col(id_col), F.col(by).alias("grp")), id_col
    ).select(
        "grp", F.greatest(-F.col("ml_score"), F.lit(0.0)).alias("ex")
    )
    agg = ex.groupBy("grp").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(F.sum("ex") / F.count("*"), 6).alias("avg_excess"),
    )
    w = Window.partitionBy()
    tot = F.sum("avg_excess").over(w)
    return agg.select(
        "grp", "n_docs", "avg_excess",
        F.when(
            tot > 0, F.round(F.col("avg_excess") / tot, 6)
        ).otherwise(
            F.round(F.lit(1.0) / F.count("*").over(w), 6)
        ).alias("weight"),
    )


def length_batches(
    docs: DataFrame,
    batch_size: int = 8,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "gocrawl",
) -> DataFrame:
    """Length-grouped batch assembly with a padding-waste report — the
    pad-efficiency counterpart of the packing family (HF
    LengthGroupedSampler / Tay et al. bucketed batching): sequences in
    a batch pad to the batch max, so batches of SIMILAR lengths waste
    the least compute. Each shard orders its docs by (token length,
    shuffle key) and cuts consecutive runs of ``batch_size`` into
    batches.

    Emits one row per batch: (shard, batch, n_seqs, max_len, sum_len,
    padded, pad_frac) where padded = n_seqs·max_len is the compute
    actually spent and pad_frac = 1 − sum_len/padded the wasted
    fraction (6 dp). The tail batch of each shard may be short.

    Scale shape: the same shard contract as every packing op
    (:func:`shard_col` of the md5 shuffle key), one window sort PER
    SHARD (shard-bounded state, no global sort), then a (shard,
    batch)-keyed aggregate. Deterministic at any parallelism: length
    ties break on the shuffle key, which is a pure row function.
    """
    key = shuffle_key(id_col, seed)
    base = docs.select(
        F.col(id_col).alias("id"),
        F.size(textstats.norm_words(text_col)).alias("n_tokens"),
        key.alias("k"),
    ).withColumn("shard", shard_col(F.col("k"), n_shards))
    w = Window.partitionBy("shard").orderBy("n_tokens", "k")
    numbered = base.withColumn(
        "batch",
        F.floor((F.row_number().over(w) - 1) / batch_size).cast("int"),
    )
    agg = numbered.groupBy("shard", "batch").agg(
        F.count("*").cast("long").alias("n_seqs"),
        F.max("n_tokens").cast("long").alias("max_len"),
        F.sum("n_tokens").cast("long").alias("sum_len"),
    )
    padded = F.col("n_seqs") * F.col("max_len")
    return agg.select(
        "shard", "batch", "n_seqs", "max_len", "sum_len",
        padded.cast("long").alias("padded"),
        F.round(
            F.when(
                padded > 0,
                F.lit(1.0) - F.col("sum_len").cast("double") / padded,
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("pad_frac"),
    )


def report_card(
    docs: DataFrame,
    host_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    short_tokens: int = 50,
) -> DataFrame:
    """Per-language corpus report card — the one-page audit a curation
    run publishes alongside its output shards. One row per language:

      (lang, n_docs, n_hosts, n_tokens, mean_doc_tokens,
       p50_doc_tokens, dup_rate, mean_quality, short_frac)

    * dup_rate = 1 − distinct(md5(text))/n_docs within the language
      (byte-copy share, same contract as `host_stats`), 6 dp;
    * mean_quality = avg of the 6-dp `textstats.quality_score`,
      rounded to 4 dp (the dsir_weights round(sum,4) stability rule);
    * p50_doc_tokens — EXACT lower median of the per-doc token count:
      the smallest token count whose cumulative doc count reaches
      ceil(n/2). Computed on the (lang, tok) FREQUENCY table, so the
      per-lang cumulative window only ever sees #distinct-token-count
      rows (bounded by the max document length), never the 10^10 docs
      themselves — no interpolated quantiles, any engine agrees;
    * short_frac — share of docs under ``short_tokens`` tokens, 6 dp.

    Scale shape: ONE corpus scan projects (lang, host, tok, md5, q)
    codegen-side; the rollup is a map-side-combining groupBy on lang
    whose two distinct-aggs expand two-phase keyed on (lang, md5) /
    (lang, host) — a giant language spreads across the cluster instead
    of hot-spotting one reducer. The median-side frequency table is a
    second groupBy on (lang, tok) over the same cached projection;
    both outputs are #langs-sized, joined broadcast.
    """
    q6 = F.round(textstats.quality_score(text_col), 6)
    per_doc = docs.select(
        F.col(lang_col).alias("lang"),
        F.col(host_col).alias("_host"),
        textstats.token_count(text_col).alias("_tok"),
        F.md5(F.col(text_col)).alias("_th"),
        q6.alias("_q"),
    )
    agg = per_doc.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.count_distinct("_host").alias("n_hosts"),
        F.sum("_tok").alias("n_tokens"),
        F.count_distinct("_th").alias("_n_uniq"),
        F.round(F.avg("_tok"), 4).alias("mean_doc_tokens"),
        F.round(F.avg("_q"), 4).alias("mean_quality"),
        F.sum(
            F.when(F.col("_tok") < short_tokens, 1).otherwise(0)
        ).alias("_n_short"),
    )
    ft = per_doc.groupBy("lang", "_tok").agg(F.count("*").alias("_cnt"))
    cum = ft.withColumn(
        "_cum",
        F.sum("_cnt").over(
            Window.partitionBy("lang")
            .orderBy(F.asc("_tok"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    med = (
        cum.join(agg.select("lang", "n_docs"), "lang")
        .filter(F.col("_cum") >= F.ceil(F.col("n_docs") / 2.0))
        .groupBy("lang")
        .agg(F.min("_tok").alias("p50_doc_tokens"))
    )
    return agg.join(F.broadcast(med), "lang").select(
        "lang",
        "n_docs",
        "n_hosts",
        "n_tokens",
        "mean_doc_tokens",
        "p50_doc_tokens",
        F.round(
            F.lit(1.0) - F.col("_n_uniq").cast("double") / F.col("n_docs"), 6
        ).alias("dup_rate"),
        "mean_quality",
        F.round(
            F.col("_n_short").cast("double") / F.col("n_docs"), 6
        ).alias("short_frac"),
    )


def bitext_filters(
    pairs: DataFrame,
    src_col: str = "src_text",
    tgt_col: str = "tgt_text",
    min_ratio_x2: int = 1,
    max_ratio_x2: int = 4,
    max_overlap_ppm: int = 800_000,
) -> DataFrame:
    """The standard bitext-pair filter battery (the ParaCrawl/CCMatrix
    hygiene pass that follows margin mining — Bañón et al. 2020): for
    each candidate (src, tgt) text pair emit the per-rule verdicts and
    the final keep decision:

    - ``ratio_ok``    — token-count ratio within [min_ratio_x2/2,
      max_ratio_x2/2]; checked as 2·n_src ≥ min·n_tgt ∧ 2·n_src ≤
      max·n_tgt in EXACT integer math (no float ratio);
    - ``identical``   — raw string equality (untranslated copies);
    - ``overlap_ppm`` — token-set Jaccard in ppm (integer DIV); pairs
      above ``max_overlap_ppm`` are near-copies (boilerplate or
      untranslated chrome with punctuation noise);
    - ``empty``       — either side tokenizes to nothing;
    - ``keep``        — ratio_ok ∧ ¬identical ∧ ¬empty ∧ overlap ≤ max.

    Everything is a per-row column expression over the pair table —
    no joins, no shuffle; at mining scale this runs as a projection on
    mine_bitext's output joined to the text store.
    """
    ws = textstats.norm_words(src_col)
    wt = textstats.norm_words(tgt_col)
    n_s = F.size(ws)
    n_t = F.size(wt)
    ds = F.array_distinct(ws)
    dt_ = F.array_distinct(wt)
    inter = F.size(F.array_intersect(ds, dt_))
    union = F.size(ds) + F.size(dt_) - inter
    staged = pairs.select(
        "*",
        n_s.alias("n_tok_src"),
        n_t.alias("n_tok_tgt"),
        (F.col(src_col) == F.col(tgt_col)).alias("identical"),
        inter.cast("long").alias("_inter"),
        union.cast("long").alias("_union"),
    )
    out = staged.select(
        "*",
        (
            (F.col("n_tok_src") * 2
             >= F.col("n_tok_tgt") * F.lit(int(min_ratio_x2)))
            & (F.col("n_tok_src") * 2
               <= F.col("n_tok_tgt") * F.lit(int(max_ratio_x2)))
        ).alias("ratio_ok"),
        # exact integer DIV — bit-equal to DuckDB's // by construction
        F.expr(
            "CASE WHEN _union > 0 THEN _inter * 1000000 DIV _union"
            " ELSE 0 END"
        ).cast("long").alias("overlap_ppm"),
        ((F.col("n_tok_src") == 0) | (F.col("n_tok_tgt") == 0)).alias("empty"),
    ).drop("_inter", "_union")
    return out.withColumn(
        "keep",
        F.col("ratio_ok")
        & ~F.col("identical")
        & ~F.col("empty")
        & (F.col("overlap_ppm") <= F.lit(int(max_overlap_ppm))),
    )


def judge_agreement(
    verdicts: DataFrame,
    judge_cols: list[str],
    id_col: str = "doc_id",
) -> DataFrame:
    """Filter-ensemble agreement audit: how much do the pipeline's
    quality judges (rule gates, classifier, heuristics) actually agree
    before their votes gate a corpus? Emits one row per judge pair —
    (judge_a, judge_b, n_items, n_agree, agree_ppm, kappa) with
    Cohen's κ — plus a ('fleiss', 'all') row carrying Fleiss' κ over
    every judge.

    All contingency mass is exact integer counts aggregated in ONE
    pass (a handful of conditional sums per pair — no joins, no
    per-pair scans); the κ arithmetic divides those integers in a
    fixed operand order and rounds to 6 dp, so the report is bit-equal
    across engines and parallelism. NULL verdicts drop the item for
    the pairs (and the Fleiss pool) that reference it.
    """
    if len(judge_cols) < 2:
        raise ValueError("judge_agreement needs at least two judges")
    m = len(judge_cols)
    aggs = []
    for i, a in enumerate(judge_cols):
        for b in judge_cols[i + 1:]:
            ok = F.col(a).isNotNull() & F.col(b).isNotNull()
            pre = f"{a}__{b}"
            aggs += [
                F.sum(F.when(ok, 1).otherwise(0)).alias(f"{pre}__n"),
                F.sum(F.when(ok & F.col(a) & F.col(b), 1).otherwise(0))
                .alias(f"{pre}__tt"),
                F.sum(F.when(ok & F.col(a) & ~F.col(b), 1).otherwise(0))
                .alias(f"{pre}__tf"),
                F.sum(F.when(ok & ~F.col(a) & F.col(b), 1).otherwise(0))
                .alias(f"{pre}__ft"),
            ]
    all_ok = F.lit(True)
    for c in judge_cols:
        all_ok = all_ok & F.col(c).isNotNull()
    n_true = F.lit(0)
    for c in judge_cols:
        n_true = n_true + F.col(c).cast("int")
    # Fleiss sufficient statistics: N items, Σ n_i1, Σ(n_i1²+n_i0²)
    aggs += [
        F.sum(F.when(all_ok, 1).otherwise(0)).alias("fl__N"),
        F.sum(F.when(all_ok, n_true).otherwise(0)).alias("fl__t"),
        F.sum(
            F.when(all_ok, n_true * n_true + (m - n_true) * (m - n_true))
            .otherwise(0)
        ).alias("fl__sq"),
    ]
    flat = verdicts.agg(*aggs)

    rows = []
    for i, a in enumerate(judge_cols):
        for b in judge_cols[i + 1:]:
            pre = f"{a}__{b}"
            n = F.col(f"{pre}__n").cast("double")
            tt = F.col(f"{pre}__tt").cast("double")
            tf = F.col(f"{pre}__tf").cast("double")
            ft = F.col(f"{pre}__ft").cast("double")
            ff = n - tt - tf - ft
            po = (tt + ff) / n
            pe = ((tt + tf) * (tt + ft) + (ft + ff) * (tf + ff)) / (n * n)
            kappa = F.when(pe < 1.0, (po - pe) / (F.lit(1.0) - pe)).otherwise(
                F.lit(1.0)
            )
            rows.append(
                F.struct(
                    F.lit(a).alias("judge_a"),
                    F.lit(b).alias("judge_b"),
                    F.col(f"{pre}__n").cast("long").alias("n_items"),
                    (F.col(f"{pre}__tt") + ff.cast("long"))
                    .cast("long")
                    .alias("n_agree"),
                    F.expr(
                        f"CASE WHEN {pre}__n > 0 THEN "
                        f"({pre}__tt + ({pre}__n - {pre}__tt - {pre}__tf"
                        f" - {pre}__ft)) * 1000000 DIV {pre}__n"
                        f" ELSE 0 END"
                    ).cast("long").alias("agree_ppm"),
                    F.round(kappa, 6).alias("kappa"),
                )
            )
    # Fleiss: P̄ = (Σ(n1²+n0²) − Nm) / (Nm(m−1)); Pe = p1² + p0²
    N = F.col("fl__N").cast("double")
    t = F.col("fl__t").cast("double")
    sq = F.col("fl__sq").cast("double")
    mm = F.lit(float(m))
    pbar = (sq - N * mm) / (N * mm * (mm - F.lit(1.0)))
    p1 = t / (N * mm)
    p0 = F.lit(1.0) - p1
    pe_f = p1 * p1 + p0 * p0
    kf = F.when(pe_f < 1.0, (pbar - pe_f) / (F.lit(1.0) - pe_f)).otherwise(
        F.lit(1.0)
    )
    rows.append(
        F.struct(
            F.lit("fleiss").alias("judge_a"),
            F.lit("all").alias("judge_b"),
            F.col("fl__N").cast("long").alias("n_items"),
            F.lit(None).cast("long").alias("n_agree"),
            F.lit(None).cast("long").alias("agree_ppm"),
            F.round(kf, 6).alias("kappa"),
        )
    )
    return flat.select(F.explode(F.array(*rows)).alias("r")).select(
        "r.judge_a", "r.judge_b", "r.n_items", "r.n_agree",
        "r.agree_ppm", "r.kappa",
    )


def clf_reliability(
    scored: DataFrame,
    labels: DataFrame,
    n_bins: int = 10,
    id_col: str = "doc_id",
    score_col: str = "score",
    label_col: str = "label",
) -> DataFrame:
    """Calibration-reliability table for a [0,1]-scored classifier
    against boolean labels: items ranked by (score, id) split into
    ``n_bins`` EQUAL-COUNT bins (rank-based — no float bucket edges),
    each reporting exact counts, the integer-ppm positive rate, and
    the bin's min/max score. A calibrated classifier's pos_rate climbs
    with the score range; a flat table means the score carries no
    signal. Joins score→label once, one global rank window, one
    n_bins-row aggregate.
    """
    joined = scored.select(F.col(id_col).alias("id"), score_col).join(
        labels.select(
            F.col(id_col).alias("id"), F.col(label_col).alias("label")
        ),
        "id",
    )
    ranked = joined.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.asc(score_col), F.asc("id")))
        .alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("_n"),
    ).withColumn("bin", F.expr(f"(_rn - 1) * {int(n_bins)} DIV _n"))
    return (
        ranked.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("label").cast("int")).cast("long").alias("n_pos"),
            F.min(score_col).alias("min_score"),
            F.max(score_col).alias("max_score"),
        )
        .select(
            "bin",
            "n",
            "n_pos",
            F.expr("n_pos * 1000000 DIV n").cast("long").alias("pos_ppm"),
            "min_score",
            "max_score",
        )
    )

"""Benchmark driver: crawl throughput + headline query timings.

Runs the fetch→extract→frontier crawl loop over the synthetic corpus
derived from $SPARK_GRAFT_SF_DIR's documents table (the BASELINE.json
metric: URLs fetched+extracted/sec), plus wall-times for the headline
operator queries. Prints ONE JSON line:

    {"metric": "urls_fetched_extracted_per_sec", "value": N,
     "unit": "sec", "queries": {...}, "sf": 0.1, ...}

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32). tools/scaling_bench.py runs this at two
parallelism levels for the N-vs-4N scaling-efficiency evidence.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# headline queries from __spark_entry__.queries(); a representative slice
# of each operator family, cheap enough to run per-round at sf0.1
HEADLINE = [
    "text_token_stats",
    "text_quality",
    "text_fingerprint",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "ann_brute_cosine",
    "ann_ivf",
    "emb_dup_pairs",
    "curate_corpus",
    "search_bm25",
    "tpch_q1_lite",
    "crawl_extract_articles",
    # round-3 additions: link-graph rank, snapshot diff, hygiene ops
    "link_rank_pagerank",
    "corpus_diff",
    "text_redact_pii",
    "text_gopher",
    "decontaminate",
    "text_c4_clean",
    "text_line_dedup",
    "dedup_substring_spans",
    "text_lm_ppl",
    "train_pack_sequences",
    "semdedup",
    "dsir_select",
    "ann_ivf_kmeans",
    "curate_host_stats",
    # continuation additions: packing feed, significance, projection
    "train_pack_tokens",
    "search_significant_terms",
    "emb_project",
    "text_quality_clf",
    "corpus_mixture_select",
    "search_fuzzy",
    # round-4: probe-path recall eval (train/probe split reported
    # separately by bench_ann_split)
    "ann_recall",
    # round-4 continuation: KN-family LM scoring + the ES pipeline/
    # request tails (one representative each)
    "text_lm_kn3_ppl",
    "search_aggs_pipeline2_a2",
    "search_request_after",
    # round-4 session 2: archive/graph/curation additions (one
    # representative each family)
    "crawl_cdx_index",
    "link_rank_trust",
    "crawl_opic_sweep",
    "search_mlt",
    "train_fim",
    # round-4 session 3: search-quality eval + corpus audits (one
    # representative each)
    "search_rank_eval",
    "corpus_zipf",
    # round-4 session 4: archive revisit dedup + percolator (one
    # representative each)
    "crawl_warc_revisit",
    "search_percolate",
    # round-4 session 5: RAG chunking, int8 SQ search, host
    # communities, containment dedup, page-level robots (one each)
    "rag_chunk_windows",
    "ann_sq",
    "crawl_host_communities",
    "dedup_containment",
    "crawl_robots_meta",
    "wp_encode_greedy",
    # round-4 session 6: DUST canonicalization, bitext mining, unigram
    # tokenizer, deterministic HLL, readability gate (one each)
    "crawl_dust_rules",
    "emb_bitext_margin",
    "unigram_encode_viterbi",
    "corpus_host_cardinality",
    "text_readability",
    # round-4 session 7: C4 span dedup, ES compound scoring, hybrid
    # RRF retrieval, LSH recall eval, WP coverage audit (one each)
    "text_c4_span_dedup",
    "search_bool_dismax",
    "search_hybrid_rrf",
    "dedup_minhash_recall",
    "wp_coverage",
    "train_curriculum",
    # round-4 session 8: corpus memorization audit, CMS heavy hitters,
    # char-entropy gate, DoReMi domain weights, length-bucketed batches
    "corpus_dup_ngrams",
    "corpus_cms_hosts",
    "text_char_entropy",
    "corpus_doremi_weights",
    "train_length_batches",
    # round-4 session 9: fetch-concentration audit, per-lang report
    # card, BM25 hard-negative mining (one each)
    "crawl_fetch_gini",
    "corpus_report_card",
    "search_hard_negatives",
    # round-4 session 10: UCB recrawl bandit, classifier ROC report,
    # curation yield funnel, co-citation seed expansion, paragraph
    # perplexity surgery, revalidation waste audit, per-host quality
    # cap (one each)
    "crawl_ucb_schedule",
    "text_quality_roc",
    "corpus_pipeline_funnel",
    "crawl_seed_expansion",
    "text_para_prune",
    "crawl_refetch_waste",
    "curate_host_cap",
    "train_quality_clf",
    "crawl_robots_drift",
    # round-4 session 11: ES DSL tail — function_score ranking and the
    # span_near ordered-proximity leaf (one representative each)
    "search_function_score",
    "search_span_near",
    # round-4 session 11: temporal operators (as-of join via window
    # carry-forward, granule-bucketed interval join, GROUPING SETS
    # rollup)
    "events_asof_join",
    "events_interval_join",
    "events_time_rollup",
    # round-4 session 11: event-log analytics (one-Exchange ordered
    # funnel; cohort retention; transition matrix)
    "events_funnel",
    "events_cohort_retention",
    "events_transitions",
    # round-4 session 11: star-join analytics (broadcast dims, single
    # fact shuffle — one representative)
    "tpch_q3_lite",
    # round-4 session 11: intervals proximity + KMV set-resemblance
    # sketch (one representative each)
    "search_intervals",
    "corpus_kmv_users",
    # round-4 session 11: JSON-path props rollup + bitext hygiene
    # battery (one representative each)
    "events_json_props",
    "curate_bitext_filters",
    # round-4 session 11: incremental rollup maintenance + rate
    # anomaly audit (one representative each)
    "events_rollup_merge",
    "events_rate_anomaly",
    # round-4 session 11: M4 chart downsampling + nearest-mode as-of
    "events_m4_downsample",
    "events_asof_nearest",
    # round-4 session 11: filter-ensemble agreement + calibration card
    "corpus_judge_agreement",
    "text_clf_reliability",
    # round-4 session 11: robots rule attribution + CUSUM drift alarm
    "crawl_rule_attribution",
    "events_cusum",
    "events_funnel_durations",
    "corpus_dup_rate_curve",
    "events_funnel_windowed",
    # round-5: advisor/judge follow-ups — hot-key funnel leg, blocked
    # bitext miner, real media decode, knn retrieval, two-sided CUSUM
    "events_funnel_skewed",
    "emb_bitext_blocked",
    "media_decode",
    "search_knn",
    "events_cusum_twosided",
]


def build_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("gocrawl-spark-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.sql.session.timeZone", "UTC")
        # measured sweet spot for multi-KB html rows: smaller Arrow
        # batches pipeline scan→python→write better than the 10k default
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .getOrCreate()
    )


def bench_crawl(spark, sf_dir: str) -> tuple[float, int, float]:
    """Full batch-iterative BFS crawl on the synthetic corpus; returns
    (seconds, urls_fetched, urls_per_sec). Exercises the whole loop —
    multi-round frontier, bloom, retries of nothing, snapshots — but on
    a small corpus the per-round fixed cost dominates; the headline
    throughput comes from bench_steady_state below."""
    from gocrawl_spark import synth
    from gocrawl_spark.rounds import CrawlConfig, CrawlRun

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    run_dir = tempfile.mkdtemp(prefix="gocrawl_bench_")
    corpus_dir = os.path.join(run_dir, "corpus")
    # materialize the corpus once (not timed: corpus synthesis is test
    # scaffolding, not part of the crawl loop being measured)
    synth.corpus_from_documents(spark, sf_dir).write.mode("overwrite").parquet(corpus_dir)
    corpus = spark.read.parquet(corpus_dir)

    cfg = CrawlConfig(max_depth=3, round_wall_s=240.0, max_rounds=8, n_salts=8)
    crawl = CrawlRun(spark, corpus, synth.seed_urls(n_docs), os.path.join(run_dir, "run"), cfg)
    t0 = time.perf_counter()
    history = crawl.run(resume=False)
    dt = time.perf_counter() - t0
    fetched = sum(h["fetched"] for h in history)
    shutil.rmtree(run_dir, ignore_errors=True)
    return dt, fetched, fetched / dt if dt > 0 else 0.0


def _build_replicated(spark, sf_dir: str, replicas: int, corpus_dir: str) -> None:
    """sf corpus replicated under distinct hosts — the wide-frontier
    steady-state input (distinct hosts keep the politeness scheduler
    balanced, exactly like salting hot domains would)."""
    from pyspark.sql import functions as F

    from gocrawl_spark import synth

    base = synth.corpus_from_documents(spark, sf_dir)
    parts = [
        base.withColumn("url", F.regexp_replace("url", "^https://", f"https://r{k}."))
        for k in range(replicas)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(64).write.mode("overwrite").parquet(corpus_dir)


def bench_pinned_replay(
    spark, sf_dir: str, replicas: int = 48, cores: int = 8, trials: int = 2
) -> dict:
    """Same-binary comparability leg (BENCH_r03 protocol): the 32-core
    headline wanders ±30-40% with neighbor load on this host, but a
    taskset-pinned 8-core steady-state leg repeats within ~9%, so
    round-over-round deltas are attributable to the code, not the
    host. Runs tools/scaling_bench.py's worker pinned to cores
    0..cores-1 on a smaller replicated corpus, plus the kernel-only
    pool-calibration snapshot (pages/s of the raw extraction kernel at
    `cores` pinned processes — the engine-independent ceiling)."""
    import subprocess

    base = tempfile.mkdtemp(prefix="bench_pin_")
    corpus_dir = os.path.join(base, "corpus")
    _build_replicated(spark, sf_dir, replicas, corpus_dir)
    repo = os.path.dirname(os.path.abspath(__file__))
    pin = ["taskset", "-c", f"0-{cores - 1}", sys.executable]
    legs = []
    for _ in range(trials):
        subprocess.run(["sync"])
        time.sleep(5)
        out = subprocess.run(
            pin + [os.path.join(repo, "tools", "scaling_bench.py"),
                   "--worker", str(cores), corpus_dir],
            capture_output=True, text=True,
        )
        try:
            legs.append(json.loads(out.stdout.strip().splitlines()[-1]))
        except Exception:
            legs.append({"error": (out.stderr or "no output")[-400:]})
    cal = subprocess.run(
        pin + [os.path.join(repo, "tools", "pool_calibration.py"), str(cores)],
        capture_output=True, text=True,
        env={**os.environ, "POOL_PAGES": "8000"},
    )
    try:
        cal_j = json.loads(cal.stdout.strip().splitlines()[-1])
    except Exception:
        cal_j = {"error": (cal.stderr or "no output")[-400:]}
    shutil.rmtree(base, ignore_errors=True)
    ups = [leg["urls_per_sec"] for leg in legs if "urls_per_sec" in leg]
    return {
        "cores": cores,
        "replicas": replicas,
        "trials_urls_per_sec": ups,
        "best_urls_per_sec": max(ups) if ups else None,
        "pool_calibration": cal_j,
    }


def bench_steady_state(spark, sf_dir: str, replicas: int) -> tuple[float, int, float]:
    """Steady-state round throughput — the BASELINE.json metric shape.

    A 10^10-URL frontier's rounds are huge; the small-corpus analogue is
    the sf corpus replicated under distinct hosts with every URL
    frontiered, one politeness-budgeted round: pop → fetch (corpus
    join) → fused extraction → snapshot commit. Frontier seeding and
    python-worker warmup are untimed one-time costs (same protocol as
    tools/scaling_bench.py)."""
    from pyspark.sql import functions as F

    from gocrawl_spark import synth, udfs
    from gocrawl_spark.rounds import CrawlConfig, CrawlRun, init_frontier_df

    run_dir = tempfile.mkdtemp(prefix="gocrawl_bench_ss_")
    corpus_dir = os.path.join(run_dir, "corpus")
    _build_replicated(spark, sf_dir, replicas, corpus_dir)
    corpus = spark.read.parquet(corpus_dir)

    cfg = CrawlConfig(max_depth=0, round_wall_s=3600.0, max_rounds=1, use_bloom=False)
    crawl = CrawlRun(spark, corpus, [], os.path.join(run_dir, "run"), cfg)
    frontier_path = os.path.join(run_dir, "frontier0")
    init_frontier_df(corpus.select("url")).write.parquet(frontier_path)
    frontier = spark.read.parquet(frontier_path)
    udfs.extract_pages(corpus.limit(CPUS * 32).repartition(CPUS)).count()  # warm workers

    t0 = time.perf_counter()
    stats = crawl.run_round(0, frontier, crawl._empty_seen(), seen_size=0)
    dt = time.perf_counter() - t0
    fetched = stats["fetched"]
    shutil.rmtree(run_dir, ignore_errors=True)
    return dt, fetched, fetched / dt if dt > 0 else 0.0


def bench_ann_split(spark, sf_dir: str) -> dict:
    """ANN train/probe split: index build (ivf_write_index — the
    one-time cost a 100 TB corpus amortizes over every query batch)
    timed separately from the probe path over the PRE-BUILT index
    (broadcast probes + dynamic partition pruning restricting the scan
    to probed cells). The headline `ann_ivf` query times both fused;
    this leg is the serving-latency number."""
    from pyspark.sql import functions as F

    from gocrawl_spark import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = tempfile.mkdtemp(prefix="bench_ivf_idx_")
    t0 = time.perf_counter()
    similarity.ivf_write_index(emb, idx, n_centroids=16)
    train_s = time.perf_counter() - t0
    probes = emb.filter(F.col("vec_id") < 100)
    t0 = time.perf_counter()
    n = similarity.ivf_topk(
        emb, probes, k=10, n_centroids=16, nprobe=4, index_path=idx
    ).count()
    probe_s = time.perf_counter() - t0
    shutil.rmtree(idx, ignore_errors=True)
    return {
        "train_s": round(train_s, 3),
        "probe_s": round(probe_s, 3),
        "probe_queries": 100,
        "probe_rows": n,
    }


def bench_bpe_batched(spark, sf_dir: str, n_merges: int = 32) -> dict:
    """Driver-round-trip evidence for the batched BPE trainer: a
    32-merge budget costs the sequential trainer 32 sweeps (one
    pair-count collect + one rewrite each); the batched trainer packs
    non-interacting merges per sweep. Reports sweeps + wall for both —
    the VERDICT bar is >=5x fewer round-trips per 32 merges."""
    from gocrawl_spark import bpe

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("text")
        .limit(8000)
    )
    t0 = time.perf_counter()
    seq, seq_syms = bpe.train_state(docs, n_merges=n_merges)
    seq_syms.unpersist()
    seq_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    merges, syms, sweeps = bpe.train_state_batched(
        docs, n_merges=n_merges, batch=16, overfetch=8
    )
    syms.unpersist()
    bat_s = time.perf_counter() - t0
    return {
        "n_merges": n_merges,
        "sequential_sweeps": len(seq),
        "batched_sweeps": sweeps,
        "roundtrip_reduction_x": round(len(seq) / max(sweeps, 1), 2),
        "sequential_s": round(seq_s, 3),
        "batched_s": round(bat_s, 3),
        "speedup_x": round(seq_s / bat_s, 2) if bat_s > 0 else None,
    }


def main() -> None:
    import __spark_entry__ as entrymod

    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else -1.0
    spark = build_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    qtimes: dict[str, float] = {}
    qs = entrymod.queries()
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.perf_counter()
        n = fn(spark, SF_DIR).count()
        qtimes[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {n} rows in {qtimes[name]}s", file=sys.stderr)

    bpe_stats = bench_bpe_batched(spark, SF_DIR)
    print(f"# bpe batched: {bpe_stats}", file=sys.stderr)

    ann_stats = bench_ann_split(spark, SF_DIR)
    print(f"# ann split: {ann_stats}", file=sys.stderr)

    crawl_s, fetched_bfs, ups_bfs = bench_crawl(spark, SF_DIR)
    qtimes["crawl_loop"] = round(crawl_s, 3)
    print(f"# crawl bfs: {fetched_bfs} urls in {crawl_s:.1f}s = {ups_bfs:.1f} urls/s", file=sys.stderr)

    # large enough that the steady round is extraction-bound, not
    # fixed-cost-bound (~1M pages at sf0.1)
    replicas = int(os.environ.get("SPARK_GRAFT_REPLICAS", "192"))
    ss_s, fetched, ups = bench_steady_state(spark, SF_DIR, replicas)
    qtimes["crawl_steady_round"] = round(ss_s, 3)
    print(f"# steady state: {fetched} urls in {ss_s:.1f}s = {ups:.1f} urls/s", file=sys.stderr)

    # low-variance comparability leg + kernel calibration (see
    # BENCH/BASELINE.md noise protocol); skip with SPARK_GRAFT_NO_REPLAY=1
    replay = {}
    if not os.environ.get("SPARK_GRAFT_NO_REPLAY"):
        replay = bench_pinned_replay(spark, SF_DIR)
        print(f"# pinned replay: {replay}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "urls_fetched_extracted_per_sec",
                "value": round(ups, 2),
                "unit": "sec",
                "queries": qtimes,
                "sf": sf,
                "cpus": CPUS,
                "urls_fetched": fetched,
                "steady_round_seconds": round(ss_s, 2),
                "bfs_urls_per_sec": round(ups_bfs, 2),
                "pinned_replay": replay,
                "bpe_batched": bpe_stats,
                "ann_split": ann_stats,
                "scaling_efficiency_note": "see BENCH/BASELINE.md (N-vs-4N pinned-core evidence)",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

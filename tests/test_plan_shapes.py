"""Physical-plan contracts: pushdown, pruning, and shuffle counts for
the hot paths. These pin the properties the engine's 100 TB story
rests on — a plan regression fails loudly even while results stay
correct."""

from __future__ import annotations

import pytest

from gocrawl_spark import synth
from gocrawl_spark.rounds import CrawlConfig, CrawlRun


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def run(spark, sf_dir, tmp_path_factory):
    corpus = synth.corpus_from_documents(spark, sf_dir)
    n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    cfg = CrawlConfig(max_depth=1, round_wall_s=10.0, max_rounds=2, use_bloom=False)
    r = CrawlRun(spark, corpus, synth.seed_urls(n, k=8),
                 str(tmp_path_factory.mktemp("planrun")), cfg)
    r.run(resume=False)
    return r


def test_articles_view_prunes_and_pushes(spark, run):
    """articles() is a projection of the extracted snapshot: the scan
    must read ONLY the article struct + flags (no html-derived page
    struct, no links) and push the validity filters into the scan."""
    plan = _plan(run.articles().select("id", "title"))
    scan = plan[plan.index("FileScan") :]
    head = scan[: scan.index("\n")] if "\n" in scan else scan
    assert "PushedFilters: [" in scan
    assert "IsNotNull(content_type)" in scan or "EqualTo(content_type,article)" in scan
    # column pruning: page struct and links never leave the scan
    assert "page" not in head.split("ReadSchema")[-1]
    assert "links" not in head.split("ReadSchema")[-1]


def test_seen_filter_antijoin_prunes_to_hash(spark, run):
    """The exact seen anti-join (J3) must scan only url_hash from the
    seen deltas, not the full rows."""
    from gocrawl_spark import frontier as fr
    from gocrawl_spark.rounds import init_frontier_df

    cand = init_frontier_df(run.corpus.select("url").limit(50))
    out = fr.filter_unseen(cand, run.seen_final(), None, spark)
    plan = _plan(out)
    # the seen-side FileScan reads only url_hash
    seen_scans = [seg for seg in plan.split("FileScan") if "/seen" in seg]
    assert seen_scans, plan
    assert all("url_hash" in seg.split("ReadSchema:")[-1][:120] for seg in seen_scans)
    assert all("fetched_round" not in seg.split("ReadSchema:")[-1][:120] for seg in seen_scans)


def test_diff_corpus_hashes_below_the_exchange(spark, sf_dir):
    """Snapshot diff (curation.diff_corpus): the content column must be
    reduced to md5 IN THE SCAN-side projection — only (key, 48-byte
    hash) rows cross the full-outer join's exchanges, so the plan moves
    O(rows) bytes regardless of document size."""
    from gocrawl_spark import curation

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    plan = _plan(curation.diff_corpus(docs, docs))
    parts = plan.split("Exchange hashpartitioning")
    assert len(parts) >= 3, plan  # both join inputs shuffle on the key
    for seg in parts[1:]:
        # between each exchange and its child scan sits the md5 project
        assert "md5" in seg.split("FileScan")[0], seg
    # nothing above the exchanges (join/sort) touches the raw text
    assert "text#" not in parts[0], parts[0]


def test_contamination_broadcasts_benchmark_side(spark, sf_dir):
    """Decontamination must broadcast the (eval-suite-sized) benchmark
    shingle index — the corpus side joins map-side, no corpus shuffle
    before the join."""
    from gocrawl_spark import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    bench = docs.limit(5).selectExpr("doc_id as bench_id", "text as bench_text")
    plan = _plan(dedup.contamination(docs, bench))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_metrics_scan_partition_pruning(spark, run):
    """Round-partitioned snapshot layout: reading one round's metrics
    touches one directory, not the whole run (the Iceberg
    partition-pruning analogue)."""
    m = run.metrics().filter("round = 0")
    plan = _plan(m)
    assert "PushedFilters" in plan or "PartitionFilters" in plan


def test_substring_spans_equi_join_no_python(spark, sf_dir):
    """ExactSubstr spans must stay hash-keyed end to end: the dup-hash
    mark-back is an equi (semi) join, never a cartesian/nested-loop,
    and the whole pipeline is built-in expressions — no Python eval in
    the plan."""
    from gocrawl_spark import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    plan = _plan(dedup.substring_spans(docs, k=8))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "LeftSemi" in plan, plan
    assert "EvalPython" not in plan, plan  # Batch/ArrowEvalPython


def test_pack_sequences_one_exchange_no_python(spark, sf_dir):
    """Sequence packing is ONE hash exchange on shard + an in-partition
    window sort — no second shuffle, no Python eval, so the plan costs
    the same per shard at any corpus size."""
    from gocrawl_spark import curation

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    plan = _plan(curation.pack_sequences(docs, budget=512, n_shards=8))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "EvalPython" not in plan, plan


def test_lm_buckets_approx_broadcasts_thresholds(spark, sf_dir):
    """The scale-path bucketing joins the per-group quantile thresholds
    via broadcast — the corpus side never shuffles for the bucket
    assignment (the ppl computation's own aggregations aside)."""
    from gocrawl_spark import textstats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    plan = _plan(textstats.lm_buckets_approx(docs))
    assert "BroadcastHashJoin" in plan, plan

def test_clf_score_broadcasts_weight_table(spark, sf_dir):
    """Classifier inference must broadcast the <=buckets-row weight
    table onto the exploded feature stream — no shuffle of either side
    for the join; the only wide exchange keys on doc_id."""
    from gocrawl_spark import curation

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    w = curation.hash_weights(spark, 1024)
    plan = _plan(curation.clf_score(docs, w))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_fuzzy_topk_broadcasts_expansions(spark, sf_dir):
    """Fuzzy search must broadcast the tiny expansion set onto the
    postings; the vocab distinct and the score agg are the only wide
    shuffles, and no nested-loop/cartesian join appears anywhere."""
    from gocrawl_spark import search as S

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    plan = _plan(S.fuzzy_topk(docs, "tble", text_col="text", id_col="doc_id"))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # top-k is TakeOrdered, not a global sort of every score
    assert "TakeOrderedAndProject" in plan, plan


def test_mixture_select_windows_only_boundary_bucket(spark, sf_dir):
    """mixture_select: the ordered window may only ever see the ONE
    boundary bucket per language — the plan's Window sits above a
    filter pinning _b = _bound, never above the full corpus scan."""
    from gocrawl_spark import curation

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = curation.mixture_select(docs, {"en": 1000, "de": 10**9})
    plan = _plan(out)
    assert "Window" in plan, plan
    # the windowed branch filters on the boundary-bucket equality
    # before sorting; the keep-all/drop-all branch carries no Window
    win_seg = plan.split("Window")[-1]
    assert "_bound" in win_seg, plan


def test_pack_token_sequences_all_jvm_two_exchanges(spark, sf_dir):
    """Token packing: the whole plan is JVM-side (no Python eval
    node anywhere) and moves data at most twice — the per-shard
    window cumsum and the (shard, seq) reassembly. O(corpus tokens)
    shuffle bytes, no per-token explode."""
    from gocrawl_spark import curation

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(curation.pack_token_sequences(docs, seqlen=128,
                                               boundaries=True))
    for node in ("BatchEvalPython", "ArrowEvalPython",
                 "FlatMapGroupsInPandas", "MapInPandas"):
        assert node not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_pack_greedy_bins_single_arrow_pass_on_shard(spark, sf_dir):
    """Bin packing: exactly ONE Arrow stage (the per-shard next-fit
    scan), keyed on shard alone — the chunking/ordering stays JVM-side
    below it."""
    from gocrawl_spark import curation

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(curation.pack_greedy_bins(docs, budget=256))
    assert plan.count("FlatMapGroupsInPandas") == 1, plan
    assert "BatchEvalPython" not in plan, plan
    # the only wide exchange routes units to their shard
    ex = [seg.split("\n")[0] for seg in
          plan.split("Exchange hashpartitioning")[1:]]
    assert len(ex) == 1 and "shard" in ex[0], plan


def test_bpe_iteration_plan_is_jvm_with_partial_agg(spark, sf_dir):
    """One BPE iteration: pair counting partial-aggregates map-side
    before its single exchange, the greedy rewrite is a codegen'd
    fold — no Python anywhere in the training loop."""
    from gocrawl_spark import bpe

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = bpe.init_symbols(bpe.word_counts(docs))
    plan = _plan(bpe.pair_counts(bpe.apply_merge(words, "e", "r")))
    for node in ("BatchEvalPython", "ArrowEvalPython",
                 "FlatMapGroupsInPandas"):
        assert node not in plan, plan
    assert "partial_sum" in plan or "partial_count" in plan, plan


def test_bpe_encode_corpus_broadcasts_symbol_table(spark, sf_dir):
    """Corpus encode: the Heaps-small symbol table must broadcast
    onto the exploded piece stream (never a shuffle of the corpus on
    word), and the token→id map is a literal — no Python eval node,
    no nested-loop join."""
    from gocrawl_spark import bpe

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    _, symbols = bpe.train_state(docs, n_merges=2)
    plan = _plan(bpe.encode_corpus(docs, symbols))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    for node in ("BatchEvalPython", "ArrowEvalPython",
                 "FlatMapGroupsInPandas"):
        assert node not in plan, plan
    symbols.unpersist()


def test_adjacency_matrix_single_scan_no_join(spark, sf_dir):
    """adjacency_matrix compiles N single + N(N−1)/2 pair cells into
    ONE conditional-aggregation pass — the executed plan must contain
    no join operator of any kind and exactly one file scan."""
    from gocrawl_spark import search

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = search.es_aggs(docs, {"adj": {"adjacency_matrix": {"filters": {
        "en": {"term": {"lang": "en"}},
        "big": {"range": {"n_chars": {"gte": 400}}},
        "s1": {"wildcard": {"source": "src1*"}}}}}})
    plan = _plan(out)
    for marker in ("SortMergeJoin", "BroadcastHashJoin",
                   "BroadcastNestedLoopJoin", "CartesianProduct",
                   "ShuffledHashJoin"):
        assert marker not in plan, marker
    assert plan.count("FileScan") == 1


def test_search_after_cursor_pushes_into_scan(spark, sf_dir):
    """The search_after keyset predicate must reach the parquet scan
    as a pushed filter — that is WHY page N costs O(page): the cursor
    prunes at the I/O layer, not after a full sort."""
    from gocrawl_spark import search

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .withColumnRenamed("doc_id", "id")
    out = search.es_search(docs, {
        "query": {"range": {"n_chars": {"gte": 0}}},
        "sort": [{"n_chars": "desc"}], "size": 5,
        "search_after": [300, 250],
    })["hits"]
    plan = _plan(out)
    scan = plan[plan.index("FileScan"):]
    pushed = scan.split("PushedFilters: [")[1].split("]")[0]
    assert "n_chars" in pushed, pushed


def test_rare_multi_terms_one_exchange(spark, sf_dir):
    """rare_terms / multi_terms are ONE groupBy each: a single
    shuffle (plus AQE reads), never a second aggregation pass over
    the raw data."""
    from gocrawl_spark import search

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for spec in (
        {"r": {"rare_terms": {"field": "n_chars", "max_doc_count": 1}}},
        {"m": {"multi_terms": {"terms": [{"field": "lang"},
                                         {"field": "source"}]}}},
    ):
        plan = _plan(search.es_aggs(docs, spec))
        n_ex = plan.count("Exchange hashpartitioning")
        # one hash exchange for the groupBy; multi_terms adds one
        # rangepartitioning for the global top-N order
        assert n_ex == 1, f"{spec}: {n_ex} hash exchanges\n{plan}"
        assert plan.count("FileScan") == 1


def test_suggest_prefix_filter_precedes_vocab_agg(spark, sf_dir):
    """suggest_topk: the prefix filter must sit BELOW the aggregate
    exchange — only matching terms shuffle, the vocabulary never
    does."""
    from gocrawl_spark import search

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(search.suggest_topk(docs, "s", field="text"))
    agg_at = plan.find("HashAggregate")
    filt_at = plan.rfind("StartsWith")
    assert agg_at >= 0 and filt_at >= 0
    # the StartsWith predicate appears deeper in the plan (printed
    # later) than the first aggregate that consumes it
    assert filt_at > agg_at, plan


def test_mlt_broadcasts_selected_terms(spark, sf_dir):
    """mlt_topk: the ≤max_query_terms selected-term set must join the
    postings by BROADCAST — the corpus-side postings never reshuffle
    on the tiny side."""
    from gocrawl_spark import search

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(search.mlt_topk(docs, 7, text_col="text", id_col="doc_id"))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_budget_allocator_broadcasts_total(spark):
    """allocate_budgets: the one-row weight-total joins by broadcast;
    host rows stay map-side (no exchange between scan and quota)."""
    from gocrawl_spark import frontier as fr

    stats = spark.createDataFrame(
        [("a.com", 10, 5), ("b.com", 3, 1)],
        "host string, queued long, weight long",
    )
    plan = _plan(fr.allocate_budgets(stats, 100, 20))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_cdx_index_is_scan_projection(spark, sf_dir):
    """cdx_index: building the capture index adds NO exchange — it is
    a pure projection over the capture scan (SURT + digest are
    codegen'd expressions)."""
    from gocrawl_spark import cdx

    caps = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .selectExpr("concat('https://h/', doc_id) AS url",
                    "doc_id AS ts_us", "text")
    )
    plan = _plan(cdx.cdx_index(caps))
    assert "Exchange" not in plan, plan
    assert "BatchScan" in plan or "FileScan" in plan


def test_rank_eval_corpus_scans_independent_of_request_count(spark, sf_dir):
    """rank_eval: corpus scan count must NOT grow with the number of
    rated requests (the whole point vs ES's search-per-request), and
    the request/df/stats sides all join by broadcast — the tf table
    never reshuffles for them."""
    from gocrawl_spark.rankeval import rank_eval

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    few = [("q0", "spark"), ("q1", "window batch")]
    many = few + [(f"q{i}", t) for i, t in enumerate(
        ["data", "cluster table", "merge", "scan", "join", "filter"], start=2)]
    p_few = _plan(rank_eval(docs, few, text_col="text", id_col="doc_id"))
    p_many = _plan(rank_eval(docs, many, text_col="text", id_col="doc_id"))
    assert p_few.count("FileScan") == p_many.count("FileScan")
    assert "BroadcastHashJoin" in p_many
    assert "CartesianProduct" not in p_many


def test_zipf_fit_prunes_to_text_and_combines_map_side(spark, sf_dir):
    """zipf_fit: the scan reads ONLY the text column, and the
    vocabulary count partial-aggregates before its exchange (map-side
    combine on the token key)."""
    from gocrawl_spark import corpusstats as cs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(cs.zipf_fit(docs))
    scan = plan[plan.index("FileScan"):]
    head = scan[: scan.index("\n")] if "\n" in scan else scan
    read = head.split("ReadSchema")[-1]
    assert "text" in read and "doc_id" not in read and "lang" not in read
    assert "partial_count" in plan or "partial count" in plan.lower()


def test_heaps_curve_no_vocab_broadcast_no_cartesian(spark, sf_dir):
    """heaps_curve: checkpoint assignment is integer math against the
    broadcast ONE-ROW max-id — no non-equi join of the vocabulary, no
    cartesian product, no sort-merge join anywhere."""
    from gocrawl_spark import corpusstats as cs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(cs.heaps_curve(docs))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_distinct_ngrams_pure_projection(spark, sf_dir):
    """distinct_ngrams: per-document ratios are codegen'd array
    expressions — the plan has NO exchange at all."""
    from gocrawl_spark import corpusstats as cs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(cs.distinct_ngrams(docs))
    assert "Exchange" not in plan, plan
    # one Project straight over the scan (higher-order array lambdas
    # run interpreted but stay JVM-side — no Python, no shuffle)
    assert "Project" in plan and "FileScan" in plan
    assert "Python" not in plan


def test_key_skew_audit_reduces_before_rank(spark, sf_dir):
    """key_skew_audit: the key-frequency table partial-aggregates
    map-side; the single-partition rank stage only ever carries
    (key, cnt) pairs, never raw rows."""
    from gocrawl_spark import corpusstats as cs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(cs.key_skew_audit(docs, "lang"))
    assert "partial_count" in plan or "partial count" in plan.lower()
    scan = plan[plan.index("FileScan"):]
    head = scan[: scan.index("\n")] if "\n" in scan else scan
    read = head.split("ReadSchema")[-1]
    assert "lang" in read and "text" not in read


def test_revisit_records_no_per_digest_window(spark, sf_dir):
    """revisit_records: original election is a map-side-combined
    min(struct) groupBy + digest equi-join — NO window sort over the
    digest partition (a hot digest must not serialize onto one task)
    and no cartesian/broadcast-nested-loop anywhere."""
    from pyspark.sql import functions as F

    from gocrawl_spark import cdx

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    caps = docs.select(
        F.concat(F.lit("https://x.com/"), F.col("doc_id")).alias("url"),
        (F.col("doc_id") * 1000).cast("long").alias("ts_us"),
        F.col("text"),
    )
    plan = _plan(cdx.revisit_records(caps))
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_min" in plan or "partial min" in plan.lower()


def test_percolate_broadcasts_query_registry(spark, sf_dir):
    """percolate: the registered-query term table joins as a
    BROADCAST side onto the exploded (doc, term) stream — never a
    sort-merge shuffle of the corpus on term — and the and/or gate
    count partial-aggregates map-side."""
    from gocrawl_spark import search as se

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = se.percolate(
        docs, [("q1", "spark window", "and"), ("q2", "batch", "or")],
        text_col="text", id_col="doc_id",
    )
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan
    assert "partial_count" in plan or "partial count" in plan.lower()


def test_termvectors_requested_docs_broadcast(spark, sf_dir):
    """termvectors: after the two index aggregations, the requested
    docs' rows (a handful) broadcast onto the vocab-sized stats table
    — the serve-path join is broadcast-hash, never a corpus shuffle,
    and the scan prunes to (id, text)."""
    from gocrawl_spark import search as se

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(se.termvectors(docs, [1, 2], text_col="text", id_col="doc_id"))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan
    scan = plan[plan.index("FileScan"):]
    head = scan[: scan.index("\n")] if "\n" in scan else scan
    read = head.split("ReadSchema")[-1]
    assert "text" in read and "lang" not in read


def test_host_dup_rate_folds_map_side(spark, sf_dir):
    """host_dup_rate: revisit election stays window-free (min-struct
    groupBy + digest equi-join) and the host rollup partial-aggregates
    map-side — no cartesian anywhere."""
    from pyspark.sql import functions as F

    from gocrawl_spark import cdx

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    caps = docs.select(
        F.concat(F.lit("https://x.com/"), F.col("doc_id")).alias("url"),
        (F.col("doc_id") * 1000).cast("long").alias("ts_us"),
        F.col("text"),
    )
    plan = _plan(cdx.host_dup_rate(caps))
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_sum" in plan or "partial sum" in plan.lower()


def test_coverage_audit_url_equijoin(spark, sf_dir):
    """coverage_audit: declared and crawled meet in a url-keyed
    EQUI-join (co-shuffle, no broadcast of a corpus-sized side, no
    nested loop), then fold to #hosts rows with partial aggregation."""
    from pyspark.sql import functions as F

    from gocrawl_spark import sitemap

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    u = F.concat(F.lit("https://x.com/"), F.col("doc_id")).alias("url")
    plan = _plan(
        sitemap.coverage_audit(docs.select(u), docs.limit(100).select(u))
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "FullOuter" in plan, plan
    assert "partial_sum" in plan or "partial sum" in plan.lower()


def test_politeness_audit_single_host_exchange(spark, sf_dir):
    """politeness_audit: the lag window and the rollup both key on
    host, so the whole audit is ONE host-keyed Exchange — the groupBy
    reuses the window's partitioning rather than reshuffling."""
    from pyspark.sql import functions as F

    from gocrawl_spark import frontier

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    log = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 10).cast("string")).alias("host"),
        (F.col("doc_id") * 977).cast("long").alias("ts_us"),
        F.concat(F.lit("https://h/"), F.col("doc_id")).alias("url"),
    )
    plan = _plan(frontier.politeness_audit(log, 1000))
    assert "CartesianProduct" not in plan
    n_exchange = plan.count("Exchange hashpartitioning")
    assert n_exchange == 1, plan


def test_dist_drift_folds_before_join(spark, sf_dir):
    """dist_drift: each snapshot folds to #keys rows map-side BEFORE
    any join; the only joins are the key-level full-outer and two
    broadcast 1-row totals — the corpus never shuffles on content."""
    from gocrawl_spark import corpusstats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(corpusstats.dist_drift(
        docs, docs.filter("doc_id % 3 != 0"), "lang"))
    assert "partial_count" in plan or "partial count" in plan.lower()
    assert "CartesianProduct" not in plan
    # totals arrive via broadcast, not shuffle
    assert "BroadcastExchange" in plan
    # the scan prunes to the key column only
    scan = plan[plan.index("FileScan"):]
    head = scan[: scan.index("\n")] if "\n" in scan else scan
    read = head.split("ReadSchema")[-1]
    assert "lang" in read and "text" not in read


def test_chunk_windows_zero_shuffle_scan(spark, sf_dir):
    """chunk_windows is a pure scan projection: tokenize + explode +
    slice with NO Exchange anywhere and the scan pruned to (doc_id,
    text)."""
    from gocrawl_spark import curation

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(curation.chunk_windows(docs, chunk_tokens=64, overlap=16))
    assert "Exchange" not in plan
    assert "CartesianProduct" not in plan
    scan = plan[plan.index("FileScan"):]
    head = scan[: scan.index("\n")] if "\n" in scan else scan
    read = head.split("ReadSchema")[-1]
    assert "doc_id" in read and "text" in read and "lang" not in read


def test_sq_topk_broadcasts_queries_no_cartesian(spark, sf_dir):
    """sq_topk keeps brute_topk's plan shape: the query side arrives
    via BroadcastExchange (corpus codes never shuffle for the join),
    and there is no CartesianProduct — the join is the broadcast
    nested-loop over the tiny query side only."""
    from pyspark.sql import functions as F

    from gocrawl_spark import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    stats = similarity.sq_stats(emb)
    codes = similarity.sq_encode(emb, stats)
    plan = _plan(similarity.sq_topk(
        codes, stats, emb.filter(F.col("vec_id") < 5), k=10))
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_containment_single_inverted_index_join(spark, sf_dir):
    """containment_pairs reuses the ngram inverted-index plan: the two
    directions come from ONE counted pair aggregate (plan contains
    exactly one gram-keyed SortMergeJoin/ShuffledHashJoin between the
    inv aliases, reused under the union), never a cartesian."""
    from gocrawl_spark import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    plan = _plan(dedup.containment_pairs(docs, k=3, threshold=0.7))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_label_propagation_no_cartesian_exact_sums(spark):
    """label_propagation sweeps are label-keyed equi-joins + exact
    LONG-sum aggregates — no cartesian, no float in the vote."""
    from gocrawl_spark import graphrank

    g = spark.createDataFrame(
        [("a.com", "b.com", 3), ("b.com", "c.com", 2)],
        "src_host string, dst_host string, weight long")
    plan = _plan(graphrank.label_propagation(g, iters=2))
    assert "CartesianProduct" not in plan
    assert "sum" in plan.lower()


def test_dust_rules_equijoin_no_cartesian(spark, sf_dir):
    """dust_rules joins stripped candidates against the crawled URL map
    on url equality — an equi-join (hosts×params output), never a
    pairwise URL comparison — and the rollup is a plain hash aggregate."""
    from gocrawl_spark import canonicalize

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    pages = docs.selectExpr(
        "concat('https://h', cast(doc_id % 4 as string), '.com/p/',"
        " cast(doc_id as string), '?sid=', cast(doc_id as string)) AS url",
        "md5(cast(doc_id as string)) AS digest",
    )
    plan = _plan(canonicalize.dust_rules(pages))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "stripped" in plan  # the equi-join key is the stripped URL


def test_hll_single_shuffle_no_join(spark, sf_dir):
    """The HLL register path is ONE aggregation chain — no join
    anywhere, register rollup keyed on (group, bucket) folds map-side;
    the estimate stage reduces m rows per group."""
    from gocrawl_spark import corpusstats as cs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").selectExpr(
        "cast(doc_id % 7 as string) AS g", "cast(doc_id as string) AS v"
    )
    plan = _plan(cs.hll_estimate(cs.hll_registers(docs, "v", ["g"]), ["g"]))
    assert "Join" not in plan
    assert "partial_max" in plan or "HashAggregate" in plan


def test_bitext_broadcasts_query_side(spark, sf_dir):
    """mine_bitext's candidate stage inherits brute_topk's shape: the
    query side broadcasts, the corpus side never shuffles on content;
    no shuffle exchange keyed on the embedding."""
    from pyspark.sql import functions as F

    from gocrawl_spark import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(64)
    out = similarity.mine_bitext(
        emb.filter(F.col("vec_id") % 2 == 0),
        emb.filter(F.col("vec_id") % 2 == 1),
        k=2,
    )
    plan = _plan(out)
    assert "BroadcastExchange" in plan


def test_bitext_candidates_equijoins_only(spark, sf_dir):
    """The production miner path: candidates= supplied → vectors
    attach by ID-keyed EQUI-joins only — no nested-loop join, no
    cartesian, no full-side broadcast of the vector table (the exact
    twin's O(n²) scored table never materializes)."""
    from pyspark.sql import functions as F

    from gocrawl_spark import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(64)
    even = emb.filter(F.col("vec_id") % 2 == 0)
    odd = emb.filter(F.col("vec_id") % 2 == 1)
    cand_all = similarity.blocked_dup_pairs(
        emb, threshold=-1.0, bands=4, planes_per_band=4, dim=64
    )
    ia, ib = F.col("id_a"), F.col("id_b")
    cand = (
        cand_all.filter((ia % 2 == 0) & (ib % 2 == 1))
        .select(ia.alias("src_id"), ib.alias("tgt_id"))
        .unionAll(
            cand_all.filter((ia % 2 == 1) & (ib % 2 == 0))
            .select(ib.alias("src_id"), ia.alias("tgt_id"))
        )
    )
    out = similarity.mine_bitext(even, odd, k=2, candidates=cand)
    plan = _plan(out)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_colocated_budgets_equijoins_only(spark):
    """Server-level budgets: host- and block-keyed equi-joins, never a
    cartesian; the split is integer arithmetic in the plan."""
    from gocrawl_spark.frontier import colocated_budgets

    stats = spark.createDataFrame(
        [("a.com", 30), ("b.com", 10)], "host string, queued long"
    )
    res = spark.createDataFrame(
        [("a.com", "10.0.1.7")], "host string, ip string"
    )
    plan = _plan(colocated_budgets(stats, res, server_cap=20))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_stale_candidates_single_equijoin(spark):
    """Lastmod recrawl: declared side pre-aggregates to max(lastmod)
    per URL before ONE url-keyed equi-join."""
    from gocrawl_spark.sitemap import stale_candidates

    crawled = spark.createDataFrame(
        [("u1", 1000)], "url string, fetch_ts_us long"
    )
    declared = spark.createDataFrame(
        [("u1", 2000)], "url string, lastmod_us long"
    )
    plan = _plan(stale_candidates(crawled, declared))
    assert plan.count("Join") <= 2  # one logical join (+AQE aliasing)
    assert "CartesianProduct" not in plan


def test_span_dedup_no_cartesian_one_span_window(spark, sf_dir):
    """C4 span dedup: duplicate election is a span-hash window (no
    join among spans), removal + reassembly are equi-joins — never a
    cartesian; the sentence text never enters the election shuffle
    (spans carry (doc_id, start, md5) only)."""
    from gocrawl_spark.dedup import span_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    plan = _plan(span_dedup(docs))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # election window partitions on the span key
    assert "row_number" in plan


def test_significant_text_single_scan_no_corpus_join(spark, sf_dir):
    """significant_text: one term-keyed fold; the only join is the
    1-row broadcast of the corpus scalars."""
    from gocrawl_spark import search

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .withColumnRenamed("doc_id", "id")
    out = search.es_search(docs, {
        "query": {"match": {"text": "merge"}},
        "aggs": {"sig": {"significant_text": {"field": "text"}}},
    })["aggs"]
    plan = _plan(out)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # scalars broadcast, never SMJ


def test_diversified_sampler_window_keys_on_dedup_field(spark, sf_dir):
    """diversified_sampler: the per-value cap is a window partitioned
    on the diversity field — the exchange keys on it, not on doc id."""
    from gocrawl_spark import search

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .withColumnRenamed("doc_id", "id")
    out = search.es_search(docs, {
        "query": {"match": {"text": "table"}},
        "aggs": {"s": {
            "diversified_sampler": {"shard_size": 10, "field": "source"},
            "aggs": {"langs": {"terms": {"field": "lang"}}}}},
    })["aggs"]
    plan = _plan(out)
    assert "hashpartitioning(source" in plan
    assert "CartesianProduct" not in plan


def test_wp_coverage_folds_to_lang_rows(spark, sf_dir):
    """wp.coverage: the (lang, word) stream joins the distinct-word
    segmentation table by equi-join and folds with partial
    aggregation — no window, no cartesian."""
    from gocrawl_spark import wordpiece as wp

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(80)
    plan = _plan(wp.coverage(docs, ["a", "b", "c", "ab"]))
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan or "partial" in plan.lower()
    assert "Window" not in plan


def test_curriculum_no_global_sort_no_window(spark, sf_dir):
    """curriculum_order: boundaries broadcast from one agg; stage
    assignment is codegen'd comparisons — no window, no global sort,
    no shuffle beyond the percentile aggregation."""
    from gocrawl_spark.curation import curriculum_order

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(curriculum_order(docs, stages=10))
    assert "Window" not in plan
    assert "rangepartitioning" not in plan.lower()  # no global Sort
    assert "BroadcastExchange" in plan or "broadcast" in plan.lower()


def test_char_entropy_zero_shuffle(spark, sf_dir):
    """char_entropy is a pure projection: the histogram fold is a
    higher-order array expression — no Exchange, no aggregate, no
    join; it pipelines with the scan."""
    from gocrawl_spark.textstats import char_entropy

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(char_entropy(docs))
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "HashAggregate" not in plan


def test_dup_ngram_mass_shuffles_on_hash_only(spark, sf_dir):
    """dup_ngram_mass: gram strings reduce to md5 BEFORE the exchange
    (the shuffle carries fixed-width hashes, never the grams), both
    aggregations hash-based, no join."""
    from gocrawl_spark import corpusstats as cs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(cs.dup_ngram_mass(docs, k=5))
    assert "Join" not in plan
    # the first exchange's partitioning expression is the md5 column,
    # not the raw gram: 'g' appears only below (inside md5), and the
    # exchange keys contain the hash alias h
    first_ex = plan[plan.index("Exchange"):][:400]
    assert "md5" in plan
    assert "hashpartitioning" in first_ex


def test_cms_probe_broadcasts_sketch(spark, sf_dir):
    """cms_estimate joins candidates to the <= depth*width sketch via
    BroadcastHashJoin — the stream-sized side never re-shuffles for
    the probe."""
    from gocrawl_spark import corpusstats as cs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").selectExpr(
        "cast(doc_id % 9 as string) AS host"
    )
    sk = cs.cms_sketch(docs, "host", depth=4, width=32)
    keys = docs.distinct()
    plan = _plan(cs.cms_estimate(sk, keys, "host", depth=4, width=32))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_length_batches_window_keys_on_shard(spark, sf_dir):
    """length_batches sorts per shard only: every Window/Sort is
    partitioned by shard (no global Sort), and the batch rollup is a
    hash aggregate — no join."""
    from gocrawl_spark.curation import length_batches

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(length_batches(docs, batch_size=8, n_shards=8))
    assert "Join" not in plan
    assert "Window" in plan
    # the sort feeding the window is shard-partitioned, not global
    for seg in plan.split("\n"):
        if "Sort " in seg and "global=true" in seg:
            raise AssertionError(f"global sort found: {seg}")


def test_fetch_gini_prunes_to_key_and_bounds_scans(spark, sf_dir):
    """fetch_gini: every scan of the fetch log reads ONLY the key
    column (the 1-row stat frames join broadcast, never cartesian),
    and the log is scanned at most twice (base stats + decile pick —
    both over the #hosts-sized count table)."""
    from gocrawl_spark import corpusstats as cs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(cs.fetch_gini(docs, "source"))
    assert "CartesianProduct" not in plan
    scans = [ln for ln in plan.split("\n") if "FileScan" in ln]
    assert 0 < len(scans) <= 2
    for ln in scans:
        assert "ReadSchema: struct<source:string>" in ln


def test_report_card_no_global_sort_window_keys_on_lang(spark, sf_dir):
    """report_card: the exact-median cumulative window runs on the
    (lang, tok) frequency table partitioned by lang — no global Sort
    anywhere — and the corpus scan prunes to (lang, source, text)."""
    from gocrawl_spark.curation import report_card

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(report_card(docs))
    for seg in plan.split("\n"):
        if "Sort " in seg and "global=true" in seg:
            raise AssertionError(f"global sort found: {seg}")
    assert "windowspecdefinition(lang" in plan
    for ln in plan.split("\n"):
        if "FileScan" in ln:
            assert "doc_id" not in ln.split("ReadSchema:")[-1]


def test_hard_negatives_shares_corpus_scans_across_requests(spark, sf_dir):
    """hard_negatives: corpus scan count must NOT grow with the number
    of training queries (rank_eval's constant-scan contract carries
    over), request/df/stats sides broadcast."""
    from gocrawl_spark.rankeval import hard_negatives

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    few = [("q0", "spark"), ("q1", "window batch")]
    many = few + [(f"q{i}", t) for i, t in enumerate(
        ["data", "cluster table", "merge", "scan"], start=2)]
    p_few = _plan(hard_negatives(docs, few, text_col="text", id_col="doc_id"))
    p_many = _plan(hard_negatives(docs, many, text_col="text", id_col="doc_id"))
    assert p_few.count("FileScan") == p_many.count("FileScan")
    assert "BroadcastHashJoin" in p_many
    assert "CartesianProduct" not in p_many


def test_clf_roc_single_corpus_scan_per_side(spark, sf_dir):
    """clf_roc: the AUC/threshold report folds off the score frequency
    table — the corpus parquet is scanned once for the score side and
    once for the label side (no per-threshold rescans: thresholds join
    as a BroadcastExchange of the literal table), no cartesian."""
    from gocrawl_spark import curation, textstats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = curation.hash_weights(spark, buckets=1024, seed="quality-clf")
    scores = curation.clf_score(docs, w, buckets=1024)
    st = textstats.gopher_stats("text")
    labels = docs.select("doc_id", textstats.gopher_keep(st).alias("label"))
    plan = _plan(curation.clf_roc(scores, labels))
    assert "CartesianProduct" not in plan
    # clf_score reads the parquet twice (features + id base), labels
    # once; clf_roc itself adds NO rescans (AUC folds inside the
    # per-threshold aggregate)
    scans = [ln for ln in plan.split("\n") if "FileScan" in ln]
    assert len(scans) <= 3
    assert "BroadcastExchange" in plan


def test_pipeline_funnel_one_scan_into_flags(spark, sf_dir):
    """pipeline_funnel: per-stage counts come from ONE flagged scan of
    the corpus folded once — the only extra corpus reads are the two
    sides of the contamination shingle join (corpus + benchmark), so
    the parquet appears at most 3 times; the benchmark side meets the
    corpus in a broadcast join, never cartesian; no global sort."""
    import pyspark.sql.functions as F

    from gocrawl_spark import corpusstats as cs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    from gocrawl_spark.textstats import norm_words

    bench = docs.filter(F.col("doc_id") % 50 == 10).select(
        F.col("doc_id").alias("bench_id"),
        F.array_join(F.slice(norm_words("text"), 3, 10), " ").alias("bench_text"),
    )
    plan = _plan(cs.pipeline_funnel(docs, bench, k=8))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    scans = [ln for ln in plan.split("\n") if "FileScan" in ln]
    assert len(scans) <= 3
    for seg in plan.split("\n"):
        if "Sort " in seg and "global=true" in seg:
            raise AssertionError(f"global sort found: {seg}")


def test_cocitation_seeds_broadcasts_seed_table(spark, sf_dir):
    """cocitation_seeds: the seed table joins broadcast (tagging rides
    the scan), the candidate cap window keys on src, and the pairing
    is an equi-join — no cartesian, no nested-loop join."""
    import pyspark.sql.functions as F

    from gocrawl_spark import graphrank

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    e = graphrank.doc_edges(docs, n).select(
        "src",
        F.concat(F.lit("site"), (F.col("dst") % 15).cast("string")).alias(
            "dst_host"
        ),
    )
    seeds = spark.createDataFrame([("site1",), ("site5",)], "host string")
    plan = _plan(graphrank.cocitation_seeds(e, seeds, max_out=32))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastExchange" in plan
    assert "windowspecdefinition(src" in plan


def test_lm_para_prune_windows_key_on_doc(spark, sf_dir):
    """lm_para_prune: no global sort (the position-ordered fold is an
    in-aggregate array_sort, not a Sort node over the corpus); the
    paragraph score fold and the reassembly both shuffle keyed on the
    doc id; count-table joins are equi-joins, never cartesian."""
    from gocrawl_spark import textstats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    plan = _plan(textstats.lm_para_prune(docs, max_ppl=100.0))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    for seg in plan.split("\n"):
        if "Sort " in seg and "global=true" in seg:
            raise AssertionError(f"global sort found: {seg}")


def test_dsl_tail_leaves_single_scan_no_join(spark, sf_dir):
    """function_score / terms_set / pinned / span_near / rank_feature
    compile to pure column arithmetic on the one-scan bool_topk plan:
    no join of any kind, exactly one file scan, and the top-k as a
    TakeOrderedAndProject (no extra Exchange)."""
    from gocrawl_spark import search

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = search.bool_topk(
        docs,
        {
            "must": [{"function_score": {
                "query": {"span_near": {
                    "clauses": [{"span_term": {"text": "table"}},
                                {"span_term": {"text": "scan"}}],
                    "slop": 2, "in_order": True}},
                "functions": [
                    {"filter": {"term": {"lang": "en"}}, "weight": 2.0},
                    {"field_value_factor": {"field": "n_chars",
                                            "factor": 0.01,
                                            "modifier": "sqrt"}},
                ],
                "score_mode": "sum", "boost_mode": "multiply",
            }}],
            "should": [
                {"rank_feature": {"field": "n_chars",
                                  "saturation": {"pivot": 300}}},
                {"terms_set": {"text": {"terms": ["merge", "vector"],
                                        "minimum_should_match": 1}}},
                {"pinned": {"ids": [1, 2],
                            "organic": {"match": {"text": "join"}}}},
            ],
        },
        id_col="doc_id", k=15,
    )
    plan = _plan(out)
    for marker in ("SortMergeJoin", "BroadcastHashJoin",
                   "BroadcastNestedLoopJoin", "CartesianProduct",
                   "ShuffledHashJoin"):
        assert marker not in plan, marker
    assert plan.count("FileScan") == 1
    assert "TakeOrderedAndProject" in plan


def test_tpch_star_joins_broadcast_dims_one_fact_shuffle(spark, sf_dir):
    """Q3/Q5/Q10 shapes: every dimension join is a BroadcastHashJoin,
    the ONLY shuffle join is the lineitem-orders fact join, and the
    selective fact filters are pushed to the parquet scans."""
    import __spark_entry__ as entry

    for name in ("tpch_q3_lite", "tpch_q5_lite", "tpch_q10_lite"):
        df = entry.queries()[name](spark, sf_dir)
        plan = _plan(df)
        n_shuffle_joins = plan.count("SortMergeJoin") + plan.count(
            "ShuffledHashJoin"
        )
        assert n_shuffle_joins <= 1, f"{name}: {n_shuffle_joins}\n{plan}"
        assert "BroadcastHashJoin" in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert "PushedFilters: [" in plan, name

"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship fetch→extract slice on sf0.001.
`queries()` — one entry per implemented operator family (SURVEY.md §2 +
the training-data-pipeline ops); each callable: (spark, sf_dir) → DataFrame.
`oracle_sql()` — DuckDB-equivalent SQL per query where the op is
SQL-expressible; crawl/HTML/NumPy-backed ops are rows-only by design
(the byte-identity of extraction is pinned by golden tests instead —
tests/test_extract.py, tests/test_crawl_e2e.py).

Determinism rules used throughout so Spark and DuckDB hash-match:
- md5/sha2 text hashing (identical across engines);
- integer counts divided as doubles (exact in IEEE754 for small ints);
- money sums as per-element-rounded DECIMAL (order-independent);
- float scores rounded to 6 dp, ordering ties broken on ids.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gocrawl_spark import bpe, curation, dedup, search, similarity, synth, textstats, udfs
from gocrawl_spark import multimodal as mm

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# rated search requests for the `_rank_eval` twin queries — shared by
# queries()['search_rank_eval'] and its oracle so both engines evaluate
# the identical request set
_RANK_EVAL_REQUESTS = [
    ("q_spark", "spark"),
    ("q_window_batch", "window batch"),
    ("q_data_pipeline", "data pipeline"),
    ("q_nomatch", "zzzqqq"),
]


# registered percolator queries — shared by queries()['search_percolate']
# and its oracle so both engines evaluate the identical registry
_PERCOLATE_QUERIES = [
    ("p_spark_or", "spark streaming", "or"),
    ("p_window_and", "window batch", "and"),
    ("p_pipeline_or", "data pipeline quality", "or"),
    ("p_nomatch_and", "zzzqqq", "and"),
]

# docs requested from the `_termvectors` twin queries
_TERMVECTOR_DOC_IDS = [1, 2, 42]

# politeness floor asserted by crawl_politeness_audit and its oracle
_POLITENESS_MIN_DELAY_US = 30 * 60 * 1_000_000


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _aug_exact(docs: DataFrame) -> DataFrame:
    """documents ∪ exact copies of every 50th doc (id+1000000) — the
    deterministic dup injection used by the exact-dedup checks."""
    dups = docs.filter((F.col("doc_id") % 50) == 0).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    return docs.unionByName(dups)


def _aug_near(docs: DataFrame) -> DataFrame:
    """documents ∪ near-dup copies (first word dropped) of every 25th
    doc — the injection used by MinHash/Jaccard/SimHash checks."""
    near = docs.filter((F.col("doc_id") % 25) == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.regexp_replace("text", r"^\S+\s*", "").alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    return docs.unionByName(near)


# SQL fragments shared by several oracles ------------------------------------

_SQL_AUG_EXACT = """
    SELECT * FROM documents
    UNION ALL
    SELECT doc_id + 1000000, text, lang, source, n_chars
    FROM documents WHERE doc_id % 50 = 0
"""

_SQL_AUG_NEAR = r"""
    SELECT * FROM documents
    UNION ALL
    SELECT doc_id + 1000000, regexp_replace(text, '^\S+\s*', ''), lang, source, n_chars
    FROM documents WHERE doc_id % 25 = 0
"""

# norm_words / shingles(k) in DuckDB (mirrors textstats.norm_words/shingles)
_SQL_WORDS = r"""list_filter(
    regexp_split_to_array(trim(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g')), '\s+'),
    x -> x <> '')"""


def _sql_shingles(k: int) -> str:
    return f"""CASE WHEN len(w) >= {k}
        THEN [array_to_string(list_slice(w, i+1, i+{k}), ' ') for i in range(0, len(w)-{k - 1})]
        ELSE [array_to_string(w, ' ')] END"""


# ---------------------------------------------------------------------------
# entry: flagship fetch→extract slice
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """sf0.001 documents → synthetic pages corpus → fused single-pass
    extraction UDF (detect C1, extract E1-E14, validate V1-V7) →
    article projection. The crawl-round scheduler over the same corpus
    is exercised in tests/test_crawl_e2e.py."""
    corpus = synth.corpus_from_documents(spark, "/root/testdata/sf0.001")
    extracted = udfs.extract_pages(corpus)
    return extracted.select(
        "url",
        "content_type",
        F.col("article.title").alias("title"),
        F.col("article.word_count").alias("word_count"),
        "article_valid",
        F.size("links").alias("n_links"),
    )


# ---------------------------------------------------------------------------
# queries + oracles
# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # -- text analysis ------------------------------------------------------
    def text_token_stats(spark, sf_dir):
        return _docs(spark, sf_dir).select(
            "doc_id",
            textstats.token_count("text").alias("n_tokens"),
            textstats.bpeish_count("text").alias("n_bpeish"),
            F.length("text").alias("n_chars_m"),
        )

    q["text_token_stats"] = text_token_stats

    def text_quality(spark, sf_dir):
        return _docs(spark, sf_dir).select(
            "doc_id",
            textstats.stopword_hits("text").alias("stop_hits"),
            textstats.punct_count("text").alias("punct_cnt"),
            F.round(textstats.quality_score("text"), 6).alias("quality"),
        )

    q["text_quality"] = text_quality

    def text_langid(spark, sf_dir):
        return _docs(spark, sf_dir).select(
            "doc_id",
            "lang",
            textstats.predict_lang("text").alias("pred_lang"),
        )

    q["text_langid"] = text_langid

    def text_fingerprint(spark, sf_dir):
        return _docs(spark, sf_dir).select(
            "doc_id",
            textstats.fingerprint("text", k=5).alias("fingerprint"),
            F.size(textstats.norm_words("text")).alias("n_words"),
        )

    q["text_fingerprint"] = text_fingerprint

    def text_redact_pii(spark, sf_dir):
        """PII scrub (textstats.redact_pii): every third document gets
        a deterministic email/IP/phone injected, then the RE2-safe
        redaction chain replaces them with typed placeholders; counts
        audit the scrub. Pure chained regexp_replace in the scan."""
        d = F.col("doc_id")
        aug = F.when(
            d % 3 == 0,
            F.concat(
                F.col("text"),
                F.lit(" Contact user"), d.cast("string"),
                F.lit("@mail.example.org from 10.1."), (d % 256).cast("string"),
                F.lit(".9 or call +1 (555) 010-"),
                (1000 + d % 9000).cast("string"), F.lit(" now."),
            ),
        ).otherwise(F.col("text"))
        docs = _docs(spark, sf_dir).select("doc_id", aug.alias("text"))
        counts = textstats.pii_counts("text")
        return docs.select(
            "doc_id",
            textstats.redact_pii("text").alias("redacted"),
            counts["email"].alias("n_email"),
            counts["ip"].alias("n_ip"),
            counts["phone"].alias("n_phone"),
        )

    q["text_redact_pii"] = text_redact_pii

    def text_gopher(spark, sf_dir):
        """Gopher/C4 shape gates (textstats.gopher_stats/gopher_keep):
        words-count, mean word length, alpha-word fraction, symbol
        ratio and the published-threshold keep verdict — all codegen'd
        expressions over one tokenization."""
        st = textstats.gopher_stats("text")
        return _docs(spark, sf_dir).select(
            "doc_id",
            st["n_words"].alias("n_words"),
            F.round(st["mean_word_len"], 6).alias("mean_word_len"),
            F.round(st["frac_alpha"], 6).alias("frac_alpha"),
            F.round(st["symbol_ratio"], 6).alias("symbol_ratio"),
            textstats.gopher_keep(st).alias("keep"),
        )

    q["text_gopher"] = text_gopher

    def text_repetition(spark, sf_dir):
        """Gopher repetition rule (textstats.repetition_stats): every
        ninth document gets a spam phrase repeated onto it; the top
        2-gram mass fraction spikes on exactly those docs. Explode +
        two keyed aggs — gram strings shuffle, documents don't."""
        d = F.col("doc_id")
        aug = F.when(
            d % 9 == 4,
            F.concat(F.col("text"), F.repeat(F.lit(" buy cheap gold"), 40)),
        ).otherwise(F.col("text"))
        docs = _docs(spark, sf_dir).select("doc_id", aug.alias("text"))
        return textstats.repetition_stats(docs, k=2)

    q["text_repetition"] = text_repetition

    def text_line_dedup(spark, sf_dir):
        """CCNet/RefinedWeb boilerplate cut (dedup.line_dedup): every
        doc gets a shared copyright footer (and every fourth a shared
        newsletter plug) plus one unique line; lines whose normalized
        hash spans ≥2 documents are dropped corpus-wide, survivors
        rejoin in order. One hash-keyed shuffle builds the (tiny)
        boilerplate table; the back-join broadcasts under AQE."""
        d = F.col("doc_id")
        aug = F.concat(
            F.col("text"),
            F.lit("\nCopyright Example Corp. All rights reserved."),
            F.when(
                d % 4 == 0, F.lit("\nSubscribe to our newsletter today!")
            ).otherwise(F.lit("")),
            F.lit("\nUnique line for doc "), d.cast("string"),
        )
        docs = _docs(spark, sf_dir).select("doc_id", aug.alias("text"))
        return dedup.line_dedup(docs)

    q["text_line_dedup"] = text_line_dedup

    def text_boilerplate_host(spark, sf_dir):
        """HOST-scoped boilerplate cut (dedup.line_dedup_host — the
        CCNet per-shard / RefinedWeb per-site rule): every doc gains
        its source's footer line (repeats in ≥25% of the SAME host's
        docs → dropped) and every 50th doc a headline quoted across
        sources — which the corpus-global line_dedup would cut but the
        host-scoped rule keeps wherever no single source crosses the
        25% bar. Boilerplate aggregates on (host, line-hash); per-host
        totals broadcast."""
        d = F.col("doc_id")
        aug = F.concat(
            F.col("text"),
            F.lit("\nFooter of "), F.col("source"), F.lit(" site."),
            F.when(
                d % 50 == 0,
                F.lit("\nBreaking: shared headline quoted everywhere."),
            ).otherwise(F.lit("")),
            F.lit("\nUnique line for doc "), d.cast("string"),
        )
        docs = _docs(spark, sf_dir).select(
            "doc_id", "source", aug.alias("text")
        )
        return dedup.line_dedup_host(docs, min_docs=2, min_frac=0.25)

    q["text_boilerplate_host"] = text_boilerplate_host

    def curate_host_stats(spark, sf_dir):
        """Per-host reputation rollup (curation.host_stats — the
        RefinedWeb site-level gate) over documents ∪ exact copies of
        every 50th doc, so mirror-heavy hosts show a real dup_rate:
        one scan, one map-side-combined groupBy on the host; the
        text-hash distinct keys on (host, md5) so a giant mirror host
        spreads instead of hot-spotting one reducer."""
        return curation.host_stats(_aug_exact(_docs(spark, sf_dir)))

    q["curate_host_stats"] = curate_host_stats

    def text_quality_clf(spark, sf_dir):
        """fasttext-architecture quality-classifier inference
        (curation.clf_score, Joulin et al. 2016): hashed
        unigram+bigram bag → broadcast (bucket, weight) join → one
        doc_id shuffle with map-side partial sums → codegen'd sigmoid.
        Weights here are the md5 stand-in (curation.hash_weights);
        production loads trained weights into the same table shape and
        the plan is unchanged."""
        docs = _docs(spark, sf_dir)
        w = curation.hash_weights(spark, buckets=1024, seed="quality-clf")
        return curation.clf_score(docs, w, buckets=1024)

    q["text_quality_clf"] = text_quality_clf

    def corpus_mixture_select(spark, sf_dir):
        """Token-budget mixture selection (curation.mixture_select —
        the "N tokens per language" data-mixing step): docs taken in
        shuffle_key order per language until the quota, straddler
        included. Quotas exercise every edge: en/de partial, fr above
        its total (keep all), es zero (keep none), zh absent (excluded
        from the output). The bucket-prefix plan windows only the ONE
        boundary bucket per language; the oracle is the naive global
        window — equivalence IS the test."""
        return curation.mixture_select(
            _docs(spark, sf_dir),
            {"en": 3000, "de": 1000, "fr": 1_000_000, "es": 0},
        )

    q["corpus_mixture_select"] = corpus_mixture_select

    def search_fuzzy(spark, sf_dir):
        """ES match-with-fuzziness (search.fuzzy_topk): the misspelled
        query "tble scann" expands against the corpus VOCABULARY
        (distinct terms only — never a corpus scan per candidate) to
        near-spellings within Levenshtein 1 sharing the first letter,
        then scores total expansion-term occurrences per doc.
        Expansion set ≤ 50/term by (distance, term) — ES's
        max_expansions with a deterministic tie-break."""
        return search.fuzzy_topk(
            _docs(spark, sf_dir), "tble scann",
            text_col="text", id_col="doc_id", k=10,
            fuzziness=1, prefix_length=1,
        )

    q["search_fuzzy"] = search_fuzzy

    def search_suggest(spark, sf_dir):
        """ES completion-suggester twin (search.suggest_topk): top-10
        vocabulary terms with prefix 's' by document frequency (term
        asc tie-break). Prefix filter runs before the vocab agg, so
        only matching terms shuffle; at scale it is an index-only
        prefix scan over the precomputed (term, doc_freq) table."""
        return search.suggest_topk(
            _docs(spark, sf_dir), "s", field="text", k=10
        )

    q["search_suggest"] = search_suggest

    def search_mlt(spark, sf_dir):
        """ES more_like_this (search.mlt_topk): representative terms
        of doc 7 (tf·idf-ranked, Lucene idf, deterministic tie-break,
        cap 10) drive an OR match with a 30% minimum_should_match;
        score folded in sorted term order so the float sum is
        bit-stable. One postings shuffle + broadcast term set."""
        return search.mlt_topk(
            _docs(spark, sf_dir), 7, text_col="text", id_col="doc_id",
            k=10, max_query_terms=10, min_term_freq=1, min_doc_freq=2,
            min_should_match_pct=30,
        )

    q["search_mlt"] = search_mlt

    def search_bool_mlt(spark, sf_dir):
        """more_like_this as a bool-DSL leaf (expanded pre-compile to
        interesting-term matches + integer minimum_should_match, like
        doc excluded via must_not ids — the /search/dsl form; TF-sum
        scoring, the documented DSL simplification of the standalone
        idf-weighted search_mlt)."""
        return search.bool_topk(
            _docs(spark, sf_dir),
            {"must": [{"more_like_this": {
                "fields": ["text"], "like": {"_id": 7},
                "max_query_terms": 10, "min_doc_freq": 2,
                "minimum_should_match": "30%", "id_col": "doc_id",
            }}]},
            id_col="doc_id",
            k=10,
        )

    q["search_bool_mlt"] = search_bool_mlt

    def search_highlight(spark, sf_dir):
        """ES highlight analogue (search.highlight_topk): top-10 by
        match TF with one 80-char snippet of the ORIGINAL text around
        the earliest query-term occurrence, the span wrapped in
        <em></em> — all codegen'd scalars in one projection, TakeOrdered
        top-k, no UDF."""
        return search.highlight_topk(
            _docs(spark, sf_dir), "window batch",
            text_col="text", id_col="doc_id", k=10,
        )

    q["search_highlight"] = search_highlight

    def dedup_cluster_reps(spark, sf_dir):
        """Quality-elected cluster survivors
        (dedup.cluster_representatives): same MinHash-LSH components
        as dedup_clusters, but each cluster keeps its highest-quality
        member (ties to the smaller id) instead of the min id — the
        RefinedWeb keep-the-cleanest-copy rule. One cluster_id window
        over the (small) dup-evidence set."""
        docs = _aug_near(_docs(spark, sf_dir))
        pairs = dedup.minhash_pairs(
            docs, num_hashes=16, k=5, bands=4, threshold=0.5
        )
        clusters = dedup.dup_clusters(pairs)
        scores = docs.select(
            "doc_id", F.round(textstats.quality_score("text"), 6).alias("score")
        )
        return dedup.cluster_representatives(clusters, scores)

    q["dedup_cluster_reps"] = dedup_cluster_reps

    def crawl_anchor_index(spark, sf_dir):
        """Inbound anchor-text index (graphrank.anchor_pairs →
        anchor_index): one parse pass over the synthetic corpus emits
        (src, resolved-url, anchor-text) per <a href> — junk schemes
        cut, relatives absolutized exactly like the crawl's candidate
        pipeline — then ONE url-keyed shuffle rolls up in-degree,
        distinct source hosts and the (capped, sorted) anchor
        vocabulary per target. The oracle rebuilds the whole link
        layer from the synth closed forms. anchors join to '|'-csv for
        engine-stable compare."""
        from gocrawl_spark import graphrank

        corpus = synth.corpus_from_documents(spark, sf_dir)
        idx = graphrank.anchor_index(graphrank.anchor_pairs(corpus))
        return idx.select(
            "url", "in_degree", "n_src_hosts",
            F.concat_ws("|", "anchors").alias("anchors_csv"),
        )

    q["crawl_anchor_index"] = crawl_anchor_index

    def train_token_ids(spark, sf_dir):
        """Hashed-vocab tokenization (curation.tokenize_ids): GPT-2
        pre-tokenizer pieces → uint32(md5) % 32768 ids, codegen'd in
        the scan. The full id sequence is pinned by an md5 over the
        csv form; head_ids makes the first 12 visible. The binary
        shard export built on the same ids is round-trip-tested in
        tests/test_pipeline_ops.py."""
        ids = curation.tokenize_ids(_docs(spark, sf_dir), vocab_size=32768)
        csv = F.concat_ws(",", F.transform("ids", lambda i: i.cast("string")))
        return ids.select(
            "doc_id",
            F.size("ids").alias("n_ids"),
            F.concat_ws(
                ",", F.transform(F.slice("ids", 1, 12), lambda i: i.cast("string"))
            ).alias("head_ids"),
            F.md5(csv).alias("ids_md5"),
        )

    q["train_token_ids"] = train_token_ids

    def rag_chunk_windows(spark, sf_dir):
        """Overlapping sliding-window chunking (curation.chunk_windows)
        — the retrieval/RAG feed: 64-piece windows at stride 48
        (overlap 16) over the GPT-2 pre-tokenizer piece stream, final
        fully-contained tails suppressed, chunk text = pieces joined
        by single spaces. Pure scan projection (explode of an integer
        sequence + slice), zero shuffle. chunk_text pinned by md5 +
        a 40-char head."""
        ch = curation.chunk_windows(
            _docs(spark, sf_dir), chunk_tokens=64, overlap=16
        )
        return ch.select(
            "doc_id", "chunk", "start_tok", "n_tokens",
            F.substring("chunk_text", 1, 40).alias("head"),
            F.md5("chunk_text").alias("text_md5"),
        )

    q["rag_chunk_windows"] = rag_chunk_windows

    def train_split(spark, sf_dir):
        """Deterministic, membership-stable train/val/test hash split
        (curation.split_corpus, 75/12.5/12.5 — binary-exact cumulative
        thresholds so the band compare is bit-identical across
        engines): one codegen'd projection, no shuffle; adding docs
        later never moves existing docs between splits."""
        return curation.split_corpus(
            _docs(spark, sf_dir).select("doc_id"),
            {"train": 0.75, "val": 0.125, "test": 0.125},
        )

    q["train_split"] = train_split

    def train_split_decon(spark, sf_dir):
        """Split + eval scrub-back (curation.split_decontaminated)
        over documents ∪ exact copies of every 50th doc: a copy and
        its original hash to independent splits, so train-side copies
        of val/test docs exist and get flagged tainted — the leak the
        scrub-back is for. Heldout shingle index broadcasts; the train
        side never shuffles on content."""
        return curation.split_decontaminated(
            _aug_exact(_docs(spark, sf_dir)).select("doc_id", "text"),
            {"train": 0.75, "val": 0.125, "test": 0.125},
        )

    q["train_split_decon"] = train_split_decon

    def train_split_cluster_safe(spark, sf_dir):
        """Leakage-safe split (curation.split_cluster_safe): documents
        split by their near-dup cluster REP's hash (min-label
        components over MinHash-LSH pairs), so paraphrase-level dups
        can never straddle train/eval — the hole exact-shingle
        decontamination leaves open. Same near-dup-augmented corpus
        and pair parameters as dedup_clusters; components run over
        pair evidence only, never the corpus."""
        from gocrawl_spark import curation

        docs = _aug_near(_docs(spark, sf_dir))
        pairs = dedup.minhash_pairs(
            docs, num_hashes=16, k=5, bands=4, threshold=0.5
        )
        return curation.split_cluster_safe(
            docs, pairs, fracs={"train": 0.75, "val": 0.125, "test": 0.125}
        ).select("doc_id", "rep", "split")

    q["train_split_cluster_safe"] = train_split_cluster_safe

    def train_pack_tokens(spark, sf_dir):
        """Token-level sequence packing
        (curation.pack_token_sequences, L=128, 8 shards): the true GPT
        feed — fixed windows cut across document boundaries in the
        deterministic shard order, without ever exploding per token
        (per-doc chunk arithmetic + one (shard,seq) reassembly
        shuffle). Sequences pinned by md5 over the id csv; every
        window except each shard's last must be exactly L long."""
        seqs = curation.pack_token_sequences(
            _docs(spark, sf_dir), seqlen=128, n_shards=8
        )
        csv = F.concat_ws(",", F.transform("ids", lambda i: i.cast("string")))
        return seqs.select(
            "shard",
            "seq",
            F.size("ids").alias("n_ids"),
            F.md5(csv).alias("ids_md5"),
        )

    q["train_pack_tokens"] = train_pack_tokens

    def train_pack_boundaries(spark, sf_dir):
        """Packed windows with document-boundary offsets
        (curation.pack_token_sequences(boundaries=True)): each
        (shard, seq) window also reports the sorted in-window offsets
        where a new document starts — the attention-mask reset
        positions a trainer needs to stop cross-document attention in
        a packed sequence."""
        seqs = curation.pack_token_sequences(
            _docs(spark, sf_dir), seqlen=128, n_shards=8, boundaries=True
        )
        csv = F.concat_ws(",", F.transform("ids", lambda i: i.cast("string")))
        bcsv = F.concat_ws(
            ",", F.transform("doc_starts", lambda i: i.cast("string"))
        )
        return seqs.select(
            "shard",
            "seq",
            F.size("ids").alias("n_ids"),
            F.md5(csv).alias("ids_md5"),
            F.size("doc_starts").alias("n_docs"),
            bcsv.alias("doc_starts_csv"),
        )

    q["train_pack_boundaries"] = train_pack_boundaries

    def train_pack_bins(spark, sf_dir):
        """Truncation-free greedy bin packing
        (curation.pack_greedy_bins, budget=256, 8 shards): documents
        placed whole into fixed-budget bins next-fit-decreasing, so
        no document is cut by a window boundary (the Fewer-Truncations
        packing family); only docs longer than the budget pre-chunk."""
        return curation.pack_greedy_bins(
            _docs(spark, sf_dir), budget=256, n_shards=8
        )

    q["train_pack_bins"] = train_pack_bins

    def bpe_pair_counts(spark, sf_dir):
        """Initial BPE pair statistics (bpe.word_counts →
        pair_counts): adjacent character-pair counts weighted by
        corpus word frequency — iteration 0 of the distributed BPE
        trainer. Top 30 by (count DESC, lft, rgt)."""
        words = bpe.init_symbols(bpe.word_counts(_docs(spark, sf_dir)))
        return (
            bpe.pair_counts(words)
            .orderBy(F.desc("c"), "lft", "rgt")
            .limit(30)
            .select("lft", "rgt", F.col("c").alias("pair_count"))
        )

    q["bpe_pair_counts"] = bpe_pair_counts

    def bpe_train_merges(spark, sf_dir):
        """Distributed BPE tokenizer training (bpe.train, 8 merges):
        per iteration one pair-count aggregation over the distinct-
        word table, a TakeOrdered(1) argmax, and a codegen'd greedy
        array rewrite — no Python in the loop, O(distinct words) per
        merge regardless of corpus bytes."""
        return bpe.train(_docs(spark, sf_dir), n_merges=8)

    q["bpe_train_merges"] = bpe_train_merges

    def bpe_encode_corpus(spark, sf_dir):
        """Corpus encode with the trained tokenizer
        (bpe.encode_corpus): for corpus text BPE encode IS a
        vocabulary lookup — pieces equi-join the trained symbol table
        (broadcast-sized by Heaps' law), tokens map to dense vocab
        ids via a literal map; no merge loop near the data. Emits
        per-doc token count and an md5 over the id stream."""
        merges, symbols = bpe.train_state(_docs(spark, sf_dir), n_merges=8)
        ids = bpe.encode_corpus(_docs(spark, sf_dir), symbols)
        csv = F.concat_ws(",", F.transform("ids", lambda i: i.cast("string")))
        return ids.select(
            "doc_id",
            F.size("ids").alias("n_tokens"),
            F.md5(csv).alias("ids_md5"),
        )

    q["bpe_encode_corpus"] = bpe_encode_corpus

    def wp_pair_scores(spark, sf_dir):
        """WordPiece likelihood scores over the base symbol table
        (wordpiece.pair_scores): score = pair_count/(c_lft*c_rgt) —
        exact BIGINT counts, one engine-identical double division.
        Top-30 by (score DESC, lft, rgt)."""
        from gocrawl_spark import wordpiece as wp

        words = bpe.init_symbols(bpe.word_counts(_docs(spark, sf_dir)))
        return (
            wp.pair_scores(words)
            .orderBy(F.desc("score"), "lft", "rgt")
            .limit(30)
            .select("lft", "rgt", "pair_count", F.round("score", 9).alias("score"))
        )

    q["wp_pair_scores"] = wp_pair_scores

    def wp_train_merges(spark, sf_dir):
        """Distributed WordPiece training (wordpiece.train, 6 merges):
        the BPE trainer's plan (one aggregation + one codegen'd
        rewrite per merge) with the argmax swapped to the likelihood
        score — rare-but-predictive pairs merge first. Oracle unrolls
        all 6 iterations in SQL."""
        from gocrawl_spark import wordpiece as wp

        return wp.train(_docs(spark, sf_dir), n_merges=6)

    q["wp_train_merges"] = wp_train_merges

    def wp_encode_greedy(spark, sf_dir):
        """BERT WordPiece inference (wordpiece.encode_greedy): greedy
        longest-match-first over the trained vocab (base chars + one
        piece per merge), ## continuation prefixes, [UNK] collapse.
        Matcher runs once per DISTINCT word; docs reassemble by
        equi-join. Oracle follows a precomputed longest-match jump
        table through a recursive CTE."""
        from gocrawl_spark import wordpiece as wp

        docs = _docs(spark, sf_dir)
        merges, _ = wp.train_state(docs, n_merges=6)
        toks = wp.encode_greedy(docs, wp.vocab_pieces(docs, merges))
        return toks.select(
            "doc_id",
            F.size("tokens").alias("n_tokens"),
            F.concat_ws(" ", F.slice("tokens", 1, 10)).alias("head_toks"),
            F.md5(F.concat_ws(",", "tokens")).alias("toks_md5"),
        )

    q["wp_encode_greedy"] = wp_encode_greedy

    def _unigram_docs(spark, sf_dir):
        """Small-alphabet corpus for the unigram trio: words built
        from ab/cd repeats and a sliding 3-gram of 'abcdabcd', so
        substrings collide meaningfully and Viterbi has real
        segmentation choices."""
        return _docs(spark, sf_dir).select(
            "doc_id",
            F.expr(
                "concat(repeat('ab', int(1 + doc_id % 3)), ' ',"
                " repeat('cd', int(1 + (doc_id DIV 3) % 2)), 'x ',"
                " substring('abcdabcd', int(1 + doc_id % 4), 3))"
            ).alias("text"),
        )

    def unigram_seed_vocab(spark, sf_dir):
        """SentencePiece-unigram seed vocabulary (unigram.seed_vocab):
        overlap-counted substrings ≤4 chars, all singles kept for
        coverage, top multis by (count, piece), scores round(ln(c/C),6)
        — pure codegen, one groupBy."""
        from gocrawl_spark import unigram as ug

        return ug.seed_vocab(
            _unigram_docs(spark, sf_dir), vocab_size=12, max_piece_len=4
        )

    q["unigram_seed_vocab"] = unigram_seed_vocab

    def unigram_encode_viterbi(spark, sf_dir):
        """Unigram Viterbi encode (unigram.encode_viterbi): max-score
        segmentation per DISTINCT word under the seed scores, ties to
        the longer final piece; docs reassemble by equi-join. Oracle
        enumerates every segmentation through a recursive CTE and
        arg-maxes (score, reversed-length-sequence) — the exact
        enumeration twin of the DP."""
        from gocrawl_spark import unigram as ug

        docs = _unigram_docs(spark, sf_dir)
        toks = ug.encode_viterbi(
            docs, ug.seed_vocab(docs, vocab_size=12, max_piece_len=4)
        )
        return toks.select(
            "doc_id",
            F.size("tokens").alias("n_tokens"),
            F.concat_ws(" ", F.slice("tokens", 1, 10)).alias("head_toks"),
            F.md5(F.concat_ws(",", "tokens")).alias("toks_md5"),
        )

    q["unigram_encode_viterbi"] = unigram_encode_viterbi

    def unigram_em_step(spark, sf_dir):
        """One hard-EM round (unigram.em_step): Viterbi usage counts
        under the seed vocab, re-scored; pieces the Viterbi never
        picks drop out — the pruning dynamic of the full trainer in
        one auditable sweep."""
        from gocrawl_spark import unigram as ug

        docs = _unigram_docs(spark, sf_dir)
        return ug.em_step(
            docs, ug.seed_vocab(docs, vocab_size=12, max_piece_len=4)
        )

    q["unigram_em_step"] = unigram_em_step

    def bpe_fertility(spark, sf_dir):
        """Tokenizer fertility by language: tokens-per-word and
        chars-per-token under the trained BPE — the standard
        tokenizer-quality report. One corpus scan exploding pieces,
        broadcast join against the Heaps-small symbol table, tiny
        per-language aggregate."""
        docs = _docs(spark, sf_dir)
        _, symbols = bpe.train_state(docs, n_merges=8)
        pieces = F.regexp_extract_all(
            F.col("text"), F.lit(f"({textstats.BPE_ISH_PATTERN})"), 1
        )
        wl = docs.select("lang", F.explode(pieces).alias("word"))
        j = wl.join(symbols.select("word", "syms"), "word")
        return (
            j.groupBy("lang")
            .agg(
                F.count("*").alias("n_words"),
                F.sum(F.size("syms")).alias("n_tokens"),
                F.sum(F.length("word")).alias("n_chars"),
            )
            .select(
                "lang",
                "n_words",
                "n_tokens",
                "n_chars",
                F.round(F.col("n_tokens") / F.col("n_words"), 6).alias(
                    "fertility"
                ),
                F.round(F.col("n_chars") / F.col("n_tokens"), 6).alias(
                    "chars_per_token"
                ),
            )
        )

    q["bpe_fertility"] = bpe_fertility

    def dedup_substring_spans(spark, sf_dir):
        """ExactSubstr-style duplicated-span detection
        (dedup.substring_spans, the window-hash form of Lee et al.
        2021): every fourth doc gets a shared 13-word boilerplate tail,
        so its 8-word windows collide across documents and merge into
        one long span (max_span_words = 13 for pure-tail dups; longer
        where the random prefix happens to collide too). One md5-keyed
        shuffle finds duplicated windows; never a doc×doc join."""
        d = F.col("doc_id")
        aug = F.when(
            d % 4 == 1,
            F.concat(
                F.col("text"),
                F.lit(
                    " subscribe to our newsletter for the latest"
                    " updates and exclusive offers today"
                ),
            ),
        ).otherwise(F.col("text"))
        docs = _docs(spark, sf_dir).select("doc_id", aug.alias("text"))
        return dedup.substring_spans(docs, k=8)

    q["dedup_substring_spans"] = dedup_substring_spans

    def text_lm_ppl(spark, sf_dir):
        """CCNet-style bigram-LM perplexity (textstats.lm_perplexity):
        the LM is trained distributively on the corpus itself
        (lm_bigram_counts — two partial-agged count shuffles), then
        each doc's position-ordered log-prob fold scores it. The fold
        is a sequential F.aggregate over array_sort'ed (pos, logp)
        structs, so the floating sum is bit-stable across engines and
        parallelism — the oracle mirrors it with list_reduce over a
        pos-ordered list."""
        return textstats.lm_perplexity(_docs(spark, sf_dir))

    q["text_lm_ppl"] = text_lm_ppl

    def text_lm_kn_ppl(spark, sf_dir):
        """Interpolated Kneser-Ney bigram perplexity
        (textstats.lm_kn_perplexity): the KenLM-family smoothing CCNet
        ships, next to the add-α twin — absolute-discount seen mass
        plus continuation-probability backoff from distinct-type
        counts, every join vocab-sized, the same position-ordered
        bit-stable per-doc fold as text_lm_ppl."""
        return textstats.lm_kn_perplexity(_docs(spark, sf_dir))

    q["text_lm_kn_ppl"] = text_lm_kn_ppl

    def text_lm_moore_lewis(spark, sf_dir):
        """Moore-Lewis cross-entropy-difference selection
        (textstats.lm_moore_lewis): H_in − H_out under two KN bigram
        LMs — in-domain = the corpus's en slice, out-of-domain = the
        whole corpus. Off-slice docs exercise the KN unseen-context
        backoff cross-engine; two transitions passes + vocab joins +
        one #docs-row id join."""
        docs = _docs(spark, sf_dir)
        return textstats.lm_moore_lewis(
            docs, docs.filter(F.col("lang") == "en")
        )

    q["text_lm_moore_lewis"] = text_lm_moore_lewis

    def text_lm_kn3_ppl(spark, sf_dir):
        """Trigram interpolated Kneser-Ney perplexity
        (textstats.lm_kn3_perplexity): the full Chen & Goodman
        recursion — discounted trigram mass backing off through
        continuation-count bigram estimates to the add-1 continuation
        unigram; every join a type-table aggregate, same bit-stable
        position-ordered fold."""
        return textstats.lm_kn3_perplexity(_docs(spark, sf_dir))

    q["text_lm_kn3_ppl"] = text_lm_kn3_ppl

    def text_lm_buckets(spark, sf_dir):
        """CCNet head/middle/tail (textstats.lm_buckets): per-language
        exact tertile split by bigram-LM perplexity, ties broken by
        doc_id. The scale twin lm_buckets_approx (quantile thresholds,
        no per-group sort) is pinned equal-on-this-corpus by pytest."""
        return textstats.lm_buckets(_docs(spark, sf_dir))

    q["text_lm_buckets"] = text_lm_buckets

    def train_shuffle_shards(spark, sf_dir):
        """Deterministic training-shard shuffle (curation.
        shuffle_shards): shard = md5(id:seed) high bits mod 8, pos =
        rank by (key, id) within the shard — the same permutation at
        any parallelism or engine. write_training_shards is the
        rank-free delivery path."""
        return curation.shuffle_shards(_docs(spark, sf_dir), 8).select(
            "doc_id", "shard", "pos"
        )

    q["train_shuffle_shards"] = train_shuffle_shards

    def train_pack_sequences(spark, sf_dir):
        """GPT-style sequence packing plan (curation.pack_sequences):
        concatenate each shard's documents in shuffle order, cut the
        token stream at a 512-token budget; each doc reports the
        sequence index and offset where it starts. Per-shard window
        cumsum — no global ordering bottleneck."""
        return curation.pack_sequences(
            _docs(spark, sf_dir), budget=512, n_shards=8
        )

    q["train_pack_sequences"] = train_pack_sequences

    def train_fim(spark, sf_dir):
        """Fill-in-the-middle transform (curation.fim_transform,
        Bavarian et al. 2022): every 2nd doc reordered to
        PSM/SPM with sentinel tokens, split points from deterministic
        id arithmetic — one codegen'd projection, zero shuffle."""
        return curation.fim_transform(_docs(spark, sf_dir))

    q["train_fim"] = train_fim

    def curate_blocklist(spark, sf_dir):
        """UT1-style domain blocklist (curation.blocklist_filter, the
        RefinedWeb adult/malware cut): synthetic per-doc URLs, a
        2-domain blocklist DataFrame; suffix-label matching blocks the
        domain and every subdomain. Suffixes explode over DISTINCT
        hosts only; the corpus anti-joins the (tiny) blocked-host
        table."""
        d = F.col("doc_id")
        docs = _docs(spark, sf_dir).select(
            "doc_id",
            F.concat(
                F.lit("https://w"), (d % 5).cast("string"),
                F.lit(".dom"), (d % 9).cast("string"),
                F.lit(".com/p/"), d.cast("string"),
            ).alias("url"),
        )
        bl = spark.createDataFrame([("dom3.com",), ("w2.dom5.com",)], "domain string")
        return curation.blocklist_filter(docs, bl)

    q["curate_blocklist"] = curate_blocklist

    def dedup_url_aliases(spark, sf_dir):
        """Heritrix-style URL canonicalization for frontier dedup
        (canonicalize.normalize_url_expr): four alias spellings per
        target page — case, default port, fragment, tracking params —
        collapse to one normalized URL; groups report alias count and
        canonical (min) doc. One scan projection + one groupBy on the
        normalized string."""
        d = F.col("doc_id")
        g = (d / 4).cast("long")
        base = F.concat(
            F.lit("w.site"), (g % 10).cast("string"), F.lit(".com/p/"),
            g.cast("string"),
        )
        url = (
            F.when(d % 4 == 0, F.concat(F.lit("https://"), base))
            .when(d % 4 == 1, F.concat(F.lit("HTTPS://"), F.upper(base), F.lit("#frag")))
            .when(d % 4 == 2, F.concat(F.lit("https://"), base, F.lit("?utm_source=feed&fbclid=xyz")))
            .otherwise(F.concat(F.lit("https://"), base, F.lit("?utm_campaign=a&ref=home#top")))
        )
        # the :443 default-port alias needs the host/path split
        url = F.when(
            d % 4 == 1,
            F.concat(
                F.lit("HTTPS://W.SITE"), (g % 10).cast("string"),
                F.lit(".COM:443/p/"), g.cast("string"), F.lit("#frag"),
            ),
        ).otherwise(url)
        from gocrawl_spark.canonicalize import normalize_url_expr

        docs = _docs(spark, sf_dir).select("doc_id", url.alias("url"))
        return (
            docs.select("doc_id", normalize_url_expr("url").alias("norm_url"))
            .groupBy("norm_url")
            .agg(
                F.count("*").alias("n_aliases"),
                F.min("doc_id").alias("canonical_doc"),
            )
        )

    q["dedup_url_aliases"] = dedup_url_aliases

    def text_c4_clean(spark, sf_dir):
        """The published C4 recipe (textstats.c4_clean/c4_page_keep):
        deterministic multi-line pages exercise every rule — a line
        dies for missing terminal punctuation, <5 words, or
        'javascript'; a page dies for 'lorem ipsum', a curly brace, or
        <3 sentences after cleaning. Pure codegen'd expressions in the
        scan projection; zero shuffles."""
        d = F.col("doc_id")
        aug = F.concat(
            F.lit("This sentence has enough words right here.\n"),
            F.substring("text", 1, 60),
            F.when(
                d % 3 == 0, F.lit("\nEnable javascript to view this page now.")
            ).otherwise(F.lit("")),
            F.when(d % 5 == 0, F.lit("\nShort line.")).otherwise(F.lit("")),
            F.lit("\nAnother fine sentence appears right here today!"),
            F.when(
                d % 7 == 2,
                F.lit("\nlorem ipsum dolor sit amet consectetur adipiscing."),
            ).otherwise(F.lit("")),
            F.when(d % 11 == 5, F.lit("\nconst x = {a: 1};")).otherwise(F.lit("")),
            F.when(
                d % 2 == 0,
                F.lit("\nAnd a third good sentence lands right here too."),
            ).otherwise(F.lit("")),
        )
        docs = _docs(spark, sf_dir).select("doc_id", aug.alias("text"))
        st = textstats.c4_clean("text")
        return docs.select(
            "doc_id",
            st["text"].alias("clean"),
            st["n_lines"].alias("n_lines"),
            st["n_kept"].alias("n_kept"),
            textstats.c4_page_keep("text", st["text"]).alias("keep_page"),
        )

    q["text_c4_clean"] = text_c4_clean

    def corpus_mixture(spark, sf_dir):
        """Training-mix planning report: docs, token budget, and token
        share per (lang, source) stratum — the table a mixture
        rebalance (curation.sample_stratified) is tuned against. One
        scan, one partial-agged shuffle; share = stratum tokens over a
        scalar total (computed in-plan, no driver hop)."""
        from pyspark.sql import Window as W

        d = _docs(spark, sf_dir).select(
            "lang", "source", textstats.token_count("text").alias("t")
        )
        agg = d.groupBy("lang", "source").agg(
            F.count("*").alias("n_docs"), F.sum("t").alias("n_tokens")
        )
        total = W.partitionBy()
        return agg.select(
            "lang", "source", "n_docs", "n_tokens",
            F.round(F.col("n_tokens") / F.sum("n_tokens").over(total), 6).alias(
                "token_share"
            ),
        )

    q["corpus_mixture"] = corpus_mixture

    def decontaminate(spark, sf_dir):
        """Test-set decontamination (dedup.contamination): benchmark =
        10-word excerpts of every 50th document; flag every corpus doc
        sharing a verbatim 8-gram with a benchmark item. One broadcast
        equi-join on the shingle — the corpus side never shuffles."""
        docs = _docs(spark, sf_dir).select("doc_id", "text")
        bench = docs.filter(F.col("doc_id") % 50 == 10).select(
            F.col("doc_id").alias("bench_id"),
            F.array_join(
                F.slice(textstats.norm_words("text"), 3, 10), " "
            ).alias("bench_text"),
        )
        return dedup.contamination(docs, bench, k=8)

    q["decontaminate"] = decontaminate

    def decontaminate_bloom(spark, sf_dir):
        """Bloom-gated decontamination (dedup.contamination_bloom):
        the heldout shingles build a SHARDED (shard, bits) Bloom — the
        frontier's own machinery over sha256(shingle) — and only
        Bloom-positive corpus shingles pay the exact join. No false
        negatives, so the contract (and the oracle) is EXACTLY
        decontaminate's; the plan is the one that survives a heldout
        suite too large to broadcast."""
        docs = _docs(spark, sf_dir).select("doc_id", "text")
        bench = docs.filter(F.col("doc_id") % 50 == 10).select(
            F.col("doc_id").alias("bench_id"),
            F.array_join(
                F.slice(textstats.norm_words("text"), 3, 10), " "
            ).alias("bench_text"),
        )
        return dedup.contamination_bloom(docs, bench, k=8)

    q["decontaminate_bloom"] = decontaminate_bloom

    def text_script_profile(spark, sf_dir):
        """Unicode-script profile (textstats.script_profile): per-doc
        codepoint counts across ten scripts plus the dominant script
        and its share in exact integer basis points — the multilingual
        router / mixed-script-spam gate. Fixture appends Cyrillic /
        Han / Hiragana runs (long enough to flip dominance on half the
        docs); Java \\p{IsX} and RE2 \\p{X} agree codepoint-for-
        codepoint, so every column is engine-exact."""
        d = F.col("doc_id")
        rep = F.when(d % 8 >= 4, F.lit(30)).otherwise(F.lit(1))
        snip = (
            F.when(d % 4 == 0, F.lit(" Привет мир культура слово"))
            .when(d % 4 == 1, F.lit(" 你好世界 汉字很多"))
            .when(d % 4 == 2, F.lit(" こんにちは ありがとう"))
            .otherwise(F.lit(""))
        )
        aug = F.concat(F.col("text"), F.repeat(snip, rep))
        prof = textstats.script_profile(aug)
        return _docs(spark, sf_dir).select(
            "doc_id", *[c.alias(n) for n, c in prof.items()]
        )

    q["text_script_profile"] = text_script_profile

    def text_collocations(spark, sf_dir):
        """Top-25 PMI bigram collocations with a support-5 floor
        (textstats.collocations): exact DECIMAL products, one double
        division, one ln — the multi-word-entity / boilerplate-phrase
        report. Two partial-agged shuffles; the corpus scans once."""
        return textstats.collocations(
            _docs(spark, sf_dir), min_count=5, k=25
        )

    q["text_collocations"] = text_collocations

    def search_term_suggest(spark, sf_dir):
        """ES term suggester / did-you-mean (search.term_suggest):
        misspelled query terms get vocabulary corrections scored
        1 − d/max(len) (plain Levenshtein, the fuzzy_expansions
        divergence contract), (score DESC, freq DESC, term ASC),
        suggest_mode=missing so in-vocabulary terms stay quiet. The
        prefix + length-band equi-join prunes the vocab before any
        distance is computed."""
        return search.term_suggest(
            _docs(spark, sf_dir),
            "windoq batchs spark",
            text_col="text",
            size=3,
        )

    q["search_term_suggest"] = search_term_suggest

    def sitemap_parse(spark, sf_dir):
        """Sitemap XML parser (sitemap.sitemap_entries) against an
        independent SQL reconstruction: one synthetic urlset per doc
        with both W3C lastmod forms (date-only and full timestamp);
        the oracle recomputes the expected (loc, lastmod) rows without
        parsing XML at all."""
        from gocrawl_spark import sitemap as sm

        d = F.col("doc_id")
        dd = F.lpad(((d % 28) + 1).cast("string"), 2, "0")
        lastmod = F.when(
            d % 2 == 0, F.concat(F.lit("2026-01-"), dd)
        ).otherwise(F.concat(F.lit("2026-02-"), dd, F.lit("T08:30:45Z")))
        xml = F.concat(
            F.lit("<urlset><url><loc>https://sm.example.com/doc/"),
            d.cast("string"),
            F.lit("</loc><lastmod>"), lastmod, F.lit("</lastmod></url></urlset>"),
        )
        src = _docs(spark, sf_dir).select(
            d.cast("string").alias("sitemap_url"), xml.alias("xml")
        )
        return sm.sitemap_entries(src).select(
            F.col("sitemap_url").cast("long").alias("doc_id"), "loc", "lastmod"
        )

    q["sitemap_parse"] = sitemap_parse

    def feed_parse(spark, sf_dir):
        """RSS/Atom feed parser (feeds.feed_entries) against an
        independent SQL reconstruction: even doc_ids carry an RSS 2.0
        item (RFC-822 pubDate), odd doc_ids an Atom entry (RFC-3339
        updated, href attribute link) — the oracle recomputes the
        expected (link, title, published, kind) rows from the same
        doc_id arithmetic without parsing any XML."""
        from gocrawl_spark import feeds as fd

        d = F.col("doc_id")
        ds = d.cast("string")
        dd = F.lpad(((d % 28) + 1).cast("string"), 2, "0")
        rss = F.concat(
            F.lit("<rss version=\"2.0\"><channel><item><title>doc "), ds,
            F.lit("</title><link>https://feed.example.com/p/"), ds,
            F.lit("</link><pubDate>Mon, "), dd,
            F.lit(" Jan 2026 08:30:45 GMT</pubDate></item></channel></rss>"),
        )
        atom = F.concat(
            F.lit("<feed><entry><title>doc "), ds,
            F.lit("</title><link href=\"https://feed.example.com/p/"), ds,
            F.lit("\"/><updated>2026-02-"), dd,
            F.lit("T08:30:45Z</updated></entry></feed>"),
        )
        src = _docs(spark, sf_dir).select(
            ds.alias("feed_url"),
            F.when(d % 2 == 0, rss).otherwise(atom).alias("xml"),
        )
        return fd.feed_entries(src).select(
            F.col("feed_url").cast("long").alias("doc_id"),
            "link", "title", "published", "kind",
        )

    q["feed_parse"] = feed_parse

    def feed_poll_schedule(spark, sf_dir):
        """Adaptive feed polling (feeds.poll_intervals): per-feed
        lower-median inter-entry gap in integer seconds, clamped —
        feeds = event users, publishes = their click timestamps. All
        integer epoch-µs math (value-sorted list, element-pick median,
        DIV), so the DuckDB twin is exact."""
        from gocrawl_spark import feeds as fd

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        entries = ev.filter(F.col("event_type") == "click").select(
            F.concat(F.lit("feed-"), F.col("user_id").cast("string")).alias(
                "feed_url"
            ),
            F.col("ts").alias("published"),
        )
        return fd.poll_intervals(entries, min_s=30000, max_s=400000)

    q["feed_poll_schedule"] = feed_poll_schedule

    def crawl_aimd_delays(spark, sf_dir):
        """AIMD per-host politeness adaptation (frontier.aimd_delays):
        hosts = event users mod 64, outcomes = non-error events in ts
        order; success shaves 100 ms off the delay (floor 100),
        failure doubles it (cap 60 s). All-LONG fold over the value-
        sorted outcome sequence — the DuckDB twin replays the same
        list_reduce."""
        from gocrawl_spark import frontier as fr

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        outcomes = ev.select(
            F.concat(F.lit("h"), (F.col("user_id") % 64).cast("string")).alias(
                "host"
            ),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            (F.col("event_type") != "error").alias("ok"),
        )
        return fr.aimd_delays(
            outcomes,
            base_delay_ms=500,
            min_delay_ms=100,
            max_delay_ms=60_000,
            dec_ms=100,
        )

    q["crawl_aimd_delays"] = crawl_aimd_delays

    def corpus_overlap_minhash(spark, sf_dir):
        """Corpus-pair shingle overlap (corpusstats.corpus_overlap):
        corpus A = docs with doc_id % 3 != 0, B = doc_id % 5 != 1 —
        overlapping splits of the same table, so true Jaccard is high
        and the 64-permutation MinHash estimate has signal. exact=True
        adds the true distinct-shingle Jaccard (integer ppm); the
        oracle recomputes sketch AND exact from the same md5 formulas."""
        from gocrawl_spark import corpusstats

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        a = docs.filter(F.col("doc_id") % 3 != 0)
        b = docs.filter(F.col("doc_id") % 5 != 1)
        return corpusstats.corpus_overlap(a, b, num_hashes=64, k=5, exact=True)

    q["corpus_overlap_minhash"] = corpus_overlap_minhash

    def emb_pca_cov(spark, sf_dir):
        """Distributed integer covariance (similarity.pca_covariance):
        vectors quantize to the 10⁴ grid, and the full dim×dim matrix
        of exact LONG numerators n·Σqᵢqⱼ − Σqᵢ·Σqⱼ comes out of ONE
        map-side-combining pass (≤ dim² rows shipped per task). All
        integer, so the oracle equality is exact, not rounded."""
        return similarity.pca_covariance(_emb(spark, sf_dir))

    q["emb_pca_cov"] = emb_pca_cov

    def emb_pca_power(spark, sf_dir):
        """Top-principal-component projection (similarity.
        pca_power_component + pca_project): 6 power sweeps over the
        integer covariance matrix with per-sweep max-normalization and
        ITER_DIGITS rounding (the graphrank determinism scheme),
        sign-fixed, then every vector's pc1 coordinate as a j-ordered
        fold. The oracle unrolls the identical 6 sweeps in SQL."""
        emb = _emb(spark, sf_dir)
        cov = similarity.pca_covariance(emb)
        axis = similarity.pca_power_component(cov, sweeps=6)
        return similarity.pca_project(emb, axis)

    q["emb_pca_power"] = emb_pca_power

    # -- scalar extraction ops that are SQL-expressible (E5, E11, V6) ------
    def clean_text_e5(spark, sf_dir):
        dirty = F.concat(
            F.col("text"),
            F.lit(
                " <script>var x=1;</script> tail function  (a,b) {return a}"
                " document.addEventListener('x', y) QuerySelector(z) end"
            ),
        )
        # the same regexp chain as extract.clean_text (Java and RE2 agree
        # on every pattern used; Go \s == [\t\n\f\r ])
        c = dirty
        for pat in [
            r"(?i)<script[^>]*>.*?</script>",
            r"(?i)document\.addEventListener[^)]*\)",
            r"(?i)function[\t\n\f\r ]*\([^)]*\)[\t\n\f\r ]*\{[^}]*\}",
            r"(?i)\.replaceWith\([^)]*\)",
            r"(?i)\.cloneNode\([^)]*\)",
            r"(?i)template\.content",
            r"(?i)\.dataset\.[a-zA-Z]+",
            r"(?i)\.parentElement",
            r"(?i)getElementById\([^)]*\)",
            r"(?i)querySelector\([^)]*\)",
        ]:
            c = F.regexp_replace(c, pat, "")
        c = F.trim(F.regexp_replace(F.regexp_replace(c, r"[\t\n\f\r ]+", " "), r"\n{3,}", "\n\n"))
        return _docs(spark, sf_dir).select("doc_id", c.alias("cleaned"))

    q["clean_text_e5"] = clean_text_e5

    def generate_id_e11(spark, sf_dir):
        url = F.concat(F.lit("https://example.com/doc/"), F.col("doc_id").cast("string"))
        return _docs(spark, sf_dir).select(
            "doc_id", F.sha2(url, 256).alias("id_sha")
        )

    q["generate_id_e11"] = generate_id_e11

    def word_count_v6(spark, sf_dir):
        html_ish = F.concat(F.lit("<p>"), F.col("text"), F.lit("</p> <b>x</b>"))
        stripped = F.regexp_replace(html_ish, r"<[^>]*>", " ")
        wc = F.size(F.filter(F.split(F.trim(stripped), r"[\t\n\f\r ]+"), lambda x: x != F.lit("")))
        return _docs(spark, sf_dir).select("doc_id", wc.alias("word_count"))

    q["word_count_v6"] = word_count_v6

    def validate_length_v4(spark, sf_dir):
        return (
            _docs(spark, sf_dir)
            .filter(F.length("text").between(100, 100000))
            .groupBy("source")
            .agg(F.count("*").alias("n_valid"))
        )

    q["validate_length_v4"] = validate_length_v4

    def curate_corpus(spark, sf_dir):
        """End-to-end curation pipeline (language-ID → quality gate →
        exact-dedup survivors) over the corpus with injected exact
        duplicates — the per-shard training-data pass, one scan + one
        content-hash shuffle (curation.py)."""
        from gocrawl_spark import curation

        return curation.curate(
            _aug_exact(_docs(spark, sf_dir)), langs=("en",), min_quality=0.5
        )

    q["curate_corpus"] = curate_corpus

    def curate_corpus_neardup(spark, sf_dir):
        """Curation with the near-dup end-game chained on: language-ID
        → quality gate → exact-dedup survivors → MinHash-LSH pairs →
        connected components → canonical-only (curation.curate with
        near_dup=...), over the corpus with injected near-duplicates."""
        from gocrawl_spark import curation

        return curation.curate(
            _aug_near(_docs(spark, sf_dir)),
            langs=("en",),
            min_quality=0.5,
            near_dup={"num_hashes": 16, "k": 5, "bands": 4, "threshold": 0.5},
        )

    q["curate_corpus_neardup"] = curate_corpus_neardup

    def corpus_diff(spark, sf_dir):
        """Snapshot diff (curation.diff_corpus — the incremental-ingest
        primitive behind scheduler.generation_diff): old snapshot drops
        doc_id%11==3, new snapshot drops doc_id%13==4 and revises
        doc_id%7==0; diff classifies every id added/removed/changed/
        unchanged by content hash. Content never shuffles — only (key,
        md5) rows reach the full-outer join."""
        from gocrawl_spark import curation

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        old = docs.filter(F.col("doc_id") % 11 != 3)
        new = docs.filter(F.col("doc_id") % 13 != 4).select(
            "doc_id",
            F.when(
                F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v2"))
            ).otherwise(F.col("text")).alias("text"),
        )
        return curation.diff_corpus(old, new)

    q["corpus_diff"] = corpus_diff

    def link_rank_pagerank(spark, sf_dir):
        """Frontier-prioritization signal: damped PageRank (3 fixed
        sweeps, d=0.85) over the corpus link graph — one shuffle per
        sweep, per-sweep rounding pins the fixpoint across engines and
        parallelism (graphrank.py; edge formula = synth.link_targets,
        what extraction recovers from the built HTML)."""
        from gocrawl_spark import graphrank

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n = docs.count()
        return (
            graphrank.link_rank(graphrank.doc_edges(docs, n), iters=3, damping=0.85)
            .select(F.col("node").alias("doc_id"), "rank")
        )

    q["link_rank_pagerank"] = link_rank_pagerank

    def link_rank_hits(spark, sf_dir):
        """Hub/authority scores (graphrank.hits, 3 sweeps) over the
        same corpus link graph — the seed-curation complement to
        PageRank (hubs = discovery pages to re-crawl, authorities =
        link-endorsed content). Max-normalized per half-sweep so the
        fixpoint is order-independent; one shuffle per half-sweep."""
        from gocrawl_spark import graphrank

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n = docs.count()
        return graphrank.hits(graphrank.doc_edges(docs, n), iters=3).select(
            F.col("node").alias("doc_id"), "hub", "auth"
        )

    q["link_rank_hits"] = link_rank_hits

    def link_rank_trust(spark, sf_dir):
        """TrustRank (graphrank.trust_rank, 3 sweeps, d=0.85):
        personalized PageRank whose teleport mass goes only to a
        trusted whitelist (every 40th doc) — the anti-spam crawl
        prioritization signal; link-farm islands unreachable from the
        whitelist score 0. Broadcast seed join + one shuffle/sweep."""
        from gocrawl_spark import graphrank

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n = docs.count()
        trusted = docs.filter(F.col("doc_id") % 40 == 0).select(
            F.col("doc_id").alias("node")
        )
        return graphrank.trust_rank(
            graphrank.doc_edges(docs, n), trusted, iters=3, damping=0.85
        ).select(F.col("node").alias("doc_id"), "trust")

    q["link_rank_trust"] = link_rank_trust

    def crawl_host_graph(spark, sf_dir):
        """Host-level contraction of the URL link graph
        (graphrank.host_graph): cross-host edges rolled up to
        (src_host, dst_host, weight, n_src_pages), self-loops dropped
        — what domain-granularity ranking and crawl-budget allocation
        run on. One groupBy on the host pair."""
        from gocrawl_spark import graphrank

        docs = _docs(spark, sf_dir)
        n = docs.count()

        def host(c):
            hi = F.when(c % 4 == 0, F.lit(0)).otherwise(c % 15 + 1)
            return F.concat(
                F.lit("site"), F.lpad(hi.cast("string"), 2, "0"),
                F.lit(".example.com"),
            )

        e = graphrank.doc_edges(docs, n).select(
            "src", "dst",
            host(F.col("src")).alias("src_host"),
            host(F.col("dst")).alias("dst_host"),
        )
        return graphrank.host_graph(e)

    q["crawl_host_graph"] = crawl_host_graph

    def crawl_host_communities(spark, sf_dir):
        """Weighted label-propagation communities over the host graph
        (graphrank.label_propagation, Raghavan et al. 2007): 3
        synchronous sweeps, votes summed in exact LONGs, argmax ties
        broken by label — deterministic at any parallelism. Surfaces
        link farms / mirror networks as domain communities."""
        from gocrawl_spark import graphrank

        docs = _docs(spark, sf_dir)
        n = docs.count()

        def host(c):
            hi = F.when(c % 4 == 0, F.lit(0)).otherwise(c % 15 + 1)
            return F.concat(
                F.lit("site"), F.lpad(hi.cast("string"), 2, "0"),
                F.lit(".example.com"),
            )

        e = graphrank.doc_edges(docs, n).select(
            "src", "dst",
            host(F.col("src")).alias("src_host"),
            host(F.col("dst")).alias("dst_host"),
        )
        return graphrank.label_propagation(graphrank.host_graph(e), iters=3)

    q["crawl_host_communities"] = crawl_host_communities

    def crawl_hyperball(spark, sf_dir):
        """HyperBall neighborhood function (graphrank.hyperball, Boldi
        & Vigna 2013): per (node, r ≤ 3), the HLL estimate of the
        out-ball {u : dist(v,u) ≤ r} — registers are the corpusstats
        md5/bit-length integer scheme, grown one hop per sweep by a
        single (node, bucket)-keyed max-merge shuffle, estimates the
        exact-DECIMAL harmonic sum. State is ≤ nodes × 2^p LONG rows,
        which is why this runs on 10^10-node graphs."""
        from gocrawl_spark import graphrank

        docs = _docs(spark, sf_dir)
        n = docs.count()
        return graphrank.hyperball(graphrank.doc_edges(docs, n), radius=3, p=8)

    q["crawl_hyperball"] = crawl_hyperball

    def crawl_harmonic(spark, sf_dir):
        """Harmonic centrality from the HyperBall growth curve
        (graphrank.harmonic_centrality): Σ_r (N_r − N_{r−1})/r in
        exact integer micro-units — the 6dp estimates lift onto the
        10⁶ grid and the 1/r discounts become an lcm-weighted LONG
        sum, so the value is engine-exact (a float fold of /2 deltas
        sits on 7th-digit rounding ties). The web-graph centrality
        that needs no dangling-mass hacks."""
        from gocrawl_spark import graphrank

        docs = _docs(spark, sf_dir)
        n = docs.count()
        anf = graphrank.hyperball(graphrank.doc_edges(docs, n), radius=3, p=8)
        return graphrank.harmonic_centrality(anf, 3)

    q["crawl_harmonic"] = crawl_harmonic

    def crawl_kcore(spark, sf_dir):
        """k-core decomposition by h-index iteration
        (graphrank.core_numbers, Lü et al. 2016): c₀ = undirected
        degree, then 8 sweeps of c(v) ← H-index of neighbors' values —
        all-integer, one shuffle per sweep, sort-based window (no
        collected neighbor lists). The dense-subgraph / link-farm
        signal; the fixture reaches its fixpoint well inside 8 sweeps
        (test-pinned)."""
        from gocrawl_spark import graphrank

        docs = _docs(spark, sf_dir)
        n = docs.count()
        return graphrank.core_numbers(graphrank.doc_edges(docs, n), sweeps=8)

    q["crawl_kcore"] = crawl_kcore

    def crawl_robots_meta(spark, sf_dir):
        """Page-level robots directives (robots.meta_directives):
        <meta name="robots"> token parse (none implies both, case/
        whitespace-insensitive) + rel="nofollow" link census via the
        real htmlmini parse. Pages constructed deterministically from
        doc_id so the oracle recomputes the expected flags from the
        construction arithmetic — a parser-vs-spec differential."""
        from gocrawl_spark import robots as _r

        d = F.col("doc_id")
        meta = (
            F.when(d % 5 == 0, F.lit("noindex,nofollow"))
            .when(d % 5 == 1, F.lit("noindex"))
            .when(d % 5 == 2, F.lit(" NOFOLLOW "))
            .when(d % 5 == 3, F.lit("none"))
            .otherwise(F.lit("index, follow"))
        )
        a1 = F.when(
            d % 3 == 0, F.lit('<a href="https://x.com/a" rel="nofollow">x</a>')
        ).otherwise(F.lit(""))
        a3 = F.when(
            d % 2 == 0, F.lit('<a href="https://x.com/c" rel="ugc nofollow">z</a>')
        ).otherwise(F.lit(""))
        pages = _docs(spark, sf_dir).select(
            F.concat(F.lit("https://x.com/p/"), d.cast("string")).alias("url"),
            F.concat(
                F.lit('<html><head><meta name="robots" content="'), meta,
                F.lit('"></head><body>'), a1,
                F.lit('<a href="https://x.com/b">y</a>'), a3,
                F.lit("</body></html>"),
            ).alias("html"),
        )
        return _r.meta_directives(pages)

    q["crawl_robots_meta"] = crawl_robots_meta

    def crawl_budget_alloc(spark, sf_dir):
        """Proportional-fair per-host round budgets
        (frontier.allocate_budgets): weight-share of a 200-page round
        budget, floored at 2, clamped by queued frontier and a
        politeness cap of 30 — pure integer arithmetic (DIV), so the
        allocation is bit-equal at any partitioning. One O(hosts) agg
        + a broadcast one-row join."""
        from gocrawl_spark import frontier as fr

        d = F.col("doc_id")
        hi = F.when(d % 4 == 0, F.lit(0)).otherwise(d % 15 + 1)
        host = F.concat(
            F.lit("site"), F.lpad(hi.cast("string"), 2, "0"),
            F.lit(".example.com"),
        )
        stats = (
            _docs(spark, sf_dir)
            .select(host.alias("host"), d)
            .groupBy("host")
            .agg(
                F.count("*").alias("queued"),
                F.sum(d % 7 + 1).alias("weight"),
            )
        )
        return fr.allocate_budgets(
            stats, round_budget=200, politeness_cap=30, floor=2
        )

    q["crawl_budget_alloc"] = crawl_budget_alloc

    def crawl_opic_sweep(spark, sf_dir):
        """One OPIC cash-ledger sweep (graphrank.opic_sweep — the
        arithmetic CrawlRun's cfg.opic online-importance feedback
        applies per round): every 3rd node popped, its micro-unit cash
        split by integer DIV over its out-edges; un-popped nodes keep
        theirs. Exact LONG arithmetic end to end."""
        from gocrawl_spark import graphrank

        docs = _docs(spark, sf_dir)
        n = docs.count()
        edges = graphrank.doc_edges(docs, n)
        nodes = (
            edges.select(F.col("src").alias("node"))
            .unionByName(edges.select(F.col("dst").alias("node")))
            .distinct()
        )
        cash = nodes.select(
            "node",
            (F.lit(1_000_000) + F.col("node") % 7).cast("long").alias("cash_u"),
        )
        popped = nodes.filter(F.col("node") % 3 == 0)
        return graphrank.opic_sweep(edges, cash, popped).select(
            F.col("node").alias("doc_id"), "cash_u"
        )

    q["crawl_opic_sweep"] = crawl_opic_sweep

    def crawl_focused_priorities(spark, sf_dir):
        """Focused-crawl priorities (graphrank.focused_priorities):
        candidates ranked by inbound anchor-text relevance to a topic
        term set — deterministic synthetic anchors (word-ring
        arithmetic), exact LONG relevance sums, rank_priorities
        bucketing; (url, relevance carried for visibility)."""
        from gocrawl_spark import graphrank

        d = F.col("doc_id")
        w = ["spark", "table", "scan", "merge", "batch", "join",
             "query", "index"]
        word = lambda e: F.element_at(  # noqa: E731
            F.array(*[F.lit(x) for x in w]), (e % 8 + 1).cast("int")
        )
        anchor = F.concat_ws(
            " ", word(d), word(d * 3 + 1), word(d * 7 + 2)
        )
        url = F.concat(
            F.lit("https://t.example.com/p/"), (d % 50).cast("string")
        )
        pairs = _docs(spark, sf_dir).select(
            url.alias("url"), anchor.alias("anchor")
        )
        pri = graphrank.focused_priorities(pairs, ["spark", "scan"])
        # join relevance back for a richer checked surface
        toks = F.split(F.lower(F.col("anchor")), " ")
        rel = (
            pairs.select(
                "url",
                (
                    F.size(F.filter(toks, lambda x: x == F.lit("spark")))
                    + F.size(F.filter(toks, lambda x: x == F.lit("scan")))
                ).alias("_h"),
            )
            .groupBy("url")
            .agg(F.sum("_h").cast("long").alias("relevance"))
            .withColumn("url_hash", F.sha2("url", 256))
        )
        return pri.join(rel, "url_hash").select(
            "url", "relevance", "priority"
        )

    q["crawl_focused_priorities"] = crawl_focused_priorities

    def rank_priorities_p3(spark, sf_dir):
        """Rank → politeness-priority bucketing (the P3 adjunct fed to
        CrawlRun(rank_priority=...)): mean-normalized PageRank bucketed
        by fixed thresholds into the reference's int priority scale —
        one O(pages) agg for the mean, then pure map-side expressions
        (graphrank.rank_priorities)."""
        from gocrawl_spark import graphrank

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n = docs.count()
        ranks = graphrank.link_rank(
            graphrank.doc_edges(docs, n), iters=3, damping=0.85
        )
        return graphrank.rank_priorities(
            ranks.select(F.col("node").cast("string").alias("url"), "rank")
        )

    q["rank_priorities_p3"] = rank_priorities_p3

    # -- dedup --------------------------------------------------------------
    def dedup_exact(spark, sf_dir):
        return dedup.exact_dup_groups(_aug_exact(_docs(spark, sf_dir)))

    q["dedup_exact"] = dedup_exact

    def dedup_exact_survivors(spark, sf_dir):
        return dedup.exact_dedup(_aug_exact(_docs(spark, sf_dir))).select("doc_id", "source")

    q["dedup_exact_survivors"] = dedup_exact_survivors

    def dedup_minhash_lsh(spark, sf_dir):
        return dedup.minhash_pairs(
            _aug_near(_docs(spark, sf_dir)), num_hashes=16, k=5, bands=4, threshold=0.5
        )

    q["dedup_minhash_lsh"] = dedup_minhash_lsh

    def dedup_ngram_jaccard(spark, sf_dir):
        return dedup.ngram_jaccard_pairs(
            _aug_near(_docs(spark, sf_dir)), k=3, threshold=0.3
        )

    q["dedup_ngram_jaccard"] = dedup_ngram_jaccard

    def dedup_prefix_jaccard(spark, sf_dir):
        """AllPairs/PPJoin prefix filtering (dedup.prefix_filter_pairs)
        on the same fixture and threshold as dedup_ngram_jaccard: only
        the |d|-⌈t|d|⌉+1 rarest grams of each doc are indexed, so the
        candidate join touches a sliver of the full inverted index —
        losslessly (the oracle is the SAME SQL as the full join; the
        candidate-count reduction is test-pinned)."""
        return dedup.prefix_filter_pairs(
            _aug_near(_docs(spark, sf_dir)), k=3, threshold=0.3
        )

    q["dedup_prefix_jaccard"] = dedup_prefix_jaccard

    def dedup_containment(spark, sf_dir):
        """Asymmetric containment (dedup.containment_pairs): every
        20th doc gains a HALF-PREFIX copy (+2000000) — contained in
        its original with c ≈ 1 while Jaccard ≈ 0.5, the aggregator/
        quotation case the symmetric scores miss. Same single
        inverted-index plan as ngram_jaccard; both directions fall out
        of one counted pair row."""
        docs = _docs(spark, sf_dir)
        w = F.split(F.col("text"), r"\s+")
        half = F.floor((F.size(w) + F.lit(1)) / F.lit(2)).cast("int")
        prefix = docs.filter((F.col("doc_id") % 20) == 0).select(
            (F.col("doc_id") + 2000000).alias("doc_id"),
            F.array_join(F.slice(w, F.lit(1), half), " ").alias("text"),
            "lang", "source", "n_chars",
        )
        return dedup.containment_pairs(
            docs.unionByName(prefix), k=3, threshold=0.7
        )

    q["dedup_containment"] = dedup_containment

    def dedup_minhash_incremental(spark, sf_dir):
        """Incremental near-dup index (dedup.MinHashIndex): the corpus
        arrives as TWO generations (even doc_ids, then odd); each
        ingest signs only its new docs and joins their band keys
        against the persisted index. The union of per-ingest pairs
        must equal the one-shot minhash_pairs over the whole corpus —
        the oracle is literally dedup_minhash_lsh's SQL."""
        import tempfile

        docs = _aug_near(_docs(spark, sf_dir))
        idx = dedup.MinHashIndex(
            spark, tempfile.mkdtemp(prefix="mhidx_"),
            num_hashes=16, k=5, bands=4, threshold=0.5,
        )
        p1 = idx.ingest(docs.filter(F.col("doc_id") % 2 == 0))
        p2 = idx.ingest(docs.filter(F.col("doc_id") % 2 == 1))
        return p1.unionByName(p2)

    q["dedup_minhash_incremental"] = dedup_minhash_incremental

    def dedup_simhash(spark, sf_dir):  # rows-only: pandas-UDF simhash
        return dedup.simhash_pairs(_aug_near(_docs(spark, sf_dir)), max_hamming=3)

    q["dedup_simhash"] = dedup_simhash

    def dedup_clusters(spark, sf_dir):
        """Near-dup CLUSTERS: MinHash-LSH pairs collapsed to disjoint
        components via distributed min-label propagation
        (dedup.connected_components) — A~B, B~C merge even when A~C was
        never a candidate pair; canonical survivor = min doc_id."""
        pairs = dedup.minhash_pairs(
            _aug_near(_docs(spark, sf_dir)), num_hashes=16, k=5, bands=4, threshold=0.5
        )
        return dedup.dup_clusters(pairs)

    q["dedup_clusters"] = dedup_clusters

    def sample_stratified(spark, sf_dir):
        """Deterministic per-stratum Bernoulli sample over the lang
        column (curation.sample_stratified): downsample en to 25%, zh
        to 50%, keep the rest — membership is a pure hash of
        (doc_id, seed), identical at any parallelism and in DuckDB."""
        from gocrawl_spark import curation

        return curation.sample_stratified(
            _docs(spark, sf_dir).select("doc_id", "lang", "source"),
            "lang",
            {"en": 0.25, "zh": 0.5},
            default=1.0,
        )

    q["sample_stratified"] = sample_stratified

    # -- similarity search --------------------------------------------------
    def ann_brute_cosine(spark, sf_dir):
        emb = _emb(spark, sf_dir)
        return similarity.brute_topk(emb, emb.filter(F.col("vec_id") < 5), k=10)

    q["ann_brute_cosine"] = ann_brute_cosine

    def ann_sq_codes(spark, sf_dir):
        """Uniform int8 scalar quantization (similarity.sq_encode,
        FAISS ScalarQuantizer QT_8bit): per-dim (min,max) trained in
        one tiny agg, code = clamp(floor((x-vmin)*255/(vmax-vmin)+.5)).
        Codes are integers — the quantized index is bit-exact across
        engines; pinned by md5 over the csv form + first 12 visible."""
        emb = _emb(spark, sf_dir)
        stats = similarity.sq_stats(emb)
        codes = similarity.sq_encode(emb, stats)
        csv = F.concat_ws(",", F.transform("codes", lambda c: c.cast("string")))
        return codes.select(
            "vec_id",
            F.size("codes").alias("n_codes"),
            F.concat_ws(
                ",", F.transform(F.slice("codes", 1, 12), lambda c: c.cast("string"))
            ).alias("head_codes"),
            F.md5(csv).alias("codes_md5"),
        )

    q["ann_sq_codes"] = ann_sq_codes

    def ann_sq(spark, sf_dir):
        """Asymmetric scalar-quantized top-k (similarity.sq_topk):
        float queries scored by cosine against int8-RECONSTRUCTED
        corpus vectors — 4x smaller index bytes, query side never
        quantizes. Same broadcast-queries plan as ann_brute_cosine."""
        emb = _emb(spark, sf_dir)
        stats = similarity.sq_stats(emb)
        codes = similarity.sq_encode(emb, stats)
        return similarity.sq_topk(
            codes, stats, emb.filter(F.col("vec_id") < 5), k=10
        )

    q["ann_sq"] = ann_sq

    def ann_ivf(spark, sf_dir):
        """IVF probe over the PERSISTED centroid_id-partitioned index
        (similarity.ivf_write_index) — the probe join broadcasts the
        tiny probe side and dynamic partition pruning restricts the
        index scan to the probed cells (plan-pinned in
        tests/test_pipeline_ops.py)."""
        import tempfile

        emb = _emb(spark, sf_dir)
        idx = tempfile.mkdtemp(prefix="ivf_index_")
        similarity.ivf_write_index(emb, idx, n_centroids=16)
        return similarity.ivf_topk(
            emb, emb.filter(F.col("vec_id") < 5), k=10, n_centroids=16, nprobe=4,
            index_path=idx,
        )

    q["ann_ivf"] = ann_ivf

    def ann_pq(spark, sf_dir):
        """Product-quantized ADC top-k (similarity.pq_topk, IVF-PQ's
        compression half): 64 float dims → 4 codebook ints per vector;
        the scan reads codes only, each query broadcasts its 4×8
        distance table. Deterministic codebooks (corpus rows < ksub
        sliced per subspace) keep the index engine-rebuildable."""
        emb = _emb(spark, sf_dir)
        cb = similarity.pq_codebooks(emb, m=4, ksub=8)
        return similarity.pq_topk(emb, emb.filter(F.col("vec_id") < 5), cb, k=10)

    q["ann_pq"] = ann_pq

    def ann_ivf_kmeans(spark, sf_dir):
        """IVF probe over TRAINED centroids: two deterministic
        spherical-Lloyd sweeps (similarity.kmeans_centroids — seeded at
        ids<16, rounded means, empty-cell keep-previous) feed the same
        cell-probed search as ann_ivf. The oracle replays both sweeps
        unrolled in SQL."""
        emb = _emb(spark, sf_dir)
        cents = similarity.kmeans_centroids(emb, k=16, dim=64, iters=2)
        return similarity.ivf_topk(
            emb, emb.filter(F.col("vec_id") < 5), k=10, n_centroids=16,
            nprobe=4, centroids=cents,
        )

    q["ann_ivf_kmeans"] = ann_ivf_kmeans

    def ann_ivfpq(spark, sf_dir):
        """IVF-PQ over the PERSISTED index (similarity.ivfpq_topk with
        ivfpq_write_index): coarse cells prune the scan to
        nprobe/n_centroids of the corpus — partition pruning on the
        centroid_id-partitioned codes table, plan-pinned in tests —
        and PQ codes compress the rest; scored by broadcast per-query
        distance tables over the probed cells."""
        import tempfile

        emb = _emb(spark, sf_dir)
        cb = similarity.pq_codebooks(emb, m=4, ksub=8)
        idx = tempfile.mkdtemp(prefix="ivfpq_index_")
        similarity.ivfpq_write_index(emb, idx, cb, n_centroids=16)
        return similarity.ivfpq_topk(
            emb, emb.filter(F.col("vec_id") < 5), cb, k=10,
            n_centroids=16, nprobe=4, index_path=idx,
        )

    q["ann_ivfpq"] = ann_ivfpq

    def emb_dup_pairs(spark, sf_dir):
        """Embedding near-dup at scale: banded sign-LSH blocking →
        exact cosine verify on candidates only (never the O(N²) cross
        join; see tests/test_pipeline_ops.py plan assertion)."""
        return similarity.blocked_dup_pairs(
            _emb(spark, sf_dir), threshold=0.4, bands=4, planes_per_band=4, dim=64
        )

    q["emb_dup_pairs"] = emb_dup_pairs

    def emb_dup_pairs_exact(spark, sf_dir):
        """The O(N²) exactness baseline, kept as an eval-only query
        (recall yardstick for the blocked form above)."""
        return similarity.cosine_dup_pairs(_emb(spark, sf_dir), threshold=0.4)

    q["emb_dup_pairs_exact"] = emb_dup_pairs_exact

    def emb_dup_recall(spark, sf_dir):
        """Recall of the blocked near-dup vs the exact form at the
        shipped threshold: |blocked ∩ exact| / |exact|. Makes the
        banding curve VISIBLE: 4 bands × 4 planes recovers ~56% of
        pairs at the (unusually low) threshold 0.4 used by these eval
        queries, and ≈98% at realistic near-dup thresholds (≥0.9) —
        P(collision) = 1-(1-s^p)^b rises steeply with cosine
        similarity s. Raise `bands` to buy recall at low thresholds."""
        emb = _emb(spark, sf_dir)
        blocked = similarity.blocked_dup_pairs(
            emb, threshold=0.4, bands=4, planes_per_band=4, dim=64
        ).select("id_a", "id_b")
        exact = similarity.cosine_dup_pairs(emb, threshold=0.4).select("id_a", "id_b")
        n_exact = exact.agg(F.count("*").alias("n_exact"))
        n_blocked = blocked.agg(F.count("*").alias("n_blocked"))
        n_common = exact.join(blocked, ["id_a", "id_b"]).agg(
            F.count("*").alias("n_common")
        )
        return (
            n_exact.crossJoin(n_blocked)
            .crossJoin(n_common)
            .select(
                "n_exact",
                "n_blocked",
                "n_common",
                F.round(F.col("n_common") / F.col("n_exact"), 4).alias("recall"),
            )
        )

    q["emb_dup_recall"] = emb_dup_recall

    def emb_bitext_margin(spark, sf_dir):
        """Ratio-margin bitext mining (similarity.mine_bitext, the
        LASER/CCMatrix recipe) between the even-id and odd-id halves
        of the embedding table standing in for two languages: mutual
        top-1 pairs whose cosine beats the average of each side's
        4-NN neighborhood (sorted IEEE fold, round 6)."""
        emb = _emb(spark, sf_dir)
        return similarity.mine_bitext(
            emb.filter(F.col("vec_id") % 2 == 0),
            emb.filter(F.col("vec_id") % 2 == 1),
            k=4,
            margin_threshold=1.0,
        )

    q["emb_bitext_margin"] = emb_bitext_margin

    def _bitext_halves_and_candidates(spark, sf_dir):
        emb = _emb(spark, sf_dir)
        ia, ib = F.col("id_a"), F.col("id_b")
        cand_all = similarity.blocked_dup_pairs(
            emb, threshold=-1.0, bands=4, planes_per_band=4, dim=64
        )
        cand = (
            cand_all.filter((ia % 2 == 0) & (ib % 2 == 1))
            .select(ia.alias("src_id"), ib.alias("tgt_id"))
            .unionAll(
                cand_all.filter((ia % 2 == 1) & (ib % 2 == 0))
                .select(ib.alias("src_id"), ia.alias("tgt_id"))
            )
        )
        return (
            emb.filter(F.col("vec_id") % 2 == 0),
            emb.filter(F.col("vec_id") % 2 == 1),
            cand,
        )

    def emb_bitext_blocked(spark, sf_dir):
        """Scale-safe bitext mining (similarity.mine_bitext with
        candidates=): banded sign-LSH collisions across the even/odd
        halves feed the same ratio-margin scoring tail — ID-keyed
        equi-joins only, no full-side broadcast, no O(n²) pair table
        (the plan contract in tests/test_pipeline_ops.py). Margins
        average each side's available candidate neighbors (÷ actual
        count ≤ k)."""
        even, odd, cand = _bitext_halves_and_candidates(spark, sf_dir)
        return similarity.mine_bitext(
            even, odd, k=4, margin_threshold=1.0, candidates=cand
        )

    q["emb_bitext_blocked"] = emb_bitext_blocked

    def emb_bitext_recall(spark, sf_dir):
        """Recall of the candidate-blocked miner vs the exact twin at
        the shipped threshold — the emb_dup_recall pattern applied to
        bitext: |blocked ∩ exact| / |exact| over accepted (src, tgt)
        pairs, making the LSH banding trade visible."""
        even, odd, cand = _bitext_halves_and_candidates(spark, sf_dir)
        blocked = similarity.mine_bitext(
            even, odd, k=4, margin_threshold=1.0, candidates=cand
        ).select("src_id", "tgt_id")
        exact = similarity.mine_bitext(
            even, odd, k=4, margin_threshold=1.0
        ).select("src_id", "tgt_id")
        n_exact = exact.agg(F.count("*").alias("n_exact"))
        n_blocked = blocked.agg(F.count("*").alias("n_blocked"))
        n_common = exact.join(blocked, ["src_id", "tgt_id"]).agg(
            F.count("*").alias("n_common")
        )
        return (
            n_exact.crossJoin(n_blocked)
            .crossJoin(n_common)
            .select(
                "n_exact",
                "n_blocked",
                "n_common",
                F.round(F.col("n_common") / F.col("n_exact"), 4).alias("recall"),
            )
        )

    q["emb_bitext_recall"] = emb_bitext_recall

    def ann_recall(spark, sf_dir):
        """Probe-path recall@k of the IVF index vs exact brute-force
        top-k at the bench's k (nprobe=4 of 16 cells) — the eval that
        makes the nprobe/n_centroids trade VISIBLE, like
        emb_dup_recall does for the LSH banding curve. One row:
        (n_brute, n_ivf, n_common, recall)."""
        emb = _emb(spark, sf_dir)
        probes_q = emb.filter(F.col("vec_id") < 5)
        brute = similarity.brute_topk(emb, probes_q, k=10).select(
            "query_id", "neighbor_id"
        )
        ivf = similarity.ivf_topk(
            emb, probes_q, k=10, n_centroids=16, nprobe=4
        ).select("query_id", "neighbor_id")
        n_brute = brute.agg(F.count("*").alias("n_brute"))
        n_ivf = ivf.agg(F.count("*").alias("n_ivf"))
        n_common = brute.join(ivf, ["query_id", "neighbor_id"]).agg(
            F.count("*").alias("n_common")
        )
        return (
            n_brute.crossJoin(n_ivf)
            .crossJoin(n_common)
            .select(
                "n_brute",
                "n_ivf",
                "n_common",
                F.round(F.col("n_common") / F.col("n_brute"), 4).alias("recall"),
            )
        )

    q["ann_recall"] = ann_recall

    def semdedup(spark, sf_dir):
        """SemDeDup (arXiv:2303.09540): cluster-blocked semantic dedup —
        IVF cells bound the pairwise work; within a cell the outlier
        (lowest cosine to centroid) survives, near-dups of it are
        pruned. Greedy pairwise keep rule = one EXISTS join, fully
        SQL-expressible; see similarity.semdedup."""
        return similarity.semdedup(
            _emb(spark, sf_dir), threshold=0.4, n_centroids=16
        )

    q["semdedup"] = semdedup

    def emb_prototype_select(spark, sf_dir):
        """SSL-prototypes pruning (similarity.prototype_select,
        Sorscher et al. 2022): keep the 120 vectors FARTHEST from
        their cluster prototypes, cluster-balanced via round-robin on
        within-cell rank — the informative-tail selection, no pairwise
        work (unlike semdedup). Same deterministic IVF assignment as
        ann_ivf; every float is the rounded cosine."""
        return similarity.prototype_select(
            _emb(spark, sf_dir), n=120, n_centroids=16, mode="hard"
        )

    q["emb_prototype_select"] = emb_prototype_select

    def dsir_select(spark, sf_dir):
        """DSIR (arXiv:2302.03169): hashed unigram+bigram importance
        weights of every doc against the English subset as the target
        domain; top-100 most target-like docs. Ratio table ≤1024 rows
        broadcast; one doc_id shuffle; distributed top-k."""
        docs = _docs(spark, sf_dir)
        return curation.dsir_select(
            docs, docs.filter(F.col("lang") == "en"), n=100, buckets=1024
        )

    q["dsir_select"] = dsir_select

    def dsir_sample(spark, sf_dir):
        """DSIR's Gumbel-top-k resampling: P(pick) ∝ exp(weight/T) with
        T=1, noise a pure md5 function of (doc_id, seed) — the sampled
        100-doc subset is engine- and parallelism-deterministic."""
        docs = _docs(spark, sf_dir)
        return curation.dsir_sample(
            docs, docs.filter(F.col("lang") == "en"), n=100, temperature=1.0,
            buckets=1024,
        )

    q["dsir_sample"] = dsir_sample

    def crawl_trap_filter(spark, sf_dir):
        """Heritrix-style crawl-trap gates (canonicalize.trap_signals /
        is_trap_expr, the CrawlConfig(drop_traps=True) hygiene filter)
        over a synthesized URL mix: repeated path segments, 14-deep
        paths, 9-param faceted queries, session tokens, and clean URLs.
        Pure codegen'd regex/array expressions — no UDF, no shuffle."""
        from gocrawl_spark import canonicalize as canon

        d = F.col("doc_id")
        ds = d.cast("string")
        base = F.concat(F.lit("https://h"), (d % 7).cast("string"), F.lit(".example.com"))
        url = (
            F.when(d % 5 == 0, F.concat(base, F.lit("/a/a/a/p/"), ds))
            .when(
                d % 5 == 1,
                F.concat(base, F.lit("/p1/p2/p3/p4/p5/p6/p7/p8/p9/pa/pb/pc/pd/x"), ds),
            )
            .when(
                d % 5 == 2,
                F.concat(base, F.lit("/doc?a=1&b=2&c=3&d=4&e=5&f=6&g=7&h=8&i="), ds),
            )
            .when(d % 5 == 3, F.concat(base, F.lit("/doc/"), ds, F.lit("?phpsessid=s"), ds))
            .otherwise(F.concat(base, F.lit("/doc/"), ds))
        )
        urls = _docs(spark, sf_dir).select("doc_id", url.alias("url"))
        s = canon.trap_signals("url")
        return urls.select(
            "doc_id",
            "url",
            s["n_segments"].alias("n_segments"),
            s["n_repeats"].alias("n_repeats"),
            s["n_params"].alias("n_params"),
            s["has_session"].alias("has_session"),
            canon.is_trap_expr("url").alias("is_trap"),
        )

    q["crawl_trap_filter"] = crawl_trap_filter

    def crawl_redirect_resolve(spark, sf_dir):
        """Round-level redirect-map resolution
        (graphrank.resolve_redirects): pointer doubling over a
        synthesized redirect map — 3-hop chains onto u_{4k} terminals,
        4-cycles seeded at every 20th doc, plus a 29-deep chain whose
        tail exceeds max_hops=16 — so chains, cycles, and over-long
        chains all appear. k=4 equi-join sweeps cover 2^4 hops;
        O(log max_hops) shuffles at any frontier size."""
        from gocrawl_spark import graphrank

        d = F.col("doc_id")
        ds = d.cast("string")
        docs = _docs(spark, sf_dir).select("doc_id")
        chain = docs.filter(d % 4 != 0).select(
            F.concat(F.lit("u"), ds).alias("src"),
            F.concat(F.lit("u"), (d - 1).cast("string")).alias("dst"),
        )
        cyc = docs.filter((d % 20 == 0) & (d > 0)).select(
            F.concat(F.lit("u"), ds).alias("src"),
            F.concat(F.lit("u"), (d + 3).cast("string")).alias("dst"),
        )
        lc = docs.filter((d >= 1) & (d < 30)).select(
            F.concat(F.lit("lc"), ds).alias("src"),
            F.concat(F.lit("lc"), (d - 1).cast("string")).alias("dst"),
        )
        edges = chain.unionByName(cyc).unionByName(lc)
        return graphrank.resolve_redirects(edges, max_hops=16)

    q["crawl_redirect_resolve"] = crawl_redirect_resolve

    def crawl_mirror_hosts(spark, sf_dir):
        """Cross-host mirror detection (dedup.mirror_hosts, Bharat &
        Broder WWW'99) over a synthesized 24-host corpus: hosts in
        triples share a per-slot page fingerprint, every 5th slot is
        host-unique noise — so within-triple Jaccard lands ~0.6 and
        cross-triple at 0. Inverted-index self-join on fingerprint;
        hosts-row output."""
        d = F.col("doc_id")
        c = F.expr("doc_id DIV 24")
        tri = F.expr("(doc_id % 24) DIV 3")
        fp = F.when(
            (c % 5) == 0, F.md5(F.concat(F.lit("uniq:"), d.cast("string")))
        ).otherwise(
            F.md5(F.concat(F.lit("pg:"), (c * 8 + tri).cast("string")))
        )
        pages = _docs(spark, sf_dir).select(
            F.concat(F.lit("h"), (d % 24).cast("string"), F.lit(".com")).alias("host"),
            fp.alias("fp"),
        )
        return dedup.mirror_hosts(pages, threshold=0.5, max_fp_hosts=16)

    q["crawl_mirror_hosts"] = crawl_mirror_hosts

    def crawl_soft404(spark, sf_dir):
        """Soft-404 classification (fetch.soft404_expr) over a
        synthesized fetch batch covering every branch: a real 404
        (status≠200 → not soft), a 404-titled 200, a body-phrase hit,
        a tiny error body, a benign short page, and healthy pages.
        Pure scan-projection expressions; zero shuffles."""
        from gocrawl_spark import fetch as fmod

        d = F.col("doc_id")
        m = d % 7
        status = F.when(m == 0, 404).otherwise(200)
        title = (
            F.when(m == 0, F.lit("404 Not Found"))
            .when(m == 1, F.lit("Error 404 - Page Not Found"))
            .when(m == 2, F.lit("Widgets"))
            .when(m == 3, F.lit("Oops"))
            .when(m == 4, F.lit("Contact"))
            .otherwise(F.concat(F.lit("Article "), d.cast("string")))
        )
        body = (
            F.when(m == 0, F.lit("not found"))
            .when(m == 1, F.substring("text", 1, 200))
            .when(
                m == 2,
                F.concat(
                    F.lit("The page you requested was not found on this server. "),
                    F.substring("text", 1, 100),
                ),
            )
            .when(m == 3, F.lit("Sorry, an error occurred."))
            .when(m == 4, F.lit("Call our office for widget pricing."))
            .otherwise(F.col("text"))
        )
        batch = _docs(spark, sf_dir).select(
            "doc_id", status.alias("status"), title.alias("title"), body.alias("body")
        )
        s = fmod.soft404_signals("title", "body")
        return batch.select(
            "doc_id",
            "status",
            s["title_hit"].alias("title_hit"),
            s["phrase_hit"].alias("phrase_hit"),
            s["tiny_hit"].alias("tiny_hit"),
            fmod.soft404_expr("status", "title", "body").alias("soft404"),
        )

    q["crawl_soft404"] = crawl_soft404

    def _dust_pages(spark, sf_dir):
        """Synthesized crawl where every page was fetched both with and
        without a session parameter: hosts 0-6 serve identical content
        either way, host 7 keys content ON sid."""
        d = F.col("doc_id")
        p = F.expr("doc_id DIV 2")
        h = p % 8
        page = F.expr("(doc_id DIV 2) DIV 8")
        base = F.concat(
            F.lit("https://h"), h.cast("string"), F.lit(".com/p/"),
            page.cast("string"),
        )
        a_val = (p % 7).cast("string")
        url = F.when(
            d % 2 == 0,
            F.concat(base, F.lit("?a="), a_val, F.lit("&sid="), d.cast("string")),
        ).otherwise(F.concat(base, F.lit("?a="), a_val))
        sid_part = F.when(d % 2 == 0, d.cast("string")).otherwise(F.lit(""))
        digest = F.md5(
            F.concat(
                base, F.lit("|a="), a_val,
                F.when(h == 7, F.concat(F.lit("|sid="), sid_part)).otherwise(F.lit("")),
            )
        )
        return _docs(spark, sf_dir).select(url.alias("url"), digest.alias("digest"))

    def crawl_dust_rules(spark, sf_dir):
        """DUST rule mining (canonicalize.dust_rules, Bar-Yossef et al.
        WWW'07) over the sid/no-sid crawl: hosts 0-6 validate the
        (host, sid) strip rule with ~30 supports each, host 7 violates
        it; stripping the real 'a' parameter never lands on a crawled
        URL so it produces no rule row. Explode → equi-join → rollup."""
        from gocrawl_spark import canonicalize as canon

        return canon.dust_rules(_dust_pages(spark, sf_dir), min_support=3)

    q["crawl_dust_rules"] = crawl_dust_rules

    def crawl_dust_apply(spark, sf_dir):
        """Frontier canonicalization with LEARNED rules
        (canonicalize.apply_dust_rules): the validated (host, sid)
        strips collapse every hosts-0-6 sid alias onto its crawled
        no-sid twin, while host 7 (rule violated) and the unstripped
        'a' param pass through. Broadcast hosts×params strip-sets; the
        URL table never shuffles."""
        from gocrawl_spark import canonicalize as canon

        pages = _dust_pages(spark, sf_dir)
        rules = canon.dust_rules(pages, min_support=3)
        return canon.apply_dust_rules(pages.select("url"), rules).select(
            "url", "canonical_url"
        )

    q["crawl_dust_apply"] = crawl_dust_apply

    def _hreflang_pages(spark, sf_dir):
        """Synthesized multilingual site: doc groups of 3 language
        variants (de/en/fr) declaring each other via <link
        rel=alternate hreflang> tags incl. self; every 5th group's fr
        page omits its return link to the en page."""
        g = F.expr("doc_id DIV 3")
        v = F.col("doc_id") % 3
        gs = g.cast("string")

        def uof(lv):
            return F.concat(
                F.lit("https://h"), (g % 8).cast("string"),
                F.lit(".com/" + lv + "/"), gs,
            )

        def tag(lv, u):
            return F.concat(
                F.lit('<link rel="alternate" hreflang="' + lv + '" href="'),
                u, F.lit('">'),
            )

        u_de, u_en, u_fr = uof("de"), uof("en"), uof("fr")
        html = F.concat(
            tag("de", u_de),
            F.when((g % 5 == 0) & (v == 2), F.lit("")).otherwise(
                tag("en", u_en)
            ),
            tag("fr", u_fr),
        )
        url = F.when(v == 0, u_de).when(v == 1, u_en).otherwise(u_fr)
        return _docs(spark, sf_dir).select(
            url.alias("url"), html.alias("html")
        )

    def crawl_hreflang_clusters(spark, sf_dir):
        """Language-variant clustering (graphrank.hreflang_clusters
        over hreflang_alternates): regex tag extraction → one
        groupBy(url) rollup keyed by the least member URL; the fr pages
        missing their en return link still agree on the cluster id."""
        from gocrawl_spark import graphrank

        alts = graphrank.hreflang_alternates(_hreflang_pages(spark, sf_dir))
        return graphrank.hreflang_clusters(alts)

    q["crawl_hreflang_clusters"] = crawl_hreflang_clusters

    def crawl_hreflang_audit(spark, sf_dir):
        """Missing-return-link audit (graphrank.hreflang_audit): pairs
        (src, dst) where dst never declares src back — the omitted
        fr→en links plus declarations pointing at never-crawled pages
        in the final partial group. One left_anti self-join."""
        from gocrawl_spark import graphrank

        alts = graphrank.hreflang_alternates(_hreflang_pages(spark, sf_dir))
        return graphrank.hreflang_audit(alts)

    q["crawl_hreflang_audit"] = crawl_hreflang_audit

    def crawl_ip_politeness(spark, sf_dir):
        """Server-level politeness (frontier.colocated_budgets): 40
        vanity hosts resolve into 10 /24 blocks (4 hosts each); a
        server_cap of 20 pages/round splits across each block's hosts
        proportionally to queued depth, exact integer arithmetic."""
        from gocrawl_spark import frontier

        h = F.col("doc_id") % 40
        docs = _docs(spark, sf_dir).select(
            F.concat(F.lit("h"), h.cast("string"), F.lit(".com")).alias("host")
        )
        host_stats = docs.groupBy("host").agg(
            F.count("*").cast("long").alias("queued")
        )
        hh = F.regexp_extract("host", r"h(\d+)\.com", 1).cast("long")
        resolutions = host_stats.select(
            "host",
            F.concat(
                F.lit("10.0."), (hh % 10).cast("string"), F.lit("."),
                F.expr(
                    "cast(cast(regexp_extract(host, 'h(\\\\d+)\\\\.com', 1)"
                    " as long) DIV 10 as string)"
                ),
            ).alias("ip"),
        )
        return frontier.colocated_budgets(host_stats, resolutions, server_cap=20)

    q["crawl_ip_politeness"] = crawl_ip_politeness

    def crawl_staleness(spark, sf_dir):
        """Sitemap-lastmod conditional recrawl (sitemap.
        stale_candidates): every third page's declared lastmod is
        doc_id%7 days (+1s) past its capture time — stale, with
        priority escalating per stale day; the rest are fresh."""
        from gocrawl_spark import sitemap as sm

        d = F.col("doc_id")
        url = F.concat(
            F.lit("https://h"), (d % 8).cast("string"), F.lit(".com/p/"),
            d.cast("string"),
        )
        fetch_us = F.lit(1700000000000000).cast("long") + d * 1000000
        lastmod = F.when(
            d % 3 == 0,
            fetch_us + (d % 7) * F.lit(86400000000).cast("long") + 1000000,
        ).otherwise(fetch_us - 1000000)
        crawled = _docs(spark, sf_dir).select(
            url.alias("url"), fetch_us.alias("fetch_ts_us")
        )
        declared = _docs(spark, sf_dir).select(
            url.alias("url"), lastmod.cast("long").alias("lastmod_us")
        )
        return sm.stale_candidates(crawled, declared)

    q["crawl_staleness"] = crawl_staleness

    def crawl_url_templates(spark, sf_dir):
        """URL pattern census (canonicalize.url_templates): article
        pages /p/N, calendar pages /cal/N/N/N, and a static /about per
        host — digit-masked templates rolled up with member counts,
        the enumerable-space report behind crawl-budget throttling."""
        from gocrawl_spark import canonicalize as canon

        d = F.col("doc_id")
        host = F.concat(F.lit("https://h"), (d % 6).cast("string"), F.lit(".com"))
        url = F.when(
            d % 5 == 0, F.concat(host, F.lit("/about"))
        ).when(
            d % 5 == 1,
            F.concat(
                host, F.lit("/cal/2024/"), (d % 12).cast("string"),
                F.lit("/"), (d % 28).cast("string"),
            ),
        ).otherwise(F.concat(host, F.lit("/p/"), d.cast("string")))
        pages = _docs(spark, sf_dir).select(url.alias("url"))
        return canon.url_templates(pages, min_count=2)

    q["crawl_url_templates"] = crawl_url_templates

    def crawl_trap_rules(spark, sf_dir):
        """Yield-learned crawl-trap rules (canonicalize.trap_rules):
        the same template census keyed by content yield — the calendar
        space mints ~16 URLs/host but only 3 distinct digests
        (yield ≤ 1875 bp → trap), article and /about spaces hash
        unique (10000 bp → clean). Exact integer basis points; one
        (host, template) rollup. Trapped templates feed
        apply_trap_rules as next-round frontier deny-rules."""
        from gocrawl_spark import canonicalize as canon

        d = F.col("doc_id")
        host = F.concat(F.lit("https://h"), (d % 6).cast("string"), F.lit(".com"))
        url = F.when(
            d % 5 == 0, F.concat(host, F.lit("/about"))
        ).when(
            d % 5 == 1,
            F.concat(
                host, F.lit("/cal/2024/"), (d % 12).cast("string"),
                F.lit("/"), (d % 28).cast("string"),
            ),
        ).otherwise(F.concat(host, F.lit("/p/"), d.cast("string")))
        digest = F.when(
            d % 5 == 1, F.concat(F.lit("dup"), (d % 3).cast("string"))
        ).otherwise(F.concat(F.lit("uniq"), d.cast("string")))
        pages = _docs(spark, sf_dir).select(
            url.alias("url"), digest.alias("digest")
        )
        return canon.trap_rules(pages, min_urls=8, max_yield_bp=3000)

    q["crawl_trap_rules"] = crawl_trap_rules

    def crawl_link_reciprocity(spark, sf_dir):
        """Nepotistic-linking census (graphrank.link_reciprocity) over
        a synthesized 12-host graph where hosts 0-3 form a mutual-
        admiration clique (every edge reciprocated) and the rest link
        forward-only — basis-point reciprocity as exact integer DIV."""
        from gocrawl_spark import graphrank

        d = F.col("doc_id")
        a = (d % 12).cast("long")
        b = (F.expr("doc_id DIV 12") % 12).cast("long")
        # clique among 0-3: emit both directions; others: forward only
        fwd = _docs(spark, sf_dir).select(
            F.concat(F.lit("h"), a.cast("string"), F.lit(".com")).alias("src_host"),
            F.concat(F.lit("h"), b.cast("string"), F.lit(".com")).alias("dst_host"),
        )
        back = (
            _docs(spark, sf_dir)
            .filter((a < 4) & (b < 4))
            .select(
                F.concat(F.lit("h"), b.cast("string"), F.lit(".com")).alias(
                    "src_host"
                ),
                F.concat(F.lit("h"), a.cast("string"), F.lit(".com")).alias(
                    "dst_host"
                ),
            )
        )
        return graphrank.link_reciprocity(fwd.unionByName(back))

    q["crawl_link_reciprocity"] = crawl_link_reciprocity

    def _card_pages(spark, sf_dir):
        d = F.col("doc_id")
        return _docs(spark, sf_dir).select(
            F.concat(F.lit("h"), (d % 10).cast("string"), F.lit(".com")).alias(
                "host"
            ),
            F.concat(
                F.lit("https://h"), (d % 10).cast("string"), F.lit(".com/p/"),
                (F.expr("doc_id DIV 10") % 37).cast("string"),
            ).alias("url"),
        )

    def corpus_host_cardinality(spark, sf_dir):
        """From-scratch deterministic HyperLogLog (corpusstats.
        hll_registers/hll_estimate, p=8): distinct-URL estimate per
        host on a ≤37-distinct fixture — the linear-counting regime —
        joined against the exact distinct for the report. md5-derived
        registers and an exact DECIMAL harmonic sum make the estimate
        bit-equal across engines and parallelism, unlike
        approx_count_distinct."""
        from gocrawl_spark import corpusstats as cs

        pages = _card_pages(spark, sf_dir)
        est = cs.hll_estimate(
            cs.hll_registers(pages, "url", ["host"], p=8), ["host"], p=8
        )
        exact = pages.groupBy("host").agg(
            F.countDistinct("url").cast("long").alias("exact_distinct")
        )
        return est.join(exact, "host")

    q["corpus_host_cardinality"] = corpus_host_cardinality

    def corpus_url_cardinality(spark, sf_dir):
        """The same HLL at p=4 (m=16) over every distinct doc URL —
        500 distinct ≫ 2.5m, exercising the raw harmonic-mean branch
        of the estimator."""
        from gocrawl_spark import corpusstats as cs

        d = F.col("doc_id")
        pages = _docs(spark, sf_dir).select(
            F.concat(
                F.lit("https://h"), (d % 10).cast("string"), F.lit(".com/p/"),
                d.cast("string"),
            ).alias("url")
        )
        est = cs.hll_estimate(cs.hll_registers(pages, "url", [], p=4), [], p=4)
        exact = pages.agg(
            F.countDistinct("url").cast("long").alias("exact_distinct")
        )
        return est.crossJoin(exact)

    q["corpus_url_cardinality"] = corpus_url_cardinality

    def _cdc_docs(spark, sf_dir):
        """Paragraph-pool fixture: each doc is three 32-char paragraphs
        drawn from a 20-paragraph pool, so chunk boundaries align
        inside shared paragraphs and CDC finds cross-doc overlap."""
        d = F.col("doc_id")
        para = lambda k: F.md5(F.concat(F.lit("para:"), k.cast("string")))
        return _docs(spark, sf_dir).select(
            "doc_id",
            F.concat(
                para(d % 20), para((d * 7 + 3) % 20),
                para(F.expr("doc_id DIV 4") % 20),
            ).alias("text"),
        )

    def corpus_cdc_chunks(spark, sf_dir):
        """Content-defined chunking (dedup.cdc_chunks): md5-window
        boundary rule (P=1/16), insert-shift-stable chunk table —
        the partial-overlap extension of the WARC digest-dedup
        storage. Pure codegen boundary scan."""
        return dedup.cdc_chunks(_cdc_docs(spark, sf_dir))

    q["corpus_cdc_chunks"] = corpus_cdc_chunks

    def corpus_cdc_stats(spark, sf_dir):
        """The one-row archive dedup report (dedup.cdc_dedup_stats):
        chunk-addressed storage ratio in basis points over the shared-
        paragraph fixture."""
        return dedup.cdc_dedup_stats(dedup.cdc_chunks(_cdc_docs(spark, sf_dir)))

    q["corpus_cdc_stats"] = corpus_cdc_stats

    def crawl_shard_rebalance(spark, sf_dir):
        """Rendezvous-vs-modulo resize stability (frontier.
        rendezvous_shard): growing the seen-store from 8 to 9 shards
        moves ~1/9 of URLs under HRW but ~8/9 under hash%n — the
        report that justifies the HRW layout for 10^10-URL frontier
        resizes. Exact integer basis points, one scan, no shuffle."""
        from gocrawl_spark import frontier

        d = F.col("doc_id")
        urls = _docs(spark, sf_dir).select(
            F.concat(
                F.lit("https://h"), (d % 10).cast("string"), F.lit(".com/p/"),
                d.cast("string"),
            ).alias("url")
        )
        df = frontier.rendezvous_shard(
            frontier.rendezvous_shard(urls, "url", 8, "s8"), "url", 9, "s9"
        )
        h = F.conv(F.substring(F.md5("url"), 1, 15), 16, 10).cast("long")
        df = df.withColumn("m8", h % 8).withColumn("m9", h % 9)
        agg = df.agg(
            F.count("*").cast("long").alias("n_urls"),
            F.sum(F.when(F.col("s8") != F.col("s9"), 1).otherwise(0))
            .cast("long")
            .alias("hrw_moved"),
            F.sum(F.when(F.col("m8") != F.col("m9"), 1).otherwise(0))
            .cast("long")
            .alias("mod_moved"),
        )
        return agg.select(
            "n_urls", "hrw_moved", "mod_moved",
            F.expr("hrw_moved * 10000 DIV n_urls").alias("hrw_moved_bp"),
            F.expr("mod_moved * 10000 DIV n_urls").alias("mod_moved_bp"),
        )

    q["crawl_shard_rebalance"] = crawl_shard_rebalance

    def text_tfidf_keywords(spark, sf_dir):
        """Per-doc top-5 TF-IDF keywords (textstats.tfidf_keywords) —
        the corpus-side analogue of the reference's keywords field:
        stopword-free ≥3-char terms, tf·ln(N/df), deterministic
        (rounded score, term tie-break)."""
        return textstats.tfidf_keywords(_docs(spark, sf_dir), top_k=5)

    q["text_tfidf_keywords"] = text_tfidf_keywords

    def text_readability(spark, sf_dir):
        """Flesch reading ease + FK grade (textstats.readability_stats)
        with the deterministic vowel-group syllable heuristic — one
        codegen'd projection pass, no shuffle."""
        s = textstats.readability_stats("text")
        return _docs(spark, sf_dir).select(
            "doc_id", *(s[k].alias(k) for k in
                        ("n_words", "n_sentences", "n_syllables",
                         "flesch", "fk_grade"))
        )

    q["text_readability"] = text_readability

    def text_mojibake(spark, sf_dir):
        """Encoding-damage gate (textstats.mojibake_stats) over text
        with deterministically injected damage: doc_id%5==0 double-UTF8
        ('Ã©'), ==1 cp1252 quotes ('â€œ'), ==2 a C0 control byte, the
        rest clean — integer-ppm rate, bit-equal gate."""
        d = F.col("doc_id")
        damaged = F.concat(
            F.col("text"),
            F.when(d % 5 == 0, F.lit(" Ã©tÃ© café"))
            .when(d % 5 == 1, F.lit(" â€œquotedâ€"))
            .when(d % 5 == 2, F.lit(" bad\x07ctl"))
            .when(d % 5 == 3, F.lit(" ok clean text."))
            .otherwise(F.lit("")),
        )
        s = textstats.mojibake_stats(damaged)
        return _docs(spark, sf_dir).select(
            "doc_id", *(s[k].alias(k) for k in
                        ("n_chars", "n_mojibake", "n_ctrl",
                         "mojibake_ppm", "is_clean"))
        )

    q["text_mojibake"] = text_mojibake

    def text_winnow(spark, sf_dir):
        """Winnowing fingerprints (Schleimer et al. 2003,
        textstats.winnow_fingerprints): rightmost-min over every
        4-window of 5-shingle md5 hashes; distinct (pos, hash) per doc.
        Guarantees any ≥8-word shared passage shares a fingerprint."""
        return textstats.winnow_fingerprints(
            _docs(spark, sf_dir), k=5, window=4
        )

    q["text_winnow"] = text_winnow

    def dedup_winnow_pairs(spark, sf_dir):
        """Shared-passage pairs via winnowing (textstats.winnow_pairs)
        over the near-dup injection: inverted-index join on the
        fingerprint hash, never doc×doc; pairs sharing ≥5 selected
        hashes."""
        return textstats.winnow_pairs(
            _aug_near(_docs(spark, sf_dir)), min_shared=5, k=5, window=4
        )

    q["dedup_winnow_pairs"] = dedup_winnow_pairs

    def crawl_change_rates(spark, sf_dir):
        """Cho & Garcia-Molina change-frequency estimation
        (scheduler.change_rates) over a synthesized 4-generation
        observation history: doc_id%3==0 pages change every generation,
        %3==1 change once (at gen 2), the rest are static. Feeds
        refresh_priorities → the freshness-driven re-crawl order."""
        from gocrawl_spark import scheduler as sch

        d = F.col("doc_id")
        hist = (
            _docs(spark, sf_dir)
            .select("doc_id", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("generation"))
            .select(
                F.concat(F.lit("https://h.example.com/doc/"), d.cast("string")).alias("url"),
                "generation",
                F.when(d % 3 == 0, F.col("generation"))
                .when((d % 3 == 1) & (F.col("generation") >= 2), F.lit(1))
                .otherwise(F.lit(0))
                .alias("page_ts"),
            )
        )
        return sch.change_rates(hist)

    q["crawl_change_rates"] = crawl_change_rates

    def ann_lsh(spark, sf_dir):
        """Sign-LSH top-k with the md5-derived Rademacher projection —
        bucket keys reproducible in the DuckDB oracle."""
        emb = _emb(spark, sf_dir)
        return similarity.lsh_topk(
            emb,
            emb.filter(F.col("vec_id") < 5),
            k=10,
            dim=64,
            n_planes=8,
            planes=similarity.rademacher_planes(64, 8),
        )

    q["ann_lsh"] = ann_lsh

    # -- search surface (A1, A2, A5, A6, BM25) ------------------------------
    def search_match_topk(spark, sf_dir):
        return search.match_topk(
            _docs(spark, sf_dir), "table scan merge", text_col="text", id_col="doc_id", k=10
        )

    q["search_match_topk"] = search_match_topk

    def search_multimatch(spark, sf_dir):
        return search.multi_match_topk(
            _docs(spark, sf_dir),
            "spark window src3",
            fields={"text": 1.0, "source": 2.0},
            id_col="doc_id",
            k=10,
        )

    q["search_multimatch"] = search_multimatch

    def search_bm25(spark, sf_dir):
        return search.bm25_topk(
            _docs(spark, sf_dir), "window batch spark", text_col="text", id_col="doc_id", k=10
        )

    q["search_bm25"] = search_bm25

    def search_bm25_maxscore(spark, sf_dir):
        """Index-time BM25 with MaxScore pruning (search.build_postings
        + bm25_index_topk, Turtle & Flood 1995): only the query terms'
        postings are read (the term-partition-pruned 100 TB plan) and
        docs whose per-term upper-bound sum can't reach the seed
        threshold are never fully scored. The prune is lossless — the
        oracle is literally search_bm25's SQL, and the per-doc score
        fold replays bm25_topk's term-order IEEE chain."""
        p, ts, c = search.build_postings(
            _docs(spark, sf_dir), text_col="text", id_col="doc_id"
        )
        return search.bm25_index_topk(p, ts, c, "window batch spark", k=10)

    q["search_bm25_maxscore"] = search_bm25_maxscore

    def search_rank_eval(spark, sf_dir):
        """ES `_rank_eval` endpoint (rankeval.rank_eval): all four
        rated requests scored in ONE corpus pass (shared tf/df
        tables, broadcast request list) — precision@10 / recall@10 /
        MRR / nDCG@10 per request against the deterministic md5
        judgment pool, position-ordered folds for every float sum."""
        from gocrawl_spark import rankeval

        return rankeval.rank_eval(
            _docs(spark, sf_dir),
            _RANK_EVAL_REQUESTS,
            text_col="text",
            id_col="doc_id",
            k=10,
        )

    q["search_rank_eval"] = search_rank_eval

    def search_percolate(spark, sf_dir):
        """ES percolator (search.percolate): registered match queries
        evaluated against every document in one corpus pass —
        broadcast query-term table onto distinct (doc, term) pairs,
        one map-side-combined groupBy applies the and/or gate."""
        return search.percolate(
            _docs(spark, sf_dir),
            _PERCOLATE_QUERIES,
            text_col="text",
            id_col="doc_id",
        )

    q["search_percolate"] = search_percolate

    def search_termvectors(spark, sf_dir):
        """ES `_termvectors` with term_statistics (search.termvectors):
        per-term in-doc frequency plus corpus doc_freq/ttf for three
        requested docs — two map-side-combined aggregations build the
        index stats, the requested docs broadcast onto them."""
        return search.termvectors(
            _docs(spark, sf_dir),
            _TERMVECTOR_DOC_IDS,
            text_col="text",
            id_col="doc_id",
        )

    q["search_termvectors"] = search_termvectors

    # -- corpus-level statistical audits (corpusstats.py) -------------------

    def corpus_zipf(spark, sf_dir):
        """Zipf's-law fit over the top-1000 word frequencies
        (corpusstats.zipf_fit): ln-ln least squares with every
        regression sum folded left-to-right over the rank-sorted
        point list."""
        from gocrawl_spark import corpusstats

        return corpusstats.zipf_fit(_docs(spark, sf_dir), top_n=1000)

    q["corpus_zipf"] = corpus_zipf

    def corpus_heaps(spark, sf_dir):
        """Heaps'-law vocabulary-growth curve at 10 doc-id checkpoints
        (corpusstats.heaps_curve): integer-only — per-word MIN(id),
        ceil-division bucketing, 10-row running sum."""
        from gocrawl_spark import corpusstats

        return corpusstats.heaps_curve(_docs(spark, sf_dir))

    q["corpus_heaps"] = corpus_heaps

    def text_distinct_ngrams(spark, sf_dir):
        """Per-document distinct-1/2/3 diversity ratios
        (corpusstats.distinct_ngrams) — the intra-document
        repetitiveness audit, pure codegen'd array expressions."""
        from gocrawl_spark import corpusstats

        return corpusstats.distinct_ngrams(_docs(spark, sf_dir))

    q["text_distinct_ngrams"] = text_distinct_ngrams

    def corpus_key_skew(spark, sf_dir):
        """Shuffle-skew audit of `lang` as a partition key
        (corpusstats.key_skew_audit): exact rank-selected order
        statistics over the key-frequency table — the number read
        before keying a join on a column at 100 TB."""
        from gocrawl_spark import corpusstats

        return corpusstats.key_skew_audit(_docs(spark, sf_dir), "lang")

    q["corpus_key_skew"] = corpus_key_skew

    def corpus_length_hist(spark, sf_dir):
        """Log2-bucketed length histogram per lang
        (corpusstats.length_histogram): bucket = binary-string length
        of n_chars — integer-only, one map-side-combining groupBy."""
        from gocrawl_spark import corpusstats

        return corpusstats.length_histogram(_docs(spark, sf_dir))

    q["corpus_length_hist"] = corpus_length_hist

    def search_significant_terms(spark, sf_dir):
        """ES significant_terms agg (search.significant_terms): JLH
        foreground-vs-background term significance for the docs
        matching 'spark' — one scan, per-doc distinct terms in the
        projection, one term-keyed conditional aggregation."""
        return search.significant_terms(
            _docs(spark, sf_dir), "spark", text_col="text",
            id_col="doc_id", k=15
        )

    q["search_significant_terms"] = search_significant_terms

    def emb_project(spark, sf_dir):
        """JL random projection (similarity.project_embeddings,
        64→16 dims, md5-Rademacher planes): codegen'd zip_with/
        aggregate folds over literal plane arrays — strictly
        sequential IEEE sums, so the values cross-check bit-for-bit
        against the SQL twin. One row per (vec, component)."""
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        proj = similarity.project_embeddings(emb, out_dim=16)
        return proj.select(
            "id", F.posexplode("proj").alias("j", "val")
        )

    q["emb_project"] = emb_project

    def corpus_mixture_temperature(spark, sf_dir):
        """Temperature-based mixture sampling weights
        (curation.temperature_weights, τ=0.7, budget 1M tokens): the
        XLM-R / mT5 p_i ∝ n_i^τ rule — one map-side-combined groupBy
        on the stratum, normalization over the ≈#strata aggregate."""
        return curation.temperature_weights(
            _docs(spark, sf_dir), tau=0.7, by="lang",
            budget_tokens=1_000_000
        )

    q["corpus_mixture_temperature"] = corpus_mixture_temperature

    def search_match_analyzed(spark, sf_dir):
        """A5 with the ES-standard-analyzer semantics made visible:
        hyphenated and apostrophized query terms ("Wi-Fi", "O'Brien's",
        "don't") must match the same way ES's standard analyzer
        segments them (mappings/article.go:48-84). Fixture text is
        injected deterministically since the corpus vocabulary carries
        no punctuation."""
        d = F.col("doc_id")
        docs = _docs(spark, sf_dir).withColumn(
            "text2",
            F.concat(
                "text",
                F.when(d % 7 == 0, F.lit(" The Wi-Fi setup in O'Brien's cafe"))
                .when(d % 7 == 1, F.lit(" don't reuse passphrases for wi-fi routers"))
                .otherwise(F.lit("")),
            ),
        )
        return search.match_topk(
            docs, "Wi-Fi O'Brien's don't", text_col="text2", id_col="doc_id", k=15
        )

    q["search_match_analyzed"] = search_match_analyzed

    def search_match_phrase(spark, sf_dir):
        """ES match_phrase analogue (search.match_phrase_topk): the
        analyzed terms must be CONSECUTIVE — a slice-equality scan
        over the token array, codegen'd, no positions index. Every
        sixth doc gets the phrase injected; score = occurrence count."""
        d = F.col("doc_id")
        aug = F.when(
            d % 6 == 1,
            F.concat(F.col("text"), F.lit(" The distributed query engine wins.")),
        ).otherwise(F.col("text"))
        docs = _docs(spark, sf_dir).select(d.alias("id"), aug.alias("content"))
        return search.match_phrase_topk(
            docs, "Distributed Query Engine", text_col="content", id_col="id", k=12
        )

    q["search_match_phrase"] = search_match_phrase

    def search_match_and(spark, sf_dir):
        """ES match with operator=and (search.match_topk): every
        analyzed term must occur; scoring stays the TF sum."""
        docs = _docs(spark, sf_dir).select(
            F.col("doc_id").alias("id"), F.col("text").alias("content")
        )
        return search.match_topk(
            docs, "spark table merge", id_col="id", k=10, operator="and"
        )

    q["search_match_and"] = search_match_and

    def search_bool(spark, sf_dir):
        """ES `bool` compositor (search.bool_topk): must-match TF
        scoring + should boosts (a match clause and a keyword term
        clause) under a range filter and a must_not exclusion — the
        four ES occurrence contexts in one query, all compiled into a
        single scan projection + boolean filter."""
        return search.bool_topk(
            _docs(spark, sf_dir),
            {
                "must": [{"match": {"text": "table scan"}}],
                "should": [
                    {"match": {"text": "merge"}},
                    {"term": {"source": "src3"}},
                ],
                "must_not": [{"term": {"lang": "de"}}],
                "filter": [{"range": {"doc_id": {"gte": 10, "lt": 450}}}],
            },
            id_col="doc_id",
            k=15,
        )

    q["search_bool"] = search_bool

    def search_bool_nested(spark, sf_dir):
        """Nested ES `bool` compositor (search.bool_topk): the must
        context holds a sub-bool (should-of-matches, msm=1 — ES's
        should-only default applies per level), the should context a
        match_phrase over an injected phrase, plus terms/exists/prefix
        filters and a must_not term — the full pass-through query-DSL
        surface (reference storage.go:212-257 forwards arbitrary query
        maps) compiled into one scan projection + one boolean filter."""
        d = F.col("doc_id")
        docs = _docs(spark, sf_dir).withColumn(
            "text",
            F.when(
                d % 5 == 2,
                F.concat(F.col("text"), F.lit(" The fused vector kernel wins.")),
            ).otherwise(F.col("text")),
        )
        return search.bool_topk(
            docs,
            {
                "must": [
                    {"bool": {"should": [
                        {"match": {"text": "table"}},
                        {"match": {"text": "stream"}},
                    ]}},
                ],
                "should": [{"match_phrase": {"text": "Fused Vector Kernel"}}],
                "must_not": [{"term": {"source": "src11"}}],
                "filter": [
                    {"terms": {"lang": ["en", "fr", "es"]}},
                    {"exists": {"field": "source"}},
                    {"prefix": {"source": "src1"}},
                ],
            },
            id_col="doc_id",
            k=15,
        )

    q["search_bool_nested"] = search_bool_nested

    def search_count_a1(spark, sf_dir):
        return (
            _docs(spark, sf_dir)
            .filter(F.col("text").contains("spark"))
            .groupBy("lang")
            .agg(F.count("*").alias("n_docs"))
        )

    q["search_count_a1"] = search_count_a1

    # -- generic agg/join surface (A2/A3 over events/orders) ---------------
    def agg_events_rollup(spark, sf_dir):
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        money = F.round(F.col("value"), 4).cast("decimal(18,4)")
        return ev.groupBy("event_type").agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(money).cast("double").alias("sum_value"),
        )

    q["agg_events_rollup"] = agg_events_rollup

    def join_segment_revenue(spark, sf_dir):
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
        money = F.round(F.col("o_totalprice"), 2).cast("decimal(18,2)")
        return (
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n_orders"), F.sum(money).cast("double").alias("revenue"))
        )

    q["join_segment_revenue"] = join_segment_revenue

    def tpch_q1_lite(spark, sf_dir):
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        qty = F.round(F.col("l_quantity"), 2).cast("decimal(18,2)")
        disc_price = F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
        ).cast("decimal(18,4)")
        return (
            li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum(qty).cast("double").alias("sum_qty"),
                F.sum(disc_price).cast("double").alias("sum_disc_price"),
                F.count("*").alias("count_order"),
            )
        )

    q["tpch_q1_lite"] = tpch_q1_lite

    def tpch_q3_lite(spark, sf_dir):
        """TPC-H Q3 shape (shipping priority): broadcast the filtered
        customer dim into orders, shuffle-join the lineitem fact ONCE
        on l_orderkey, decimal-exact revenue, top-10. The join order
        matters at 100 TB: customer×orders first (broadcast, no
        shuffle) so the single big exchange is the fact join."""
        cust = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
            F.col("c_mktsegment") == "BUILDING"
        )
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_orderdate") < F.lit("1997-06-01")
        )
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
            F.col("l_shipdate") > F.lit("1997-06-01")
        )
        rev = F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
        ).cast("decimal(18,4)")
        return (
            li.join(
                orders.join(
                    F.broadcast(cust),
                    orders.o_custkey == cust.c_custkey,
                ).select("o_orderkey", "o_orderdate"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("l_orderkey", "o_orderdate")
            .agg(F.sum(rev).cast("double").alias("revenue"))
            .select(
                "l_orderkey",
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
                "revenue",
            )
            .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
            .limit(10)
        )

    q["tpch_q3_lite"] = tpch_q3_lite

    def tpch_q5_lite(spark, sf_dir):
        """TPC-H Q5 shape (local supplier volume): region→nation→
        supplier and customer are all broadcast dims; lineitem joins
        orders in the one big exchange, then the tiny dims prune it.
        The c_nationkey = s_nationkey 'local supplier' constraint
        rides the broadcast joins."""
        region = spark.read.parquet(f"{sf_dir}/region.parquet").filter(
            F.col("r_name") == "ASIA"
        )
        nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
        supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
        cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") < F.lit("1997-01-01"))
        )
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        rev = F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
        ).cast("decimal(18,4)")
        nations_in = nation.join(
            F.broadcast(region), nation.n_regionkey == region.r_regionkey
        ).select("n_nationkey", "n_name")
        return (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
            .join(
                F.broadcast(cust),
                (orders.o_custkey == cust.c_custkey)
                & (cust.c_nationkey == supp.s_nationkey),
            )
            .join(
                F.broadcast(nations_in),
                supp.s_nationkey == F.col("n_nationkey"),
            )
            .groupBy("n_name")
            .agg(F.sum(rev).cast("double").alias("revenue"))
        )

    q["tpch_q5_lite"] = tpch_q5_lite

    def tpch_q10_lite(spark, sf_dir):
        """TPC-H Q10 shape (returned-item reporting): one quarter of
        orders, returned lineitems only, customer+nation broadcast,
        revenue per customer, top-20 — the classic fact-to-dim star
        shape with a selective fact filter that must reach the scan."""
        cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
        nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01"))
            & (F.col("o_orderdate") < F.lit("1997-04-01"))
        )
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
            F.col("l_returnflag") == "R"
        )
        rev = F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
        ).cast("decimal(18,4)")
        return (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .join(
                F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
            )
            .groupBy("c_custkey", "c_name", "n_name")
            .agg(F.sum(rev).cast("double").alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("c_custkey"))
            .limit(20)
        )

    q["tpch_q10_lite"] = tpch_q10_lite

    # -- multimodal plumbing (payload bytes never shuffle; features do) ----
    def media_features(spark, sf_dir):
        media = mm.synth_media(spark, _docs(spark, sf_dir), modality="video")
        feats = mm.extract_features(media, frame_stride_ms=1000)
        return feats.select(
            "media_id", "payload_sha", "n_bytes", "duration_ms", "frames_sampled"
        )

    q["media_features"] = media_features

    def media_parse(spark, sf_dir):
        """Header metadata parsed from the RAW payload bytes (PNG IHDR /
        JPEG SOF0 marker walk / WAV header) — asserts
        parse(serialize(meta)) == meta against the oracle's closed-form
        expectations. NULLs coalesced to -1 for engine-stable
        hashing."""
        docs = _docs(spark, sf_dir)
        media = (
            mm.synth_media(spark, docs, "image")
            .unionByName(mm.synth_media(spark, docs, "jpeg"))
            .unionByName(mm.synth_media(spark, docs, "audio"))
        )
        feats = mm.extract_features(media)
        return feats.select(
            "media_id",
            "modality",
            F.coalesce("width", F.lit(-1)).alias("width"),
            F.coalesce("height", F.lit(-1)).alias("height"),
            F.coalesce("duration_ms", F.lit(-1)).alias("duration_ms"),
            "n_bytes",
        )

    q["media_parse"] = media_parse

    def media_stats(spark, sf_dir):
        docs = _docs(spark, sf_dir)
        media = mm.synth_media(spark, docs, "image").unionByName(
            mm.synth_media(spark, docs, "audio")
        )
        return mm.media_stats(mm.extract_features(media))

    q["media_stats"] = media_stats

    def media_phash_pairs(spark, sf_dir):
        """Media near-dup by banded perceptual hash (mm.phash_pairs):
        32 digest-MSB bits (the sign bits of the fake-decoded feature
        stream), 4-band LSH blocking, exact-hamming verify — the
        SimHash recipe applied to the media table; a real DCT pHash
        slots in behind the same (media_id, bits) contract once
        codecs exist."""
        docs = _docs(spark, sf_dir)
        # inject re-posted copies (same text, new id; +130000 keeps
        # doc_id%13 — and so the payload — identical) — the dup shape
        # a crawl actually sees; every copy must pair with its source
        dup = docs.filter(F.col("doc_id") < 50).withColumn(
            "doc_id", F.col("doc_id") + 130000
        )
        media = mm.synth_media(spark, docs.unionByName(dup), "video")
        feats = mm.extract_features(media)
        return mm.phash_pairs(feats, bands=4, max_hamming=3)

    q["media_phash_pairs"] = media_phash_pairs

    def media_decode(spark, sf_dir):
        """REAL pixel/sample decode (mm.decode_media): uncompressed
        24-bit BMP + binary PPM pixels and 16-bit PCM-WAV samples
        decoded from the raw payload bytes — exact integer value and
        per-channel sums the DuckDB twin reproduces closed-form from
        the synth's digest tiling. NotImplementedError stays reserved
        for entropy-coded payloads (PNG/JPEG/video) only."""
        docs = _docs(spark, sf_dir)
        media = (
            mm.synth_media(spark, docs, "bmp")
            .unionByName(mm.synth_media(spark, docs, "ppm"))
            .unionByName(mm.synth_media(spark, docs, "audio"))
        )
        d = mm.decode_media(media)
        return d.select(
            "media_id",
            "modality",
            "codec",
            F.coalesce("width", F.lit(-1)).alias("width"),
            F.coalesce("height", F.lit(-1)).alias("height"),
            "n_values",
            "value_sum",
            "value_min",
            "value_max",
            F.coalesce("sum_c0", F.lit(-1)).cast("long").alias("sum_c0"),
            F.coalesce("sum_c1", F.lit(-1)).cast("long").alias("sum_c1"),
            F.coalesce("sum_c2", F.lit(-1)).cast("long").alias("sum_c2"),
        )

    q["media_decode"] = media_decode

    def search_aggs_pipeline_a2(spark, sf_dir):
        """ES pipeline aggs (A2 tail): cumulative_sum + derivative
        over a numeric-histogram bucket series — one ordered window
        over the already-aggregated buckets (#buckets rows, never the
        corpus), buckets_path resolving _count and sibling metrics."""
        out = search.es_aggs(
            _docs(spark, sf_dir),
            {
                "chars_hist": {
                    "histogram": {"field": "n_chars", "interval": 100},
                    "aggs": {
                        "avg_chars": {"avg": {"field": "n_chars"}},
                        "cum_docs": {"cumulative_sum": {
                            "buckets_path": "_count"}},
                        "d_docs": {"derivative": {"buckets_path": "_count"}},
                        "d_avg": {"derivative": {
                            "buckets_path": "avg_chars"}},
                    },
                }
            },
        )
        return out.select(
            "key", "doc_count",
            F.round("avg_chars", 6).alias("avg_chars"),
            "cum_docs", "d_docs",
            F.round("d_avg", 6).alias("d_avg"),
        )

    q["search_aggs_pipeline_a2"] = search_aggs_pipeline_a2

    def search_aggs_pipeline2_a2(spark, sf_dir):
        """ES pipeline aggs (A2 tail, part 2): moving_fn window,
        bucket_script arithmetic over sibling paths, sibling
        sum_bucket/max_bucket scalars, and a bucket_selector filter —
        all ordered windows / expressions over the already-aggregated
        bucket series (#buckets rows); the selector drops empty filled
        buckets only AFTER the moving window saw them (ES ordering)."""
        out = search.es_aggs(
            _docs(spark, sf_dir),
            {
                "chars_hist": {
                    "histogram": {"field": "n_chars", "interval": 25},
                    "aggs": {
                        "sum_chars": {"sum": {"field": "n_chars"}},
                        "mv_docs": {"moving_fn": {
                            "buckets_path": "_count", "window": 3,
                            "script": "MovingFunctions.unweightedAvg"}},
                        "chars_per_doc": {"bucket_script": {
                            "buckets_path": {"s": "sum_chars",
                                             "c": "_count"},
                            "script": "params.s / params.c"}},
                        "total_docs": {"sum_bucket": {
                            "buckets_path": "_count"}},
                        "peak_docs": {"max_bucket": {
                            "buckets_path": "_count"}},
                        "nonempty": {"bucket_selector": {
                            "buckets_path": {"c": "_count"},
                            "script": "params.c > 0"}},
                    },
                }
            },
        )
        return out.select(
            "key", "doc_count",
            F.col("sum_chars").cast("long").alias("sum_chars"),
            F.round("mv_docs", 6).alias("mv_docs"),
            F.round("chars_per_doc", 6).alias("chars_per_doc"),
            "total_docs", "peak_docs",
        )

    q["search_aggs_pipeline2_a2"] = search_aggs_pipeline2_a2

    def search_aggs_extstats_a2(spark, sf_dir):
        """ES extended_stats metric sub-agg under a terms bucket:
        stats + sum_of_squares/variance/std_deviation, sums in LONG
        (exact), the two-division E[x²]−E[x]² op sequence reproduced
        verbatim in the oracle."""
        out = search.es_aggs(
            _docs(spark, sf_dir),
            {"by_lang": {"terms": {"field": "lang", "size": 10},
                         "aggs": {"cs": {"extended_stats": {
                             "field": "n_chars"}}}}},
        )
        return out.select(
            "key", "doc_count", "cs_count", "cs_min", "cs_max",
            F.round("cs_avg", 6).alias("cs_avg"),
            "cs_sum", "cs_sum_of_squares",
            F.round("cs_variance", 6).alias("cs_variance"),
            F.round("cs_std_deviation", 6).alias("cs_std_deviation"),
        )

    q["search_aggs_extstats_a2"] = search_aggs_extstats_a2

    def search_aggs_rare_a2(spark, sf_dir):
        """ES rare_terms bucket agg: the long-tail complement of
        terms (doc_count ≤ max_doc_count, count-asc ordering) —
        exact, unlike ES's CuckooFilter approximation; the rarity cut
        is a HAVING on the aggregated side, one scan."""
        out = search.es_aggs(
            _docs(spark, sf_dir),
            {"rare_len": {"rare_terms": {"field": "n_chars",
                                         "max_doc_count": 1},
                          "aggs": {"min_doc": {"min": {
                              "field": "doc_id"}}}}},
        )
        return out.select("key", "doc_count", "min_doc")

    q["search_aggs_rare_a2"] = search_aggs_rare_a2

    def search_aggs_multiterms_a2(spark, sf_dir):
        """ES multi_terms bucket agg: terms over a (lang, source)
        tuple — one composite-key groupBy, count-desc-keys-asc
        ordering, top size buckets, metric sub-aggs."""
        out = search.es_aggs(
            _docs(spark, sf_dir),
            {"pairs": {"multi_terms": {
                "terms": [{"field": "lang"}, {"field": "source"}],
                "size": 8},
                "aggs": {"avg_chars": {"avg": {"field": "n_chars"}}}}},
        )
        return out.select(
            "lang", "source", "doc_count",
            F.round("avg_chars", 6).alias("avg_chars"),
        )

    q["search_aggs_multiterms_a2"] = search_aggs_multiterms_a2

    def search_aggs_daterange_a2(spark, sf_dir):
        """ES date_range bucket agg over the events stream: [from,to)
        timestamp buckets in declared order, empty buckets kept —
        the range agg's conditional-aggregation plan with ISO-string
        bounds."""
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        out = search.es_aggs(
            ev,
            {"by_window": {"date_range": {"field": "ts", "ranges": [
                {"key": "w1", "to": "2024-01-10"},
                {"key": "w2", "from": "2024-01-10", "to": "2024-01-20"},
                {"key": "w3", "from": "2024-01-20"},
                {"key": "empty", "from": "2025-01-01"},
            ]},
                "aggs": {"v": {"sum": {"field": "event_id"}}}}},
        )
        return out.select("key", "doc_count",
                          F.col("v").cast("long").alias("v"))

    q["search_aggs_daterange_a2"] = search_aggs_daterange_a2

    def search_aggs_missing_a2(spark, sf_dir):
        """ES missing bucket agg: one bucket counting null-field docs
        with metric sub-aggs over that slice (nulls synthesized
        upstream — the corpus tables are dense)."""
        docs = _docs(spark, sf_dir).withColumn(
            "opt_source",
            F.when(F.col("doc_id") % 7 == 0, F.lit(None)).otherwise(
                F.col("source")
            ),
        )
        out = search.es_aggs(
            docs,
            {"no_source": {"missing": {"field": "opt_source"},
                           "aggs": {"avg_chars": {"avg": {
                               "field": "n_chars"}}}}},
        )
        return out.select(
            "key", "doc_count", F.round("avg_chars", 6).alias("avg_chars")
        )

    q["search_aggs_missing_a2"] = search_aggs_missing_a2

    def search_aggs_terms_opts_a2(spark, sf_dir):
        """ES terms-agg include/exclude regexes: anchored whole-term
        matches applied ROW-side, so excluded keys never reach the
        aggregation shuffle."""
        out = search.es_aggs(
            _docs(spark, sf_dir),
            {"srcs": {"terms": {"field": "source", "include": "src1.*",
                                "exclude": "src1[23]", "size": 20}}},
        )
        return out.select("key", "doc_count")

    q["search_aggs_terms_opts_a2"] = search_aggs_terms_opts_a2

    def search_aggs_terms_mindoc_a2(spark, sf_dir):
        """ES terms-agg min_doc_count: a HAVING cut on the aggregated
        side before the size limit, _key-asc ordering."""
        out = search.es_aggs(
            _docs(spark, sf_dir),
            {"lens": {"terms": {"field": "n_chars", "min_doc_count": 3,
                                "order": {"_key": "asc"}, "size": 12}}},
        )
        return out.select("key", "doc_count")

    q["search_aggs_terms_mindoc_a2"] = search_aggs_terms_mindoc_a2

    def search_aggs_adjmatrix_a2(spark, sf_dir):
        """ES adjacency_matrix: N named filters → N single + N(N−1)/2
        pairwise-intersection buckets in ONE conditional-aggregation
        scan (no self-join), empty buckets dropped, metric sub-aggs
        per cell."""
        out = search.es_aggs(
            _docs(spark, sf_dir),
            {"adj": {"adjacency_matrix": {"filters": {
                "en": {"term": {"lang": "en"}},
                "big": {"range": {"n_chars": {"gte": 400}}},
                "s1": {"wildcard": {"source": "src1*"}},
            }},
                "aggs": {"avg_chars": {"avg": {"field": "n_chars"}}}}},
        )
        return out.select(
            "key", "doc_count", F.round("avg_chars", 6).alias("avg_chars")
        )

    q["search_aggs_adjmatrix_a2"] = search_aggs_adjmatrix_a2

    def search_request_after(spark, sf_dir):
        """ES search_after keyset pagination: page 2 fetched with the
        cursor from page 1's last hit — a strict-lexicographic filter
        that pushes into the scan, so page N costs O(page) at any
        depth (the from+size deep-paging trap never materializes).
        The cursor collect is ONE row (driver metadata, not data)."""
        docs = _docs(spark, sf_dir).withColumnRenamed("doc_id", "id")
        body = {"query": {"term": {"lang": "en"}},
                "sort": [{"n_chars": "desc"}], "size": 5}
        last = search.es_search(docs, body)["hits"].collect()[-1]
        page2 = search.es_search(
            docs, dict(body, search_after=[last["n_chars"], last["id"]])
        )["hits"]
        return page2.select("id", "n_chars")

    q["search_request_after"] = search_request_after

    def search_request_postfilter(spark, sf_dir):
        """ES post_filter: narrows HITS without touching the aggs /
        total scope (facet counts survive the UI filter). Returned
        frame = the narrowed hit ids; the scope split is pinned by
        the unit test, the id set by this oracle."""
        docs = _docs(spark, sf_dir).withColumnRenamed("doc_id", "id")
        out = search.es_search(docs, {
            "query": {"term": {"lang": "en"}},
            "post_filter": {"range": {"n_chars": {"gte": 400}}},
            "size": 1000,
        })
        return out["hits"].select("id")

    q["search_request_postfilter"] = search_request_postfilter

    def search_request_collapse(spark, sf_dir):
        """ES field collapsing: one hit per distinct `lang` — the best
        hit under (_score desc, id) via a collapse-key-partitioned
        row_number, then global top-k over one survivor per key."""
        docs = _docs(spark, sf_dir).withColumnRenamed("doc_id", "id")
        return search.es_search(docs, {
            "query": {"match": {"text": "spark"}},
            "collapse": {"field": "lang"},
            "size": 10,
        })["hits"]

    q["search_request_collapse"] = search_request_collapse

    def search_request_rescore(spark, sf_dir):
        """ES rescore: the top-20 `match` hits re-ranked by a phrase
        boost (final = 1·score + 2·phrase_count for window docs
        matching the rescore query) — only the window pays the
        secondary scoring."""
        docs = _docs(spark, sf_dir).withColumnRenamed("doc_id", "id")
        return search.es_search(docs, {
            "query": {"match": {"text": "spark"}},
            "rescore": {"window_size": 20, "query": {
                "rescore_query": {"match_phrase": {"text": "window batch"}},
                "query_weight": 1.0,
                "rescore_query_weight": 2.0,
            }},
            "size": 10,
        })["hits"]

    q["search_request_rescore"] = search_request_rescore

    def search_request_global(spark, sf_dir):
        """ES global agg: sub-aggs over the WHOLE index from inside a
        filtered request — the query (lang=fr) must not narrow the
        bucket counts."""
        docs = _docs(spark, sf_dir).withColumnRenamed("doc_id", "id")
        out = search.es_search(docs, {
            "query": {"term": {"lang": "fr"}},
            "aggs": {"g": {"global": {}, "aggs": {
                "langs": {"terms": {"field": "lang"}}}}},
        })
        return out["aggs"]

    q["search_request_global"] = search_request_global

    def search_aggs_autodatehist_a2(spark, sf_dir):
        """ES auto_date_histogram: ladder-chosen interval (the
        month-long events stream at buckets=12 lands on the 7d tier),
        epoch-floor rollup in one groupBy, interval reported."""
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        out = search.es_aggs(
            ev,
            {"auto": {"auto_date_histogram": {"field": "ts",
                                              "buckets": 12},
                      "aggs": {"n_users": {"cardinality": {
                          "field": "user_id"}}}}},
        )
        return out.select(
            F.date_format("key", "yyyy-MM-dd HH:mm:ss").alias("key"),
            "doc_count", "n_users", "interval",
        )

    q["search_aggs_autodatehist_a2"] = search_aggs_autodatehist_a2

    def search_aggs_pipeline3_a2(spark, sf_dir):
        """ES pipeline tail part 3: serial_diff (seasonal lag-2
        differencing), stats_bucket and percentiles_bucket sibling
        scalars — windows over the filled #buckets series only."""
        out = search.es_aggs(
            _docs(spark, sf_dir),
            {"hist": {
                "histogram": {"field": "n_chars", "interval": 50},
                "aggs": {
                    "sd2": {"serial_diff": {"buckets_path": "_count",
                                            "lag": 2}},
                    "st": {"stats_bucket": {"buckets_path": "_count"}},
                    "pb": {"percentiles_bucket": {
                        "buckets_path": "_count", "percents": [50]}},
                }}},
        )
        return out.select(
            "key", "doc_count", "sd2",
            "st_count", "st_min", "st_max",
            F.round("st_avg", 6).alias("st_avg"), "st_sum",
            F.round("pb_p50", 6).alias("pb_p50"),
        )

    q["search_aggs_pipeline3_a2"] = search_aggs_pipeline3_a2

    def search_sig_terms_scoped(spark, sf_dir):
        """ES significant_terms as a request-scoped agg: sources
        overrepresented among the query's (lang=en) docs vs the whole
        index — JLH over a keyword field, fg flag codegen'd, one
        scan."""
        docs = _docs(spark, sf_dir).withColumnRenamed("doc_id", "id")
        out = search.es_search(docs, {
            "query": {"term": {"lang": "en"}},
            "aggs": {"sig_src": {"significant_terms": {
                "field": "source", "size": 10}}},
        })
        return out["aggs"]

    q["search_sig_terms_scoped"] = search_sig_terms_scoped

    def agg_events_sessions(spark, sf_dir):
        """User-activity sessionization (streaming.sessionize_events,
        batch form of the stream_sessionize stateful op): 30-min-gap
        session windows, exact-gap event EXTENDS the session (Spark's
        boundary rule, pinned by the unit test), bounds as epoch-µs
        longs, count + exact LONG sums only. One user-keyed shuffle."""
        from gocrawl_spark import streaming as _st

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        return _st.sessionize_events(ev)

    q["agg_events_sessions"] = agg_events_sessions

    def search_aggs_fixedhist_a2(spark, sf_dir):
        """ES date_histogram fixed_interval (12h epoch-floor buckets,
        not calendar-truncated) with a weighted_avg metric sub-agg
        (exact LONG sums, one division)."""
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        out = search.es_aggs(
            ev,
            {"g": {"date_histogram": {"fixed_interval": "12h",
                                      "field": "ts"},
                   "aggs": {"wa": {"weighted_avg": {
                       "value": {"field": "event_id"},
                       "weight": {"field": "user_id"}}}}}},
        )
        return out.select(
            F.date_format("key", "yyyy-MM-dd HH:mm:ss").alias("key"),
            "doc_count", F.round("wa", 6).alias("wa"),
        )

    q["search_aggs_fixedhist_a2"] = search_aggs_fixedhist_a2

    def search_aggs_histopts_a2(spark, sf_dir):
        """ES histogram offset + extended_bounds: buckets at
        offset+k·interval, the fill domain widened past the data to
        the declared bounds (empty edge buckets emitted)."""
        out = search.es_aggs(
            _docs(spark, sf_dir),
            {"h": {"histogram": {
                "field": "n_chars", "interval": 100, "offset": 25,
                "extended_bounds": {"min": -150, "max": 750}}}},
        )
        return out.select("key", "doc_count")

    q["search_aggs_histopts_a2"] = search_aggs_histopts_a2

    def search_aggs_pctranks_a2(spark, sf_dir):
        """ES percentile_ranks under a terms bucket: exact inverse
        percentiles (% of values ≤ v), two counts + one division per
        rank — no t-digest approximation."""
        out = search.es_aggs(
            _docs(spark, sf_dir),
            {"by_lang": {"terms": {"field": "lang", "size": 10},
                         "aggs": {"cr": {"percentile_ranks": {
                             "field": "n_chars",
                             "values": [200, 400]}}}}},
        )
        return out.select(
            "key", "doc_count",
            F.round("cr_r200", 6).alias("cr_r200"),
            F.round("cr_r400", 6).alias("cr_r400"),
        )

    q["search_aggs_pctranks_a2"] = search_aggs_pctranks_a2

    # -- crawl core (rows-only: HTML parsing / iterative driver loop) ------
    def crawl_extract_articles(spark, sf_dir):
        """Flagship fetch→extract slice: the fused single-DOM-pass
        kernel (C1 detect, E1-E14 extract, V1-V9 validate, F1 links)
        over the synthetic corpus. The oracle re-derives every output
        column — urls, content types, sha256 article ids, word counts
        incl. the pad-loop closed form, validation verdicts with exact
        skip-reason strings, and link counts — from the documents table
        by pure SQL (no DOM), so the whole kernel is hash-checked.
        NULLs (page rows have no article) coalesce to ''/-1 for
        engine-stable hashing."""
        corpus = synth.corpus_from_documents(spark, sf_dir)
        ex = udfs.extract_pages(corpus)
        return ex.select(
            "url",
            "content_type",
            F.coalesce(F.col("article.id"), F.lit("")).alias("article_id"),
            F.coalesce(F.col("article.word_count"), F.lit(-1)).alias("word_count"),
            "article_valid",
            "skip_reason",
            F.size("links").alias("n_links"),
        )

    q["crawl_extract_articles"] = crawl_extract_articles

    def crawl_surt_keys(spark, sf_dir):
        """SURT canonical keys (canonicalize.surt_key_expr): four
        archive-equivalent spellings per target page — scheme http vs
        https, www/www2 host labels, mixed case, default ports,
        unsorted/empty query params — collapse to ONE sort-friendly
        key. The oracle states the closed-form expected key from the
        same doc_id arithmetic, so the whole transform (host reversal,
        www-strip, port drop, query canon) is hash-checked. One scan
        projection + one groupBy on the key."""
        from gocrawl_spark.canonicalize import surt_key_expr

        d = F.col("doc_id")
        g = (d / 4).cast("long")
        h = (g % 10).cast("string")
        gs = g.cast("string")
        url = (
            F.when(d % 4 == 0, F.concat(
                F.lit("https://site"), h, F.lit(".example.com/page/"), gs,
                F.lit("?a=1&b=2")))
            .when(d % 4 == 1, F.concat(
                F.lit("HTTPS://WWW.SITE"), h, F.lit(".EXAMPLE.COM:443/PAGE/"),
                gs, F.lit("?A=1&B=2")))
            .when(d % 4 == 2, F.concat(
                F.lit("https://www2.site"), h, F.lit(".example.com/page/"),
                gs, F.lit("?b=2&a=1#frag")))
            .otherwise(F.concat(
                F.lit("http://u@site"), h, F.lit(".example.com:80/page/"),
                gs, F.lit("?b=2&&a=1")))
        )
        docs = _docs(spark, sf_dir).select("doc_id", url.alias("url"))
        return (
            docs.select("doc_id", surt_key_expr("url").alias("surt"))
            .groupBy("surt")
            .agg(
                F.count("*").alias("n_aliases"),
                F.min("doc_id").alias("canonical_doc"),
            )
        )

    q["crawl_surt_keys"] = crawl_surt_keys

    def _cdx_captures(spark, sf_dir):
        """Deterministic capture table: every synthetic page captured
        1 + doc_id%3 times, one day apart, payload alternating between
        two versions — the url/ts arithmetic mirrors synth.url_of /
        synth.pub_date so the oracle re-derives it in pure SQL."""
        d = F.col("doc_id")
        hostidx = F.when(d % 4 == 0, F.lit(0)).otherwise(
            (d % 15 + 1).cast("int")
        )
        host = F.concat(
            F.lit("site"), F.lpad(hostidx.cast("string"), 2, "0"),
            F.lit(".example.com"),
        )
        kind = (
            F.when(d % 17 == 3, F.lit("category"))
            .when(d % 3 != 0, F.lit("article"))
            .otherwise(F.lit("page"))
        )
        url = F.concat(
            F.lit("https://"), host, F.lit("/"), kind, F.lit("/"),
            d.cast("string"),
        )
        base_us = (
            F.lit(1672531200).cast("long")  # 2023-01-01 (synth._EPOCH)
            + (d % 365) * 86400 + (d % 24) * 3600 + (d % 60) * 60
        ) * F.lit(1000000).cast("long")
        return (
            _docs(spark, sf_dir)
            .select("doc_id", url.alias("url"), "text", base_us.alias("base_us"))
            .withColumn(
                "k", F.explode(F.sequence(F.lit(0), (d % 3).cast("int")))
            )
            .select(
                "url",
                (F.col("base_us") + F.col("k").cast("long") * 86400000000)
                .alias("ts_us"),
                F.concat(F.col("text"), (F.col("k") % 2).cast("string"))
                .alias("payload"),
            )
        )

    def crawl_cdx_index(spark, sf_dir):
        """CDX capture index (cdx.cdx_index): one record per capture
        with SURT key, epoch-µs timestamp, sha256 digest, and payload
        length — the web-archive lookup surface over the input_hint
        corpus shape. Pure scan projection, zero shuffle."""
        from gocrawl_spark import cdx

        return cdx.cdx_index(
            _cdx_captures(spark, sf_dir), payload_col="payload"
        )

    q["crawl_cdx_index"] = crawl_cdx_index

    def crawl_cdx_lookup(spark, sf_dir):
        """CDX domain range-scan + latest-capture collapse
        (cdx.cdx_lookup): all captures under one host prefix, most
        recent capture elected per key via max_by. Prefix filter on
        the sort key + one groupBy on the matched slice only."""
        from gocrawl_spark import cdx

        idx = cdx.cdx_index(_cdx_captures(spark, sf_dir), payload_col="payload")
        return cdx.cdx_lookup(idx, "com,example,site01)", latest_only=True)

    q["crawl_cdx_lookup"] = crawl_cdx_lookup

    def crawl_warc_revisit(spark, sf_dir):
        """WARC revisit-record election (cdx.revisit_records): the
        earliest capture of each payload digest stays a full response,
        later captures become revisit pointers (WARC/1.1 §6.7.2 — the
        Common-Crawl/Heritrix history-dedup mechanism). One map-side-
        combined min(struct) groupBy elects originals, one digest
        equi-join classifies — no per-digest window sort, so a hot
        digest (the empty page at 10^10 captures) cannot serialize
        onto one task."""
        from gocrawl_spark import cdx

        return cdx.revisit_records(
            _cdx_captures(spark, sf_dir), payload_col="payload"
        )

    q["crawl_warc_revisit"] = crawl_warc_revisit

    def crawl_host_dup_rate(spark, sf_dir):
        """Per-host duplication audit (cdx.host_dup_rate): what share
        of each host's captures are byte-duplicates (basis points,
        integer DIV) and how many payload bytes the revisit mechanism
        saves — the Common-Crawl per-crawl dedup rollup. The digest
        election shuffles once, then everything folds map-side to
        #hosts rows."""
        from gocrawl_spark import cdx

        return cdx.host_dup_rate(
            _cdx_captures(spark, sf_dir), payload_col="payload"
        )

    q["crawl_host_dup_rate"] = crawl_host_dup_rate

    def crawl_sitemap_coverage(spark, sf_dir):
        """Sitemap-vs-crawl coverage audit (sitemap.coverage_audit):
        per host, how many sitemap-declared URLs the crawl fetched
        (coverage in basis points), and the declared-only /
        crawled-only remainders. Declared set: every even doc URL
        plus a phantom /extra/ URL for doc_id%7==0 (never crawled);
        crawled set: every capture URL. One url-keyed full-outer
        equi-join, then a host-keyed partial-agg rollup."""
        from gocrawl_spark import sitemap

        d = F.col("doc_id")
        hostidx = F.when(d % 4 == 0, F.lit(0)).otherwise(
            (d % 15 + 1).cast("int")
        )
        host = F.concat(
            F.lit("site"), F.lpad(hostidx.cast("string"), 2, "0"),
            F.lit(".example.com"),
        )
        kind = (
            F.when(d % 17 == 3, F.lit("category"))
            .when(d % 3 != 0, F.lit("article"))
            .otherwise(F.lit("page"))
        )
        url = F.concat(
            F.lit("https://"), host, F.lit("/"), kind, F.lit("/"),
            d.cast("string"),
        )
        docs = _docs(spark, sf_dir)
        crawled = docs.select(url.alias("url"))
        declared = docs.filter(d % 2 == 0).select(url.alias("url")).unionAll(
            docs.filter(d % 7 == 0).select(
                F.concat(
                    F.lit("https://"), host, F.lit("/extra/"),
                    d.cast("string"),
                ).alias("url")
            )
        )
        return sitemap.coverage_audit(declared, crawled)

    q["crawl_sitemap_coverage"] = crawl_sitemap_coverage

    def crawl_politeness_audit(spark, sf_dir):
        """Politeness-compliance audit (frontier.politeness_audit):
        per host, consecutive same-host fetch gaps in (ts, url) order
        — min gap and the count of gaps under the 30-minute floor.
        One lag window per host partition (O(1) state per row), then
        a host-keyed partial-agg groupBy."""
        from gocrawl_spark import frontier

        caps = _cdx_captures(spark, sf_dir)
        log = caps.select(
            F.split(F.col("url"), "/").getItem(2).alias("host"),
            "ts_us",
            "url",
        )
        return frontier.politeness_audit(log, _POLITENESS_MIN_DELAY_US)

    q["crawl_politeness_audit"] = crawl_politeness_audit

    def corpus_lang_drift(spark, sf_dir):
        """Language-mix drift between two crawl snapshots
        (corpusstats.dist_drift): per-lang counts and integer-ppm
        shares for the current corpus vs a re-crawl that lost every
        doc_id%3==0 page, with |delta| ppm per lang. Two map-side-
        combined rollups to #langs rows; totals broadcast."""
        from gocrawl_spark import corpusstats

        docs = _docs(spark, sf_dir)
        return corpusstats.dist_drift(
            docs, docs.filter(F.col("doc_id") % 3 != 0), "lang"
        )

    q["corpus_lang_drift"] = corpus_lang_drift

    def crawl_frontier_pop(spark, sf_dir):
        """Politeness pop (P1-P4) over a frontier synthesized from
        documents: every doc URL at depth 0, budget 5/host."""
        docs = _docs(spark, sf_dir)
        frontier = udfs.with_url_identity(
            docs.select(
                F.concat(
                    F.lit("https://site"),
                    F.lpad((F.col("doc_id") % 7).cast("string"), 2, "0"),
                    F.lit(".example.com/doc/"),
                    F.col("doc_id").cast("string"),
                ).alias("url"),
                F.lit(0).alias("depth"),
                (F.col("doc_id") % 10).cast("int").alias("priority"),
                F.lit(0).alias("discovered_round"),
                F.col("doc_id").alias("discovery_seq"),
            )
        ).withColumn("budget", F.lit(5))
        from gocrawl_spark import frontier as fr

        return fr.pop_batch(frontier, n_salts=4).select("url", "domain", "priority")

    q["crawl_frontier_pop"] = crawl_frontier_pop

    def robots_gate_s3(spark, sf_dir):
        """S3 robots allow/deny: urls derived from doc_id routed through
        the real parser+gate (gocrawl_spark.robots); the oracle
        re-derives the longest-match decision for the synthetic ruleset
        independently in SQL."""
        from gocrawl_spark import robots as rb

        docs = _docs(spark, sf_dir)
        path = (
            F.when(F.col("doc_id") % 4 == 0, F.concat(F.lit("/article/"), F.col("doc_id")))
            .when(F.col("doc_id") % 4 == 1, F.concat(F.lit("/category/"), F.col("doc_id")))
            .when(F.col("doc_id") % 4 == 2, F.concat(F.lit("/page/"), F.col("doc_id")))
            .otherwise(F.concat(F.lit("/page/1"), F.col("doc_id")))
        )
        host = F.concat(
            F.lit("site"), F.lpad((F.col("doc_id") % 16).cast("string"), 2, "0"),
            F.lit(".example.com"),
        )
        urls = docs.select(
            "doc_id",
            F.concat(F.lit("https://"), host, path).alias("url"),
            host.alias("host"),
        )
        return rb.gate(urls, rb.synth_robots(spark)).select("doc_id", "url")

    q["robots_gate_s3"] = robots_gate_s3

    def parse_date_e10(spark, sf_dir):
        """E10: Go-layout cascade parse; date strings rendered JVM-side
        from a doc_id-derived timestamp, parsed back by the kernel."""
        ts = F.to_timestamp(F.lit("2023-01-01 00:00:00")) + F.make_interval(
            days=(F.col("doc_id") % 365).cast("int"), hours=(F.col("doc_id") % 24).cast("int")
        )
        date_str = (
            F.when(F.col("doc_id") % 4 == 0, F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'"))
            .when(F.col("doc_id") % 4 == 1, F.date_format(ts, "yyyy-MM-dd"))
            .when(F.col("doc_id") % 4 == 2, F.date_format(ts, "yyyy-MM-dd HH:mm:ss"))
            .otherwise(F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss"))
        )
        return _docs(spark, sf_dir).select(
            "doc_id",
            date_str.alias("date_str"),
            udfs.parse_date_udf(date_str).alias("parsed"),
        )

    q["parse_date_e10"] = parse_date_e10

    def prepare_v9(spark, sf_dir):
        """V9 PrepareForIndexing (article.go:110-186) as pure Catalyst
        expressions: blank og_title when equal to title, whitespace-only
        strings to empty, tags trimmed/deduped keeping first occurrence,
        null when empty."""
        d = F.col("doc_id")
        title = F.concat(F.lit("Doc "), d)
        og_title_raw = F.when(d % 2 == 0, title).otherwise(F.concat(F.lit("OG "), d))
        desc_raw = F.when(d % 3 == 0, F.lit("   ")).otherwise(F.concat(F.lit("desc "), d))
        tags_raw = F.array(
            F.concat(F.lit("tag"), (d % 5)),
            F.concat(F.lit(" tag"), (d % 5), F.lit(" ")),
            F.concat(F.lit("x"), (d % 3)),
            F.lit(""),
        )
        tags = F.array_distinct(
            # NB: not F.transform(tags_raw, F.trim) — transform feeds the
            # element index as trim's trimStr argument
            F.filter(F.transform(tags_raw, lambda x: F.trim(x)), lambda x: x != F.lit(""))
        )
        return _docs(spark, sf_dir).select(
            "doc_id",
            F.when(F.trim(og_title_raw) == F.trim(title), F.lit("")).otherwise(
                og_title_raw
            ).alias("og_title"),
            F.when(F.trim(desc_raw) == "", F.lit("")).otherwise(desc_raw).alias("description"),
            F.when(F.size(tags) == 0, F.lit(None)).otherwise(
                F.array_join(tags, "|")
            ).alias("tags_s"),
        )

    q["prepare_v9"] = prepare_v9

    def upsert_articles_s5(spark, sf_dir):
        """S5 idempotent doc-id upsert (storage.go:85-139): two write
        generations merged keep-latest-per-id — the Iceberg MERGE INTO
        analogue expressed as a dedupe window."""
        from pyspark.sql import Window

        docs = _docs(spark, sf_dir)
        v0 = docs.select("doc_id", F.lit(0).alias("version"), "source")
        v1 = (
            docs.filter(F.col("doc_id") % 10 == 0)
            .select("doc_id", F.lit(1).alias("version"), F.lit("updated").alias("source"))
        )
        w = Window.partitionBy("doc_id").orderBy(F.desc("version"))
        return (
            v0.unionByName(v1)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("doc_id", "version", "source")
        )

    q["upsert_articles_s5"] = upsert_articles_s5

    def get_document_s8(spark, sf_dir):
        """S8 point lookup by generated id (sha256 of a url-shaped key)."""
        key = F.concat(F.lit("https://example.com/doc/"), F.col("doc_id").cast("string"))
        return (
            _docs(spark, sf_dir)
            .withColumn("id", F.sha2(key, 256))
            .filter(F.col("doc_id").isin(7, 42, 421))
            .select("id", "doc_id", "source", F.sha2(F.col("text"), 256).alias("text_sha"))
        )

    q["get_document_s8"] = get_document_s8

    def discover_selectors_e15(spark, sf_dir):
        """E15 selector auto-discovery (reference
        internal/generator/discovery.go): candidate CSS selectors voted
        by corpus-wide support × confidence. Runs the real htmlmini
        matcher over every page (sample=None → deterministic support
        fractions); the oracle independently re-derives each
        candidate's support from the known fixture templates (which
        selectors structurally exist in article vs page HTML)."""
        from gocrawl_spark import discovery

        corpus = synth.corpus_from_documents(spark, sf_dir)
        return discovery.discover_selectors(corpus, sample=None).select(
            "field", "selector", F.round("score", 6).alias("score")
        )

    q["discover_selectors_e15"] = discover_selectors_e15

    def search_aggs_terms_a2(spark, sf_dir):
        """A2 ES-aggs passthrough: terms bucket + metric sub-aggs over
        events (decimal-rounded sum for cross-engine determinism)."""
        ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
            "value_dec", F.round(F.col("value"), 4).cast("decimal(18,4)")
        )
        out = search.es_aggs(
            ev,
            {
                "by_type": {
                    "terms": {"field": "event_type", "size": 4},
                    "aggs": {
                        "sum_value": {"sum": {"field": "value_dec"}},
                        "n_users": {"cardinality": {"field": "user_id"}},
                    },
                }
            },
        )
        return out.select(
            "key", "doc_count", F.col("sum_value").cast("double").alias("sum_value"), "n_users"
        )

    q["search_aggs_terms_a2"] = search_aggs_terms_a2

    def search_aggs_minmax_a2(spark, sf_dir):
        """A2: terms bucket with min/max/value_count metric sub-aggs
        (decimal-exact values for cross-engine hashing)."""
        ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
            "value_dec", F.round(F.col("value"), 4).cast("decimal(18,4)")
        )
        out = search.es_aggs(
            ev,
            {
                "by_type": {
                    "terms": {"field": "event_type", "size": 3},
                    "aggs": {
                        "min_value": {"min": {"field": "value_dec"}},
                        "max_value": {"max": {"field": "value_dec"}},
                        "n_vals": {"value_count": {"field": "value"}},
                    },
                }
            },
        )
        return out.select(
            "key",
            "doc_count",
            F.col("min_value").cast("double").alias("min_value"),
            F.col("max_value").cast("double").alias("max_value"),
            "n_vals",
        )

    q["search_aggs_minmax_a2"] = search_aggs_minmax_a2

    def search_aggs_cardinality_a2(spark, sf_dir):
        """A2 bare metric agg (size:0-style body, one row out)."""
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        return search.es_aggs(ev, {"users": {"cardinality": {"field": "user_id"}}})

    q["search_aggs_cardinality_a2"] = search_aggs_cardinality_a2

    def search_aggs_datehist_a2(spark, sf_dir):
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        out = search.es_aggs(
            ev, {"per_day": {"date_histogram": {"field": "ts", "calendar_interval": "month"}}}
        )
        return out.select(F.date_format("key", "yyyy-MM-dd").alias("key"), "doc_count")

    q["search_aggs_datehist_a2"] = search_aggs_datehist_a2

    def search_bool_wildcard(spark, sf_dir):
        """ES DSL tail (A5 pass-through surface): a `query_string`
        must clause — Lucene subset with AND/OR/NOT, parens and a
        negated term, parsed into the SAME clause dicts the bool
        compiler executes (search.parse_query_string) — under a
        `wildcard` filter (`?`/`*` on the raw keyword-style source
        field, constant score, no score contribution from filter
        context). One scan projection + boolean filter, same as every
        bool_topk plan."""
        return search.bool_topk(
            _docs(spark, sf_dir),
            {
                "must": [{"query_string": {
                    "query": "table AND (scan OR merge) AND NOT batch",
                    "default_field": "text",
                }}],
                "filter": [{"wildcard": {"source": "src?3*"}}],
            },
            id_col="doc_id",
            k=15,
        )

    q["search_bool_wildcard"] = search_bool_wildcard

    def search_aggs_nested_a2(spark, sf_dir):
        """Nested bucket agg (A2 tail): terms(lang) with an avg metric
        AND a terms(source) sub-bucket carrying its own max metric —
        flattened to one row per (outer, inner) bucket with per-level
        ES orderings and size limits (inner size via one window over
        the aggregated buckets, not the raw rows)."""
        out = search.es_aggs(
            _docs(spark, sf_dir),
            {
                "by_lang": {
                    "terms": {"field": "lang", "size": 3},
                    "aggs": {
                        "avg_chars": {"avg": {"field": "n_chars"}},
                        "by_source": {
                            "terms": {"field": "source", "size": 2},
                            "aggs": {
                                "max_chars": {"max": {"field": "n_chars"}}
                            },
                        },
                    },
                }
            },
        )
        return out.select(
            "key", "doc_count", F.round("avg_chars", 6).alias("avg_chars"),
            "by_source_key", "by_source_doc_count", "by_source_max_chars",
        )

    q["search_aggs_nested_a2"] = search_aggs_nested_a2

    def search_aggs_histogram_a2(spark, sf_dir):
        """Numeric `histogram` bucket agg (A2 tail): fixed interval
        over n_chars with an avg sub-metric; empty buckets between the
        data min and max emit doc_count 0 (ES min_doc_count=0 default)
        via a 1-row bounds aggregate + sequence explode — no second
        data scan."""
        out = search.es_aggs(
            _docs(spark, sf_dir),
            {
                "chars_hist": {
                    "histogram": {"field": "n_chars", "interval": 50},
                    "aggs": {"avg_chars": {"avg": {"field": "n_chars"}}},
                }
            },
        )
        return out.select(
            "key", "doc_count", F.round("avg_chars", 6).alias("avg_chars")
        )

    q["search_aggs_histogram_a2"] = search_aggs_histogram_a2

    def search_aggs_range_a2(spark, sf_dir):
        """ES `range` bucket agg (A2 tail): explicit [from, to)
        buckets — the third bucket OVERLAPS the second (a doc lands in
        every matching range) and empty buckets still emit, both
        semantics a plain groupBy can't express; one conditional-agg
        scan, unpivoted in declared order."""
        out = search.es_aggs(
            _docs(spark, sf_dir),
            {
                "chars_ranges": {
                    "range": {
                        "field": "n_chars",
                        "ranges": [
                            {"to": 150},
                            {"from": 150, "to": 300},
                            {"from": 250, "to": 400},
                            {"from": 400},
                        ],
                    },
                    "aggs": {"avg_chars": {"avg": {"field": "n_chars"}}},
                }
            },
        )
        return out.select(
            "key", "doc_count", F.round("avg_chars", 6).alias("avg_chars")
        )

    q["search_aggs_range_a2"] = search_aggs_range_a2

    def search_bool_fuzzy(spark, sf_dir):
        """ES `fuzzy` leaf inside the bool compositor + Lucene `term~`
        fuzzy suffix via query_string: each fuzzy leaf pre-expands
        against the corpus vocabulary (search._expand_fuzzy_clauses →
        fuzzy_expansions) into a should-of-matches sub-bool, so typo
        tolerance composes with every other context — here a must
        fuzzy ("tble"), a should query_string fuzzy ("merg~"), and a
        must_not keyword term."""
        return search.bool_topk(
            _docs(spark, sf_dir),
            {
                "must": [{"fuzzy": {"text": {"value": "tble",
                                             "fuzziness": 1}}}],
                "should": [{"query_string": {"query": "merg~",
                                             "default_field": "text"}}],
                "must_not": [{"term": {"lang": "de"}}],
            },
            id_col="doc_id",
            k=12,
        )

    q["search_bool_fuzzy"] = search_bool_fuzzy

    def search_aggs_stats_a2(spark, sf_dir):
        """Multi-valued metric sub-aggs (A2 tail): ES `stats`
        (count/min/max/avg/sum columns) + `percentiles` (exact
        interpolated p50/p95, the deterministic stand-in for ES's
        t-digest) under a terms bucket — on a bigint field so the sums
        stay order-independent across engines."""
        out = search.es_aggs(
            _docs(spark, sf_dir),
            {
                "by_lang": {
                    "terms": {"field": "lang", "size": 3},
                    "aggs": {
                        "chars": {"stats": {"field": "n_chars"}},
                        "chars_pct": {"percentiles": {
                            "field": "n_chars", "percents": [50, 95],
                        }},
                    },
                }
            },
        )
        return out.select(
            "key", "doc_count", "chars_count", "chars_min", "chars_max",
            F.round("chars_avg", 6).alias("chars_avg"), "chars_sum",
            F.round("chars_pct_p50", 6).alias("chars_pct_p50"),
            F.round("chars_pct_p95", 6).alias("chars_pct_p95"),
        )

    q["search_aggs_stats_a2"] = search_aggs_stats_a2

    def search_aggs_filters_a2(spark, sf_dir):
        """ES `filters` bucket agg (A2 tail): one bucket per named
        query clause — here a match (analyzed TF predicate), a range,
        and a nested bool — with an avg sub-metric; buckets may
        overlap and emit in declared order even when empty, the
        semantics a groupBy can't express (one conditional-agg
        scan)."""
        out = search.es_aggs(
            _docs(spark, sf_dir),
            {
                "slices": {
                    "filters": {"filters": {
                        "mentions_table": {"match": {"text": "table"}},
                        "long_docs": {"range": {"n_chars": {"gte": 300}}},
                        "short_en": {"bool": {"must": [
                            {"term": {"lang": "en"}},
                            {"range": {"n_chars": {"lt": 200}}},
                        ]}},
                    }},
                    "aggs": {"avg_chars": {"avg": {"field": "n_chars"}}},
                }
            },
        )
        return out.select(
            "key", "doc_count", F.round("avg_chars", 6).alias("avg_chars")
        )

    q["search_aggs_filters_a2"] = search_aggs_filters_a2

    def search_bool_misc(spark, sf_dir):
        """Remaining ES leaf tail in one bool query: `regexp`
        (anchored Lucene-style whole-value match on the keyword
        source), `ids` (id-list membership, filter context), `exists`
        and `prefix` — constant-score leaves around a scoring match."""
        return search.bool_topk(
            _docs(spark, sf_dir),
            {
                "must": [{"match": {"text": "data"}}],
                "should": [{"regexp": {"source": "src[0-9]"}}],
                "filter": [
                    {"ids": {"values": list(range(0, 400, 2))}},
                    {"exists": {"field": "lang"}},
                    {"prefix": {"source": "src"}},
                ],
            },
            id_col="doc_id",
            k=20,
        )

    q["search_bool_misc"] = search_bool_misc

    def search_request_aggs(spark, sf_dir):
        """Full ES _search request body in one call (search.es_search
        — the exact shape the reference's storage layer forwards
        verbatim, storage.go:212-257/364-415): a bool query filters
        the scope, the terms agg + avg sub-metric run over the
        FILTERED scope like ES; one scan projection + one boolean
        filter feed hits, total and aggs."""
        out = search.es_search(
            _docs(spark, sf_dir),
            {
                "query": {"bool": {
                    "must": [{"match": {"text": "data"}}],
                    "filter": [{"range": {"n_chars": {"gte": 150}}}],
                }},
                "aggs": {"by_lang": {
                    "terms": {"field": "lang", "size": 4},
                    "aggs": {"avg_chars": {"avg": {"field": "n_chars"}}},
                }},
                "size": 0,
            },
            id_col="doc_id",
        )
        return out["aggs"].select(
            "key", "doc_count", F.round("avg_chars", 6).alias("avg_chars")
        )

    q["search_request_aggs"] = search_request_aggs

    def search_aggs_composite_a2(spark, sf_dir):
        """ES `composite` bucket agg (A2 tail): (lang, source) bucket
        tuples streamed in key order with after-keyset pagination —
        the agg that pages an unbounded bucket space through bounded
        responses (each page = one groupBy + a struct-comparison
        keyset filter; no global collect at 100 TB)."""
        out = search.es_aggs(
            _docs(spark, sf_dir),
            {
                "pages": {
                    "composite": {
                        "size": 6,
                        "sources": [
                            {"lang": {"terms": {"field": "lang"}}},
                            {"src": {"terms": {"field": "source"}}},
                        ],
                        "after": {"lang": "en", "src": "src12"},
                    },
                    "aggs": {"avg_chars": {"avg": {"field": "n_chars"}}},
                }
            },
        )
        return out.select(
            "lang", "src", "doc_count",
            F.round("avg_chars", 6).alias("avg_chars"),
        )

    q["search_aggs_composite_a2"] = search_aggs_composite_a2

    def search_aggs_tophits_a2(spark, sf_dir):
        """ES `top_hits` sub-agg (A2 tail): the top documents of each
        terms bucket by an explicit sort — one window over the
        bucket-keyed rows, flattened to a (bucket, hit) row each, with
        _source columns as the deterministic tie-break."""
        out = search.es_aggs(
            _docs(spark, sf_dir),
            {
                "by_lang": {
                    "terms": {"field": "lang", "size": 3},
                    "aggs": {"longest": {"top_hits": {
                        "size": 2,
                        "sort": [{"n_chars": "desc"}],
                        "_source": ["doc_id", "n_chars"],
                    }}},
                }
            },
        )
        return out.select(
            "key", "doc_count", "longest_rank", "doc_id", "n_chars"
        )

    q["search_aggs_tophits_a2"] = search_aggs_tophits_a2

    def search_bool_dismax(spark, sf_dir):
        """ES `dis_max` compound query (search._compile_leaf): best of
        two match sub-queries + tie_breaker·(other matching scores) —
        Lucene's disjunction-max scoring for fields/phrasings that
        shouldn't ADD. Compiles into the same single scan projection +
        boolean filter as every bool-compositor query."""
        return search.bool_topk(
            _docs(spark, sf_dir),
            {
                "must": [{"dis_max": {
                    "queries": [
                        {"match": {"text": "table scan"}},
                        {"match": {"text": "merge join"}},
                    ],
                    "tie_breaker": 0.3,
                }}],
                "filter": [{"range": {"doc_id": {"gte": 5, "lt": 480}}}],
            },
            id_col="doc_id",
            k=15,
        )

    q["search_bool_dismax"] = search_bool_dismax

    def search_function_score(spark, sf_dir):
        """ES `function_score` compound (search._compile_leaf): a
        match sub-query decides matching; a filtered weight function
        (lang=en → 2.0) and an unfiltered field_value_factor
        (sqrt(0.01·n_chars)) combine per score_mode=sum, then multiply
        the query's TF score (boost_mode=multiply). sqrt keeps the
        oracle bit-equal (IEEE-exact in both engines). Pure column
        arithmetic on the same single-scan bool_topk plan."""
        return search.bool_topk(
            _docs(spark, sf_dir),
            {
                "must": [{"function_score": {
                    "query": {"match": {"text": "table scan"}},
                    "functions": [
                        {"filter": {"term": {"lang": "en"}}, "weight": 2.0},
                        {"field_value_factor": {
                            "field": "n_chars", "factor": 0.01,
                            "modifier": "sqrt", "missing": 1.0}},
                    ],
                    "score_mode": "sum",
                    "boost_mode": "multiply",
                }}],
            },
            id_col="doc_id",
            k=15,
        )

    q["search_function_score"] = search_function_score

    def search_terms_set(spark, sf_dir):
        """ES `terms_set` leaf: analyzed-term membership where each
        document carries its own required match count
        (minimum_should_match_field) — here a derived req_terms column
        (doc_id mod 3 + 1). Score = Σ TF of present query terms (the
        match leaf's TF scoring)."""
        docs = _docs(spark, sf_dir).withColumn(
            "req_terms", (F.col("doc_id") % 3 + 1).cast("int")
        )
        return search.bool_topk(
            docs,
            {
                "must": [{"terms_set": {"text": {
                    "terms": ["table", "merge", "vector"],
                    "minimum_should_match_field": "req_terms",
                }}}],
                "filter": [{"range": {"doc_id": {"lt": 400}}}],
            },
            id_col="doc_id",
            k=15,
        )

    q["search_terms_set"] = search_terms_set

    def search_pinned(spark, sf_dir):
        """ES `pinned` query: promoted ids rank first in list order
        (score base 1e6 − position, dominating any organic score),
        organic hits follow under their own match scores — ES's
        searchable-ads primitive, one CASE column, no extra plan
        nodes."""
        return search.bool_topk(
            _docs(spark, sf_dir),
            {
                "must": [{"pinned": {
                    "ids": [42, 7, 99],
                    "organic": {"match": {"text": "merge join"}},
                }}],
            },
            id_col="doc_id",
            k=15,
        )

    q["search_pinned"] = search_pinned

    def search_span_near(spark, sf_dir):
        """Lucene `span_near` (in_order=true): 'table' then 'scan'
        within slop 2 intervening positions; score = anchored
        matching-window count via a greedy subsequence fold
        (search._subseq_window_count) — per-row column expression,
        no join, codegen-able; slop=0 degenerates to match_phrase."""
        return search.bool_topk(
            _docs(spark, sf_dir),
            {
                "must": [{"span_near": {
                    "clauses": [
                        {"span_term": {"text": "table"}},
                        {"span_term": {"text": "scan"}},
                    ],
                    "slop": 2,
                    "in_order": True,
                }}],
            },
            id_col="doc_id",
            k=15,
        )

    q["search_span_near"] = search_span_near

    def search_rank_feature(spark, sf_dir):
        """ES `rank_feature` should-clause shaping a relevance boost
        from a numeric feature: saturation n_chars/(n_chars+pivot)
        × boost added to the match TF score — the static-quality-
        signal ranking pattern (pagerank/freshness boosting) as pure
        IEEE-exact column arithmetic."""
        return search.bool_topk(
            _docs(spark, sf_dir),
            {
                "must": [{"match": {"text": "table"}}],
                "should": [{"rank_feature": {
                    "field": "n_chars",
                    "saturation": {"pivot": 300},
                    "boost": 5.0,
                }}],
            },
            id_col="doc_id",
            k=15,
        )

    q["search_rank_feature"] = search_rank_feature

    def events_asof_join(spark, sf_dir):
        """As-of join (timeops.asof_join): each click event matched to
        the latest view at-or-before it by the same user — the
        state-at-event-time primitive (which robots snapshot / host
        config was live at fetch time). Tagged UNION + one window
        carry-forward: ONE key shuffle, no join operator, no pair
        explosion; DuckDB's native ASOF JOIN is the oracle. gap_us is
        exact integer microseconds."""
        from gocrawl_spark import timeops

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        clicks = ev.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts"
        )
        views = ev.filter(F.col("event_type") == "view").select(
            "user_id", "ts", F.col("event_id").alias("view_id")
        )
        out = timeops.asof_join(
            clicks, views, on="user_id", how="inner"
        )
        return out.select(
            "event_id",
            "user_id",
            "view_id",
            (
                timeops._epoch_us(F.col("ts"))
                - timeops._epoch_us(F.col("ts_r"))
            ).alias("gap_us"),
        )

    q["events_asof_join"] = events_asof_join

    def events_interval_join(spark, sf_dir):
        """Interval containment join (timeops.interval_join): error
        events open 600 s incident windows per user; click events
        inside each window aggregate to an order-exact integer-cents
        total. The non-equi containment join runs as a granule-
        bucketed EQUI-join (each window explodes into ≤2 600 s
        granules, each event maps to exactly 1) — shuffled hash/sort-
        merge, never BroadcastNestedLoop, the property the plan
        contract pins."""
        from gocrawl_spark import timeops

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        incidents = ev.filter(F.col("event_type") == "error").select(
            F.col("event_id").alias("incident_id"),
            "user_id",
            F.col("ts").alias("start"),
            (F.col("ts") + F.expr("INTERVAL 600 SECONDS")).alias("end"),
        )
        clicks = ev.filter(F.col("event_type") == "click").select(
            "user_id", "ts", "event_id", "value"
        )
        joined = timeops.interval_join(
            clicks, incidents, on="user_id", granule_s=600, how="left"
        )
        return joined.groupBy("incident_id", "user_id").agg(
            F.count("event_id").alias("n_clicks"),
            (
                F.coalesce(
                    F.sum(F.round(F.col("value") * 100, 0).cast("long")),
                    F.lit(0),
                )
                / F.lit(100.0)
            ).alias("sum_value"),
        )

    q["events_interval_join"] = events_interval_join

    def events_time_rollup(spark, sf_dir):
        """One-pass multi-granularity rollup (timeops.time_rollup):
        hour and day buckets × event_type in a single GROUPING SETS
        aggregate — Expand + ONE shuffle with map-side combine,
        versus a scan+shuffle per granularity if spelled as a UNION
        of group-bys. Sums go through integer cents so they are
        order-exact at any parallelism."""
        from gocrawl_spark import timeops

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        return timeops.time_rollup(
            ev,
            keys=["event_type"],
            value="value",
            granularities=("hour", "day"),
        )

    q["events_time_rollup"] = events_time_rollup

    def events_funnel(spark, sf_dir):
        """Ordered-step conversion funnel (eventops.funnel):
        view → click → purchase, step k counted only at-or-after step
        k−1's earliest completion. The chained recurrence folds into
        ONE window pass + a same-partitioning aggregate — one user
        Exchange total, versus a shuffle per step for the
        join-per-stage spelling."""
        from gocrawl_spark import eventops

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        return eventops.funnel(ev, ["view", "click", "purchase"])

    q["events_funnel"] = events_funnel

    def events_funnel_skewed(spark, sf_dir):
        """Adversarial-skew funnel leg (VERDICT r4 item 7): one
        synthetic bot user re-keyed to hold 10% of ALL events
        (event_id % 10 = 0 → user 0) before the user-keyed chained
        window — regressions in the window plan under hot-key
        pressure show up here while the uniform events_funnel stays
        flat. Identical funnel semantics on the re-keyed stream."""
        from gocrawl_spark import eventops

        ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
            "user_id",
            F.when(F.col("event_id") % 10 == 0, F.lit(0)).otherwise(
                F.col("user_id")
            ),
        )
        return eventops.funnel(ev, ["view", "click", "purchase"])

    q["events_funnel_skewed"] = events_funnel_skewed

    def events_cohort_retention(spark, sf_dir):
        """Day-grain cohort retention (eventops.cohort_retention):
        users bucketed by first-active day, activity counted per day
        offset with exact integer counts and an exact-ratio retention
        column."""
        from gocrawl_spark import eventops

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        return eventops.cohort_retention(ev, max_offset_days=30)

    q["events_cohort_retention"] = events_cohort_retention

    def events_transitions(spark, sf_dir):
        """First-order event-type transition matrix
        (eventops.transitions): lag over each user's time-ordered
        stream (event_id tie-break), exact pair counts, probabilities
        as exact-integer ratios."""
        from gocrawl_spark import eventops

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        return eventops.transitions(ev)

    q["events_transitions"] = events_transitions

    def search_intervals(spark, sf_dir):
        """ES `intervals` query (search._compile_leaf): any_of over
        two ordered match rules with max_gaps — proximity search as
        the same anchored greedy-subsequence fold as span_near
        (slop ≡ max_gaps), best-rule count as the score. Single-scan
        column expression."""
        return search.bool_topk(
            _docs(spark, sf_dir),
            {
                "must": [{"intervals": {"text": {
                    "any_of": {"intervals": [
                        {"match": {"query": "table scan",
                                   "max_gaps": 1, "ordered": True}},
                        {"match": {"query": "merge join",
                                   "max_gaps": 1, "ordered": True}},
                    ]},
                }}}],
            },
            id_col="doc_id",
            k=15,
        )

    q["search_intervals"] = search_intervals

    def search_combined_fields(spark, sf_dir):
        """ES `combined_fields` (search._compile_leaf): term-centric
        scoring over a virtual combined field — each query term's
        frequency is the boost-weighted sum of its per-field TFs
        (source^2 doubles source hits); operator=or. One scan, both
        fields analyzed once."""
        return search.bool_topk(
            _docs(spark, sf_dir),
            {
                "must": [{"combined_fields": {
                    "query": "table src3",
                    "fields": ["text", "source^2"],
                    "operator": "or",
                }}],
            },
            id_col="doc_id",
            k=15,
        )

    q["search_combined_fields"] = search_combined_fields

    def corpus_kmv_users(spark, sf_dir):
        """Bottom-k (KMV) set-resemblance sketch
        (corpusstats.kmv_jaccard): Jaccard of the first-half vs
        second-half active-user sets from the k=64 smallest md5-order
        members of the union — Broder's estimator, the
        URL-seen-set-overlap primitive across crawl generations at
        scale (each side reduces to ≤k rows, mergeable by
        construction). exact=True adds the full-join truth as the
        evaluation twin."""
        from gocrawl_spark import corpusstats as cs

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        wk1 = ev.filter(F.col("ts") < F.lit("2024-01-16")).select("user_id")
        wk2 = ev.filter(F.col("ts") >= F.lit("2024-01-16")).select("user_id")
        return cs.kmv_jaccard(wk1, wk2, "user_id", k=64, exact=True)

    q["corpus_kmv_users"] = corpus_kmv_users

    def events_json_props(spark, sf_dir):
        """Semi-structured column handling: JSON-path extraction from
        the events `props` payload (get_json_object — JVM-side JSON,
        no UDF) rolled up per event_type with exact integer sums and
        an exact-ratio mean."""
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        k = F.get_json_object("props", "$.k").cast("int")
        return (
            ev.select("event_type", k.alias("k"))
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.count("k").alias("n_k"),
                F.sum("k").cast("long").alias("sum_k"),
                F.min("k").alias("min_k"),
                F.max("k").alias("max_k"),
                (F.sum("k").cast("long") / F.count("k")).alias("avg_k"),
            )
        )

    q["events_json_props"] = events_json_props

    def curate_bitext_filters(spark, sf_dir):
        """Bitext-pair hygiene battery (curation.bitext_filters — the
        ParaCrawl/CCMatrix post-mining pass): even-id docs paired with
        odd-id docs as candidate (src, tgt); per-pair token-ratio
        check in exact integer math, identical-copy flag, token-set
        Jaccard overlap in integer ppm, empty-side flag, and the
        combined keep verdict plus a lang-agreement column. Pure
        per-row projection after the pair join."""
        from gocrawl_spark import curation

        docs = _docs(spark, sf_dir)
        src = docs.filter(F.col("doc_id") % 2 == 0).select(
            F.expr("doc_id DIV 2").alias("pair_id"),
            F.col("text").alias("src_text"),
            F.col("lang").alias("src_lang"),
        )
        tgt = docs.filter(F.col("doc_id") % 2 == 1).select(
            F.expr("doc_id DIV 2").alias("pair_id"),
            F.col("text").alias("tgt_text"),
            F.col("lang").alias("tgt_lang"),
        )
        out = curation.bitext_filters(
            src.join(tgt, "pair_id"), max_overlap_ppm=600_000
        )
        return out.select(
            "pair_id",
            "n_tok_src",
            "n_tok_tgt",
            "ratio_ok",
            "identical",
            "overlap_ppm",
            "empty",
            "keep",
            (F.col("src_lang") == F.col("tgt_lang")).alias("lang_match"),
        )

    q["curate_bitext_filters"] = curate_bitext_filters

    def events_rollup_merge(spark, sf_dir):
        """Incremental-view maintenance (timeops.rollup_merge): the
        rollup of the first half-month MERGED with the rollup of the
        rest must equal the direct full rollup — counts and integer-
        cent sums are associative, so a day's delta folds into the
        materialized aggregate without re-scanning history. The oracle
        IS the direct full rollup, so a green row proves merge
        correctness, not just shape."""
        from gocrawl_spark import timeops

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        cut = F.lit("2024-01-16")
        half1 = timeops.time_rollup(
            ev.filter(F.col("ts") < cut), keys=["event_type"],
            value="value", granularities=("hour", "day"), as_cents=True,
        )
        half2 = timeops.time_rollup(
            ev.filter(F.col("ts") >= cut), keys=["event_type"],
            value="value", granularities=("hour", "day"), as_cents=True,
        )
        merged = timeops.rollup_merge(half1, half2)
        return merged.select(
            "granularity",
            "bucket",
            "event_type",
            "n_events",
            (F.col("sum_cents") / F.lit(100.0)).alias("sum_value"),
        )

    q["events_rollup_merge"] = events_rollup_merge

    def events_rate_anomaly(spark, sf_dir):
        """Hourly-rate anomaly audit (eventops.rate_anomaly): per-type
        bucket counts flagged when |n − median| > 3·MAD, both order
        statistics rank-selected lower medians in exact integer math —
        the fetch-burst/dead-feed ops alarm."""
        from gocrawl_spark import eventops

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        return eventops.rate_anomaly(ev)

    q["events_rate_anomaly"] = events_rate_anomaly

    def events_m4_downsample(spark, sf_dir):
        """M4 downsampling (timeops.m4_downsample — Jugel et al.,
        PVLDB'14): per (event_type, 6 h bucket) the four extreme
        points (first/last/min/max), the pixel-perfect reduction for
        charting a billion-point series — one map-side-combining
        groupBy, struct-ordered deterministic ties."""
        from gocrawl_spark import timeops

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        return timeops.m4_downsample(
            ev, keys=["event_type"], bucket_s=21600
        )

    q["events_m4_downsample"] = events_m4_downsample

    def events_asof_nearest(spark, sf_dir):
        """asof_join direction='nearest' (pandas merge_asof's third
        mode): each click matched to the CLOSER of its latest prior /
        earliest later view, backward on ties, within a 1-day
        tolerance — both carries computed over one key Exchange.
        The oracle picks the same winner via explicit lead/lag
        window logic."""
        from gocrawl_spark import timeops

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        clicks = ev.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts"
        )
        views = ev.filter(F.col("event_type") == "view").select(
            "user_id", "ts", F.col("event_id").alias("view_id")
        )
        out = timeops.asof_join(
            clicks, views, on="user_id", direction="nearest",
            tolerance=86400, how="inner",
        )
        return out.select(
            "event_id",
            "user_id",
            "view_id",
            (
                timeops._epoch_us(F.col("ts"))
                - timeops._epoch_us(F.col("ts_r"))
            ).alias("gap_us"),
        )

    q["events_asof_nearest"] = events_asof_nearest

    def corpus_judge_agreement(spark, sf_dir):
        """Filter-ensemble agreement (curation.judge_agreement): do
        the Gopher rule gate, the quality heuristic, and a length gate
        actually agree before their votes gate the corpus? Pairwise
        Cohen's κ + Fleiss' κ over all three, exact integer
        contingency mass in ONE aggregation pass."""
        from gocrawl_spark import curation

        docs = _docs(spark, sf_dir)
        st = textstats.gopher_stats("text")
        verdicts = docs.select(
            "doc_id",
            textstats.gopher_keep(st).alias("j_gopher"),
            (F.round(textstats.quality_score("text"), 6) >= 0.5).alias(
                "j_quality"
            ),
            (F.col("n_chars") >= 200).alias("j_len"),
        )
        return curation.judge_agreement(
            verdicts, ["j_gopher", "j_quality", "j_len"]
        )

    q["corpus_judge_agreement"] = corpus_judge_agreement

    def text_clf_reliability(spark, sf_dir):
        """Calibration-reliability table (curation.clf_reliability):
        the hashed linear classifier's scores vs the Gopher gate as
        weak labels, ten equal-count rank bins with integer-ppm
        positive rates — the FineWeb-style calibration card that
        complements text_quality_roc's AUC."""
        from gocrawl_spark import curation

        docs = _docs(spark, sf_dir)
        w = curation.hash_weights(spark, buckets=1024, seed="quality-clf")
        scores = curation.clf_score(docs, w, buckets=1024)
        st = textstats.gopher_stats("text")
        labels = docs.select(
            "doc_id", textstats.gopher_keep(st).alias("label")
        )
        return curation.clf_reliability(scores, labels, n_bins=10)

    q["text_clf_reliability"] = text_clf_reliability

    def crawl_rule_attribution(spark, sf_dir):
        """Per-rule robots hit attribution (robots.rule_attribution):
        for every synthetic URL the WINNING robots.txt line under RFC
        9309 longest-match (Allow wins ties, no match ⇒ NULL rule),
        rolled up to (host, pattern, allow, verdict, n_urls) — the
        coverage-cost audit showing which Disallow line blocks how
        much of each host. Exploded rule table (metadata-small,
        broadcast join) + one winner window per URL."""
        from gocrawl_spark import robots as rb

        docs = _docs(spark, sf_dir)
        path = (
            F.when(F.col("doc_id") % 4 == 0,
                   F.concat(F.lit("/article/"), F.col("doc_id")))
            .when(F.col("doc_id") % 4 == 1,
                  F.concat(F.lit("/category/"), F.col("doc_id")))
            .when(F.col("doc_id") % 4 == 2,
                  F.concat(F.lit("/page/"), F.col("doc_id")))
            .otherwise(F.concat(F.lit("/page/1"), F.col("doc_id")))
        )
        host = F.concat(
            F.lit("site"),
            F.lpad((F.col("doc_id") % 16).cast("string"), 2, "0"),
            F.lit(".example.com"),
        )
        urls = docs.select(
            F.concat(F.lit("https://"), host, path).alias("url"),
            host.alias("host"),
        )
        return rb.rule_attribution(urls, rb.synth_robots(spark))

    q["crawl_rule_attribution"] = crawl_rule_attribution

    def events_cusum(spark, sf_dir):
        """One-sided CUSUM level-shift detection
        (eventops.cusum_changepoints): the sequential recurrence
        rewritten as prefix-sum − running-min (two windows, no
        recursion), allowance and threshold from rank-selected
        integer median/MAD — the sustained-drift complement to the
        pointwise rate_anomaly alarm."""
        from gocrawl_spark import eventops

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        return eventops.cusum_changepoints(ev)

    q["events_cusum"] = events_cusum

    def events_funnel_durations(spark, sf_dir):
        """Time-to-convert (eventops.funnel_durations): per adjacent
        funnel-step pair the converting-user count and the exact
        rank-selected median gap — same chained completion windows as
        the funnel, gaps in integer microseconds DIV'd to seconds so
        both engines agree bit-for-bit."""
        from gocrawl_spark import eventops

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        return eventops.funnel_durations(ev, ["view", "click", "purchase"])

    q["events_funnel_durations"] = events_funnel_durations

    def corpus_dup_rate_curve(spark, sf_dir):
        """Duplicate-rate growth curve (corpusstats.dup_rate_curve):
        cumulative exact-dup share of the corpus at 10 evenly spaced
        id checkpoints over the dup-injected corpus — the
        "re-reading the web" freshness KPI next to the Heaps
        vocabulary curve; MIN(id)-per-content-hash + integer
        checkpoint math, content never shuffles."""
        from gocrawl_spark import corpusstats as cs

        return cs.dup_rate_curve(_aug_exact(_docs(spark, sf_dir)))

    q["corpus_dup_rate_curve"] = corpus_dup_rate_curve

    def events_funnel_windowed(spark, sf_dir):
        """Deadline-bounded funnel (eventops.funnel within_s): step k
        counts only within 24 h of the step-k−1 completion (exact
        integer-microsecond bound) — the conversion-window semantics
        analytics funnels default to, same one-Exchange chained-window
        plan as the unbounded funnel."""
        from gocrawl_spark import eventops

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        return eventops.funnel(
            ev, ["view", "click", "purchase"], within_s=86400
        )

    q["events_funnel_windowed"] = events_funnel_windowed

    def search_bool_boosting(spark, sf_dir):
        """ES `boosting` + `constant_score` compounds: positive match
        TF scoring demoted ×0.2 on negative-matching (lang=de) docs —
        demoted, never excluded — plus a fixed-boost filter-context
        should clause (source=src3 → +2.5). One scan, no shuffle
        beyond the top-k sort."""
        return search.bool_topk(
            _docs(spark, sf_dir),
            {
                "must": [{"boosting": {
                    "positive": {"match": {"text": "table"}},
                    "negative": {"term": {"lang": "de"}},
                    "negative_boost": 0.2,
                }}],
                "should": [{"constant_score": {
                    "filter": {"term": {"source": "src3"}},
                    "boost": 2.5,
                }}],
            },
            id_col="doc_id",
            k=15,
        )

    q["search_bool_boosting"] = search_bool_boosting

    def search_phrase_prefix(spark, sf_dir):
        """ES `match_phrase_prefix` (type-ahead phrase): every fifth
        doc gets the marker phrase injected; the query's last term is
        a PREFIX of the closing token ('ker' → 'kernel'), score =
        matching-window count. Same windowed slice scan as
        match_phrase with a startswith closing position."""
        d = F.col("doc_id")
        docs = _docs(spark, sf_dir).withColumn(
            "text",
            F.when(
                d % 5 == 2,
                F.concat(F.col("text"), F.lit(" The fused vector kernel wins.")),
            ).otherwise(F.col("text")),
        )
        return search.bool_topk(
            docs,
            {"must": [{"match_phrase_prefix": {"text": "fused vector ker"}}]},
            id_col="doc_id",
            k=15,
        )

    q["search_phrase_prefix"] = search_phrase_prefix

    def search_significant_text(spark, sf_dir):
        """ES `significant_text` as a request-scoped agg: ANALYZED
        terms overrepresented in the query's (match merge) docs vs the
        whole index — JLH over per-doc-distinct tokens, fg flag
        codegen'd, ONE scan + one term-keyed fold."""
        docs = _docs(spark, sf_dir).withColumnRenamed("doc_id", "id")
        out = search.es_search(docs, {
            "query": {"match": {"text": "merge"}},
            "aggs": {"sig": {"significant_text": {
                "field": "text", "size": 10}}},
        })
        return out["aggs"]

    q["search_significant_text"] = search_significant_text

    def search_request_sampler(spark, sf_dir):
        """ES `diversified_sampler` agg: the terms sub-agg runs over
        only the top-20 highest-scoring query-matched docs after
        capping 2 docs per source (field-keyed row_number window on
        the dedup key only, then one global top-k) — deterministic
        (score desc, id asc) single-logical-shard semantics. The
        sampler bucket's doc_count broadcasts onto the inner rows."""
        docs = _docs(spark, sf_dir).withColumnRenamed("doc_id", "id")
        out = search.es_search(docs, {
            "query": {"match": {"text": "table"}},
            "aggs": {"samp": {
                "diversified_sampler": {
                    "shard_size": 20,
                    "field": "source",
                    "max_docs_per_value": 2,
                },
                "aggs": {"langs": {"terms": {"field": "lang"}}},
            }},
        })
        return out["aggs"]

    q["search_request_sampler"] = search_request_sampler

    def search_aggs_bucketsort_a2(spark, sf_dir):
        """ES `bucket_sort` pipeline agg: re-orders the histogram
        bucket series by doc_count desc (key-asc tiebreak) and pages
        with from=1/size=4 — one row_number window over the ≈#buckets
        aggregated frame, ES's last-run pipeline."""
        out = search.es_aggs(
            _docs(spark, sf_dir),
            {
                "chars_hist": {
                    "histogram": {"field": "n_chars", "interval": 50},
                    "aggs": {
                        "avg_chars": {"avg": {"field": "n_chars"}},
                        "page": {"bucket_sort": {
                            "sort": [{"_count": {"order": "desc"}}],
                            "from": 1,
                            "size": 4,
                        }},
                    },
                }
            },
        )
        return out.select(
            "key", "doc_count", F.round("avg_chars", 6).alias("avg_chars")
        )

    q["search_aggs_bucketsort_a2"] = search_aggs_bucketsort_a2

    def dedup_minhash_recall(spark, sf_dir):
        """Recall of the banded MinHash-LSH near-dup pass vs the exact
        Jaccard ground truth at the SAME (k=5, t=0.5) operating point
        — the text twin of emb_dup_recall, making the 16-hash/4-band
        collision curve visible: P(candidate) = 1-(1-s^4)^4 plus the
        est-Jaccard ≥ t cut. Both sides are the shipped operators;
        the three counts and the ratio are metadata-sized."""
        aug = _aug_near(_docs(spark, sf_dir))
        lsh = dedup.minhash_pairs(
            aug, num_hashes=16, k=5, bands=4, threshold=0.5
        ).select("id_a", "id_b")
        exact = dedup.ngram_jaccard_pairs(aug, k=5, threshold=0.5).select(
            "id_a", "id_b"
        )
        n_exact = exact.agg(F.count("*").alias("n_exact"))
        n_lsh = lsh.agg(F.count("*").alias("n_lsh"))
        n_common = exact.join(lsh, ["id_a", "id_b"]).agg(
            F.count("*").alias("n_common")
        )
        return (
            n_exact.crossJoin(n_lsh)
            .crossJoin(n_common)
            .select(
                "n_exact",
                "n_lsh",
                "n_common",
                F.round(F.col("n_common") / F.col("n_exact"), 4).alias(
                    "recall"
                ),
            )
        )

    q["dedup_minhash_recall"] = dedup_minhash_recall

    def text_c4_span_dedup(spark, sf_dir):
        """C4's cross-corpus three-sentence span dedup
        (dedup.span_dedup; Raffel et al. 2020 §2.2 'discarded all but
        one of any three-sentence span occurring more than once'):
        every 7th doc gets a shared 4-sentence blurb appended — its
        trailing 3-sentence window is corpus-duplicated, the FIRST
        occurrence by (doc_id, start) keeps it, every other loses
        those sentences. Sentence split is the RE2-safe capture-group
        transform so the oracle replays it verbatim; duplicate
        election is ONE span-hash window shuffle."""
        d = F.col("doc_id")
        aug = _docs(spark, sf_dir).select(
            "doc_id",
            F.when(
                d % 7 == 3,
                F.concat(
                    F.col("text"),
                    F.lit(
                        " Spam alpha beta. Buy gold now."
                        " Offer ends soon. Act fast today."
                    ),
                ),
            ).otherwise(F.col("text")).alias("text"),
        )
        return dedup.span_dedup(aug, n=3)

    q["text_c4_span_dedup"] = text_c4_span_dedup

    def wp_coverage(spark, sf_dir):
        """Tokenizer-card coverage audit (wordpiece.coverage): a
        WordPiece vocab trained ONLY on the English slice is measured
        over every language — per lang: word/UNK/piece counts, UNK
        rate, fertility. Words with any character outside the en
        training alphabet collapse to [UNK] (BERT's rule). Matcher
        runs once per distinct word; #langs-row result."""
        from gocrawl_spark import wordpiece as wp

        docs = _docs(spark, sf_dir)
        en = docs.filter(F.col("lang") == "en")
        merges, _ = wp.train_state(en, n_merges=6)
        return wp.coverage(docs, wp.vocab_pieces(en, merges))

    q["wp_coverage"] = wp_coverage

    def train_curriculum(spark, sf_dir):
        """Quality-curriculum ordering (curation.curriculum_order):
        exact decile boundaries from ONE percentile aggregation
        (9 broadcast scalars), codegen'd comparison-count stage
        assignment, shuffle_key intra-stage permutation — the
        easy-first training schedule with no global sort and no rank
        column (the (stage, sort_key) pair IS the order)."""
        return curation.curriculum_order(_docs(spark, sf_dir), stages=10)

    q["train_curriculum"] = train_curriculum

    def search_hybrid_rrf(spark, sf_dir):
        """Hybrid retrieval (search.hybrid_rrf, Cormack et al.
        SIGIR'09): BM25 top-20 over text fused with exact-cosine
        top-20 neighbors of embedding 3 by reciprocal-rank fusion
        (k=60) — the standard lexical+semantic combiner. Both ranked
        lists are top-N-sized, so the fusion join is metadata-scale."""
        from pyspark.sql import Window

        docs = _docs(spark, sf_dir)
        emb = _emb(spark, sf_dir)
        lex = search.bm25_topk(
            docs, "window batch spark", text_col="text",
            id_col="doc_id", k=20,
        ).withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.desc("score"), F.asc("id"))
            ),
        )
        sem = similarity.brute_topk(
            emb, emb.filter(F.col("vec_id") == 3), k=20
        ).select(F.col("neighbor_id").alias("id"), "rank")
        return search.hybrid_rrf(lex, sem, k=10)

    q["search_hybrid_rrf"] = search_hybrid_rrf

    def corpus_mixture_epochs(spark, sf_dir):
        """Data-constrained mixing recipe (curation.mixture_epochs,
        Muennighoff et al. 2023): integer 5/2/2/1 weights over a
        150k-token budget — scarce languages repeat whole epochs up to
        the cap, the uncoverable remainder reports as deficit. ONE
        map-side-combined fold to #sources rows, all-integer
        arithmetic after it."""
        return curation.mixture_epochs(
            _docs(spark, sf_dir),
            weights={"en": 5, "de": 2, "fr": 2, "es": 1},
            budget=150000,
            max_epochs=3,
        )

    q["corpus_mixture_epochs"] = corpus_mixture_epochs

    def emb_matryoshka_recall(spark, sf_dir):
        """Matryoshka truncation eval (similarity.matryoshka_recall,
        Kusupati et al. 2022): recall@10 of exact cosine over the
        first-8/16/32 prefix dims vs the full 64-dim ranking for the
        5 eval queries — the serve-short / re-rank-long trade-off
        card. Each dim is the broadcast brute plan; the recall joins
        are top-k-sized."""
        emb = _emb(spark, sf_dir)
        return similarity.matryoshka_recall(
            emb, emb.filter(F.col("vec_id") < 5), dims=[8, 16, 32], k=10
        )

    q["emb_matryoshka_recall"] = emb_matryoshka_recall

    def corpus_dup_ngrams(spark, sf_dir):
        """Corpus-wide duplicated-5-gram audit per language
        (corpusstats.dup_ngram_mass; Lee et al. 2022 memorization
        metric): fraction of k-gram mass and of the distinct k-gram
        vocabulary that repeats corpus-wide. Shuffle keys on md5(gram)
        — fixed-width, map-side combined; #langs output rows."""
        from gocrawl_spark import corpusstats

        return corpusstats.dup_ngram_mass(_docs(spark, sf_dir), k=5)

    q["corpus_dup_ngrams"] = corpus_dup_ngrams

    def text_char_entropy(spark, sf_dir):
        """Per-doc Shannon character entropy (textstats.char_entropy)
        — the oracle-checkable twin of the zlib compression-ratio
        gate: sorted-distinct-char fold, zero shuffle, pure codegen."""
        return textstats.char_entropy(_docs(spark, sf_dir))

    q["text_char_entropy"] = text_char_entropy

    def corpus_doremi_weights(spark, sf_dir):
        """One-round deterministic DoReMi (curation.doremi_weights,
        Xie et al. 2023): per-language clipped excess loss of the
        corpus-trained KN bigram proxy over the en-slice-trained
        reference, normalized into mixture weights. Two LM passes +
        one #langs-row aggregate."""
        docs = _docs(spark, sf_dir)
        return curation.doremi_weights(
            docs, docs.filter(F.col("lang") == "en")
        )

    q["corpus_doremi_weights"] = corpus_doremi_weights

    def corpus_cms_hosts(spark, sf_dir):
        """Count-Min-Sketch heavy hitters (corpusstats.cms_sketch /
        cms_estimate): depth-4 × width-32 sketch over a skewed host
        stream (doc_id%20 < 10 all map to h0 — one host carries half
        the mass), probed for every distinct host next to its exact
        count. The narrow width forces collisions, so the min-over-
        rows bound est ≥ exact is exercised, not vacuous. The only
        stream shuffle keys on the ≤ depth·width sketch cells."""
        from gocrawl_spark import corpusstats as cs

        d = F.col("doc_id")
        hid = F.when(d % 20 < 10, F.lit(0)).otherwise((d % 20).cast("int"))
        stream = _docs(spark, sf_dir).select(
            F.concat(F.lit("h"), hid.cast("string")).alias("host")
        )
        sk = cs.cms_sketch(stream, "host", depth=4, width=32)
        exact = stream.groupBy("host").agg(
            F.count("*").cast("long").alias("exact")
        )
        est = cs.cms_estimate(sk, exact.select("host"), "host", depth=4, width=32)
        return exact.join(est, exact["host"] == est["key"]).select(
            "host", "exact", "est", (F.col("est") - F.col("exact")).alias("over")
        )

    q["corpus_cms_hosts"] = corpus_cms_hosts

    def train_length_batches(spark, sf_dir):
        """Length-grouped batch assembly + padding-waste report
        (curation.length_batches; the HF LengthGroupedSampler shape):
        per shard, docs sort by (token length, shuffle key) and cut
        into batches of 8; each batch reports n_seqs·max_len compute
        vs useful tokens. One per-shard window + a (shard,batch) agg —
        no global sort."""
        return curation.length_batches(
            _docs(spark, sf_dir), batch_size=8, n_shards=8
        )

    q["train_length_batches"] = train_length_batches

    def crawl_fetch_gini(spark, sf_dir):
        """Fetch-concentration audit (corpusstats.fetch_gini): exact
        Gini / HHI / top-decile share over per-host fetch counts —
        the politeness-health number a crawl round publishes (the
        reference's metrics stop at global fetch counters,
        internal/metrics/metrics.go). Every 4th doc is reassigned to
        one hot host so the statistic is exercised off the uniform
        floor; both rank windows run on the #hosts-sized count table,
        never the fetch log."""
        from gocrawl_spark import corpusstats as cs

        docs = _docs(spark, sf_dir)
        skewed = docs.select(
            F.when(F.col("doc_id") % 4 == 0, F.lit("hot.example"))
            .otherwise(F.col("source"))
            .alias("source")
        )
        return cs.fetch_gini(skewed, "source")

    q["crawl_fetch_gini"] = crawl_fetch_gini

    def corpus_report_card(spark, sf_dir):
        """Per-language corpus report card (curation.report_card):
        docs/hosts/tokens, EXACT lower-median doc length off the
        (lang, tok) frequency table (the per-lang window sees
        #distinct-lengths rows, never the corpus), byte-dup rate and
        mean quality — over documents ∪ exact dups so dup_rate is
        non-vacuous. The audit page a curation run ships with its
        training shards."""
        return curation.report_card(_aug_exact(_docs(spark, sf_dir)))

    q["corpus_report_card"] = corpus_report_card

    def search_hard_negatives(spark, sf_dir):
        """BM25 hard-negative mining (rankeval.hard_negatives — the
        DPR/Contriever retriever-training-data step): top-20 BM25 pool
        per rated request, judged-relevant docs removed, top-5
        survivors kept as contrastive negatives. The whole request
        batch shares ONE tokenized corpus pass (rank_eval's
        constant-scan contract); judgments are the deterministic md5
        pool."""
        from gocrawl_spark import rankeval

        return rankeval.hard_negatives(
            _docs(spark, sf_dir),
            _RANK_EVAL_REQUESTS,
            text_col="text",
            id_col="doc_id",
            pool_k=20,
            n_neg=5,
        )

    q["search_hard_negatives"] = search_hard_negatives

    def crawl_ucb_schedule(spark, sf_dir):
        """UCB1 bandit recrawl ordering (scheduler.ucb_schedule, Auer
        et al. 2002): mean change-rate + sqrt(2·ln N / n) optimism
        bonus over a synthesized history where every 4th URL has 6
        observations and the rest only 3 — the sparsely-observed arms
        float above equally-changing well-observed ones, fixing the
        change_rates cold-start. One url-keyed window + groupBy, one
        1-row scalar broadcast."""
        from gocrawl_spark import scheduler as sch

        d = F.col("doc_id")
        n_gen = F.when(d % 4 == 0, F.lit(6)).otherwise(F.lit(3))
        hist = (
            _docs(spark, sf_dir)
            .select(
                "doc_id",
                F.explode(F.sequence(F.lit(0), n_gen - 1)).alias("generation"),
            )
            .select(
                F.concat(
                    F.lit("https://h.example.com/doc/"), d.cast("string")
                ).alias("url"),
                "generation",
                F.when(d % 3 == 0, F.col("generation"))
                .when((d % 3 == 1) & (F.col("generation") >= 2), F.lit(1))
                .otherwise(F.lit(0))
                .alias("page_ts"),
            )
        )
        return sch.ucb_schedule(hist)

    q["crawl_ucb_schedule"] = crawl_ucb_schedule

    def text_quality_roc(spark, sf_dir):
        """Classifier calibration report (curation.clf_roc): exact
        Mann-Whitney AUC + per-threshold confusion/PRF of the hashed
        linear classifier (clf_score) against the Gopher rule gate as
        weak labels — the filter-vs-rules cross-check FineWeb-style
        pipelines publish before gating a corpus. AUC folds off the
        ≈#distinct-scores frequency table, never doc pairs; the corpus
        is scanned once per side."""
        docs = _docs(spark, sf_dir)
        w = curation.hash_weights(spark, buckets=1024, seed="quality-clf")
        scores = curation.clf_score(docs, w, buckets=1024)
        st = textstats.gopher_stats("text")
        labels = docs.select(
            "doc_id", textstats.gopher_keep(st).alias("label")
        )
        return curation.clf_roc(scores, labels)

    q["text_quality_roc"] = text_quality_roc

    def corpus_pipeline_funnel(spark, sf_dir):
        """Dataset-card yield funnel (corpusstats.pipeline_funnel):
        docs/tokens surviving raw → exact_dedup → Gopher gate →
        decontamination, cumulatively — the per-stage accounting C4 /
        MassiveText / RefinedWeb releases publish. Benchmark side =
        the decontaminate query's 10-word excerpts of every 50th doc.
        One corpus scan into flags, one text-key window, one broadcast
        shingle probe, ONE final fold; the 4 rows are a literal
        unpivot."""
        from gocrawl_spark import corpusstats as cs

        docs = _docs(spark, sf_dir).select("doc_id", "text")
        bench = docs.filter(F.col("doc_id") % 50 == 10).select(
            F.col("doc_id").alias("bench_id"),
            F.array_join(
                F.slice(textstats.norm_words("text"), 3, 10), " "
            ).alias("bench_text"),
        )
        return cs.pipeline_funnel(docs, bench, k=8)

    q["corpus_pipeline_funnel"] = corpus_pipeline_funnel

    def crawl_seed_expansion(spark, sf_dir):
        """Co-citation seed expansion (graphrank.cocitation_seeds,
        Small 1973 / Dean & Henzinger WWW8): hosts pages cite
        alongside the seed hosts site01/site05 become candidate new
        crawl seeds, scored by distinct co-citing pages. Per-page
        fan-out capped at 32; seed table broadcast; the pairing is a
        src-keyed self-join of capped rows."""
        from gocrawl_spark import graphrank

        docs = _docs(spark, sf_dir)
        n = docs.count()

        def host(c):
            hi = F.when(c % 4 == 0, F.lit(0)).otherwise(c % 15 + 1)
            return F.concat(
                F.lit("site"), F.lpad(hi.cast("string"), 2, "0"),
                F.lit(".example.com"),
            )

        e = graphrank.doc_edges(docs, n).select(
            "src", host(F.col("dst")).alias("dst_host")
        )
        seeds = spark.createDataFrame(
            [("site01.example.com",), ("site05.example.com",)], "host string"
        )
        return graphrank.cocitation_seeds(e, seeds, max_out=32)

    q["crawl_seed_expansion"] = crawl_seed_expansion

    def text_para_prune(spark, sf_dir):
        """Paragraph-level perplexity surgery (textstats.lm_para_prune):
        every 5th doc gets a doc-unique gibberish paragraph appended;
        under the corpus-trained bigram LM those paragraphs score
        ppl ≈ 216 vs ≤ 53 for real text, so max_ppl=100 removes
        exactly them and re-joins the surviving paragraphs in order —
        CCNet's LM signal applied at paragraph granularity instead of
        the whole-document drop."""
        docs = _docs(spark, sf_dir).select("doc_id", "text")
        gib = F.concat_ws(
            " ",
            *[
                F.concat(F.lit(w), F.col("doc_id").cast("string"))
                for w in ["zz", "qq", "wx", "kv"]
            ],
        )
        noisy = docs.select(
            "doc_id",
            F.when(
                F.col("doc_id") % 5 == 0, F.concat("text", F.lit("\n"), gib)
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        return textstats.lm_para_prune(noisy, max_ppl=100.0)

    q["text_para_prune"] = text_para_prune

    def crawl_refetch_waste(spark, sf_dir):
        """Revalidation audit (scheduler.refetch_waste): per-host
        share of refetches that brought back an unchanged page — the
        fetches conditional GETs would have turned into 304s. Same
        synthesized 4-generation history as crawl_change_rates, hosts
        assigned doc_id % 7; one lag window + one host rollup."""
        from gocrawl_spark import scheduler as sch

        d = F.col("doc_id")
        hist = (
            _docs(spark, sf_dir)
            .select(
                "doc_id",
                F.explode(F.sequence(F.lit(0), F.lit(3))).alias("generation"),
            )
            .select(
                F.concat(
                    F.lit("https://h.example.com/doc/"), d.cast("string")
                ).alias("url"),
                F.concat(
                    F.lit("h"), (d % 7).cast("string"), F.lit(".example.com")
                ).alias("host"),
                "generation",
                F.when(d % 3 == 0, F.col("generation"))
                .when((d % 3 == 1) & (F.col("generation") >= 2), F.lit(1))
                .otherwise(F.lit(0))
                .alias("page_ts"),
            )
        )
        return sch.refetch_waste(hist)

    q["crawl_refetch_waste"] = crawl_refetch_waste

    def curate_host_cap(spark, sf_dir):
        """Per-host document cap with quality-ranked retention
        (curation.host_cap): keep the top-10 quality_score docs per
        source host (25 per host in the testdata, so the cut binds) —
        FineWeb/MassiveText per-domain limiting. One
        codegen'd quality projection + one host-partitioned
        row_number window, filter before anything downstream."""
        docs = _docs(spark, sf_dir)
        return curation.host_cap(docs, cap=10, host_col="source")

    q["curate_host_cap"] = curate_host_cap

    def train_quality_clf(spark, sf_dir):
        """Distributed logistic-regression training for the quality
        classifier (curation.clf_train, fasttext architecture): 3
        full-batch GD sweeps on the hashed unigram+bigram mean-pooled
        bag against the Gopher gate as weak labels — the FineWeb-Edu
        step that turns a rule gate into a cheap corpus-scale scorer
        (AUC 0.45 untrained → 0.71 after 3 sweeps on this corpus).
        All arithmetic in exact integer micro-units, so the trained
        (bucket, weight) table is bit-equal at any parallelism and
        the oracle replays the sweeps verbatim."""
        docs = _docs(spark, sf_dir).select("doc_id", "text")
        st = textstats.gopher_stats("text")
        labels = docs.select(
            "doc_id", textstats.gopher_keep(st).alias("label")
        )
        return curation.clf_train(docs, labels, sweeps=3, lr=0.5)

    q["train_quality_clf"] = train_quality_clf

    def crawl_robots_drift(spark, sf_dir):
        """Retro robots-compliance audit (robots.drift_audit): the
        robots_gate_s3 URL mix re-checked as a FETCH LOG against the
        current synth_robots rules — per host, how many stored pages
        the present rules disallow (the RFC 9309 purge list the
        reference never computes). Same parser/evaluator as the
        fetch-time gate; one join + one #hosts-row rollup."""
        from gocrawl_spark import robots as rb

        docs = _docs(spark, sf_dir)
        path = (
            F.when(F.col("doc_id") % 4 == 0, F.concat(F.lit("/article/"), F.col("doc_id")))
            .when(F.col("doc_id") % 4 == 1, F.concat(F.lit("/category/"), F.col("doc_id")))
            .when(F.col("doc_id") % 4 == 2, F.concat(F.lit("/page/"), F.col("doc_id")))
            .otherwise(F.concat(F.lit("/page/1"), F.col("doc_id")))
        )
        host = F.concat(
            F.lit("site"), F.lpad((F.col("doc_id") % 16).cast("string"), 2, "0"),
            F.lit(".example.com"),
        )
        fetched = docs.select(
            F.concat(F.lit("https://"), host, path).alias("url"),
            host.alias("host"),
        )
        return rb.drift_audit(fetched, rb.synth_robots(spark))

    q["crawl_robots_drift"] = crawl_robots_drift

    def events_cusum_twosided(spark, sf_dir):
        """Two-sided CUSUM with hourly densification
        (eventops.cusum_changepoints two_sided=True): the error
        stream is cut off after Jan 20 — a source going QUIET — and
        the downward statistic accumulates over the densified zero
        hours; the sparse one-sided detector is structurally blind to
        this (no bucket rows exist). Grid = #types × span hours
        (metadata-sized); same exact integer median/MAD arithmetic on
        both engines."""
        from gocrawl_spark import eventops

        ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
            ~(
                (F.col("event_type") == "error")
                & (F.col("ts") >= F.lit("2024-01-20 00:00:00").cast("timestamp"))
            )
        )
        return eventops.cusum_changepoints(ev, two_sided=True)

    q["events_cusum_twosided"] = events_cusum_twosided

    def search_knn(spark, sf_dir):
        """ES `knn` retrieval section (search.knn_topk → es_search):
        dense-vector top-10 for the vec_id-7 query vector through the
        IVF probe path (16 deterministic centroids, nprobe 4) — the
        modern query-DSL surface the bool tail lacked. The oracle
        replays the identical deterministic IVF assignment + probe in
        SQL (the ann_ivf twin), so the APPROXIMATE path itself is
        verified, not just a lucky exact agreement."""
        emb = _emb(spark, sf_dir)
        qv = [float(x) for x in emb.filter(F.col("vec_id") == 7).head()["embedding"]]
        res = search.es_search(
            emb.select(F.col("vec_id").alias("id"), "embedding"),
            {
                "knn": {
                    "field": "embedding",
                    "query_vector": qv,
                    "k": 10,
                    "n_centroids": 16,
                    "nprobe": 4,
                },
                "size": 10,
            },
        )
        return res["hits"]

    q["search_knn"] = search_knn

    def search_knn_hybrid(spark, sf_dir):
        """Hybrid knn + query (ES's pre-retriever combination): match
        scoring over the text field SUMS with the cosine similarity
        over the union of both hit sets. Run on documents joined with
        their embedding rows (doc_id ≡ vec_id)."""
        emb = _emb(spark, sf_dir)
        docs = _docs(spark, sf_dir).join(
            emb, F.col("doc_id") == F.col("vec_id")
        )
        qv = [float(x) for x in emb.filter(F.col("vec_id") == 7).head()["embedding"]]
        res = search.es_search(
            docs.select(F.col("doc_id").alias("id"), "text", "embedding"),
            {
                "query": {"match": {"text": "table"}},
                "knn": {
                    "field": "embedding",
                    "query_vector": qv,
                    "k": 10,
                    "n_centroids": 16,
                    "nprobe": 4,
                },
                "size": 15,
            },
        )
        return res["hits"]

    q["search_knn_hybrid"] = search_knn_hybrid

    def update_document_partial(spark, sf_dir):
        """ES partial-document update through the REAL warehouse path
        (catalog.Warehouse.update ↔ reference DocumentManager.Update,
        indexing.go:18-19): every 7th doc gets source patched and lang
        explicitly nulled; untouched columns and unmatched docs keep
        their stored values — distinct from upsert's whole-row
        overwrite."""
        import tempfile

        from gocrawl_spark.catalog import Warehouse

        docs = _docs(spark, sf_dir).select("doc_id", "source", "lang", "n_chars")
        wh = Warehouse(spark, tempfile.mkdtemp(prefix="wh_update_"))
        wh.upsert("docs", docs, key="doc_id")
        patch = docs.filter(F.col("doc_id") % 7 == 0).select(
            "doc_id",
            F.lit("patched").alias("source"),
            F.lit(None).cast("string").alias("lang"),
        )
        wh.update("docs", patch, key="doc_id")
        return wh.table("docs").select("doc_id", "source", "lang", "n_chars")

    q["update_document_partial"] = update_document_partial

    # -- gate ordering ------------------------------------------------------
    # A budget-limited correctness gate sweeps a PREFIX of this dict, so
    # least-recently-gate-verified entries lead. Computed dynamically from
    # the driver's own CORRECTNESS_r*.json artifacts: entries with no
    # driver row ever lead (newest registration first — each session's
    # additions are the least-verified), then the stalest-round rows, then
    # the freshest. Falls back to the static round-3 list if the artifacts
    # are absent.
    import json as _json
    import os as _os

    _here = _os.path.dirname(_os.path.abspath(__file__))
    _checked: dict[str, int] = {}
    for _rnd, _fname in sorted(
        (int(m.group(1)), f)
        for f in _os.listdir(_here)
        if (m := __import__("re").match(r"CORRECTNESS_r0*(\d+)\.json$", f))
    ):
        try:
            with open(_os.path.join(_here, _fname)) as _fh:
                for _name, _row in _json.load(_fh).items():
                    if isinstance(_row, dict) and not _row.get("err"):
                        _checked[_name] = _rnd
        except (OSError, ValueError):
            pass
    if _checked:
        _names = list(q)
        _never = [n for n in reversed(_names) if n not in _checked]
        _stale = sorted(
            (n for n in _names if n in _checked),
            key=lambda n: _checked[n],
        )
        return {n: q[n] for n in _never + _stale}

    gate_first = [
        # round-4 additions lead: no driver row exists for them yet
        "search_rank_eval", "corpus_zipf", "corpus_heaps",
        "text_distinct_ngrams", "corpus_key_skew", "corpus_length_hist",
        "search_request_collapse", "search_request_rescore",
        "ann_recall", "search_bool_wildcard", "search_aggs_nested_a2",
        "search_aggs_histogram_a2", "search_aggs_range_a2",
        "search_bool_fuzzy", "search_aggs_stats_a2",
        "search_aggs_filters_a2", "search_bool_misc",
        "search_request_aggs", "search_aggs_composite_a2",
        "search_aggs_tophits_a2", "media_phash_pairs",
        "search_aggs_pipeline_a2", "search_aggs_pipeline2_a2",
        "text_lm_kn_ppl", "search_aggs_extstats_a2",
        "search_aggs_rare_a2", "search_aggs_multiterms_a2",
        "search_aggs_daterange_a2", "search_aggs_missing_a2",
        "search_aggs_terms_opts_a2", "search_aggs_terms_mindoc_a2",
        "search_aggs_adjmatrix_a2", "search_request_after",
        "search_request_postfilter", "search_request_global",
        "text_lm_moore_lewis", "search_aggs_autodatehist_a2",
        "search_aggs_pipeline3_a2", "text_lm_kn3_ppl",
        "search_sig_terms_scoped", "agg_events_sessions",
        "search_aggs_fixedhist_a2", "search_aggs_histopts_a2",
        "search_aggs_pctranks_a2",
        "dedup_minhash_incremental", "dedup_simhash", "dedup_clusters",
        "sample_stratified", "ann_brute_cosine", "ann_ivf", "ann_pq",
        "ann_ivf_kmeans", "ann_ivfpq", "emb_dup_pairs",
        "emb_dup_pairs_exact", "emb_dup_recall", "semdedup", "dsir_select",
        "dsir_sample", "crawl_trap_filter", "text_tfidf_keywords",
        "text_winnow", "dedup_winnow_pairs", "crawl_change_rates",
        "ann_lsh", "search_match_topk", "search_multimatch", "search_bm25",
        "search_significant_terms", "emb_project",
        "corpus_mixture_temperature", "search_match_analyzed",
        "search_match_phrase", "search_match_and", "search_bool",
        "search_bool_nested", "search_count_a1", "agg_events_rollup",
        "join_segment_revenue", "tpch_q1_lite", "media_features",
        "media_parse", "media_stats", "crawl_extract_articles",
        "crawl_frontier_pop", "robots_gate_s3", "parse_date_e10",
        "prepare_v9", "upsert_articles_s5", "get_document_s8",
        "discover_selectors_e15", "search_aggs_terms_a2",
        "search_aggs_minmax_a2", "search_aggs_cardinality_a2",
        "search_aggs_datehist_a2",
    ]
    ordered = {name: q[name] for name in gate_first if name in q}
    ordered.update({name: fn for name, fn in q.items() if name not in ordered})
    return ordered


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}

    o["text_token_stats"] = r"""
        SELECT doc_id,
               len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS n_tokens,
               len(regexp_extract_all(text, '([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])', 1)) AS n_bpeish,
               length(text) AS n_chars_m
        FROM documents
    """

    _stop = r"\b(the|a|an|and|or|of|to|in|is|that|for|it|on|with|as|was|at|by|be|this)\b"
    o["text_quality"] = rf"""
        WITH t AS (
          SELECT doc_id,
                 len(regexp_extract_all(lower(text), '{_stop}', 1)) AS stop_hits,
                 len(regexp_extract_all(text, '([.,;:!?])', 1)) AS punct_cnt,
                 length(text)::DOUBLE AS n_chars,
                 len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> ''))::DOUBLE AS n_tok
          FROM documents)
        SELECT doc_id, stop_hits, punct_cnt,
               round(0.5::DOUBLE * least(1.0::DOUBLE, n_chars / 500.0::DOUBLE)
                   + 0.3::DOUBLE * least(1.0::DOUBLE,
                       (CASE WHEN n_tok > 0 THEN stop_hits / n_tok ELSE 0.0::DOUBLE END) / 0.4::DOUBLE)
                   + 0.2::DOUBLE * (1.0::DOUBLE - least(1.0::DOUBLE,
                       (CASE WHEN n_chars > 0 THEN punct_cnt / n_chars ELSE 0.0::DOUBLE END) * 5.0::DOUBLE)),
                   6) AS quality
        FROM t
    """

    _markers = {
        "en": r"\b(the|and|of|to|is|that|for|with)\b",
        "de": r"\b(der|die|das|und|ist|nicht|mit|ein)\b",
        "fr": r"\b(le|la|les|et|est|que|pour|dans)\b",
        "es": r"\b(el|los|las|es|que|para|por|una)\b",
        "zh": r"\b(de|shi|le|zai|he|you|wo|ta)\b",
    }
    hit_cols = ",\n".join(
        f"len(regexp_extract_all(lower(text), '{pat}', 1)) AS h_{la}"
        for la, pat in _markers.items()
    )
    o["text_langid"] = f"""
        WITH h AS (SELECT doc_id, lang, {hit_cols} FROM documents),
        m AS (SELECT *, greatest(h_en, h_de, h_fr, h_es, h_zh) AS best FROM h)
        SELECT doc_id, lang,
          CASE WHEN best = 0 THEN 'und'
               WHEN h_en = best THEN 'en'
               WHEN h_de = best THEN 'de'
               WHEN h_fr = best THEN 'fr'
               WHEN h_es = best THEN 'es'
               ELSE 'zh' END AS pred_lang
        FROM m
    """

    # curation pipeline = langid CASE ∘ quality formula ∘ dedup window,
    # composed from the same verified building blocks, over the
    # dup-injected corpus
    o["curate_corpus"] = rf"""
        WITH aug AS ({_SQL_AUG_EXACT}),
        h AS (
          SELECT doc_id, text, {hit_cols},
                 len(regexp_extract_all(lower(text), '{_stop}', 1)) AS stop_hits,
                 len(regexp_extract_all(text, '([.,;:!?])', 1)) AS punct_cnt,
                 length(text)::DOUBLE AS n_chars,
                 len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS n_tokens
          FROM aug),
        m AS (
          SELECT doc_id, text, n_tokens,
                 CASE WHEN greatest(h_en, h_de, h_fr, h_es, h_zh) = 0 THEN 'und'
                      WHEN h_en = greatest(h_en, h_de, h_fr, h_es, h_zh) THEN 'en'
                      WHEN h_de = greatest(h_en, h_de, h_fr, h_es, h_zh) THEN 'de'
                      WHEN h_fr = greatest(h_en, h_de, h_fr, h_es, h_zh) THEN 'fr'
                      WHEN h_es = greatest(h_en, h_de, h_fr, h_es, h_zh) THEN 'es'
                      ELSE 'zh' END AS pred_lang,
                 round(0.5::DOUBLE * least(1.0::DOUBLE, n_chars / 500.0::DOUBLE)
                     + 0.3::DOUBLE * least(1.0::DOUBLE,
                         (CASE WHEN n_tokens > 0 THEN stop_hits / n_tokens::DOUBLE ELSE 0.0::DOUBLE END) / 0.4::DOUBLE)
                     + 0.2::DOUBLE * (1.0::DOUBLE - least(1.0::DOUBLE,
                         (CASE WHEN n_chars > 0 THEN punct_cnt / n_chars ELSE 0.0::DOUBLE END) * 5.0::DOUBLE)),
                     6) AS quality
          FROM h),
        k AS (SELECT * FROM m WHERE pred_lang = 'en' AND quality >= 0.5::DOUBLE),
        d AS (
          SELECT doc_id, pred_lang, quality, n_tokens,
                 row_number() OVER (
                   PARTITION BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
                   ORDER BY doc_id) AS rn
          FROM k)
        SELECT doc_id, pred_lang, quality, n_tokens FROM d WHERE rn = 1
    """

    # mixture report: same whitespace token count, same share math
    o["corpus_mixture"] = r"""
        WITH t AS (
          SELECT lang, source,
                 len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS t
          FROM documents),
        a AS (SELECT lang, source, count(*) AS n_docs, sum(t)::BIGINT AS n_tokens
              FROM t GROUP BY lang, source)
        SELECT lang, source, n_docs, n_tokens,
               round(n_tokens::DOUBLE / (SELECT sum(n_tokens)::DOUBLE FROM a), 6) AS token_share
        FROM a
    """

    # repetition rule: same augmented text, same normalized 2-gram
    # stream, grouped in SQL
    o["text_repetition"] = f"""
        WITH aug AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 9 = 4
                      THEN text || repeat(' buy cheap gold', 40)
                      ELSE text END AS text
          FROM documents),
        w AS (SELECT doc_id, {_SQL_WORDS} AS w FROM aug),
        g AS (SELECT doc_id, unnest({_sql_shingles(2)}) AS g FROM w),
        per AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY doc_id, g),
        a AS (SELECT doc_id, max(c) AS top_c, sum(c) AS total,
                     count(*) AS n_distinct
              FROM per GROUP BY doc_id)
        SELECT doc_id,
               round(top_c::DOUBLE / total::DOUBLE, 6) AS top_ngram_frac,
               round(n_distinct::DOUBLE / total::DOUBLE, 6) AS distinct_frac
        FROM a
    """

    o["text_line_dedup"] = r"""
        WITH aug AS (
          SELECT doc_id,
                 text || chr(10) || 'Copyright Example Corp. All rights reserved.'
                      || CASE WHEN doc_id % 4 = 0
                              THEN chr(10) || 'Subscribe to our newsletter today!'
                              ELSE '' END
                      || chr(10) || 'Unique line for doc ' || doc_id::VARCHAR AS text
          FROM documents),
        ls AS (SELECT doc_id, string_split(text, chr(10)) AS l FROM aug),
        ex AS (SELECT doc_id, u.pos, u.line
               FROM ls, LATERAL (SELECT unnest(l) AS line,
                                        unnest(range(1, len(l)+1)) AS pos) u),
        h AS (SELECT doc_id, pos, line,
                     md5(trim(regexp_replace(lower(line), '\s+', ' ', 'g'))) AS hh
              FROM ex),
        boiler AS (SELECT hh FROM h GROUP BY hh HAVING count(DISTINCT doc_id) >= 2),
        kept AS (SELECT * FROM h WHERE hh NOT IN (SELECT hh FROM boiler)),
        reb AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text,
                       count(*) AS n_kept FROM kept GROUP BY doc_id),
        tot AS (SELECT doc_id, len(l)::INTEGER AS n_lines FROM ls)
        SELECT t.doc_id, coalesce(r.text, '') AS text, t.n_lines,
               coalesce(r.n_kept, 0)::INTEGER AS n_kept
        FROM tot t LEFT JOIN reb r ON t.doc_id = r.doc_id
    """

    o["text_c4_clean"] = r"""
        WITH aug AS (
          SELECT doc_id,
            'This sentence has enough words right here.' || chr(10) || substr(text, 1, 60)
            || CASE WHEN doc_id % 3 = 0
                    THEN chr(10) || 'Enable javascript to view this page now.' ELSE '' END
            || CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'Short line.' ELSE '' END
            || chr(10) || 'Another fine sentence appears right here today!'
            || CASE WHEN doc_id % 7 = 2
                    THEN chr(10) || 'lorem ipsum dolor sit amet consectetur adipiscing.'
                    ELSE '' END
            || CASE WHEN doc_id % 11 = 5 THEN chr(10) || 'const x = {a: 1};' ELSE '' END
            || CASE WHEN doc_id % 2 = 0
                    THEN chr(10) || 'And a third good sentence lands right here too.'
                    ELSE '' END AS text
          FROM documents),
        c AS (
          SELECT doc_id, text, string_split(text, chr(10)) AS l,
                 list_filter(string_split(text, chr(10)),
                   x -> regexp_matches(trim(x), '[.!?"]$')
                        AND len(regexp_extract_all(trim(x), '\S+')) >= 5
                        AND NOT contains(lower(trim(x)), 'javascript')) AS kept
          FROM aug)
        SELECT doc_id, array_to_string(kept, chr(10)) AS clean,
               len(l)::INTEGER AS n_lines, len(kept)::INTEGER AS n_kept,
               (NOT contains(lower(text), 'lorem ipsum') AND NOT contains(text, '{')
                AND len(regexp_extract_all(array_to_string(kept, chr(10)), '[.!?]')) >= 3)
                 AS keep_page
        FROM c
    """

    # ExactSubstr spans: same norm-words window hashing, duplicated
    # windows = md5 collisions across docs, runs via gaps-and-islands
    o["dedup_substring_spans"] = f"""
        WITH d AS (
          SELECT doc_id,
                 text || CASE WHEN doc_id % 4 = 1
                   THEN ' subscribe to our newsletter for the latest updates and exclusive offers today'
                   ELSE '' END AS text
          FROM documents),
        w AS (SELECT doc_id, {_SQL_WORDS} AS w FROM d),
        win AS (
          SELECT doc_id, u.pos AS pos, u.h AS h
          FROM (SELECT doc_id,
                       unnest([{{'pos': i,
                                 'h': md5(array_to_string(list_slice(w, i+1, i+8), ' '))}}
                               for i in range(0, len(w) - 7)]) AS u
                FROM w WHERE len(w) >= 8)),
        dup AS (SELECT h FROM win GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
        m AS (SELECT doc_id, pos FROM win WHERE h IN (SELECT h FROM dup)),
        runs AS (SELECT doc_id,
                        pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
                 FROM m),
        rl AS (SELECT doc_id, grp, count(*) AS run_len FROM runs GROUP BY 1, 2),
        st AS (SELECT doc_id, sum(run_len) AS dup_windows, count(*) AS dup_runs,
                      max(run_len) + 7 AS max_span_words
               FROM rl GROUP BY 1),
        tot AS (SELECT doc_id, greatest(len(w) - 7, 0) AS total_windows FROM w)
        SELECT t.doc_id,
               t.total_windows::BIGINT AS total_windows,
               coalesce(s.dup_windows, 0)::BIGINT AS dup_windows,
               coalesce(s.dup_runs, 0)::BIGINT AS dup_runs,
               coalesce(s.max_span_words, 0)::BIGINT AS max_span_words
        FROM tot t LEFT JOIN st s USING (doc_id)
    """

    # bigram-LM perplexity: identical counts, smoothing, and a
    # position-ordered sequential fold (list_reduce seeded with 0.0 =
    # Spark's F.aggregate(0.0, acc + lp)) so floats match bit-for-bit
    o["text_lm_ppl"] = f"""
        WITH w AS (SELECT doc_id, {_SQL_WORDS} AS w FROM documents),
        uni AS (SELECT u AS w1, count(*) AS c1
                FROM (SELECT unnest(w) AS u FROM w) GROUP BY u),
        v AS (SELECT count(*) AS v FROM uni),
        trans AS (
          SELECT doc_id, u.pos AS pos, u.bg AS bg, string_split(u.bg, ' ')[1] AS w1
          FROM (SELECT doc_id,
                       unnest([{{'pos': i,
                                 'bg': array_to_string(list_slice(w, i+1, i+2), ' ')}}
                               for i in range(0, len(w) - 1)]) AS u
                FROM w WHERE len(w) >= 2)),
        bg AS (SELECT bg, count(*) AS c2 FROM trans GROUP BY bg),
        j AS (SELECT t.doc_id, t.pos,
                     ln((coalesce(b.c2, 0) + 1.0)
                        / (coalesce(u.c1, 0) + 1.0 * (SELECT v FROM v))) AS lp
              FROM trans t
              LEFT JOIN bg b ON t.bg = b.bg
              LEFT JOIN uni u ON t.w1 = u.w1),
        sc AS (SELECT doc_id, count(*) AS n_trans,
                      list_reduce(list_prepend(0.0, list(lp ORDER BY pos)),
                                  (acc, x) -> acc + x) AS sum_lp
               FROM j GROUP BY doc_id)
        SELECT d.doc_id,
               coalesce(s.n_trans, 0)::BIGINT AS n_trans,
               round(coalesce(s.sum_lp, 0.0), 6)::DOUBLE AS sum_logp,
               round(CASE WHEN s.n_trans > 0 THEN exp(-s.sum_lp / s.n_trans)
                          ELSE 0.0 END, 6)::DOUBLE AS ppl
        FROM documents d LEFT JOIN sc s USING (doc_id)
    """

    # text_lm_kn_ppl: interpolated Kneser-Ney — context stats (c1 =
    # Σc2, N1+ forward) and continuation stats (N1+ backward) are
    # GROUP BYs over the bigram-TYPE table; the seen-mass/backoff
    # arithmetic is written in the same operation order as the Spark
    # expression so the doubles match bit-for-bit before rounding
    o["text_lm_kn_ppl"] = f"""
        WITH w AS (SELECT doc_id, {_SQL_WORDS} AS w FROM documents),
        uni AS (SELECT count(DISTINCT u) AS v
                FROM (SELECT unnest(w) AS u FROM w)),
        trans AS MATERIALIZED (
          SELECT doc_id, u.pos AS pos, u.bg AS bg,
                 string_split(u.bg, ' ')[1] AS w1,
                 string_split(u.bg, ' ')[2] AS w2
          FROM (SELECT doc_id,
                       unnest([{{'pos': i,
                                 'bg': array_to_string(list_slice(w, i+1, i+2), ' ')}}
                               for i in range(0, len(w) - 1)]) AS u
                FROM w WHERE len(w) >= 2)),
        bg AS MATERIALIZED (
          SELECT bg, count(*) AS c2,
                 string_split(bg, ' ')[1] AS w1,
                 string_split(bg, ' ')[2] AS w2
          FROM trans GROUP BY bg),
        tt AS (SELECT count(*) AS t FROM bg),
        ctx AS (SELECT w1, sum(c2)::BIGINT AS c1, count(*) AS n1f
                FROM bg GROUP BY w1),
        cont AS (SELECT w2, count(*) AS n1b FROM bg GROUP BY w2),
        j AS (SELECT tr.doc_id, tr.pos,
                     ln(CASE WHEN cx.c1 IS NOT NULL THEN
                          greatest(coalesce(b.c2, 0) - 0.75, 0.0) / cx.c1
                          + (0.75 * cx.n1f) / cx.c1
                            * ((coalesce(cn.n1b, 0) + 1.0)
                               / ((SELECT t FROM tt) + (SELECT v FROM uni)))
                        ELSE (coalesce(cn.n1b, 0) + 1.0)
                             / ((SELECT t FROM tt) + (SELECT v FROM uni))
                        END) AS lp
              FROM trans tr
              LEFT JOIN bg b ON tr.bg = b.bg
              LEFT JOIN ctx cx ON tr.w1 = cx.w1
              LEFT JOIN cont cn ON tr.w2 = cn.w2),
        sc AS (SELECT doc_id, count(*) AS n_trans,
                      list_reduce(list_prepend(0.0, list(lp ORDER BY pos)),
                                  (acc, x) -> acc + x) AS sum_lp
               FROM j GROUP BY doc_id)
        SELECT d.doc_id,
               coalesce(s.n_trans, 0)::BIGINT AS n_trans,
               round(coalesce(s.sum_lp, 0.0), 6)::DOUBLE AS sum_logp,
               round(CASE WHEN s.n_trans > 0 THEN exp(-s.sum_lp / s.n_trans)
                          ELSE 0.0 END, 6)::DOUBLE AS ppl
        FROM documents d LEFT JOIN sc s USING (doc_id)
    """

    # CCNet buckets: the lm_ppl pipeline + per-language ntile(3) over
    # (rounded ppl, doc_id) — identical larger-buckets-first rule
    o["text_lm_buckets"] = f"""
        WITH w AS (SELECT doc_id, {_SQL_WORDS} AS w FROM documents),
        uni AS (SELECT u AS w1, count(*) AS c1
                FROM (SELECT unnest(w) AS u FROM w) GROUP BY u),
        v AS (SELECT count(*) AS v FROM uni),
        trans AS (
          SELECT doc_id, u.pos AS pos, u.bg AS bg, string_split(u.bg, ' ')[1] AS w1
          FROM (SELECT doc_id,
                       unnest([{{'pos': i,
                                 'bg': array_to_string(list_slice(w, i+1, i+2), ' ')}}
                               for i in range(0, len(w) - 1)]) AS u
                FROM w WHERE len(w) >= 2)),
        bg AS (SELECT bg, count(*) AS c2 FROM trans GROUP BY bg),
        j AS (SELECT t.doc_id, t.pos,
                     ln((coalesce(b.c2, 0) + 1.0)
                        / (coalesce(u.c1, 0) + 1.0 * (SELECT v FROM v))) AS lp
              FROM trans t
              LEFT JOIN bg b ON t.bg = b.bg
              LEFT JOIN uni u ON t.w1 = u.w1),
        sc AS (SELECT doc_id, count(*) AS n_trans,
                      list_reduce(list_prepend(0.0, list(lp ORDER BY pos)),
                                  (acc, x) -> acc + x) AS sum_lp
               FROM j GROUP BY doc_id),
        p AS (SELECT d.doc_id, d.lang,
                     round(CASE WHEN s.n_trans > 0 THEN exp(-s.sum_lp / s.n_trans)
                                ELSE 0.0 END, 6)::DOUBLE AS ppl
              FROM documents d LEFT JOIN sc s USING (doc_id)),
        r AS (SELECT doc_id, lang, ppl,
                     ntile(3) OVER (PARTITION BY lang ORDER BY ppl, doc_id) AS nt
              FROM p)
        SELECT doc_id, lang, ppl,
               CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
        FROM r
    """

    # deterministic shard shuffle: same md5 key, same high-32-bit mod
    # FIM: same integer-DIV split arithmetic, same PSM/SPM layouts
    o["train_fim"] = """
        WITH s AS (
          SELECT doc_id, text, length(text)::BIGINT AS n,
                 least(length(text)::BIGINT,
                       (length(text) // 3) + doc_id % 5) AS p1,
                 least(length(text)::BIGINT,
                       ((2 * length(text)) // 3) + doc_id % 3) AS p2
          FROM documents),
        sp AS (
          SELECT doc_id, text, n,
                 least(p1, p2) AS lo, greatest(p1, p2) AS hi
          FROM s),
        parts AS (
          SELECT doc_id, text,
                 substr(text, 1, lo::INT) AS prefix,
                 substr(text, (lo + 1)::INT, (hi - lo)::INT) AS middle,
                 substr(text, (hi + 1)::INT, (n - hi)::INT) AS suffix,
                 CASE WHEN doc_id % 2 <> 0 THEN 'plain'
                      WHEN doc_id % 4 = 0 THEN 'spm'
                      ELSE 'psm' END AS fim_mode
          FROM sp)
        SELECT doc_id, fim_mode,
               CASE fim_mode
                 WHEN 'plain' THEN text
                 WHEN 'spm' THEN '<fim_prefix><fim_suffix>' || suffix
                                  || '<fim_middle>' || prefix || middle
                 ELSE '<fim_prefix>' || prefix || '<fim_suffix>' || suffix
                      || '<fim_middle>' || middle
               END AS fim_text
        FROM parts
    """

    o["train_shuffle_shards"] = """
        WITH k AS (
          SELECT doc_id,
                 md5(doc_id::VARCHAR || ':' || 'gocrawl') AS key,
                 (('0x' || substr(md5(doc_id::VARCHAR || ':' || 'gocrawl'), 1, 8))::UBIGINT
                  % 8)::INTEGER AS shard
          FROM documents)
        SELECT doc_id, shard,
               row_number() OVER (PARTITION BY shard ORDER BY key, doc_id)::BIGINT AS pos
        FROM k
    """

    # sequence packing: per-shard running token count in shuffle order,
    # cut at the 512-token budget
    o["train_pack_sequences"] = r"""
        WITH k AS (
          SELECT doc_id,
                 md5(doc_id::VARCHAR || ':' || 'gocrawl') AS key,
                 (('0x' || substr(md5(doc_id::VARCHAR || ':' || 'gocrawl'), 1, 8))::UBIGINT
                  % 8)::INTEGER AS shard,
                 len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                                 x -> x <> ''))::BIGINT AS n_tokens
          FROM documents),
        c AS (
          SELECT doc_id, shard, n_tokens,
                 (sum(n_tokens) OVER (PARTITION BY shard ORDER BY key, doc_id
                                      ROWS UNBOUNDED PRECEDING) - n_tokens)::BIGINT AS start
          FROM k)
        SELECT doc_id, shard, n_tokens,
               (start // 512)::BIGINT AS seq,
               (start % 512)::BIGINT AS offset
        FROM c
    """

    # blocklist: the oracle never parses URLs — it re-derives the
    # blocked hosts from the same doc_id arithmetic (host =
    # w{id%5}.dom{id%9}.com; dom3.com blocks all id%9=3, w2.dom5.com
    # blocks the exact host id%5=2 AND id%9=5)
    o["curate_blocklist"] = """
        WITH d AS (
          SELECT doc_id,
                 'https://w' || (doc_id % 5)::VARCHAR || '.dom'
                   || (doc_id % 9)::VARCHAR || '.com/p/' || doc_id::VARCHAR AS url
          FROM documents)
        SELECT doc_id, url FROM d
        WHERE NOT ((doc_id % 9) = 3 OR ((doc_id % 5) = 2 AND (doc_id % 9) = 5))
    """

    # URL aliases: the oracle never parses URLs — all four alias
    # spellings of page g normalize to the same canonical form, so the
    # groups are pure doc_id arithmetic (4 consecutive ids per page)
    o["dedup_url_aliases"] = """
        WITH g AS (SELECT DISTINCT doc_id // 4 AS g FROM documents)
        SELECT 'https://w.site' || (g % 10)::VARCHAR || '.com/p/' || g::VARCHAR AS norm_url,
               4::BIGINT AS n_aliases,
               (g * 4)::BIGINT AS canonical_doc
        FROM g
    """

    # SURT keys: the oracle states the closed-form expected key from
    # the same doc_id arithmetic — the generic Spark transform (host
    # reversal, www-strip, port drop, query canon) must land on it
    o["crawl_surt_keys"] = """
        WITH g AS (SELECT doc_id, doc_id // 4 AS grp FROM documents)
        SELECT 'com,example,site' || (grp % 10)::VARCHAR || ')/page/'
                 || grp::VARCHAR || '?a=1&b=2' AS surt,
               count(*)::BIGINT AS n_aliases,
               min(doc_id)::BIGINT AS canonical_doc
        FROM g GROUP BY surt
    """

    # CDX capture index: url/ts arithmetic mirrors synth.url_of /
    # synth.pub_date; the SURT is stated closed-form (host labels
    # reversed), digest/length re-derived from the same payload concat
    _CDX_CAPS = """
        caps AS (
          SELECT d.doc_id, d.text,
                 CASE WHEN d.doc_id % 4 = 0 THEN 0
                      ELSE 1 + (d.doc_id % 15) END AS hostidx,
                 CASE WHEN d.doc_id % 17 = 3 THEN 'category'
                      WHEN d.doc_id % 3 <> 0 THEN 'article'
                      ELSE 'page' END AS kind,
                 (1672531200 + (d.doc_id % 365)*86400
                  + (d.doc_id % 24)*3600 + (d.doc_id % 60)*60)
                   * 1000000 AS base_us,
                 u.k AS k
          FROM documents d,
               LATERAL unnest(generate_series(0, d.doc_id % 3)) AS u(k)
        ),
        rec AS (
          SELECT 'com,example,site' || lpad(hostidx::VARCHAR, 2, '0')
                   || ')/' || kind || '/' || doc_id::VARCHAR AS surt,
                 (base_us + k * 86400000000)::BIGINT AS ts_us,
                 'https://site' || lpad(hostidx::VARCHAR, 2, '0')
                   || '.example.com/' || kind || '/'
                   || doc_id::VARCHAR AS url,
                 'text/html' AS mime,
                 200::INTEGER AS status,
                 sha256(text || (k % 2)::VARCHAR) AS digest,
                 length(text || (k % 2)::VARCHAR)::BIGINT AS length,
                 hostidx
          FROM caps
        )
    """
    o["crawl_cdx_index"] = f"""
        WITH {_CDX_CAPS}
        SELECT surt, ts_us, url, mime, status, digest, length FROM rec
    """
    o["crawl_cdx_lookup"] = f"""
        WITH {_CDX_CAPS}
        SELECT surt,
               count(*)::BIGINT AS n_captures,
               max(ts_us)::BIGINT AS last_ts_us,
               arg_max(url, ts_us) AS url,
               arg_max(digest, ts_us) AS digest,
               arg_max(length, ts_us)::BIGINT AS length
        FROM rec WHERE hostidx = 1 GROUP BY surt
    """

    # WARC revisit election: first capture per digest by (ts, url) —
    # the window's (ts_us, url) order is exactly Spark's
    # min(struct(ts_us, url)) tie-break
    o["crawl_warc_revisit"] = f"""
        WITH {_CDX_CAPS},
        f AS (
          SELECT url, ts_us, digest, length,
                 first_value(url) OVER w AS f_url,
                 first_value(ts_us) OVER w AS f_ts
          FROM rec
          WINDOW w AS (PARTITION BY digest ORDER BY ts_us, url)
        )
        SELECT url, ts_us, digest,
               CASE WHEN ts_us = f_ts AND url = f_url
                    THEN 'response' ELSE 'revisit' END AS record_type,
               CASE WHEN NOT (ts_us = f_ts AND url = f_url)
                    THEN f_url END AS refers_to_url,
               (CASE WHEN NOT (ts_us = f_ts AND url = f_url)
                     THEN f_ts END)::BIGINT AS refers_to_ts_us,
               (CASE WHEN NOT (ts_us = f_ts AND url = f_url)
                     THEN length ELSE 0 END)::BIGINT AS saved_bytes
        FROM f
    """

    # host dup rate: the same (ts, url)-first revisit election folded
    # to a host rollup — integer basis points via //
    o["crawl_host_dup_rate"] = f"""
        WITH {_CDX_CAPS},
        f AS (
          SELECT url, ts_us, digest, length,
                 first_value(url) OVER w AS f_url,
                 first_value(ts_us) OVER w AS f_ts
          FROM rec
          WINDOW w AS (PARTITION BY digest ORDER BY ts_us, url)
        ),
        r AS (
          SELECT split_part(url, '/', 3) AS host,
                 CASE WHEN ts_us = f_ts AND url = f_url THEN 0 ELSE 1 END AS is_rev,
                 CASE WHEN ts_us = f_ts AND url = f_url THEN 0 ELSE length END AS saved
          FROM f
        )
        SELECT host, count(*)::BIGINT AS n_captures,
               sum(1 - is_rev)::BIGINT AS n_responses,
               sum(is_rev)::BIGINT AS n_revisits,
               (sum(is_rev)::BIGINT * 10000) // count(*)::BIGINT AS dup_bp,
               sum(saved)::BIGINT AS bytes_saved
        FROM r GROUP BY host
    """

    # sitemap coverage: same url arithmetic as the Spark twin —
    # declared = even docs + /extra/ phantoms for doc_id%7==0
    o["crawl_sitemap_coverage"] = """
        WITH u AS (
          SELECT doc_id,
                 'site' || lpad((CASE WHEN doc_id % 4 = 0 THEN 0
                                 ELSE 1 + (doc_id % 15) END)::VARCHAR, 2, '0')
                   || '.example.com' AS host,
                 CASE WHEN doc_id % 17 = 3 THEN 'category'
                      WHEN doc_id % 3 <> 0 THEN 'article'
                      ELSE 'page' END AS kind
          FROM documents
        ),
        crawled AS (
          SELECT DISTINCT 'https://' || host || '/' || kind || '/'
                 || doc_id::VARCHAR AS url FROM u
        ),
        declared0 AS (
          SELECT 'https://' || host || '/' || kind || '/'
                 || doc_id::VARCHAR AS url FROM u WHERE doc_id % 2 = 0
          UNION ALL
          SELECT 'https://' || host || '/extra/' || doc_id::VARCHAR
          FROM u WHERE doc_id % 7 = 0
        ),
        dd AS (SELECT DISTINCT url, 1 AS _d FROM declared0),
        cc AS (SELECT url, 1 AS _c FROM crawled),
        j AS (
          SELECT split_part(coalesce(dd.url, cc.url), '/', 3) AS host,
                 _d, _c
          FROM dd FULL OUTER JOIN cc ON dd.url = cc.url
        ),
        g AS (
          SELECT host,
                 sum(CASE WHEN _d IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_declared,
                 sum(CASE WHEN _c IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_crawled,
                 sum(CASE WHEN _d IS NOT NULL AND _c IS NOT NULL
                          THEN 1 ELSE 0 END)::BIGINT AS n_both,
                 sum(CASE WHEN _d IS NOT NULL AND _c IS NULL
                          THEN 1 ELSE 0 END)::BIGINT AS n_declared_only,
                 sum(CASE WHEN _c IS NOT NULL AND _d IS NULL
                          THEN 1 ELSE 0 END)::BIGINT AS n_crawled_only
          FROM j GROUP BY host
        )
        SELECT host, n_declared, n_crawled, n_both, n_declared_only,
               n_crawled_only,
               (CASE WHEN n_declared > 0
                     THEN (n_both * 10000) // n_declared
                     ELSE 0 END)::BIGINT AS coverage_bp
        FROM g
    """

    # politeness audit: identical (ts, url)-ordered lag window per
    # host, identical 30-minute floor
    o["crawl_politeness_audit"] = f"""
        WITH {_CDX_CAPS},
        l AS (
          SELECT split_part(url, '/', 3) AS host, ts_us, url,
                 ts_us - lag(ts_us) OVER (
                   PARTITION BY split_part(url, '/', 3)
                   ORDER BY ts_us, url) AS gap
          FROM rec
        )
        SELECT host, count(*)::BIGINT AS n_fetches,
               min(gap)::BIGINT AS min_gap_us,
               sum(CASE WHEN gap < {_POLITENESS_MIN_DELAY_US}
                        THEN 1 ELSE 0 END)::BIGINT AS n_violations
        FROM l GROUP BY host
    """

    # lang drift: same integer-ppm DIV arithmetic, same B-snapshot
    # predicate (doc_id % 3 <> 0)
    o["corpus_lang_drift"] = """
        WITH ca AS (
          SELECT lang AS key, count(*)::BIGINT AS n_a
          FROM documents GROUP BY lang),
        cb AS (
          SELECT lang AS key, count(*)::BIGINT AS n_b
          FROM documents WHERE doc_id % 3 <> 0 GROUP BY lang),
        ta AS (SELECT sum(n_a)::BIGINT AS t_a FROM ca),
        tb AS (SELECT sum(n_b)::BIGINT AS t_b FROM cb),
        j AS (
          SELECT coalesce(ca.key, cb.key) AS key,
                 coalesce(n_a, 0)::BIGINT AS n_a,
                 coalesce(n_b, 0)::BIGINT AS n_b
          FROM ca FULL OUTER JOIN cb ON ca.key = cb.key),
        p AS (
          SELECT key, n_a, n_b,
                 (CASE WHEN t_a > 0 THEN (n_a * 1000000) // t_a
                       ELSE 0 END)::BIGINT AS ppm_a,
                 (CASE WHEN t_b > 0 THEN (n_b * 1000000) // t_b
                       ELSE 0 END)::BIGINT AS ppm_b
          FROM j, ta, tb)
        SELECT key, n_a, n_b, ppm_a, ppm_b,
               abs(ppm_a - ppm_b)::BIGINT AS delta_ppm
        FROM p
    """

    # sitemap parse: the oracle never sees XML — it reconstructs the
    # expected rows from the same doc_id arithmetic
    o["sitemap_parse"] = """
        SELECT doc_id,
               'https://sm.example.com/doc/' || doc_id::VARCHAR AS loc,
               CASE WHEN doc_id % 2 = 0
                    THEN ('2026-01-' || lpad(((doc_id % 28) + 1)::VARCHAR, 2, '0'))::TIMESTAMP
                    ELSE ('2026-02-' || lpad(((doc_id % 28) + 1)::VARCHAR, 2, '0')
                          || ' 08:30:45')::TIMESTAMP END AS lastmod
        FROM documents
    """

    # feed parse: like sitemap_parse, the oracle reconstructs the
    # expected rows from doc_id arithmetic — RSS (even) and Atom (odd)
    # entries land in one table with their dialect tag
    o["feed_parse"] = """
        SELECT doc_id,
               'https://feed.example.com/p/' || doc_id::VARCHAR AS link,
               'doc ' || doc_id::VARCHAR AS title,
               CASE WHEN doc_id % 2 = 0
                    THEN ('2026-01-' || lpad(((doc_id % 28) + 1)::VARCHAR, 2, '0')
                          || ' 08:30:45')::TIMESTAMP
                    ELSE ('2026-02-' || lpad(((doc_id % 28) + 1)::VARCHAR, 2, '0')
                          || ' 08:30:45')::TIMESTAMP END AS published,
               CASE WHEN doc_id % 2 = 0 THEN 'rss' ELSE 'atom' END AS kind
        FROM documents
    """

    # feed poll schedule: integer gap math over the value-sorted click
    # timestamps per user — element-pick lower median, DIV seconds,
    # least/greatest clamp (identical op order to feeds.poll_intervals)
    o["feed_poll_schedule"] = """
        WITH e AS (
          SELECT 'feed-' || user_id::VARCHAR AS feed, epoch_us(ts) AS us
          FROM events WHERE event_type = 'click'),
        g AS (SELECT feed, list_sort(list(us)) AS ts FROM e GROUP BY feed),
        m AS (
          SELECT feed, len(ts) AS n,
                 list_sort(list_transform(generate_series(1, len(ts) - 1),
                                          i -> ts[i + 1] - ts[i])) AS gaps
          FROM g)
        SELECT feed,
               (CASE WHEN n < 2 THEN 400000
                     ELSE least(400000, greatest(30000,
                          gaps[(len(gaps) + 1) // 2] // 1000000)) END)::BIGINT
                   AS interval_s
        FROM m
    """

    # AIMD delays: identical integer fold replayed with list_reduce
    # over the same (ts, ok)-sorted outcome sequence
    o["crawl_aimd_delays"] = """
        WITH e AS (
          SELECT 'h' || (user_id % 64)::VARCHAR AS host,
                 epoch_us(ts) AS ts_us,
                 CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END AS ok
          FROM events),
        g AS (
          SELECT host,
                 list(ok ORDER BY ts_us, ok) AS oks,
                 sum(ok)::BIGINT AS n_ok,
                 (count(*) - sum(ok))::BIGINT AS n_err
          FROM e GROUP BY host)
        SELECT host,
               list_reduce(list_prepend(500::BIGINT, oks),
                 (acc, x) -> CASE WHEN x = 1
                                  THEN greatest(100::BIGINT, acc - 100)
                                  ELSE least(60000::BIGINT, acc * 2) END)
                   AS delay_ms,
               n_ok, n_err
        FROM g
    """

    # corpus-pair overlap: corpus-level minhash per permutation (min
    # over the corpus's distinct-shingle union — identical to Spark's
    # min-over-docs of per-doc minima) + exact distinct-shingle Jaccard
    # PCA: integer covariance numerators are exact in both engines;
    # the power iteration unrolls sweep-by-sweep with the same
    # max-normalize + round(·, 9) and the same j-ordered folds
    _pca_cov_ctes = """
        q AS (SELECT vec_id,
                     list_transform(embedding,
                       x -> floor(x::DOUBLE * 10000 + 0.5)::BIGINT) AS q
              FROM embeddings),
        pos AS (SELECT unnest(range(0, 64))::INT AS i),
        tri AS (SELECT pi.i AS i, pj.i AS j,
                       sum(q[pi.i + 1] * q[pj.i + 1])::BIGINT AS sxy,
                       count(*)::BIGINT AS n
                FROM q, pos pi, pos pj WHERE pj.i >= pi.i
                GROUP BY 1, 2),
        fm AS (SELECT i, sum(q[i + 1])::BIGINT AS s FROM q, pos GROUP BY i),
        ut AS (SELECT t.i, t.j, (t.n * t.sxy - fi.s * fj.s)::BIGINT AS cov_num,
                      t.n
               FROM tri t JOIN fm fi ON fi.i = t.i JOIN fm fj ON fj.i = t.j),
        cov AS (SELECT i, j, cov_num, n FROM ut
                UNION ALL
                SELECT j AS i, i AS j, cov_num, n FROM ut WHERE i <> j)
    """

    o["emb_pca_cov"] = f"""
        WITH {_pca_cov_ctes}
        SELECT i, j, cov_num, n FROM cov
    """

    _pca_sweeps = []
    _prev = "v0"
    for _s in range(1, 7):
        # DuckDB forbids subqueries inside lambdas — the carried
        # vector/scalar join in via a 1-row cross join instead
        _pca_sweeps.append(f"""
        w{_s} AS (SELECT i, list_reduce(list_prepend(0.0::DOUBLE,
                    list_transform(generate_series(0, 63),
                      j -> row[j + 1]::DOUBLE * vv.v[j + 1])),
                    (a, b) -> a + b) AS w
                  FROM mat, {_prev} vv),
        m{_s} AS (SELECT max(abs(w)) AS m FROM w{_s}),
        v{_s} AS (SELECT list_transform(list(w ORDER BY i),
                    x -> round(x / mm.m, 9)) AS v
                  FROM w{_s}, m{_s} mm GROUP BY mm.m)""")
        _prev = f"v{_s}"
    o["emb_pca_power"] = f"""
        WITH {_pca_cov_ctes},
        mat AS (SELECT i, list(cov_num ORDER BY j) AS row FROM cov GROUP BY i),
        v0 AS (SELECT list_transform(generate_series(0, 63),
                                     x -> 1.0::DOUBLE) AS v),
        {",".join(_pca_sweeps)},
        vf AS (SELECT CASE WHEN list_filter(v, x -> abs(x) =
                             list_max(list_transform(v, y -> abs(y))))[1] < 0
                           THEN list_transform(v, x -> -x) ELSE v END AS v
               FROM v6)
        SELECT vec_id,
               round(list_reduce(list_prepend(0.0::DOUBLE,
                 list_transform(generate_series(0, 63),
                   i -> q[i + 1]::DOUBLE * vv.v[i + 1])),
                 (a, b) -> a + b), 6) AS pc1
        FROM q, vf vv
    """

    o["corpus_overlap_minhash"] = f"""
        WITH w AS (SELECT doc_id, {_SQL_WORDS} AS w FROM documents),
        sh AS (SELECT doc_id, {_sql_shingles(5)} AS shingles FROM w),
        ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        sa AS (SELECT DISTINCT s FROM ex WHERE doc_id % 3 <> 0),
        sb AS (SELECT DISTINCT s FROM ex WHERE doc_id % 5 <> 1),
        perms AS (SELECT unnest(range(0, 64)) AS h),
        siga AS (SELECT h, min(md5(h::VARCHAR || '#' || s)) AS mh_a
                 FROM sa, perms GROUP BY h),
        sigb AS (SELECT h, min(md5(h::VARCHAR || '#' || s)) AS mh_b
                 FROM sb, perms GROUP BY h),
        m AS (SELECT sum(CASE WHEN mh_a = mh_b THEN 1 ELSE 0 END)::BIGINT
                     AS matches
              FROM siga JOIN sigb USING (h)),
        ha AS (SELECT DISTINCT md5(s) AS hs FROM sa),
        hb AS (SELECT DISTINCT md5(s) AS hs FROM sb),
        exj AS (SELECT sum(CASE WHEN ha.hs IS NOT NULL AND hb.hs IS NOT NULL
                                THEN 1 ELSE 0 END)::BIGINT AS n_inter,
                       count(*)::BIGINT AS n_union
                FROM ha FULL OUTER JOIN hb ON ha.hs = hb.hs)
        SELECT 64::BIGINT AS n_hashes, m.matches,
               (m.matches * 1000000 // 64)::BIGINT AS est_jaccard_ppm,
               exj.n_inter, exj.n_union,
               (CASE WHEN exj.n_union > 0
                     THEN exj.n_inter * 1000000 // exj.n_union
                     ELSE 0 END)::BIGINT AS exact_jaccard_ppm
        FROM m, exj
    """

    # snapshot diff: same derived old/new snapshots, same md5-compare
    o["corpus_diff"] = """
        WITH a AS (SELECT doc_id, text FROM documents WHERE doc_id % 11 <> 3),
        b AS (SELECT doc_id,
                     CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
              FROM documents WHERE doc_id % 13 <> 4),
        j AS (SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
                     md5(a.text) AS ha, md5(b.text) AS hb
              FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
        SELECT doc_id,
               CASE WHEN ha IS NULL THEN 'added'
                    WHEN hb IS NULL THEN 'removed'
                    WHEN ha <> hb THEN 'changed'
                    ELSE 'unchanged' END AS change
        FROM j
    """

    # curation + near-dup end-game: the curate_corpus chain over the
    # near-dup-injected corpus, then MinHash-LSH pairs among the exact
    # survivors → connected components → canonical-only. Composed from
    # the verified curate_corpus and dedup_clusters oracle blocks.
    o["curate_corpus_neardup"] = rf"""
        WITH RECURSIVE
        aug AS ({_SQL_AUG_NEAR}),
        h AS (
          SELECT doc_id, text, {hit_cols},
                 len(regexp_extract_all(lower(text), '{_stop}', 1)) AS stop_hits,
                 len(regexp_extract_all(text, '([.,;:!?])', 1)) AS punct_cnt,
                 length(text)::DOUBLE AS n_chars,
                 len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS n_tokens
          FROM aug),
        m AS (
          SELECT doc_id, text, n_tokens,
                 CASE WHEN greatest(h_en, h_de, h_fr, h_es, h_zh) = 0 THEN 'und'
                      WHEN h_en = greatest(h_en, h_de, h_fr, h_es, h_zh) THEN 'en'
                      WHEN h_de = greatest(h_en, h_de, h_fr, h_es, h_zh) THEN 'de'
                      WHEN h_fr = greatest(h_en, h_de, h_fr, h_es, h_zh) THEN 'fr'
                      WHEN h_es = greatest(h_en, h_de, h_fr, h_es, h_zh) THEN 'es'
                      ELSE 'zh' END AS pred_lang,
                 round(0.5::DOUBLE * least(1.0::DOUBLE, n_chars / 500.0::DOUBLE)
                     + 0.3::DOUBLE * least(1.0::DOUBLE,
                         (CASE WHEN n_tokens > 0 THEN stop_hits / n_tokens::DOUBLE ELSE 0.0::DOUBLE END) / 0.4::DOUBLE)
                     + 0.2::DOUBLE * (1.0::DOUBLE - least(1.0::DOUBLE,
                         (CASE WHEN n_chars > 0 THEN punct_cnt / n_chars ELSE 0.0::DOUBLE END) * 5.0::DOUBLE)),
                     6) AS quality
          FROM h),
        kq AS (SELECT * FROM m WHERE pred_lang = 'en' AND quality >= 0.5::DOUBLE),
        d AS (
          SELECT doc_id, text, pred_lang, quality, n_tokens,
                 row_number() OVER (
                   PARTITION BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
                   ORDER BY doc_id) AS rn
          FROM kq),
        surv AS (SELECT doc_id, text, pred_lang, quality, n_tokens FROM d WHERE rn = 1),
        w AS (SELECT doc_id AS id, {_SQL_WORDS} AS w FROM surv),
        sh AS (SELECT id, {_sql_shingles(5)} AS shingles FROM w),
        sig AS (SELECT id,
                 [list_min([md5(hx::VARCHAR || '#' || s) for s in shingles]) for hx in range(0,16)] AS sig
                FROM sh),
        bands AS (SELECT id, band,
                   md5(array_to_string(list_slice(sig, band*4+1, band*4+4), '|')) AS key
                  FROM (SELECT id, sig, unnest(range(0,4)) AS band FROM sig)),
        cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
                 FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key AND a.id < b.id),
        prs AS (SELECT c.id_a, c.id_b
                FROM cand c JOIN sig sa ON sa.id = c.id_a JOIN sig sb ON sb.id = c.id_b
                WHERE (len(list_filter(range(1,17), i -> sa.sig[i] = sb.sig[i]))::DOUBLE / 16.0::DOUBLE) >= 0.5::DOUBLE),
        edges AS (SELECT id_a AS u, id_b AS v FROM prs
                  UNION SELECT id_b AS u, id_a AS v FROM prs),
        cc AS (SELECT u, u AS label FROM (SELECT DISTINCT u FROM edges)
               UNION
               SELECT e.u, c.label FROM edges e JOIN cc c ON c.u = e.v),
        lab AS (SELECT u AS doc_id, min(label) AS cluster_id FROM cc GROUP BY u),
        losers AS (SELECT doc_id FROM lab WHERE doc_id <> cluster_id)
        SELECT s.doc_id, s.pred_lang, s.quality, s.n_tokens
        FROM surv s LEFT JOIN losers l ON l.doc_id = s.doc_id
        WHERE l.doc_id IS NULL
    """

    # damped PageRank, 3 sweeps unrolled (no recursion needed for a
    # FIXED iteration count); same per-sweep round(…, 9) as the engine
    _pr_iters = []
    for i in range(3):
        prev = f"r{i}"
        _pr_iters.append(f"""
        c{i + 1} AS (SELECT e.dst AS node, sum(r.rank / d.outdeg) AS c
                 FROM e JOIN {prev} r ON r.node = e.src JOIN deg d ON d.src = e.src
                 GROUP BY e.dst),
        r{i + 1} AS (SELECT nodes.node,
                   round((1.0::DOUBLE - 0.85::DOUBLE) / (SELECT n FROM nn)
                         + 0.85::DOUBLE * coalesce(c, 0.0::DOUBLE), 9) AS rank
                 FROM nodes LEFT JOIN c{i + 1} ON c{i + 1}.node = nodes.node)""")
    o["link_rank_pagerank"] = f"""
        WITH e AS (
          SELECT doc_id AS src,
                 (doc_id * 31 + 7 * (j + 1) + 1) % (SELECT count(*) FROM documents) AS dst
          FROM documents, range(0, 6) t(j)
          WHERE j < 3 + doc_id % 3),
        nodes AS (SELECT DISTINCT src AS node FROM e
                  UNION SELECT DISTINCT dst FROM e),
        nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
        deg AS (SELECT src, count(*)::DOUBLE AS outdeg FROM e GROUP BY src),
        r0 AS (SELECT node, 1.0::DOUBLE / (SELECT n FROM nn) AS rank FROM nodes),{",".join(_pr_iters)}
        SELECT node AS doc_id, round(rank, 6) AS rank FROM r3
    """

    # HITS: same edge CTE, sweeps unrolled; each half-sweep is a
    # rounded fan-in sum then an exact (order-independent) max-norm —
    # the *f CTEs are MATERIALIZED because each is read twice (by the
    # normalizer and by its scalar max)
    _hits_iters = []
    for i in range(3):
        _hits_iters.append(f"""
        a{i + 1}r AS (SELECT e.dst AS node, round(sum(h.hub), 9) AS a
                 FROM e JOIN h{i} h ON h.node = e.src GROUP BY e.dst),
        a{i + 1}f AS MATERIALIZED (
                 SELECT nodes.node, coalesce(a, 0.0::DOUBLE) AS a
                 FROM nodes LEFT JOIN a{i + 1}r ON a{i + 1}r.node = nodes.node),
        a{i + 1} AS (SELECT node,
                   coalesce(round(a / nullif((SELECT max(a) FROM a{i + 1}f), 0), 9),
                            0.0::DOUBLE) AS auth
                 FROM a{i + 1}f),
        h{i + 1}r AS (SELECT e.src AS node, round(sum(a.auth), 9) AS h
                 FROM e JOIN a{i + 1} a ON a.node = e.dst GROUP BY e.src),
        h{i + 1}f AS MATERIALIZED (
                 SELECT nodes.node, coalesce(h, 0.0::DOUBLE) AS h
                 FROM nodes LEFT JOIN h{i + 1}r ON h{i + 1}r.node = nodes.node),
        h{i + 1} AS (SELECT node,
                   coalesce(round(h / nullif((SELECT max(h) FROM h{i + 1}f), 0), 9),
                            0.0::DOUBLE) AS hub
                 FROM h{i + 1}f)""")
    o["link_rank_hits"] = f"""
        WITH e AS (
          SELECT doc_id AS src,
                 (doc_id * 31 + 7 * (j + 1) + 1) % (SELECT count(*) FROM documents) AS dst
          FROM documents, range(0, 6) t(j)
          WHERE j < 3 + doc_id % 3),
        nodes AS MATERIALIZED (
                  SELECT DISTINCT src AS node FROM e
                  UNION SELECT DISTINCT dst FROM e),
        h0 AS (SELECT node, 1.0::DOUBLE AS hub FROM nodes),{",".join(_hits_iters)}
        SELECT h3.node AS doc_id, round(h3.hub, 6) AS hub,
               round(a3.auth, 6) AS auth
        FROM h3 JOIN a3 ON a3.node = h3.node
    """

    # TrustRank: same edge CTE; teleport lands only on the seed
    # subset, sweeps unrolled with the link_rank rounding scheme
    _tr_iters = []
    for i in range(3):
        _tr_iters.append(f"""
        tc{i + 1} AS (SELECT e.dst AS node, sum(r.trust / d.outdeg) AS c
                 FROM e JOIN t{i} r ON r.node = e.src JOIN deg d ON d.src = e.src
                 GROUP BY e.dst),
        t{i + 1} AS (SELECT nodes.node,
                   round(CASE WHEN nodes.node % 40 = 0
                              THEN (1.0::DOUBLE - 0.85::DOUBLE) / (SELECT k FROM ns)
                              ELSE 0.0::DOUBLE END
                         + 0.85::DOUBLE * coalesce(c, 0.0::DOUBLE), 9) AS trust
                 FROM nodes LEFT JOIN tc{i + 1} ON tc{i + 1}.node = nodes.node)""")
    o["link_rank_trust"] = f"""
        WITH e AS (
          SELECT doc_id AS src,
                 (doc_id * 31 + 7 * (j + 1) + 1) % (SELECT count(*) FROM documents) AS dst
          FROM documents, range(0, 6) t(j)
          WHERE j < 3 + doc_id % 3),
        nodes AS MATERIALIZED (
                  SELECT DISTINCT src AS node FROM e
                  UNION SELECT DISTINCT dst FROM e),
        ns AS (SELECT count(*)::DOUBLE AS k FROM nodes WHERE node % 40 = 0),
        deg AS (SELECT src, count(*)::DOUBLE AS outdeg FROM e GROUP BY src),
        t0 AS (SELECT node,
                      CASE WHEN node % 40 = 0
                           THEN 1.0::DOUBLE / (SELECT k FROM ns)
                           ELSE 0.0::DOUBLE END AS trust
               FROM nodes),{",".join(_tr_iters)}
        SELECT node AS doc_id, round(trust, 6) AS trust FROM t3
    """

    o["crawl_host_graph"] = """
        WITH e AS (
          SELECT doc_id AS src,
                 (doc_id * 31 + 7 * (j + 1) + 1) % (SELECT count(*) FROM documents) AS dst
          FROM documents, range(0, 6) t(j)
          WHERE j < 3 + doc_id % 3),
        h AS (SELECT src, dst,
                'site' || lpad((CASE WHEN src % 4 = 0 THEN 0
                                     ELSE 1 + src % 15 END)::VARCHAR, 2, '0')
                       || '.example.com' AS src_host,
                'site' || lpad((CASE WHEN dst % 4 = 0 THEN 0
                                     ELSE 1 + dst % 15 END)::VARCHAR, 2, '0')
                       || '.example.com' AS dst_host
              FROM e)
        SELECT src_host, dst_host,
               count(*)::BIGINT AS weight,
               count(DISTINCT src)::BIGINT AS n_src_pages
        FROM h WHERE src_host <> dst_host
        GROUP BY src_host, dst_host
    """

    # robots meta: the expected flags recomputed from the page
    # CONSTRUCTION arithmetic (doc_id mods) — the Spark side must
    # recover exactly these through the real HTML parse
    o["crawl_robots_meta"] = """
        SELECT 'https://x.com/p/' || doc_id::VARCHAR AS url,
               (doc_id % 5 IN (0, 1, 3)) AS noindex,
               (doc_id % 5 IN (0, 2, 3)) AS nofollow,
               (1 + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
                  + CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_links,
               (CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
                  + CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_nofollow_links
        FROM documents
    """

    # label propagation: same host-graph CTEs, the 3 sweeps unrolled —
    # votes are exact BIGINT sums so there is no float order anywhere;
    # argmax = row_number over (sum DESC, label ASC), literally the
    # Spark window
    _lpa_sweeps = []
    for _i in range(1, 4):
        _lpa_sweeps.append(f"""
        v{_i} AS MATERIALIZED (
          SELECT s.u, l.label, sum(s.w)::BIGINT AS sc
          FROM sym s JOIN l{_i - 1} l ON s.v = l.u
          GROUP BY s.u, l.label),
        n{_i} AS (SELECT u, label FROM (
            SELECT u, label,
                   row_number() OVER (PARTITION BY u
                                      ORDER BY sc DESC, label) AS rn
            FROM v{_i}) WHERE rn = 1),
        l{_i} AS MATERIALIZED (
          SELECT nodes.u, coalesce(n{_i}.label, nodes.u) AS label
          FROM nodes LEFT JOIN n{_i} ON nodes.u = n{_i}.u)""")

    o["crawl_host_communities"] = f"""
        WITH e AS (
          SELECT doc_id AS src,
                 (doc_id * 31 + 7 * (j + 1) + 1) % (SELECT count(*) FROM documents) AS dst
          FROM documents, range(0, 6) t(j)
          WHERE j < 3 + doc_id % 3),
        h AS (SELECT src, dst,
                'site' || lpad((CASE WHEN src % 4 = 0 THEN 0
                                     ELSE 1 + src % 15 END)::VARCHAR, 2, '0')
                       || '.example.com' AS src_host,
                'site' || lpad((CASE WHEN dst % 4 = 0 THEN 0
                                     ELSE 1 + dst % 15 END)::VARCHAR, 2, '0')
                       || '.example.com' AS dst_host
              FROM e),
        g AS (SELECT src_host, dst_host, count(*)::BIGINT AS w
              FROM h WHERE src_host <> dst_host
              GROUP BY src_host, dst_host),
        sym AS MATERIALIZED (
          SELECT src_host AS u, dst_host AS v, w FROM g
          UNION ALL
          SELECT dst_host AS u, src_host AS v, w FROM g),
        nodes AS MATERIALIZED (SELECT DISTINCT u FROM sym),
        l0 AS (SELECT u, u AS label FROM nodes),{",".join(_lpa_sweeps)}
        SELECT u AS node, label AS community FROM l3
    """

    # HyperBall: the same md5/bit-length register scheme as the
    # corpus-cardinality oracle, seeded per node with node::VARCHAR and
    # max-merged one hop per sweep; estimates reuse the exact DECIMAL
    # harmonic-sum math. Each regs CTE is read three times (next
    # sweep's two references + its estimate) → MATERIALIZED.
    _hb_m, _hb_p = 256, 8
    _hb_fac = repr((0.7213 / (1.0 + 1.079 / _hb_m)) * _hb_m * _hb_m)
    _hb_raw = f"({_hb_fac} * 4611686018427387904.0 / tot::DOUBLE)"
    _hb_est = []
    for _r in range(4):
        _hb_est.append(f"""
        agg{_r} AS (SELECT node, count(*)::BIGINT AS n_buckets,
                   sum(1::BIGINT << (62 - rho)::INT) AS occ
                 FROM regs{_r} GROUP BY node),
        est{_r} AS (SELECT node, {_r} AS r, n_buckets,
                   round(CASE WHEN {_hb_raw} <= {2.5 * _hb_m!r} AND v > 0
                              THEN {float(_hb_m)!r} * ln({float(_hb_m)!r} / v::DOUBLE)
                              ELSE {_hb_raw} END, 6) AS estimate
                 FROM (SELECT node, n_buckets,
                              ({_hb_m} - n_buckets)::BIGINT AS v,
                              occ + (({_hb_m} - n_buckets)::HUGEINT
                                     * (1::BIGINT << 62)::HUGEINT) AS tot
                       FROM agg{_r}))""")
    _hb_sweeps = []
    for _r in range(1, 4):
        _hb_sweeps.append(f"""
        regs{_r} AS MATERIALIZED (
          SELECT node, bucket, max(rho) AS rho FROM (
            SELECT node, bucket, rho FROM regs{_r - 1}
            UNION ALL
            SELECT eh.src AS node, b.bucket, b.rho
            FROM eh JOIN regs{_r - 1} b ON b.node = eh.dst)
          GROUP BY node, bucket)""")
    _hb_ctes = f"""
        e0 AS (
          SELECT doc_id AS src,
                 (doc_id * 31 + 7 * (j + 1) + 1) % (SELECT count(*) FROM documents) AS dst
          FROM documents, range(0, 6) t(j)
          WHERE j < 3 + doc_id % 3),
        eh AS MATERIALIZED (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
        nodes AS (SELECT DISTINCT src AS node FROM eh
                  UNION SELECT DISTINCT dst FROM eh),
        hsh AS (
          SELECT node,
                 ('0x' || substr(md5(node::VARCHAR), 1, 15))::UBIGINT::BIGINT AS h_hi,
                 ('0x' || substr(md5(node::VARCHAR), 16, 1))::UBIGINT::BIGINT AS h_lo
          FROM nodes),
        rr AS (
          SELECT node, (h_hi % 16) * 16 + h_lo AS bucket,
                 least(CASE WHEN h_hi // 16 > 0
                            THEN 56 - length(bin(h_hi // 16)) + 1
                            ELSE 57 END, 62)::BIGINT AS rho
          FROM hsh),
        regs0 AS MATERIALIZED (
          SELECT node, bucket, max(rho) AS rho FROM rr GROUP BY node, bucket),{",".join(_hb_sweeps)},{",".join(_hb_est)}
    """
    o["crawl_hyperball"] = f"""
        WITH {_hb_ctes}
        SELECT node, r, n_buckets, estimate FROM est0
        UNION ALL SELECT node, r, n_buckets, estimate FROM est1
        UNION ALL SELECT node, r, n_buckets, estimate FROM est2
        UNION ALL SELECT node, r, n_buckets, estimate FROM est3
    """
    # harmonic: exact integer micro-units — 6dp estimates lift onto
    # the 10^6 grid, 1/r discounts become lcm(1..3)=6-weighted LONG
    # sums, one truncating // lands the result (no float fold)
    o["crawl_harmonic"] = f"""
        WITH {_hb_ctes},
        mu AS (SELECT e0r.node,
                      round(e0r.estimate * 1000000.0, 0)::BIGINT AS m0,
                      round(e1r.estimate * 1000000.0, 0)::BIGINT AS m1,
                      round(e2r.estimate * 1000000.0, 0)::BIGINT AS m2,
                      round(e3r.estimate * 1000000.0, 0)::BIGINT AS m3
               FROM est0 e0r
               JOIN est1 e1r ON e1r.node = e0r.node
               JOIN est2 e2r ON e2r.node = e0r.node
               JOIN est3 e3r ON e3r.node = e0r.node)
        SELECT node,
               (6 * (m1 - m0) + 3 * (m2 - m1) + 2 * (m3 - m2)) // 6
                 AS harmonic_micro
        FROM mu
    """

    # k-core by h-index iteration: all-integer, 8 unrolled sweeps;
    # max(least(rank, value)) over the DESC-sorted neighbor values is
    # tie-order invariant, so the window needs no tiebreak column
    _kc_sweeps = []
    for _s in range(1, 9):
        _kc_sweeps.append(f"""
        c{_s} AS MATERIALIZED (
          SELECT src, max(least(rn, c)) AS c FROM (
            SELECT u.src, p.c,
                   row_number() OVER (PARTITION BY u.src ORDER BY p.c DESC) AS rn
            FROM und u JOIN c{_s - 1} p ON p.src = u.dst)
          GROUP BY src)""")
    o["crawl_kcore"] = f"""
        WITH e0 AS (
          SELECT doc_id AS src,
                 (doc_id * 31 + 7 * (j + 1) + 1) % (SELECT count(*) FROM documents) AS dst
          FROM documents, range(0, 6) t(j)
          WHERE j < 3 + doc_id % 3),
        fwd AS (SELECT src, dst FROM e0 WHERE src <> dst),
        und AS MATERIALIZED (
          SELECT DISTINCT src, dst FROM (
            SELECT src, dst FROM fwd
            UNION ALL SELECT dst AS src, src AS dst FROM fwd)),
        c0 AS (SELECT src, count(*)::BIGINT AS c FROM und GROUP BY src),{",".join(_kc_sweeps)}
        SELECT src AS node, c AS core FROM c8
    """

    # budget allocation: same host arithmetic; the share is integer
    # DIV of exact LONG sums, so the oracle is a literal re-statement
    o["crawl_budget_alloc"] = """
        WITH h AS (
          SELECT doc_id,
                 'site' || lpad((CASE WHEN doc_id % 4 = 0 THEN 0
                                      ELSE 1 + doc_id % 15 END)::VARCHAR, 2, '0')
                        || '.example.com' AS host
          FROM documents),
        s AS (SELECT host, count(*)::BIGINT AS queued,
                     sum(doc_id % 7 + 1)::BIGINT AS weight
              FROM h GROUP BY host),
        t AS (SELECT sum(weight)::BIGINT AS w_total FROM s)
        SELECT host,
               least(queued, 30::BIGINT,
                     greatest(2::BIGINT,
                              ((200::BIGINT * weight) // (SELECT w_total FROM t))::BIGINT)
               )::BIGINT AS quota
        FROM s WHERE queued > 0
    """

    # OPIC sweep: same edge CTE; contributions are integer DIV of
    # LONG micro-units, kept rows pass through, popped rows reset
    o["crawl_opic_sweep"] = """
        WITH e AS (
          SELECT doc_id AS src,
                 (doc_id * 31 + 7 * (j + 1) + 1) % (SELECT count(*) FROM documents) AS dst
          FROM documents, range(0, 6) t(j)
          WHERE j < 3 + doc_id % 3),
        nodes AS MATERIALIZED (
                  SELECT DISTINCT src AS node FROM e
                  UNION SELECT DISTINCT dst FROM e),
        cash AS (SELECT node, (1000000 + node % 7)::BIGINT AS cash_u FROM nodes),
        pop AS (SELECT node FROM nodes WHERE node % 3 = 0),
        k AS (SELECT src, count(*)::BIGINT AS k FROM e GROUP BY src),
        contrib AS (SELECT e.dst AS node,
                           sum(c.cash_u // k.k)::BIGINT AS delta_u
                    FROM e
                    JOIN cash c ON c.node = e.src
                    JOIN pop p ON p.node = e.src
                    JOIN k ON k.src = e.src
                    GROUP BY e.dst),
        kept AS (SELECT c.node, c.cash_u AS delta_u
                 FROM cash c LEFT JOIN pop p ON p.node = c.node
                 WHERE p.node IS NULL)
        SELECT node AS doc_id, sum(delta_u)::BIGINT AS cash_u
        FROM (SELECT * FROM contrib UNION ALL SELECT * FROM kept)
        GROUP BY node
    """

    # focused priorities: the word-ring anchors reduce to closed-form
    # hit arithmetic ('spark' = ring slot 0, 'scan' = slot 2); same
    # mean-normalized bucketing as rank_priorities
    o["crawl_focused_priorities"] = """
        WITH h AS (
          SELECT doc_id % 50 AS t,
                 (CASE WHEN doc_id % 8 = 0 THEN 1 ELSE 0 END
                  + CASE WHEN (doc_id * 3 + 1) % 8 = 0 THEN 1 ELSE 0 END
                  + CASE WHEN (doc_id * 7 + 2) % 8 = 0 THEN 1 ELSE 0 END
                  + CASE WHEN doc_id % 8 = 2 THEN 1 ELSE 0 END
                  + CASE WHEN (doc_id * 3 + 1) % 8 = 2 THEN 1 ELSE 0 END
                  + CASE WHEN (doc_id * 7 + 2) % 8 = 2 THEN 1 ELSE 0 END
                 )::BIGINT AS hit
          FROM documents),
        rel AS MATERIALIZED (
          SELECT 'https://t.example.com/p/' || t::VARCHAR AS url,
                 sum(hit)::BIGINT AS relevance
          FROM h GROUP BY t),
        st AS (SELECT round(sum(relevance)::DOUBLE / count(*), 9) AS mean
               FROM rel),
        x AS (SELECT url, relevance,
                     round(relevance / (SELECT mean FROM st), 6) AS x
              FROM rel)
        SELECT url, relevance,
               CASE WHEN x >= 4.0 THEN 8 WHEN x >= 2.0 THEN 7
                    WHEN x >= 1.2 THEN 6 ELSE 5 END AS priority
        FROM x
        WHERE x >= 1.2
    """

    # rank → priority bucketing: same PageRank CTE chain, then the
    # engine's mean-normalize (round(mean,9), round(x,6)) + fixed
    # thresholds; url_hash = sha256 of the stringified node id
    o["rank_priorities_p3"] = f"""
        WITH e AS (
          SELECT doc_id AS src,
                 (doc_id * 31 + 7 * (j + 1) + 1) % (SELECT count(*) FROM documents) AS dst
          FROM documents, range(0, 6) t(j)
          WHERE j < 3 + doc_id % 3),
        nodes AS (SELECT DISTINCT src AS node FROM e
                  UNION SELECT DISTINCT dst FROM e),
        nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
        deg AS (SELECT src, count(*)::DOUBLE AS outdeg FROM e GROUP BY src),
        r0 AS (SELECT node, 1.0::DOUBLE / (SELECT n FROM nn) AS rank FROM nodes),{",".join(_pr_iters)},
        rf AS (SELECT node, round(rank, 6) AS rank FROM r3),
        m AS (SELECT round(sum(rank) / count(*), 9) AS mean FROM rf),
        x AS (SELECT node, round(rank / (SELECT mean FROM m), 6) AS x FROM rf)
        SELECT sha256(node::VARCHAR) AS url_hash,
               CASE WHEN x >= 4.0 THEN 8 WHEN x >= 2.0 THEN 7 ELSE 6 END AS priority
        FROM x WHERE x >= 1.2
    """

    o["text_fingerprint"] = rf"""
        WITH w AS (SELECT doc_id, {_SQL_WORDS} AS w FROM documents),
        sh AS (SELECT doc_id, w, {_sql_shingles(5)} AS shingles FROM w)
        SELECT doc_id,
               list_min([md5(s) for s in shingles]) AS fingerprint,
               len(w) AS n_words
        FROM sh
    """

    # PII scrub: same injection, same RE2-safe patterns (global flag),
    # same email -> ip -> phone order
    _pii_email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    _pii_ip = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
    _pii_phone = r"\+?[0-9][0-9()\-\s]{6,}[0-9]"
    o["text_redact_pii"] = f"""
        WITH aug AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 3 = 0
                      THEN text || ' Contact user' || doc_id::VARCHAR
                           || '@mail.example.org from 10.1.' || (doc_id % 256)::VARCHAR
                           || '.9 or call +1 (555) 010-'
                           || (1000 + doc_id % 9000)::VARCHAR || ' now.'
                      ELSE text END AS text
          FROM documents)
        SELECT doc_id,
               regexp_replace(regexp_replace(regexp_replace(text,
                 '{_pii_email}', '<EMAIL>', 'g'),
                 '{_pii_ip}', '<IP>', 'g'),
                 '{_pii_phone}', '<PHONE>', 'g') AS redacted,
               len(regexp_extract_all(text, '({_pii_email})', 1)) AS n_email,
               len(regexp_extract_all(text, '({_pii_ip})', 1)) AS n_ip,
               len(regexp_extract_all(text, '({_pii_phone})', 1)) AS n_phone
        FROM aug
    """

    # Gopher/C4 shape gates: same whitespace tokenization as the
    # engine's tokens() (word_count_v6 pattern), raw doubles compared
    # against the thresholds, rounding only at the output
    o["text_gopher"] = r"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ws,
                 len(regexp_extract_all(text, '([.,;:!?])', 1)) AS punct
          FROM documents),
        m AS (
          SELECT doc_id, len(ws) AS n_words,
                 list_sum(list_transform(ws, x -> length(x)))::DOUBLE / len(ws)::DOUBLE AS mwl,
                 len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE / len(ws)::DOUBLE AS fa,
                 punct::DOUBLE / len(ws)::DOUBLE AS sr
          FROM t)
        SELECT doc_id, n_words,
               round(mwl, 6) AS mean_word_len,
               round(fa, 6) AS frac_alpha,
               round(sr, 6) AS symbol_ratio,
               (n_words >= 50 AND mwl BETWEEN 3.0 AND 10.0
                AND fa >= 0.8 AND sr <= 0.1) AS keep
        FROM m
    """

    # decontamination: benchmark = words 3..12 of every 50th doc;
    # verbatim 8-gram collision via the shared shingle fragment
    o["decontaminate"] = f"""
        WITH w0 AS (SELECT doc_id, {_SQL_WORDS} AS w FROM documents),
        dsh AS (SELECT doc_id, unnest(list_distinct(sh)) AS g
                FROM (SELECT doc_id, {_sql_shingles(8)} AS sh FROM w0)),
        bw AS (SELECT doc_id AS bench_id, list_slice(w, 3, 12) AS w
               FROM w0 WHERE doc_id % 50 = 10),
        bsh AS (SELECT bench_id, unnest(list_distinct(sh)) AS g
                FROM (SELECT bench_id, {_sql_shingles(8)} AS sh FROM bw))
        SELECT d.doc_id, b.bench_id, count(*) AS n_hits
        FROM dsh d JOIN bsh b USING (g)
        GROUP BY d.doc_id, b.bench_id
        HAVING count(*) >= 1
    """

    # the Bloom gate is lossless (no false negatives; FPs die in the
    # exact join), so the oracle IS decontaminate's SQL — equality
    # proves the pruned plan returns the identical contamination table
    o["decontaminate_bloom"] = o["decontaminate"]

    # script profile: RE2 \p{X} ≡ Java \p{IsX} on script classes;
    # dominance via the same struct-sort, share via exact integer //
    _scr = ("Latin", "Cyrillic", "Greek", "Arabic", "Hebrew",
            "Han", "Hiragana", "Katakana", "Hangul", "Devanagari")
    _scr_counts = ", ".join(
        f"length(regexp_replace(aug, '[^\\p{{{s}}}]', '', 'g'))::BIGINT"
        f" AS {s.lower()}" for s in _scr
    )
    _scr_total = " + ".join(s.lower() for s in _scr)
    _scr_structs = ", ".join(
        f"{{'_n': -{s.lower()}, '_s': '{s.lower()}'}}" for s in _scr
    )
    o["text_script_profile"] = f"""
        WITH a AS (
          SELECT doc_id,
                 text || repeat(
                   CASE WHEN doc_id % 4 = 0 THEN ' Привет мир культура слово'
                        WHEN doc_id % 4 = 1 THEN ' 你好世界 汉字很多'
                        WHEN doc_id % 4 = 2 THEN ' こんにちは ありがとう'
                        ELSE '' END,
                   CASE WHEN doc_id % 8 >= 4 THEN 30 ELSE 1 END) AS aug
          FROM documents),
        c AS (SELECT doc_id, {_scr_counts} FROM a),
        d AS (SELECT *, ({_scr_total})::BIGINT AS _tot,
                     list_sort([{_scr_structs}])[1] AS _top
              FROM c)
        SELECT doc_id, {", ".join(s.lower() for s in _scr)},
               CASE WHEN _tot = 0 THEN 'none' ELSE _top._s END AS dominant,
               CASE WHEN _tot = 0 THEN 0
                    ELSE ((-_top._n) * 10000) // _tot END AS dominant_bp
        FROM d
    """

    o["clean_text_e5"] = r"""
        SELECT doc_id, trim(regexp_replace(regexp_replace(
            regexp_replace(regexp_replace(regexp_replace(regexp_replace(
            regexp_replace(regexp_replace(regexp_replace(regexp_replace(
            regexp_replace(regexp_replace(
              text || ' <script>var x=1;</script> tail function  (a,b) {return a} document.addEventListener(''x'', y) QuerySelector(z) end',
              '(?i)<script[^>]*>.*?</script>', '', 'g'),
              '(?i)document\.addEventListener[^)]*\)', '', 'g'),
              '(?i)function[\t\n\f\r ]*\([^)]*\)[\t\n\f\r ]*\{[^}]*\}', '', 'g'),
              '(?i)\.replaceWith\([^)]*\)', '', 'g'),
              '(?i)\.cloneNode\([^)]*\)', '', 'g'),
              '(?i)template\.content', '', 'g'),
              '(?i)\.dataset\.[a-zA-Z]+', '', 'g'),
              '(?i)\.parentElement', '', 'g'),
              '(?i)getElementById\([^)]*\)', '', 'g'),
              '(?i)querySelector\([^)]*\)', '', 'g'),
              '[\t\n\f\r ]+', ' ', 'g'),
              '\n{3,}', E'\n\n', 'g')) AS cleaned
        FROM documents
    """

    o["generate_id_e11"] = """
        SELECT doc_id, sha256('https://example.com/doc/' || doc_id::VARCHAR) AS id_sha
        FROM documents
    """

    o["word_count_v6"] = r"""
        SELECT doc_id,
          len(list_filter(regexp_split_to_array(
            trim(regexp_replace('<p>' || text || '</p> <b>x</b>', '<[^>]*>', ' ', 'g')),
            '[\t\n\f\r ]+'), x -> x <> '')) AS word_count
        FROM documents
    """

    o["validate_length_v4"] = """
        SELECT source, count(*) AS n_valid FROM documents
        WHERE length(text) BETWEEN 100 AND 100000
        GROUP BY source
    """

    o["dedup_exact"] = f"""
        WITH aug AS ({_SQL_AUG_EXACT})
        SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS text_key,
               count(*) AS n_docs, min(doc_id) AS canonical_id
        FROM aug GROUP BY 1 HAVING count(*) > 1
    """

    o["dedup_exact_survivors"] = f"""
        WITH aug AS ({_SQL_AUG_EXACT}),
        k AS (SELECT doc_id, source,
                     md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS tk,
                     row_number() OVER (PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                                        ORDER BY doc_id) AS rn
              FROM aug)
        SELECT doc_id, source FROM k WHERE rn = 1
    """

    o["dedup_minhash_lsh"] = rf"""
        WITH aug AS ({_SQL_AUG_NEAR}),
        w AS (SELECT doc_id AS id, {_SQL_WORDS} AS w FROM aug),
        sh AS (SELECT id, {_sql_shingles(5)} AS shingles FROM w),
        sig AS (SELECT id,
                 [list_min([md5(h::VARCHAR || '#' || s) for s in shingles]) for h in range(0,16)] AS sig
                FROM sh),
        bands AS (SELECT id, band,
                   md5(array_to_string(list_slice(sig, band*4+1, band*4+4), '|')) AS key
                  FROM (SELECT id, sig, unnest(range(0,4)) AS band FROM sig)),
        cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
                 FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key AND a.id < b.id)
        SELECT c.id_a, c.id_b,
               (len(list_filter(range(1,17), i -> sa.sig[i] = sb.sig[i]))::DOUBLE / 16.0::DOUBLE) AS est_jaccard
        FROM cand c
        JOIN sig sa ON sa.id = c.id_a
        JOIN sig sb ON sb.id = c.id_b
        WHERE (len(list_filter(range(1,17), i -> sa.sig[i] = sb.sig[i]))::DOUBLE / 16.0::DOUBLE) >= 0.5::DOUBLE
    """

    # incremental index invariant: union of per-generation ingests ≡
    # one-shot LSH over the whole corpus — same SQL, verbatim
    o["dedup_minhash_incremental"] = o["dedup_minhash_lsh"]

    o["dedup_clusters"] = rf"""
        WITH RECURSIVE
        aug AS ({_SQL_AUG_NEAR}),
        w AS (SELECT doc_id AS id, {_SQL_WORDS} AS w FROM aug),
        sh AS (SELECT id, {_sql_shingles(5)} AS shingles FROM w),
        sig AS (SELECT id,
                 [list_min([md5(h::VARCHAR || '#' || s) for s in shingles]) for h in range(0,16)] AS sig
                FROM sh),
        bands AS (SELECT id, band,
                   md5(array_to_string(list_slice(sig, band*4+1, band*4+4), '|')) AS key
                  FROM (SELECT id, sig, unnest(range(0,4)) AS band FROM sig)),
        cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
                 FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key AND a.id < b.id),
        pairs AS (SELECT c.id_a, c.id_b
                  FROM cand c JOIN sig sa ON sa.id = c.id_a JOIN sig sb ON sb.id = c.id_b
                  WHERE (len(list_filter(range(1,17), i -> sa.sig[i] = sb.sig[i]))::DOUBLE / 16.0::DOUBLE) >= 0.5::DOUBLE),
        edges AS (SELECT id_a AS u, id_b AS v FROM pairs
                  UNION SELECT id_b AS u, id_a AS v FROM pairs),
        cc AS (SELECT u, u AS label FROM (SELECT DISTINCT u FROM edges)
               UNION
               SELECT e.u, c.label FROM edges e JOIN cc c ON c.u = e.v),
        lab AS (SELECT u AS doc_id, min(label) AS cluster_id FROM cc GROUP BY u),
        sz AS (SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY 1)
        SELECT l.doc_id, l.cluster_id, s.cluster_size,
               l.doc_id = l.cluster_id AS is_canonical
        FROM lab l JOIN sz s USING (cluster_id)
    """

    # cluster-safe split: dedup_clusters' recursive components give
    # the rep; docs without pair evidence represent themselves; the
    # banding is train_split's md5 contract keyed on the REP
    o["train_split_cluster_safe"] = rf"""
        WITH RECURSIVE
        aug AS ({_SQL_AUG_NEAR}),
        w AS (SELECT doc_id AS id, {_SQL_WORDS} AS w FROM aug),
        sh AS (SELECT id, {_sql_shingles(5)} AS shingles FROM w),
        sig AS (SELECT id,
                 [list_min([md5(h::VARCHAR || '#' || s) for s in shingles]) for h in range(0,16)] AS sig
                FROM sh),
        bands AS (SELECT id, band,
                   md5(array_to_string(list_slice(sig, band*4+1, band*4+4), '|')) AS key
                  FROM (SELECT id, sig, unnest(range(0,4)) AS band FROM sig)),
        cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
                 FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key AND a.id < b.id),
        prs AS (SELECT c.id_a, c.id_b
                FROM cand c JOIN sig sa ON sa.id = c.id_a JOIN sig sb ON sb.id = c.id_b
                WHERE (len(list_filter(range(1,17), i -> sa.sig[i] = sb.sig[i]))::DOUBLE / 16.0::DOUBLE) >= 0.5::DOUBLE),
        edges AS (SELECT id_a AS u, id_b AS v FROM prs
                  UNION SELECT id_b AS u, id_a AS v FROM prs),
        cc AS (SELECT u, u AS label FROM (SELECT DISTINCT u FROM edges)
               UNION
               SELECT e.u, c.label FROM edges e JOIN cc c ON c.u = e.v),
        lab AS (SELECT u AS doc_id, min(label) AS cluster_id FROM cc GROUP BY u),
        rep AS (SELECT a.doc_id, coalesce(l.cluster_id, a.doc_id) AS rep
                FROM aug a LEFT JOIN lab l ON l.doc_id = a.doc_id),
        uu AS (SELECT doc_id, rep,
                 ('0x' || substr(md5(rep::VARCHAR || ':split'), 1, 8))::UBIGINT::DOUBLE
                   / 4294967296.0 AS u
               FROM rep)
        SELECT doc_id, rep,
               CASE WHEN u < 0.75 THEN 'train'
                    WHEN u < 0.875 THEN 'val'
                    ELSE 'test' END AS split
        FROM uu
    """

    o["sample_stratified"] = """
        SELECT doc_id, lang, source FROM documents
        WHERE ('0x' || substr(md5(doc_id::VARCHAR || ':' || 'gocrawl'), 1, 8))::UBIGINT::DOUBLE
                / 4294967296.0
              < CASE lang WHEN 'en' THEN 0.25::DOUBLE WHEN 'zh' THEN 0.5::DOUBLE ELSE 1.0::DOUBLE END
    """

    o["dedup_ngram_jaccard"] = rf"""
        WITH aug AS ({_SQL_AUG_NEAR}),
        w AS (SELECT doc_id AS id, {_SQL_WORDS} AS w FROM aug),
        s AS (SELECT id, list_distinct({_sql_shingles(3)}) AS sh FROM w),
        inv AS (SELECT id, unnest(sh) AS g FROM s),
        cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
                 FROM inv a JOIN inv b ON a.g = b.g AND a.id < b.id)
        SELECT c.id_a, c.id_b,
               (len(list_intersect(sa.sh, sb.sh))::DOUBLE
                / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))::DOUBLE) AS jaccard
        FROM cand c JOIN s sa ON sa.id = c.id_a JOIN s sb ON sb.id = c.id_b
        WHERE (len(list_intersect(sa.sh, sb.sh))::DOUBLE
                / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))::DOUBLE) >= 0.3::DOUBLE
    """

    # dedup_prefix_jaccard: prefix filtering is LOSSLESS candidate
    # pruning of the same exact-Jaccard join, so its oracle IS the full
    # inverted-index SQL — equality against it proves no pair was lost
    o["dedup_prefix_jaccard"] = o["dedup_ngram_jaccard"]

    # containment: half-prefix aug (same (len+1)//2 word grid as the
    # Spark query — raw \s+ split, single-space join), then both
    # directions of the shared-gram pair set scored |A∩B|/|A|
    o["dedup_containment"] = rf"""
        WITH pre AS (
          SELECT doc_id + 2000000 AS doc_id,
                 array_to_string(
                   list_slice(regexp_split_to_array(text, '\s+'), 1,
                              (len(regexp_split_to_array(text, '\s+')) + 1) // 2),
                   ' ') AS text,
                 lang, source, n_chars
          FROM documents WHERE doc_id % 20 = 0),
        aug AS (SELECT * FROM documents UNION ALL SELECT * FROM pre),
        w AS (SELECT doc_id AS id, {_SQL_WORDS} AS w FROM aug),
        s AS MATERIALIZED (SELECT id, list_distinct({_sql_shingles(3)}) AS sh FROM w),
        inv AS (SELECT id, unnest(sh) AS g FROM s),
        cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
                 FROM inv a JOIN inv b ON a.g = b.g AND a.id < b.id),
        pairs AS MATERIALIZED (
          SELECT c.id_a, c.id_b,
                 len(list_intersect(sa.sh, sb.sh))::BIGINT AS inter,
                 len(sa.sh)::BIGINT AS n_a, len(sb.sh)::BIGINT AS n_b
          FROM cand c JOIN s sa ON sa.id = c.id_a JOIN s sb ON sb.id = c.id_b),
        dirs AS (
          SELECT id_a AS contained_id, id_b AS container_id,
                 inter::DOUBLE / n_a::DOUBLE AS containment FROM pairs
          UNION ALL
          SELECT id_b AS contained_id, id_a AS container_id,
                 inter::DOUBLE / n_b::DOUBLE AS containment FROM pairs)
        SELECT contained_id, container_id, containment
        FROM dirs WHERE containment >= 0.7::DOUBLE
    """

    _dot = "list_sum(list_transform(range(1, 65), i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))"
    _norm_a = "sqrt(list_sum(list_transform(range(1, 65), i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE)))"
    _norm_b = "sqrt(list_sum(list_transform(range(1, 65), i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)))"
    _cos = f"round({_dot} / ({_norm_a} * {_norm_b}), 6)"

    o["ann_brute_cosine"] = f"""
        WITH scored AS (
          SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {_cos} AS score
          FROM embeddings a JOIN embeddings b ON a.vec_id < 5 AND b.vec_id <> a.vec_id),
        r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
              FROM scored)
        SELECT query_id, neighbor_id, score, rank FROM r WHERE rank <= 10
    """

    # scalar quantization: per-dim (min,max) over the corpus, the same
    # pinned float grid ((x-mn)*255/(mx-mn)+.5 on DOUBLE-cast floats,
    # floor, clamp) — codes are integers so the encode oracle is exact;
    # the topk oracle reconstructs mn + c*(mx-mn)/255 and reuses the
    # in-order cosine fold
    _SQ_CODES = r"""
        st AS MATERIALIZED (
          SELECT pos, min(x) AS vmin, max(x) AS vmax
          FROM (SELECT unnest(embedding) AS x,
                       generate_subscripts(embedding, 1) AS pos
                FROM embeddings)
          GROUP BY pos),
        sl AS MATERIALIZED (
          SELECT list(vmin ORDER BY pos) AS mn, list(vmax ORDER BY pos) AS mx
          FROM st),
        codes AS MATERIALIZED (
          SELECT vec_id,
                 list_transform(range(1, 65), i ->
                   CASE WHEN mx[i] = mn[i] THEN 0
                        ELSE least(255, greatest(0,
                          floor((embedding[i]::DOUBLE - mn[i]::DOUBLE) * 255.0
                                / (mx[i]::DOUBLE - mn[i]::DOUBLE) + 0.5)))::INT
                   END) AS codes
          FROM embeddings, sl)
    """

    o["ann_sq_codes"] = f"""
        WITH {_SQ_CODES}
        SELECT vec_id,
               len(codes) AS n_codes,
               array_to_string(list_transform(list_slice(codes, 1, 12),
                                              x -> x::VARCHAR), ',') AS head_codes,
               md5(array_to_string(list_transform(codes, x -> x::VARCHAR), ',')) AS codes_md5
        FROM codes
    """

    o["ann_sq"] = f"""
        WITH {_SQ_CODES},
        recon AS MATERIALIZED (
          SELECT vec_id,
                 list_transform(range(1, 65), i ->
                   mn[i]::DOUBLE + codes[i]::DOUBLE
                     * (mx[i]::DOUBLE - mn[i]::DOUBLE) / 255.0) AS rv
          FROM codes, sl),
        scored AS (
          SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                 round(
                   list_sum(list_transform(range(1, 65),
                       i -> a.embedding[i]::DOUBLE * b.rv[i]))
                   / (sqrt(list_sum(list_transform(range(1, 65),
                          i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE)))
                      * sqrt(list_sum(list_transform(range(1, 65),
                          i -> b.rv[i] * b.rv[i])))), 6) AS score
          FROM embeddings a JOIN recon b
            ON a.vec_id < 5 AND b.vec_id <> a.vec_id),
        r AS (SELECT *, row_number() OVER (
                  PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
              FROM scored)
        SELECT query_id, neighbor_id, score, rank FROM r WHERE rank <= 10
    """

    o["ann_ivf"] = f"""
        WITH cents AS (SELECT vec_id AS centroid_id, embedding FROM embeddings WHERE vec_id < 16),
        asgn AS (
          SELECT vec_id, embedding, centroid_id FROM (
            SELECT a.vec_id, a.embedding, b.centroid_id,
                   row_number() OVER (PARTITION BY a.vec_id ORDER BY {_cos.replace("b.embedding", "b.embedding")} DESC, b.centroid_id) AS rn
            FROM embeddings a JOIN (SELECT centroid_id, embedding FROM cents) b ON true)
          WHERE rn = 1),
        probes AS (
          SELECT query_id, qv, centroid_id FROM (
            SELECT a.vec_id AS query_id, a.embedding AS qv, b.centroid_id,
                   row_number() OVER (PARTITION BY a.vec_id ORDER BY {_cos} DESC, b.centroid_id) AS rn
            FROM embeddings a JOIN (SELECT centroid_id, embedding FROM cents) b ON a.vec_id < 5)
          WHERE rn <= 4),
        scored AS (
          SELECT p.query_id, v.vec_id AS neighbor_id,
                 round(list_sum(list_transform(range(1, 65), i -> p.qv[i]::DOUBLE * v.embedding[i]::DOUBLE))
                   / (sqrt(list_sum(list_transform(range(1, 65), i -> p.qv[i]::DOUBLE * p.qv[i]::DOUBLE)))
                    * sqrt(list_sum(list_transform(range(1, 65), i -> v.embedding[i]::DOUBLE * v.embedding[i]::DOUBLE)))), 6) AS score
          FROM probes p JOIN asgn v ON v.centroid_id = p.centroid_id AND v.vec_id <> p.query_id),
        r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
              FROM scored)
        SELECT query_id, neighbor_id, score, rank FROM r WHERE rank <= 10
    """

    # ann_recall: the brute CTE is the ann_brute_cosine pipeline, the
    # ivf CTE is the ann_ivf pipeline; both MATERIALIZED (each is
    # referenced twice in the count rollup — DuckDB inlines CTEs)
    o["ann_recall"] = f"""
        WITH brute AS MATERIALIZED (
          SELECT query_id, neighbor_id FROM (
            SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                   row_number() OVER (PARTITION BY a.vec_id ORDER BY {_cos} DESC, b.vec_id) AS rank
            FROM embeddings a JOIN embeddings b ON a.vec_id < 5 AND b.vec_id <> a.vec_id)
          WHERE rank <= 10),
        cents AS (SELECT vec_id AS centroid_id, embedding FROM embeddings WHERE vec_id < 16),
        asgn AS (
          SELECT vec_id, embedding, centroid_id FROM (
            SELECT a.vec_id, a.embedding, b.centroid_id,
                   row_number() OVER (PARTITION BY a.vec_id ORDER BY {_cos} DESC, b.centroid_id) AS rn
            FROM embeddings a JOIN (SELECT centroid_id, embedding FROM cents) b ON true)
          WHERE rn = 1),
        probes AS (
          SELECT query_id, qv, centroid_id FROM (
            SELECT a.vec_id AS query_id, a.embedding AS qv, b.centroid_id,
                   row_number() OVER (PARTITION BY a.vec_id ORDER BY {_cos} DESC, b.centroid_id) AS rn
            FROM embeddings a JOIN (SELECT centroid_id, embedding FROM cents) b ON a.vec_id < 5)
          WHERE rn <= 4),
        scored AS (
          SELECT p.query_id, v.vec_id AS neighbor_id,
                 round(list_sum(list_transform(range(1, 65), i -> p.qv[i]::DOUBLE * v.embedding[i]::DOUBLE))
                   / (sqrt(list_sum(list_transform(range(1, 65), i -> p.qv[i]::DOUBLE * p.qv[i]::DOUBLE)))
                    * sqrt(list_sum(list_transform(range(1, 65), i -> v.embedding[i]::DOUBLE * v.embedding[i]::DOUBLE)))), 6) AS score
          FROM probes p JOIN asgn v ON v.centroid_id = p.centroid_id AND v.vec_id <> p.query_id),
        ivf AS MATERIALIZED (
          SELECT query_id, neighbor_id FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
            FROM scored)
          WHERE rank <= 10)
        SELECT n_brute, n_ivf, n_common,
               round(n_common::DOUBLE / n_brute, 4) AS recall
        FROM (SELECT count(*) AS n_brute FROM brute),
             (SELECT count(*) AS n_ivf FROM ivf),
             (SELECT count(*) AS n_common
              FROM brute JOIN ivf USING (query_id, neighbor_id))
    """

    # ann_ivf_kmeans: two spherical-Lloyd sweeps unrolled (seed cells →
    # assign → rounded per-position means, empty cell keeps previous →
    # re-assign → means), then the identical probe/rank as ann_ivf
    def _cosk(a: str, b: str) -> str:
        return (
            f"round(list_sum(list_transform(range(1, 65), i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))"
            f" / (sqrt(list_sum(list_transform(range(1, 65), i -> {a}[i]::DOUBLE * {a}[i]::DOUBLE)))"
            f" * sqrt(list_sum(list_transform(range(1, 65), i -> {b}[i]::DOUBLE * {b}[i]::DOUBLE)))), 6)"
        )

    def _lloyd_sweep(prev: str, a: str, m: str, nxt: str) -> str:
        return f"""
        {a} AS (
          SELECT vec_id, embedding, centroid_id FROM (
            SELECT e.vec_id, e.embedding, c.centroid_id,
                   row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY {_cosk('e.embedding', 'c.cv')} DESC, c.centroid_id) AS rn
            FROM embeddings e JOIN {prev} c ON true)
          WHERE rn = 1),
        {m} AS (
          SELECT centroid_id, list(m ORDER BY pos) AS cv FROM (
            SELECT centroid_id, pos, round(avg(v), 6) AS m FROM (
              SELECT centroid_id, unnest(embedding) AS v,
                     unnest(range(1, 65)) AS pos FROM {a})
            GROUP BY centroid_id, pos)
          GROUP BY centroid_id),
        {nxt} AS (
          SELECT p.centroid_id,
                 coalesce(mm.cv, CAST(p.cv AS DOUBLE[])) AS cv
          FROM {prev} p LEFT JOIN {m} mm USING (centroid_id))"""

    o["ann_ivf_kmeans"] = f"""
        WITH c0 AS (SELECT vec_id AS centroid_id, embedding AS cv
                    FROM embeddings WHERE vec_id < 16),
        {_lloyd_sweep('c0', 'a1', 'm1', 'c1')},
        {_lloyd_sweep('c1', 'a2', 'm2', 'c2')},
        asgn AS (
          SELECT vec_id, embedding, centroid_id FROM (
            SELECT e.vec_id, e.embedding, c.centroid_id,
                   row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY {_cosk('e.embedding', 'c.cv')} DESC, c.centroid_id) AS rn
            FROM embeddings e JOIN c2 c ON true)
          WHERE rn = 1),
        probes AS (
          SELECT query_id, qv, centroid_id FROM (
            SELECT e.vec_id AS query_id, e.embedding AS qv, c.centroid_id,
                   row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY {_cosk('e.embedding', 'c.cv')} DESC, c.centroid_id) AS rn
            FROM embeddings e JOIN c2 c ON e.vec_id < 5)
          WHERE rn <= 4),
        scored AS (
          SELECT p.query_id, v.vec_id AS neighbor_id,
                 {_cosk('p.qv', 'v.embedding')} AS score
          FROM probes p JOIN asgn v
            ON v.centroid_id = p.centroid_id AND v.vec_id <> p.query_id),
        r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY score DESC, neighbor_id) AS rank FROM scored)
        SELECT query_id, neighbor_id, score, rank FROM r WHERE rank <= 10
    """

    # PQ/ADC: same deterministic codebooks (rows < 8 sliced into 4
    # subspaces of 16 dims), same per-subspace rounded L2² and
    # (d, c)-ordered argmin, same table-lookup sum
    o["ann_pq"] = """
        WITH subd AS (
          SELECT a.vec_id, s.s, b.vec_id AS c,
                 round(list_sum(list_transform(range(1, 17),
                   i -> (a.embedding[s.s*16 + i]::DOUBLE - b.embedding[s.s*16 + i]::DOUBLE)
                      * (a.embedding[s.s*16 + i]::DOUBLE - b.embedding[s.s*16 + i]::DOUBLE))), 6) AS d
          FROM embeddings a,
               (SELECT unnest([0, 1, 2, 3]) AS s) s,
               (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 8) b),
        enc AS (
          SELECT vec_id, s, c FROM (
            SELECT vec_id, s, c, row_number() OVER (PARTITION BY vec_id, s ORDER BY d, c) AS rn
            FROM subd) WHERE rn = 1),
        qd AS (SELECT vec_id AS query_id, s, c, d FROM subd WHERE vec_id < 5),
        scored AS (
          SELECT q.query_id, e.vec_id AS neighbor_id, round(sum(q.d), 6) AS score
          FROM enc e JOIN qd q ON q.s = e.s AND q.c = e.c AND e.vec_id <> q.query_id
          GROUP BY q.query_id, e.vec_id),
        r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score, neighbor_id) AS rank
              FROM scored)
        SELECT query_id, neighbor_id, score, rank FROM r WHERE rank <= 10
    """

    # IVF-PQ: ann_ivf's cell assignment/probes composed with ann_pq's
    # codebook encoding and ADC table-lookup sum
    o["ann_ivfpq"] = f"""
        WITH cents AS (SELECT vec_id AS centroid_id, embedding FROM embeddings WHERE vec_id < 16),
        asgn AS (
          SELECT vec_id, centroid_id FROM (
            SELECT a.vec_id, b.centroid_id,
                   row_number() OVER (PARTITION BY a.vec_id ORDER BY {_cos} DESC, b.centroid_id) AS rn
            FROM embeddings a JOIN (SELECT centroid_id, embedding FROM cents) b ON true)
          WHERE rn = 1),
        probes AS (
          SELECT query_id, centroid_id FROM (
            SELECT a.vec_id AS query_id, b.centroid_id,
                   row_number() OVER (PARTITION BY a.vec_id ORDER BY {_cos} DESC, b.centroid_id) AS rn
            FROM embeddings a JOIN (SELECT centroid_id, embedding FROM cents) b ON a.vec_id < 5)
          WHERE rn <= 4),
        subd AS (
          SELECT a.vec_id, s.s, b.vec_id AS c,
                 round(list_sum(list_transform(range(1, 17),
                   i -> (a.embedding[s.s*16 + i]::DOUBLE - b.embedding[s.s*16 + i]::DOUBLE)
                      * (a.embedding[s.s*16 + i]::DOUBLE - b.embedding[s.s*16 + i]::DOUBLE))), 6) AS d
          FROM embeddings a,
               (SELECT unnest([0, 1, 2, 3]) AS s) s,
               (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 8) b),
        enc AS (
          SELECT vec_id, s, c FROM (
            SELECT vec_id, s, c, row_number() OVER (PARTITION BY vec_id, s ORDER BY d, c) AS rn
            FROM subd) WHERE rn = 1),
        qd AS (SELECT vec_id AS query_id, s, c, d FROM subd WHERE vec_id < 5),
        scored AS (
          SELECT p.query_id, e.vec_id AS neighbor_id, round(sum(q.d), 6) AS score
          FROM probes p
          JOIN asgn v ON v.centroid_id = p.centroid_id AND v.vec_id <> p.query_id
          JOIN enc e ON e.vec_id = v.vec_id
          JOIN qd q ON q.query_id = p.query_id AND q.s = e.s AND q.c = e.c
          GROUP BY p.query_id, e.vec_id),
        r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score, neighbor_id) AS rank
              FROM scored)
        SELECT query_id, neighbor_id, score, rank FROM r WHERE rank <= 10
    """

    o["emb_dup_pairs_exact"] = f"""
        SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_cos} AS score
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE {_cos} >= 0.4::DOUBLE
    """

    # --- sign-LSH with the md5-Rademacher projection, rebuilt in SQL ---
    # plane j, dim i: ±1 from the low bit of md5('{j}#{i}') — mirrors
    # similarity.rademacher_planes exactly.
    def _sql_plane_dot(j: int, vec: str = "embedding") -> str:
        return (
            f"list_sum(list_transform(range(1, 65), i -> {vec}[i]::DOUBLE * "
            f"(CASE WHEN ('0x' || substr(md5('{j}#' || (i-1)::VARCHAR), 1, 1))::INT % 2 = 1 "
            f"THEN 1.0::DOUBLE ELSE -1.0::DOUBLE END)))"
        )

    def _sql_band_key(planes: list[int], vec: str = "embedding") -> str:
        return "(" + " + ".join(
            f"CASE WHEN {_sql_plane_dot(j, vec)} > 0 THEN {1 << jj} ELSE 0 END"
            for jj, j in enumerate(planes)
        ) + ")::BIGINT"

    _band_rows = "\n        UNION ALL ".join(
        f"SELECT vec_id, {b} AS band, {_sql_band_key([4 * b + jj for jj in range(4)])} AS key FROM embeddings"
        for b in range(4)
    )
    o["emb_dup_pairs"] = f"""
        WITH keys AS (
        {_band_rows}
        ),
        cand AS (
          SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
          FROM keys a JOIN keys b ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id)
        SELECT c.id_a, c.id_b, {_cos} AS score
        FROM cand c
        JOIN embeddings a ON a.vec_id = c.id_a
        JOIN embeddings b ON b.vec_id = c.id_b
        WHERE {_cos} >= 0.4::DOUBLE
    """

    o["emb_dup_recall"] = f"""
        WITH keys AS (
        {_band_rows}
        ),
        cand AS (
          SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
          FROM keys a JOIN keys b ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id),
        blocked AS (
          SELECT c.id_a, c.id_b FROM cand c
          JOIN embeddings a ON a.vec_id = c.id_a
          JOIN embeddings b ON b.vec_id = c.id_b
          WHERE {_cos} >= 0.4::DOUBLE),
        exact AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b
          FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
          WHERE {_cos} >= 0.4::DOUBLE),
        common AS (
          SELECT count(*) AS c FROM exact e
          JOIN blocked bl ON bl.id_a = e.id_a AND bl.id_b = e.id_b)
        SELECT (SELECT count(*) FROM exact)::BIGINT AS n_exact,
               (SELECT count(*) FROM blocked)::BIGINT AS n_blocked,
               (SELECT c FROM common)::BIGINT AS n_common,
               round((SELECT c FROM common)::DOUBLE
                     / (SELECT count(*) FROM exact)::DOUBLE, 4) AS recall
    """

    # semdedup: same deterministic IVF assignment as ann_ivf, then the
    # greedy within-cell keep rule (prune x when a lower-centroid-sim
    # neighbor y in the same cell has cos(x,y) >= t)
    def _cos2(a: str, b: str) -> str:
        return (
            f"round(list_sum(list_transform(range(1, 65), i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))"
            f" / (sqrt(list_sum(list_transform(range(1, 65), i -> {a}[i]::DOUBLE * {a}[i]::DOUBLE)))"
            f" * sqrt(list_sum(list_transform(range(1, 65), i -> {b}[i]::DOUBLE * {b}[i]::DOUBLE)))), 6)"
        )

    # PMI collocations: exact HUGEINT products, one double division,
    # one ln — identical op order to the Spark DECIMAL(38,0) math
    o["text_collocations"] = f"""
        WITH w AS (SELECT {_SQL_WORDS} AS w FROM documents),
        uni AS (SELECT unnest(w) AS w1 FROM w),
        u AS (SELECT w1, count(*)::BIGINT AS c1 FROM uni GROUP BY w1),
        bg AS (SELECT unnest({_sql_shingles(2)}) AS bg
               FROM w WHERE len(w) >= 2),
        b AS (SELECT string_split(bg, ' ')[1] AS w1,
                     string_split(bg, ' ')[2] AS w2,
                     count(*)::BIGINT AS c2
              FROM bg GROUP BY bg),
        n1 AS (SELECT sum(c1)::BIGINT AS n1 FROM u),
        n2 AS (SELECT sum(c2)::BIGINT AS n2 FROM b)
        SELECT b.w1, b.w2, b.c2,
               round(ln((b.c2::HUGEINT * n1.n1::HUGEINT * n1.n1::HUGEINT)::DOUBLE
                        / (n2.n2::HUGEINT * ux.c1::HUGEINT * uy.c1::HUGEINT)::DOUBLE), 6) AS pmi
        FROM b
        JOIN u ux ON ux.w1 = b.w1
        JOIN u uy ON uy.w1 = b.w2
        CROSS JOIN n1 CROSS JOIN n2
        WHERE b.c2 >= 5
        ORDER BY pmi DESC, b.w1, b.w2
        LIMIT 25
    """

    # prototype selection: the same seed-centroid assignment as
    # ann_ivf/semdedup; within-cell rank then global round-robin cut
    o["emb_prototype_select"] = f"""
        WITH cents AS (SELECT vec_id AS centroid_id, embedding AS cv FROM embeddings WHERE vec_id < 16),
        asgn AS (
          SELECT vec_id, centroid_id, cs AS centroid_sim FROM (
            SELECT a.vec_id, b.centroid_id,
                   {_cos2('a.embedding', 'b.cv')} AS cs,
                   row_number() OVER (PARTITION BY a.vec_id
                       ORDER BY {_cos2('a.embedding', 'b.cv')} DESC, b.centroid_id) AS rn
            FROM embeddings a JOIN cents b ON true)
          WHERE rn = 1),
        rk AS (SELECT vec_id, centroid_id, centroid_sim,
                      row_number() OVER (PARTITION BY centroid_id
                          ORDER BY centroid_sim ASC, vec_id) AS r
               FROM asgn)
        SELECT vec_id, centroid_id, centroid_sim,
               row_number() OVER (ORDER BY r, centroid_sim ASC, vec_id)
                 AS pick_rank
        FROM rk
        QUALIFY pick_rank <= 120
    """

    o["semdedup"] = f"""
        WITH cents AS (SELECT vec_id AS centroid_id, embedding AS cv FROM embeddings WHERE vec_id < 16),
        asgn AS (
          SELECT vec_id, embedding, centroid_id, cs AS centroid_sim FROM (
            SELECT a.vec_id, a.embedding, b.centroid_id,
                   {_cos2('a.embedding', 'b.cv')} AS cs,
                   row_number() OVER (PARTITION BY a.vec_id
                       ORDER BY {_cos2('a.embedding', 'b.cv')} DESC, b.centroid_id) AS rn
            FROM embeddings a JOIN cents b ON true)
          WHERE rn = 1),
        dom AS (
          SELECT DISTINCT x.vec_id
          FROM asgn x JOIN asgn y ON x.centroid_id = y.centroid_id
           AND (y.centroid_sim < x.centroid_sim
                OR (y.centroid_sim = x.centroid_sim AND y.vec_id < x.vec_id))
          WHERE {_cos2('x.embedding', 'y.embedding')} >= 0.4::DOUBLE)
        SELECT a.vec_id, a.centroid_id, a.centroid_sim,
               (d.vec_id IS NULL) AS keep
        FROM asgn a LEFT JOIN dom d ON d.vec_id = a.vec_id
    """

    # dsir_select: hashed unigram+bigram buckets (shard_col md5 contract),
    # add-1-smoothed log ratios vs the lang='en' target, top-100
    o["dsir_select"] = rf"""
        WITH w AS (SELECT doc_id, lang, {_SQL_WORDS} AS w FROM documents),
        f AS (SELECT doc_id, lang,
                     unnest(w || [w[i+1] || ' ' || w[i+2] for i in range(0, len(w)-1)]) AS f
              FROM w),
        b AS (SELECT doc_id, lang,
                     (('0x' || substr(md5(f), 1, 8))::UBIGINT % 1024)::INT AS bucket
              FROM f),
        raw AS (SELECT bucket, count(*) AS rc FROM b GROUP BY bucket),
        tgt AS (SELECT bucket, count(*) AS tc FROM b WHERE lang = 'en' GROUP BY bucket),
        tot AS (SELECT (SELECT count(*) FROM b) AS rt,
                       (SELECT count(*) FROM b WHERE lang = 'en') AS tt),
        ratios AS (
          SELECT raw.bucket,
                 round(ln(coalesce(tgt.tc, 0) + 1) - ln(tot.tt + 1024)
                     - ln(raw.rc + 1) + ln(tot.rt + 1024), 6) AS lr
          FROM raw LEFT JOIN tgt USING (bucket) CROSS JOIN tot),
        wgt AS (SELECT b.doc_id, round(sum(r.lr), 4) AS weight
                FROM b JOIN ratios r USING (bucket) GROUP BY b.doc_id),
        rk AS (SELECT doc_id, weight,
                      row_number() OVER (ORDER BY weight DESC, doc_id) AS rank
               FROM wgt)
        SELECT doc_id, weight, rank FROM rk WHERE rank <= 100
    """

    # text_tfidf_keywords: same norm_words stream, same stopword list,
    # tf·ln(N/df) with the same rounding and tie-break
    _stoplist = ", ".join(f"'{s}'" for s in sorted(textstats.STOPWORDS))
    o["text_tfidf_keywords"] = rf"""
        WITH w AS (SELECT doc_id, unnest({_SQL_WORDS}) AS term FROM documents),
        f AS (SELECT doc_id, term FROM w
              WHERE length(term) >= 3 AND term NOT IN ({_stoplist})),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM f GROUP BY doc_id, term),
        dft AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
        n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
        s AS (SELECT tf.doc_id, tf.term,
                     round(tf.tf * ln(n.n::DOUBLE / dft.df), 6) AS tfidf
              FROM tf JOIN dft USING (term) CROSS JOIN n),
        r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                  ORDER BY tfidf DESC, term) AS rank FROM s)
        SELECT doc_id, term, tfidf, rank FROM r WHERE rank <= 5
    """

    # text_winnow: same shingle hashes, same rightmost-min window rule
    o["text_winnow"] = rf"""
        WITH w AS (SELECT doc_id, {_SQL_WORDS} AS w FROM documents),
        sh AS (SELECT doc_id, w, {_sql_shingles(5)} AS shingles FROM w),
        h AS (SELECT doc_id, [md5(s) for s in shingles] AS h FROM sh),
        sel AS (
          SELECT doc_id,
                 [{{'pos': list_max([j for j in range(i, i + least(4, len(h)))
                                     if h[j + 1] = list_min(list_slice(h, i + 1, i + least(4, len(h))))]),
                    'hash': list_min(list_slice(h, i + 1, i + least(4, len(h))))}}
                  for i in range(0, len(h) - least(4, len(h)) + 1)] AS fps
          FROM h),
        e AS (SELECT doc_id, unnest(fps) AS fp FROM sel)
        SELECT DISTINCT doc_id, fp.pos::INT AS pos, fp.hash AS hash FROM e
    """

    # dedup_winnow_pairs: the text_winnow pipeline over the near-dup
    # injection, then the inverted-index pair join
    o["dedup_winnow_pairs"] = rf"""
        WITH aug AS ({_SQL_AUG_NEAR}),
        w AS (SELECT doc_id, {_SQL_WORDS} AS w FROM aug),
        sh AS (SELECT doc_id, w, {_sql_shingles(5)} AS shingles FROM w),
        h AS (SELECT doc_id, [md5(s) for s in shingles] AS h FROM sh),
        sel AS (
          SELECT doc_id,
                 [{{'pos': list_max([j for j in range(i, i + least(4, len(h)))
                                     if h[j + 1] = list_min(list_slice(h, i + 1, i + least(4, len(h))))]),
                    'hash': list_min(list_slice(h, i + 1, i + least(4, len(h))))}}
                  for i in range(0, len(h) - least(4, len(h)) + 1)] AS fps
          FROM h),
        e AS (SELECT DISTINCT doc_id, (unnest(fps)).hash AS hash FROM sel),
        p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
              FROM e a JOIN e b ON a.hash = b.hash AND a.doc_id < b.doc_id)
        SELECT id_a, id_b, count(*) AS n_shared
        FROM p GROUP BY id_a, id_b HAVING count(*) >= 5
    """

    # crawl_change_rates: same synthesized history, same lag-based
    # change counting, same Poisson-MLE continuity-corrected estimator
    o["crawl_change_rates"] = r"""
        WITH hist AS (
          SELECT 'https://h.example.com/doc/' || doc_id::VARCHAR AS url,
                 g AS generation,
                 CASE WHEN doc_id % 3 = 0 THEN g
                      WHEN doc_id % 3 = 1 AND g >= 2 THEN 1
                      ELSE 0 END AS page_ts
          FROM documents, unnest(range(0, 4)) AS t(g)),
        obs AS (
          SELECT url, page_ts,
                 lag(page_ts) OVER (PARTITION BY url ORDER BY generation) AS prev
          FROM hist),
        agg AS (
          SELECT url, count(*) AS n_obs,
                 sum(CASE WHEN prev IS NOT NULL AND page_ts <> prev THEN 1 ELSE 0 END)::BIGINT AS n_changes
          FROM obs GROUP BY url)
        SELECT url, n_obs, n_changes,
               round(-ln(((n_obs - 1)::DOUBLE - n_changes::DOUBLE + 0.5)
                         / ((n_obs - 1)::DOUBLE + 0.5)), 6) + 0.0 AS change_rate
        FROM agg WHERE n_obs >= 2
    """

    # crawl_trap_filter: same synthesized URL mix, same RE2 trap regexes
    o["crawl_trap_filter"] = r"""
        WITH u AS (
          SELECT doc_id,
                 'https://h' || (doc_id % 7)::VARCHAR || '.example.com' ||
                 CASE doc_id % 5
                   WHEN 0 THEN '/a/a/a/p/' || doc_id::VARCHAR
                   WHEN 1 THEN '/p1/p2/p3/p4/p5/p6/p7/p8/p9/pa/pb/pc/pd/x' || doc_id::VARCHAR
                   WHEN 2 THEN '/doc?a=1&b=2&c=3&d=4&e=5&f=6&g=7&h=8&i=' || doc_id::VARCHAR
                   WHEN 3 THEN '/doc/' || doc_id::VARCHAR || '?phpsessid=s' || doc_id::VARCHAR
                   ELSE '/doc/' || doc_id::VARCHAR
                 END AS url
          FROM documents),
        s AS (
          SELECT doc_id, url,
                 list_filter(regexp_split_to_array(
                     regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1),
                     '/'), x -> x <> '') AS segs,
                 list_filter(regexp_split_to_array(
                     regexp_extract(url, '\?([^#]*)', 1), '&'), x -> x <> '') AS params,
                 regexp_matches(regexp_extract(url, '\?([^#]*)', 1),
                     '(?i)(^|&)(phpsessid|jsessionid|sessionid|sid|cfid|cftoken)=') AS has_session
          FROM u)
        SELECT doc_id, url,
               len(segs)::INT AS n_segments,
               (len(segs) - len(list_distinct(segs)))::INT AS n_repeats,
               len(params)::INT AS n_params,
               has_session,
               (len(segs) > 12 OR (len(segs) - len(list_distinct(segs))) > 1
                OR len(params) > 8 OR has_session) AS is_trap
        FROM s
    """

    # crawl_redirect_resolve: same synthetic redirect map; the oracle
    # walks chains step-by-step with a recursive CTE (hop-capped), which
    # must agree with Spark's pointer-doubling resolution exactly
    o["crawl_redirect_resolve"] = r"""
        WITH RECURSIVE edges AS MATERIALIZED (
          SELECT 'u' || doc_id::VARCHAR AS src,
                 'u' || (doc_id - 1)::VARCHAR AS dst
          FROM documents WHERE doc_id % 4 <> 0
          UNION ALL
          SELECT 'u' || doc_id::VARCHAR, 'u' || (doc_id + 3)::VARCHAR
          FROM documents WHERE doc_id % 20 = 0 AND doc_id > 0
          UNION ALL
          SELECT 'lc' || doc_id::VARCHAR, 'lc' || (doc_id - 1)::VARCHAR
          FROM documents WHERE doc_id >= 1 AND doc_id < 30
        ),
        srcs AS MATERIALIZED (SELECT DISTINCT src FROM edges),
        walk AS (
          SELECT src AS url, dst AS cur, 1 AS hops FROM edges
          UNION ALL
          SELECT w.url, e.dst, w.hops + 1
          FROM walk w JOIN edges e ON e.src = w.cur
          WHERE w.hops <= 16
        ),
        fin AS (
          SELECT w.url, w.cur AS final_url, w.hops
          FROM walk w LEFT JOIN srcs s ON w.cur = s.src
          WHERE s.src IS NULL AND w.hops <= 16
        )
        SELECT s.src AS url,
               COALESCE(f.final_url, '') AS final_url,
               COALESCE(f.hops, -1)::BIGINT AS hops,
               f.final_url IS NOT NULL AS resolved
        FROM srcs s LEFT JOIN fin f ON s.src = f.url
    """

    # crawl_mirror_hosts: same 24-host fingerprint synthesis; Jaccard as
    # a single exact int division (IEEE-identical across engines)
    o["crawl_mirror_hosts"] = r"""
        WITH pg AS MATERIALIZED (
          SELECT DISTINCT
                 'h' || (doc_id % 24)::VARCHAR || '.com' AS h,
                 CASE WHEN (doc_id // 24) % 5 = 0
                      THEN md5('uniq:' || doc_id::VARCHAR)
                      ELSE md5('pg:' || ((doc_id // 24) * 8
                                         + (doc_id % 24) // 3)::VARCHAR)
                 END AS g
          FROM documents),
        sizes AS MATERIALIZED (SELECT h, count(*) AS n FROM pg GROUP BY h),
        inv AS MATERIALIZED (
          SELECT pg.h, pg.g, s.n FROM pg JOIN sizes s ON pg.h = s.h),
        inter AS (
          SELECT a.h AS host_a, b.h AS host_b, a.n AS n_a, b.n AS n_b,
                 count(*) AS shared
          FROM inv a JOIN inv b ON a.g = b.g AND a.h < b.h
          GROUP BY 1, 2, 3, 4)
        SELECT host_a, host_b, shared, n_a, n_b,
               shared::DOUBLE / (n_a + n_b - shared) AS jaccard
        FROM inter
        WHERE shared::DOUBLE / (n_a + n_b - shared) >= 0.5
    """

    # crawl_soft404: same synthesized batch, same RE2∩Java regexes over
    # lowercased input, same whitespace word count as word_count_v6
    o["crawl_soft404"] = r"""
        WITH b AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 7 = 0 THEN 404 ELSE 200 END AS status,
                 CASE doc_id % 7
                   WHEN 0 THEN '404 Not Found'
                   WHEN 1 THEN 'Error 404 - Page Not Found'
                   WHEN 2 THEN 'Widgets'
                   WHEN 3 THEN 'Oops'
                   WHEN 4 THEN 'Contact'
                   ELSE 'Article ' || doc_id::VARCHAR
                 END AS title,
                 CASE doc_id % 7
                   WHEN 0 THEN 'not found'
                   WHEN 1 THEN substr(text, 1, 200)
                   WHEN 2 THEN 'The page you requested was not found on this server. '
                               || substr(text, 1, 100)
                   WHEN 3 THEN 'Sorry, an error occurred.'
                   WHEN 4 THEN 'Call our office for widget pricing.'
                   ELSE text
                 END AS body
          FROM documents),
        s AS (
          SELECT doc_id, status,
                 regexp_matches(lower(title),
                     '\b(404|page not found|not found|error)\b') AS title_hit,
                 regexp_matches(lower(body),
                     '(page (you requested )?((was|could) )?not (be )?found|no longer (exists|available)|does not exist|has been (removed|deleted))')
                     AS phrase_hit,
                 (len(list_filter(regexp_split_to_array(trim(lower(body)),
                      '[\t\n\f\r ]+'), x -> x <> '')) < 20
                  AND regexp_matches(lower(body),
                      '\b(error|not found|oops|sorry)\b')) AS tiny_hit
          FROM b)
        SELECT doc_id, status, title_hit, phrase_hit, tiny_hit,
               (status = 200 AND (title_hit OR phrase_hit OR tiny_hit)) AS soft404
        FROM s
    """

    # crawl_dust_rules: same synthesized sid/no-sid crawl; generic DUST
    # logic re-expressed (explode params → strip one → self-join on the
    # crawled URL map → (host, param) rollup). 1-based pos in DuckDB's
    # lambda matches 1-based generate_subscripts, mirroring Spark's
    # 0-based posexplode/filter pair.
    o["crawl_dust_rules"] = r"""
        WITH pg AS MATERIALIZED (
          SELECT 'https://h' || ((doc_id // 2) % 8)::VARCHAR || '.com/p/'
                 || ((doc_id // 2) // 8)::VARCHAR
                 || '?a=' || ((doc_id // 2) % 7)::VARCHAR
                 || CASE WHEN doc_id % 2 = 0
                         THEN '&sid=' || doc_id::VARCHAR ELSE '' END AS url,
                 md5('https://h' || ((doc_id // 2) % 8)::VARCHAR || '.com/p/'
                     || ((doc_id // 2) // 8)::VARCHAR
                     || '|a=' || ((doc_id // 2) % 7)::VARCHAR
                     || CASE WHEN (doc_id // 2) % 8 = 7
                             THEN '|sid=' || CASE WHEN doc_id % 2 = 0
                                                  THEN doc_id::VARCHAR
                                                  ELSE '' END
                             ELSE '' END) AS digest
          FROM documents),
        parsed AS MATERIALIZED (
          SELECT url, digest,
                 regexp_extract(url, '^https?://([^/?#]+)', 1) AS host,
                 str_split(url, '?')[1] AS base,
                 str_split(str_split(url, '?')[2], '&') AS params
          FROM pg
          WHERE str_split(url, '?')[2] IS NOT NULL
            AND len(str_split(str_split(url, '?')[2], '&')) > 0),
        ex AS (
          SELECT digest, host, base, params,
                 unnest(params) AS param_kv,
                 generate_subscripts(params, 1) AS pos
          FROM parsed),
        cand AS (
          SELECT digest, host,
                 str_split(param_kv, '=')[1] AS param,
                 CASE WHEN len(params) = 1 THEN base
                      ELSE base || '?' || array_to_string(
                          list_filter(params, (x, i) -> i <> pos), '&')
                 END AS stripped
          FROM ex),
        hits AS (
          SELECT c.host, c.param,
                 CASE WHEN c.digest = p2.digest THEN 1 ELSE 0 END AS agreed
          FROM cand c JOIN pg p2 ON c.stripped = p2.url),
        rules AS (
          SELECT host, param,
                 sum(agreed)::BIGINT AS support,
                 sum(1 - agreed)::BIGINT AS violations
          FROM hits GROUP BY host, param)
        SELECT host, param, support, violations,
               (support >= 3 AND violations = 0) AS rule_ok
        FROM rules
    """

    # crawl_dust_apply: reuse the rule-mining CTE chain, aggregate the
    # validated rules to per-host strip-sets, rewrite every crawled URL
    _dust_cte = o["crawl_dust_rules"][: o["crawl_dust_rules"].rindex("SELECT host")]
    o["crawl_dust_apply"] = (
        _dust_cte
        + r""", ok AS (
          SELECT host, list(param) AS strips
          FROM rules WHERE support >= 3 AND violations = 0 GROUP BY host),
        app AS (
          SELECT p.url,
                 regexp_extract(p.url, '^https?://([^/?#]+)', 1) AS host,
                 str_split(p.url, '?')[1] AS base,
                 str_split(str_split(p.url, '?')[2], '&') AS params
          FROM pg p),
        j AS (
          SELECT a.url, a.base,
                 list_filter(a.params,
                     x -> NOT list_contains(o.strips, str_split(x, '=')[1]))
                     AS kept,
                 a.params IS NULL OR o.strips IS NULL AS passthru
          FROM app a LEFT JOIN ok o ON a.host = o.host)
        SELECT url,
               CASE WHEN passthru THEN url
                    WHEN len(kept) = 0 THEN base
                    ELSE base || '?' || array_to_string(kept, '&')
               END AS canonical_url
        FROM j
    """
    )

    # crawl_hreflang_*: same synthesized multilingual groups, same regex
    # tag extraction, same one-rollup cluster key / left_anti audit
    _hreflang_cte = r"""
        WITH d AS (
          SELECT doc_id, doc_id // 3 AS g, doc_id % 3 AS v FROM documents),
        m AS (
          SELECT doc_id, g, v,
                 'https://h' || (g % 8)::VARCHAR || '.com/de/' || g::VARCHAR AS u_de,
                 'https://h' || (g % 8)::VARCHAR || '.com/en/' || g::VARCHAR AS u_en,
                 'https://h' || (g % 8)::VARCHAR || '.com/fr/' || g::VARCHAR AS u_fr
          FROM d),
        pages AS (
          SELECT CASE v WHEN 0 THEN u_de WHEN 1 THEN u_en ELSE u_fr END AS url,
                 '<link rel="alternate" hreflang="de" href="' || u_de || '">'
                 || CASE WHEN g % 5 = 0 AND v = 2 THEN ''
                         ELSE '<link rel="alternate" hreflang="en" href="'
                              || u_en || '">' END
                 || '<link rel="alternate" hreflang="fr" href="' || u_fr || '">'
                     AS html
          FROM m),
        tags AS (
          SELECT url, unnest(regexp_extract_all(html,
                     '(<link[^>]*rel="alternate"[^>]*>)', 1)) AS tag
          FROM pages),
        alts AS MATERIALIZED (
          SELECT url,
                 regexp_extract(tag, 'hreflang="([^"]*)"', 1) AS lang,
                 regexp_extract(tag, 'href="([^"]*)"', 1) AS href
          FROM tags
          WHERE regexp_extract(tag, 'hreflang="([^"]*)"', 1) <> ''
            AND regexp_extract(tag, 'href="([^"]*)"', 1) <> ''),
    """
    o["crawl_hreflang_clusters"] = (
        _hreflang_cte
        + r"""fin AS (
          SELECT least(min(href), url) AS cluster_id, url,
                 coalesce(max(CASE WHEN href = url THEN lang END), '') AS lang
          FROM alts GROUP BY url)
        SELECT cluster_id, url, lang FROM fin
    """
    )
    o["crawl_hreflang_audit"] = (
        _hreflang_cte
        + r"""fwd AS (SELECT url AS src, href AS dst FROM alts WHERE href <> url)
        SELECT f.src, f.dst
        FROM fwd f LEFT JOIN fwd r ON r.src = f.dst AND r.dst = f.src
        WHERE r.src IS NULL
    """
    )

    # crawl_ip_politeness: same 40-host/10-block synthesis, same exact
    # integer split
    o["crawl_ip_politeness"] = r"""
        WITH hosts AS MATERIALIZED (
          SELECT 'h' || (doc_id % 40)::VARCHAR || '.com' AS host,
                 count(*)::BIGINT AS queued
          FROM documents GROUP BY 1),
        res AS (
          SELECT host, queued,
                 '10.0.' || (regexp_extract(host, 'h(\d+)\.com', 1)::BIGINT % 10)::VARCHAR
                     AS ip_block
          FROM hosts),
        blocks AS MATERIALIZED (
          SELECT ip_block, sum(queued)::BIGINT AS block_queued
          FROM res GROUP BY ip_block)
        SELECT r.host, r.ip_block, r.queued,
               least(r.queued,
                     greatest(1::BIGINT,
                              (20 * r.queued) // b.block_queued)) AS quota
        FROM res r JOIN blocks b ON r.ip_block = b.ip_block
    """

    # crawl_staleness: same epoch-µs synthesis, integer-day escalation
    o["crawl_staleness"] = r"""
        WITH c AS MATERIALIZED (
          SELECT 'https://h' || (doc_id % 8)::VARCHAR || '.com/p/'
                     || doc_id::VARCHAR AS url,
                 (1700000000000000 + doc_id * 1000000)::BIGINT AS fetch_ts_us,
                 CASE WHEN doc_id % 3 = 0
                      THEN 1700000000000000 + doc_id * 1000000
                           + (doc_id % 7) * 86400000000 + 1000000
                      ELSE 1700000000000000 + doc_id * 1000000 - 1000000
                 END::BIGINT AS lastmod_us
          FROM documents)
        SELECT url, fetch_ts_us, lastmod_us,
               (lastmod_us - fetch_ts_us)::BIGINT AS staleness_us,
               least(10::BIGINT,
                     5 + (lastmod_us - fetch_ts_us) // 86400000000)
                   AS refresh_priority
        FROM c WHERE lastmod_us > fetch_ts_us
    """

    # crawl_url_templates: same synthesis, same digit masking + rollup
    o["crawl_url_templates"] = r"""
        WITH pages AS (
          SELECT CASE
                   WHEN doc_id % 5 = 0
                     THEN 'https://h' || (doc_id % 6)::VARCHAR || '.com/about'
                   WHEN doc_id % 5 = 1
                     THEN 'https://h' || (doc_id % 6)::VARCHAR || '.com/cal/2024/'
                          || (doc_id % 12)::VARCHAR || '/' || (doc_id % 28)::VARCHAR
                   ELSE 'https://h' || (doc_id % 6)::VARCHAR || '.com/p/'
                        || doc_id::VARCHAR
                 END AS url
          FROM documents),
        t AS (
          SELECT url,
                 regexp_extract(url, '^https?://([^/?#]+)', 1) AS host,
                 regexp_replace(
                     CASE WHEN regexp_extract(url,
                              '^https?://[^/?#]*([^?#]*)', 1) = '' THEN '/'
                          ELSE regexp_extract(url,
                              '^https?://[^/?#]*([^?#]*)', 1) END,
                     '[0-9]+', 'N', 'g') AS template
          FROM pages)
        SELECT host, template, count(*)::BIGINT AS n_urls,
               min(url) AS example_url
        FROM t GROUP BY host, template
        HAVING count(*) >= 2
    """

    # crawl_trap_rules: same synthesis + a digest that collapses the
    # calendar space; yield is exact integer basis points (DuckDB //
    # on positive LONGs ≡ Spark DIV)
    o["crawl_trap_rules"] = r"""
        WITH pages AS (
          SELECT CASE
                   WHEN doc_id % 5 = 0
                     THEN 'https://h' || (doc_id % 6)::VARCHAR || '.com/about'
                   WHEN doc_id % 5 = 1
                     THEN 'https://h' || (doc_id % 6)::VARCHAR || '.com/cal/2024/'
                          || (doc_id % 12)::VARCHAR || '/' || (doc_id % 28)::VARCHAR
                   ELSE 'https://h' || (doc_id % 6)::VARCHAR || '.com/p/'
                        || doc_id::VARCHAR
                 END AS url,
                 CASE WHEN doc_id % 5 = 1
                      THEN 'dup' || (doc_id % 3)::VARCHAR
                      ELSE 'uniq' || doc_id::VARCHAR
                 END AS digest
          FROM documents),
        t AS (
          SELECT url, digest,
                 regexp_extract(url, '^https?://([^/?#]+)', 1) AS host,
                 regexp_replace(
                     CASE WHEN regexp_extract(url,
                              '^https?://[^/?#]*([^?#]*)', 1) = '' THEN '/'
                          ELSE regexp_extract(url,
                              '^https?://[^/?#]*([^?#]*)', 1) END,
                     '[0-9]+', 'N', 'g') AS template
          FROM pages),
        agg AS (
          SELECT host, template, count(*)::BIGINT AS n_urls,
                 count(DISTINCT digest)::BIGINT AS n_digests
          FROM t GROUP BY host, template)
        SELECT host, template, n_urls, n_digests,
               (n_digests * 10000) // n_urls AS yield_bp,
               (n_urls >= 8 AND (n_digests * 10000) // n_urls <= 3000) AS trap
        FROM agg
    """

    # crawl_link_reciprocity: same 12-host graph with the 0-3 clique
    o["crawl_link_reciprocity"] = r"""
        WITH raw AS (
          SELECT 'h' || (doc_id % 12)::VARCHAR || '.com' AS src,
                 'h' || ((doc_id // 12) % 12)::VARCHAR || '.com' AS dst
          FROM documents
          UNION ALL
          SELECT 'h' || ((doc_id // 12) % 12)::VARCHAR || '.com',
                 'h' || (doc_id % 12)::VARCHAR || '.com'
          FROM documents
          WHERE doc_id % 12 < 4 AND (doc_id // 12) % 12 < 4),
        e AS MATERIALIZED (
          SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
        agg AS (
          SELECT e.src AS host, count(*)::BIGINT AS n_out,
                 sum(CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
                     AS n_recip
          FROM e LEFT JOIN e r ON r.src = e.dst AND r.dst = e.src
          GROUP BY e.src)
        SELECT host, n_out, n_recip,
               (n_recip * 10000) // n_out AS reciprocity_bp
        FROM agg
    """

    # corpus_*_cardinality: the from-scratch HLL re-derived — same md5
    # register layout, exact integer harmonic sum (HUGEINT ≡ Spark's
    # DECIMAL(38,0)), same literals, same branch order
    def _hll_sql(pages_cte: str, grp: str, p: int, exact_join: str) -> str:
        m = 1 << p
        alpha = 0.7213 / (1.0 + 1.079 / m)
        fac = repr(alpha * m * m)
        shard = 1 << (p - 4) if p >= 4 else 1
        width = 64 - p
        g = grp + ", " if grp else ""
        gb = f"GROUP BY {grp}" if grp else ""
        gbb = f"{grp}, " if grp else ""
        raw = f"({fac} * 4611686018427387904.0 / tot::DOUBLE)"
        return f"""
        WITH pages AS MATERIALIZED ({pages_cte}),
        h AS (
          SELECT {g}('0x' || substr(md5(url), 1, 15))::UBIGINT::BIGINT AS h_hi,
                 ('0x' || substr(md5(url), 16, 1))::UBIGINT::BIGINT AS h_lo
          FROM pages),
        r AS (
          SELECT {g}(h_hi % {shard}) * 16 + h_lo AS bucket,
                 least(CASE WHEN h_hi // {shard} > 0
                            THEN {width} - length(bin(h_hi // {shard})) + 1
                            ELSE {width} + 1 END, 62)::BIGINT AS rho
          FROM h),
        regs AS (
          SELECT {g}bucket, max(rho) AS rho
          FROM r GROUP BY {gbb}bucket),
        agg AS (
          SELECT {g}count(*)::BIGINT AS n_buckets,
                 sum(1::BIGINT << (62 - rho)::INT) AS occ
          FROM regs {gb}),
        est AS (
          SELECT {g}n_buckets, ({m} - n_buckets)::BIGINT AS v,
                 occ + (({m} - n_buckets)::HUGEINT
                        * (1::BIGINT << 62)::HUGEINT) AS tot
          FROM agg),
        fin AS (
          SELECT {g}n_buckets,
                 round(CASE WHEN {raw} <= {2.5 * m!r} AND v > 0
                            THEN {float(m)!r} * ln({float(m)!r} / v::DOUBLE)
                            ELSE {raw} END, 6) AS estimate
          FROM est)
        {exact_join}
        """

    _card_pages_cte = (
        "SELECT 'h' || (doc_id % 10)::VARCHAR || '.com' AS host,"
        " 'https://h' || (doc_id % 10)::VARCHAR || '.com/p/'"
        " || ((doc_id // 10) % 37)::VARCHAR AS url FROM documents"
    )
    o["corpus_host_cardinality"] = _hll_sql(
        _card_pages_cte,
        "host",
        8,
        """SELECT f.host, f.n_buckets, f.estimate, e.exact_distinct
        FROM fin f JOIN (
          SELECT host, count(DISTINCT url)::BIGINT AS exact_distinct
          FROM pages GROUP BY host) e ON e.host = f.host""",
    )
    o["corpus_url_cardinality"] = _hll_sql(
        "SELECT 'https://h' || (doc_id % 10)::VARCHAR || '.com/p/'"
        " || doc_id::VARCHAR AS url FROM documents",
        "",
        4,
        """SELECT f.n_buckets, f.estimate, e.exact_distinct
        FROM fin f, (
          SELECT count(DISTINCT url)::BIGINT AS exact_distinct
          FROM pages) e""",
    )

    # corpus_cdc_*: same paragraph pool, same md5-window boundary rule
    _cdc_cte = r"""
        WITH docs2 AS MATERIALIZED (
          SELECT doc_id,
                 md5('para:' || (doc_id % 20)::VARCHAR)
                 || md5('para:' || ((doc_id * 7 + 3) % 20)::VARCHAR)
                 || md5('para:' || ((doc_id // 4) % 20)::VARCHAR) AS text
          FROM documents),
        b AS MATERIALIZED (
          SELECT doc_id, text, length(text)::BIGINT AS n,
                 list_filter(range(8, length(text) + 1),
                     i -> substr(md5(substr(text, (i - 7)::INT, 8)), 32, 1)
                          = '0') AS bnds
          FROM docs2),
        e AS (
          SELECT doc_id, text, n, bnds,
                 unnest(list_prepend(0::BIGINT, bnds)) AS prev,
                 generate_subscripts(list_prepend(0::BIGINT, bnds), 1) AS j
          FROM b),
        ch AS MATERIALIZED (
          SELECT doc_id, (j - 1)::BIGINT AS chunk_idx,
                 (prev + 1)::BIGINT AS start,
                 (coalesce(bnds[j::INT], n) - prev)::BIGINT AS length,
                 md5(substr(text, (prev + 1)::INT,
                     (coalesce(bnds[j::INT], n) - prev)::INT)) AS chunk_md5
          FROM e
          WHERE coalesce(bnds[j::INT], n) - prev > 0),
    """
    o["corpus_cdc_chunks"] = (
        _cdc_cte
        + r"""fin AS (SELECT * FROM ch)
        SELECT doc_id, chunk_idx, start, length, chunk_md5 FROM fin
    """
    )
    o["corpus_cdc_stats"] = (
        _cdc_cte
        + r"""per AS (
          SELECT chunk_md5, count(*)::BIGINT AS refs,
                 max(length)::BIGINT AS length
          FROM ch GROUP BY chunk_md5)
        SELECT sum(refs)::BIGINT AS n_chunks,
               count(*)::BIGINT AS n_distinct,
               sum(refs * length)::BIGINT AS total_bytes,
               sum(length)::BIGINT AS unique_bytes,
               ((sum(length) * 10000) // sum(refs * length))::BIGINT
                   AS dedup_bp
        FROM per
    """
    )

    # crawl_shard_rebalance: same md5 HRW argmax (struct compare =
    # Spark array_max on (w, s)), same modulo strawman
    o["crawl_shard_rebalance"] = r"""
        WITH u AS MATERIALIZED (
          SELECT 'https://h' || (doc_id % 10)::VARCHAR || '.com/p/'
                 || doc_id::VARCHAR AS url
          FROM documents),
        s AS (
          SELECT url,
                 struct_extract(list_max(list_transform(range(0, 8),
                     s -> struct_pack(w := md5(url || ':' || s::VARCHAR),
                                      s := s))), 's') AS s8,
                 struct_extract(list_max(list_transform(range(0, 9),
                     s -> struct_pack(w := md5(url || ':' || s::VARCHAR),
                                      s := s))), 's') AS s9,
                 ('0x' || substr(md5(url), 1, 15))::UBIGINT::BIGINT % 8 AS m8,
                 ('0x' || substr(md5(url), 1, 15))::UBIGINT::BIGINT % 9 AS m9
          FROM u),
        agg AS (
          SELECT count(*)::BIGINT AS n_urls,
                 sum(CASE WHEN s8 <> s9 THEN 1 ELSE 0 END)::BIGINT AS hrw_moved,
                 sum(CASE WHEN m8 <> m9 THEN 1 ELSE 0 END)::BIGINT AS mod_moved
          FROM s)
        SELECT n_urls, hrw_moved, mod_moved,
               (hrw_moved * 10000) // n_urls AS hrw_moved_bp,
               (mod_moved * 10000) // n_urls AS mod_moved_bp
        FROM agg
    """

    # text_readability: same splitter as word_count_v6, same vowel-group
    # syllable heuristic, identical float op order (two subtractions
    # left to right), round 6
    o["text_readability"] = r"""
        WITH w AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(trim(text),
                     '[\t\n\f\r ]+'), x -> x <> '') AS wds,
                 greatest(1, len(regexp_extract_all(text, '([.!?]+)', 1)))::BIGINT
                     AS n_sentences
          FROM documents),
        s AS (
          SELECT doc_id, n_sentences,
                 greatest(1, len(wds))::BIGINT AS n_words,
                 coalesce(list_sum(list_transform(wds,
                     x -> greatest(1, len(regexp_extract_all(lower(x),
                                          '([aeiouy]+)', 1))))), 0)::BIGINT
                     AS n_syllables
          FROM w)
        SELECT doc_id, n_words, n_sentences, n_syllables,
               round(206.835 - 1.015 * (n_words::DOUBLE / n_sentences::DOUBLE)
                     - 84.6 * (n_syllables::DOUBLE / n_words::DOUBLE), 6)
                   AS flesch,
               round(0.39 * (n_words::DOUBLE / n_sentences::DOUBLE)
                     + 11.8 * (n_syllables::DOUBLE / n_words::DOUBLE)
                     - 15.59, 6) AS fk_grade
        FROM s
    """

    # text_mojibake: same injected damage, same marker-codepoint class,
    # integer // ppm
    o["text_mojibake"] = r"""
        WITH dmg AS (
          SELECT doc_id,
                 text || CASE doc_id % 5
                   WHEN 0 THEN ' Ã©tÃ© café'
                   WHEN 1 THEN ' â€œquotedâ€'
                   WHEN 2 THEN ' bad' || chr(7) || 'ctl'
                   WHEN 3 THEN ' ok clean text.'
                   ELSE ''
                 END AS t
          FROM documents),
        s AS (
          SELECT doc_id,
                 greatest(1, len(t))::BIGINT AS n_chars,
                 len(regexp_extract_all(t, '([ÃÂ€�])', 1))::BIGINT AS n_mojibake,
                 len(regexp_extract_all(t,
                     '([\x00-\x08\x0b\x0c\x0e-\x1f])', 1))::BIGINT AS n_ctrl
          FROM dmg)
        SELECT doc_id, n_chars, n_mojibake, n_ctrl,
               ((n_mojibake + n_ctrl) * 1000000) // n_chars AS mojibake_ppm,
               ((n_mojibake + n_ctrl) * 1000000) // n_chars <= 500 AS is_clean
        FROM s
    """

    # unigram_*: same small-alphabet fixture; seed vocab by substring
    # enumeration; the encode twin enumerates every segmentation via a
    # recursive CTE and arg-maxes (score DESC, reversed-lens DESC) —
    # exactly the DP's optimum with its longer-final-piece tie-break
    _ug_cte = r"""
        WITH RECURSIVE docs2 AS MATERIALIZED (
          SELECT doc_id,
                 repeat('ab', (1 + doc_id % 3)::INT) || ' '
                 || repeat('cd', (1 + (doc_id // 3) % 2)::INT) || 'x '
                 || substr('abcdabcd', (1 + doc_id % 4)::INT, 3) AS text
          FROM documents),
        w AS MATERIALIZED (
          SELECT word, count(*)::BIGINT AS cnt FROM (
            SELECT unnest(regexp_extract_all(text,
                '([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])', 1)) AS word
            FROM docs2) GROUP BY word),
        sub AS MATERIALIZED (
          SELECT substr(word, i::INT, l::INT) AS piece, sum(cnt)::BIGINT AS c
          FROM (SELECT word, cnt, unnest(range(1, length(word) + 1)) AS i
                FROM w),
               unnest([1, 2, 3, 4]) AS t(l)
          WHERE i + l - 1 <= length(word)
          GROUP BY 1),
        singles AS MATERIALIZED (
          SELECT piece, c FROM sub WHERE length(piece) = 1),
        multi AS (
          SELECT piece, c FROM (
            SELECT piece, c, row_number() OVER (ORDER BY c DESC, piece) AS rk
            FROM sub WHERE length(piece) > 1)
          WHERE rk <= 12 - (SELECT count(*) FROM singles)),
        sel AS MATERIALIZED (
          SELECT * FROM singles UNION ALL SELECT * FROM multi),
        voc AS MATERIALIZED (
          SELECT piece, c,
                 round(ln(c::DOUBLE / (SELECT sum(c) FROM sel)::DOUBLE), 6)
                     AS score
          FROM sel),
    """
    _ug_seg = r"""
        wl AS MATERIALIZED (SELECT DISTINCT word FROM w),
        seg AS (
          SELECT word, 0::BIGINT AS pos, 0.0::DOUBLE AS score,
                 []::BIGINT[] AS lens, []::VARCHAR[] AS toks
          FROM wl
          UNION ALL
          SELECT s.word, s.pos + length(v.piece), s.score + v.score,
                 list_prepend(length(v.piece)::BIGINT, s.lens),
                 list_append(s.toks, v.piece)
          FROM seg s JOIN voc v
            ON substr(s.word, (s.pos + 1)::INT, length(v.piece)) = v.piece
          WHERE s.pos < length(s.word)),
        best AS MATERIALIZED (
          SELECT word, toks FROM (
            SELECT word, toks, row_number() OVER (
                     PARTITION BY word ORDER BY score DESC, lens DESC) AS rk
            FROM seg WHERE pos = length(word))
          WHERE rk = 1),
    """
    o["unigram_seed_vocab"] = (
        _ug_cte + r"""fin AS (SELECT piece, c, score FROM voc)
        SELECT piece, c, score FROM fin
    """
    )
    o["unigram_encode_viterbi"] = (
        _ug_cte + _ug_seg
        + r"""pieces AS MATERIALIZED (
          SELECT doc_id,
                 unnest(regexp_extract_all(text,
                     '([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])', 1)) AS word,
                 generate_subscripts(regexp_extract_all(text,
                     '([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])', 1), 1) AS i
          FROM docs2),
        tok AS (SELECT p.doc_id, flatten(list(b.toks ORDER BY p.i)) AS toks
                FROM pieces p JOIN best b USING (word)
                GROUP BY p.doc_id)
        SELECT doc_id, len(toks) AS n_tokens,
               array_to_string(list_slice(toks, 1, 10), ' ') AS head_toks,
               md5(array_to_string(toks, ',')) AS toks_md5
        FROM tok
    """
    )
    o["unigram_em_step"] = (
        _ug_cte + _ug_seg
        + r"""usage AS MATERIALIZED (
          SELECT piece, sum(c)::BIGINT AS c FROM (
            SELECT w.cnt AS c, unnest(b.toks) AS piece
            FROM w JOIN best b USING (word))
          GROUP BY piece)
        SELECT piece, c,
               round(ln(c::DOUBLE / (SELECT sum(c) FROM usage)::DOUBLE), 6)
                   AS score
        FROM usage
    """
    )

    # dsir_sample: same weights, Gumbel-top-k with md5-seeded noise
    _dsir_wgt_cte = o["dsir_select"][: o["dsir_select"].index("rk AS")]
    o["dsir_sample"] = (
        _dsir_wgt_cte
        + r"""keyed AS (
          SELECT doc_id, weight,
                 round(weight / 1.0 - ln(-ln(
                     ((('0x' || substr(md5(doc_id::VARCHAR || ':' || 'dsir'), 1, 8))::UBIGINT
                       + 1.0) / 4294967297.0))), 6) AS key
          FROM wgt),
        rk AS (SELECT doc_id, weight, key,
                      row_number() OVER (ORDER BY key DESC, doc_id) AS rank
               FROM keyed)
        SELECT doc_id, weight, key, rank FROM rk WHERE rank <= 100
    """
    )

    _qdot = "list_sum(list_transform(range(1, 65), i -> q.qv[i]::DOUBLE * k.embedding[i]::DOUBLE))"
    _qnorm = "sqrt(list_sum(list_transform(range(1, 65), i -> q.qv[i]::DOUBLE * q.qv[i]::DOUBLE)))"
    _knorm = "sqrt(list_sum(list_transform(range(1, 65), i -> k.embedding[i]::DOUBLE * k.embedding[i]::DOUBLE)))"
    # emb_bitext_margin: same even/odd split, same brute 4-NN, same
    # sorted-fold averages and ratio margin
    _bitext_avg = (
        "round(list_reduce(list_prepend(0.0, list(score ORDER BY score)),"
        " (x, y) -> x + y) / 4.0, 6)"
    )
    o["emb_bitext_margin"] = f"""
        WITH ev AS MATERIALIZED (
          SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 0),
        od AS MATERIALIZED (
          SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 1),
        fwd AS MATERIALIZED (
          SELECT q.query_id, k.vec_id AS neighbor_id,
                 round({_qdot} / ({_qnorm} * {_knorm}), 6) AS score
          FROM (SELECT vec_id AS query_id, embedding AS qv FROM ev) q, od k),
        fr AS MATERIALIZED (
          SELECT *, row_number() OVER (
                     PARTITION BY query_id ORDER BY score DESC, neighbor_id)
                     AS rnk
          FROM fwd),
        bwd AS MATERIALIZED (
          SELECT q.query_id, k.vec_id AS neighbor_id,
                 round({_qdot} / ({_qnorm} * {_knorm}), 6) AS score
          FROM (SELECT vec_id AS query_id, embedding AS qv FROM od) q, ev k),
        br AS MATERIALIZED (
          SELECT *, row_number() OVER (
                     PARTITION BY query_id ORDER BY score DESC, neighbor_id)
                     AS rnk
          FROM bwd),
        favg AS (SELECT query_id, {_bitext_avg} AS avg_f
                 FROM fr WHERE rnk <= 4 GROUP BY query_id),
        bavg AS (SELECT query_id, {_bitext_avg} AS avg_b
                 FROM br WHERE rnk <= 4 GROUP BY query_id),
        f1 AS (SELECT query_id AS src_id, neighbor_id AS tgt_id, score
               FROM fr WHERE rnk = 1),
        b1 AS (SELECT neighbor_id AS src_id, query_id AS tgt_id
               FROM br WHERE rnk = 1),
        mut AS (SELECT f1.* FROM f1 JOIN b1 USING (src_id, tgt_id)),
        fin AS (
          SELECT m.src_id, m.tgt_id, m.score,
                 round(m.score / ((fa.avg_f + ba.avg_b) / 2.0), 6) AS margin
          FROM mut m JOIN favg fa ON fa.query_id = m.src_id
                     JOIN bavg ba ON ba.query_id = m.tgt_id)
        SELECT src_id, tgt_id, score, margin FROM fin WHERE margin >= 1.0
    """

    # blocked bitext: cross-half LSH band collisions (the emb_dup_pairs
    # banding) as candidates, ONE scored pair table, integer-rational
    # margins over the AVAILABLE candidate neighbors — micro-unit
    # score lifts, exact long sums/counts, one double division (the
    # repo-wide probability-column determinism scheme)
    _bitext_blocked_body = f"""
        keys AS (
        {_band_rows}
        ),
        colls AS (
          SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
          FROM keys a JOIN keys b
            ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id),
        cand AS (
          SELECT id_a AS src_id, id_b AS tgt_id FROM colls
          WHERE id_a % 2 = 0 AND id_b % 2 = 1
          UNION ALL
          SELECT id_b, id_a FROM colls
          WHERE id_a % 2 = 1 AND id_b % 2 = 0),
        bscored AS MATERIALIZED (
          SELECT c.src_id, c.tgt_id, {_cos} AS score,
                 CAST(round({_cos} * 1000000.0) AS BIGINT) AS si
          FROM cand c
          JOIN embeddings a ON a.vec_id = c.src_id
          JOIN embeddings b ON b.vec_id = c.tgt_id),
        bfr AS MATERIALIZED (
          SELECT *, row_number() OVER (
                     PARTITION BY src_id ORDER BY score DESC, tgt_id) AS rnk
          FROM bscored),
        bbr AS MATERIALIZED (
          SELECT *, row_number() OVER (
                     PARTITION BY tgt_id ORDER BY score DESC, src_id) AS rnk
          FROM bscored),
        bfagg AS (SELECT src_id, sum(si)::BIGINT AS sum_f,
                         count(*)::BIGINT AS n_f
                  FROM bfr WHERE rnk <= 4 GROUP BY src_id),
        bbagg AS (SELECT tgt_id, sum(si)::BIGINT AS sum_b,
                         count(*)::BIGINT AS n_b
                  FROM bbr WHERE rnk <= 4 GROUP BY tgt_id),
        bf1 AS (SELECT src_id, tgt_id, score, si FROM bfr WHERE rnk = 1),
        bb1 AS (SELECT src_id, tgt_id FROM bbr WHERE rnk = 1),
        bmut AS (SELECT bf1.* FROM bf1 JOIN bb1 USING (src_id, tgt_id)),
        blocked_fin AS (
          SELECT m.src_id, m.tgt_id, m.score,
                 round((2 * m.si * fa.n_f * ba.n_b)::DOUBLE
                       / (fa.sum_f * ba.n_b + ba.sum_b * fa.n_f)::DOUBLE,
                       6) AS margin
          FROM bmut m JOIN bfagg fa ON fa.src_id = m.src_id
                      JOIN bbagg ba ON ba.tgt_id = m.tgt_id)"""

    o["emb_bitext_blocked"] = f"""
        WITH {_bitext_blocked_body}
        SELECT src_id, tgt_id, score, margin FROM blocked_fin
        WHERE margin >= 1.0
    """

    # exact chain with e-prefixed CTE names so the recall oracle can
    # hold both pipelines in one statement
    _bitext_exact_body = f"""
        eev AS MATERIALIZED (
          SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 0),
        eod AS MATERIALIZED (
          SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 1),
        efwd AS MATERIALIZED (
          SELECT q.query_id, k.vec_id AS neighbor_id,
                 round({_qdot} / ({_qnorm} * {_knorm}), 6) AS score
          FROM (SELECT vec_id AS query_id, embedding AS qv FROM eev) q, eod k),
        efr AS MATERIALIZED (
          SELECT *, row_number() OVER (
                     PARTITION BY query_id ORDER BY score DESC, neighbor_id)
                     AS rnk
          FROM efwd),
        ebwd AS MATERIALIZED (
          SELECT q.query_id, k.vec_id AS neighbor_id,
                 round({_qdot} / ({_qnorm} * {_knorm}), 6) AS score
          FROM (SELECT vec_id AS query_id, embedding AS qv FROM eod) q, eev k),
        ebr AS MATERIALIZED (
          SELECT *, row_number() OVER (
                     PARTITION BY query_id ORDER BY score DESC, neighbor_id)
                     AS rnk
          FROM ebwd),
        efavg AS (SELECT query_id, {_bitext_avg} AS avg_f
                  FROM efr WHERE rnk <= 4 GROUP BY query_id),
        ebavg AS (SELECT query_id, {_bitext_avg} AS avg_b
                  FROM ebr WHERE rnk <= 4 GROUP BY query_id),
        ef1 AS (SELECT query_id AS src_id, neighbor_id AS tgt_id, score
                FROM efr WHERE rnk = 1),
        eb1 AS (SELECT neighbor_id AS src_id, query_id AS tgt_id
                FROM ebr WHERE rnk = 1),
        emut AS (SELECT ef1.* FROM ef1 JOIN eb1 USING (src_id, tgt_id)),
        exact_fin AS (
          SELECT m.src_id, m.tgt_id, m.score,
                 round(m.score / ((fa.avg_f + ba.avg_b) / 2.0), 6) AS margin
          FROM emut m JOIN efavg fa ON fa.query_id = m.src_id
                      JOIN ebavg ba ON ba.query_id = m.tgt_id)"""

    o["emb_bitext_recall"] = f"""
        WITH {_bitext_blocked_body},
        {_bitext_exact_body},
        bl AS (SELECT src_id, tgt_id FROM blocked_fin WHERE margin >= 1.0),
        ex AS (SELECT src_id, tgt_id FROM exact_fin WHERE margin >= 1.0),
        common AS (
          SELECT count(*) AS c FROM ex JOIN bl USING (src_id, tgt_id))
        SELECT (SELECT count(*) FROM ex)::BIGINT AS n_exact,
               (SELECT count(*) FROM bl)::BIGINT AS n_blocked,
               (SELECT c FROM common)::BIGINT AS n_common,
               round((SELECT c FROM common)::DOUBLE
                     / (SELECT count(*) FROM ex)::DOUBLE, 4) AS recall
    """

    o["ann_lsh"] = f"""
        WITH keys AS (
          SELECT vec_id, embedding, {_sql_band_key(list(range(8)))} AS key FROM embeddings),
        q AS (SELECT vec_id AS query_id, qv, key FROM (
                SELECT vec_id, embedding AS qv, key FROM keys WHERE vec_id < 5)),
        scored AS (
          SELECT q.query_id, k.vec_id AS neighbor_id,
                 round({_qdot} / ({_qnorm} * {_knorm}), 6) AS score
          FROM q JOIN keys k ON k.key = q.key AND k.vec_id <> q.query_id),
        r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
              FROM scored)
        SELECT query_id, neighbor_id, score, rank FROM r WHERE rank <= 10
    """

    # ES-standard-analyzer tokenization (search.ANALYZER_RE): letter/
    # digit runs, apostrophes kept between runs, lowercased — identical
    # RE2/Java regex both sides.
    _AN = r"[\p{L}\p{N}]+(?:[''’][\p{L}\p{N}]+)*"

    def _antoks(col: str) -> str:
        return f"regexp_extract_all(lower({col}), '{_AN}')"

    def _antf(toks: str, term: str) -> str:
        return f"len(list_filter({toks}, x -> x = '{term}'))"

    # term suggester: same analyzer vocab, same prefix/length-band
    # pruning, plain levenshtein, score = 1 − d/max(len) rounded 6
    from gocrawl_spark.search import analyze_query as _ts_analyze

    _ts_terms = ", ".join(
        f"('{t}')"
        for t in _ts_analyze("windoq batchs spark")
        if len(t) >= 4
    )
    o["search_term_suggest"] = f"""
        WITH qt(term) AS (VALUES {_ts_terms}),
        vocab AS (
          SELECT v, count(*)::BIGINT AS freq FROM (
            SELECT unnest({_antoks("text")}) AS v FROM documents)
          GROUP BY v),
        missing AS (
          SELECT term FROM qt
          WHERE term NOT IN (SELECT v FROM vocab)),
        cand AS (
          SELECT m.term, v.v AS suggestion, v.freq,
                 levenshtein(m.term, v.v) AS d
          FROM missing m JOIN vocab v
            ON substr(v.v, 1, 1) = substr(m.term, 1, 1)
           AND abs(length(v.v) - length(m.term)) <= 2
           AND v.v <> m.term
          WHERE levenshtein(m.term, v.v) <= 2),
        scored AS (
          SELECT term, suggestion, freq,
                 round(1.0 - d::DOUBLE
                       / greatest(length(term), length(suggestion))::DOUBLE,
                       6) AS score
          FROM cand)
        SELECT term, suggestion, score, freq FROM (
          SELECT *, row_number() OVER (PARTITION BY term
                      ORDER BY score DESC, freq DESC, suggestion) AS rn
          FROM scored)
        WHERE rn <= 3
    """


    o["search_match_topk"] = f"""
        WITH t AS (SELECT doc_id AS id, {_antoks("text")} AS toks FROM documents)
        SELECT id,
               ({_antf("toks", "table")} + {_antf("toks", "scan")} + {_antf("toks", "merge")})::DOUBLE AS score
        FROM t
        WHERE ({_antf("toks", "table")} + {_antf("toks", "scan")} + {_antf("toks", "merge")}) > 0
        ORDER BY score DESC, id ASC LIMIT 10
    """

    o["search_match_analyzed"] = f"""
        WITH d AS (
          SELECT doc_id AS id,
                 text || CASE WHEN doc_id % 7 = 0 THEN ' The Wi-Fi setup in O''Brien''s cafe'
                              WHEN doc_id % 7 = 1 THEN ' don''t reuse passphrases for wi-fi routers'
                              ELSE '' END AS text2
          FROM documents),
        t AS (SELECT id, {_antoks("text2")} AS toks FROM d)
        SELECT id,
               ({_antf("toks", "wi")} + {_antf("toks", "fi")}
              + {_antf("toks", "o''brien''s")} + {_antf("toks", "don''t")})::DOUBLE AS score
        FROM t
        WHERE ({_antf("toks", "wi")} + {_antf("toks", "fi")}
             + {_antf("toks", "o''brien''s")} + {_antf("toks", "don''t")}) > 0
        ORDER BY score DESC, id ASC LIMIT 15
    """

    # match operator=and: all terms required, TF-sum scoring unchanged
    o["search_match_and"] = f"""
        WITH t AS (SELECT doc_id AS id, {_antoks("text")} AS toks FROM documents)
        SELECT id,
               ({_antf("toks", "spark")} + {_antf("toks", "table")} + {_antf("toks", "merge")})::DOUBLE AS score
        FROM t
        WHERE {_antf("toks", "spark")} > 0
          AND {_antf("toks", "table")} > 0
          AND {_antf("toks", "merge")} > 0
        ORDER BY score DESC, id ASC LIMIT 10
    """

    # bool: must = match(table scan) [OR over terms, TF-scored];
    # should = match(merge) + term(source=src3) [scores add];
    # must_not = term(lang=de); filter = 10 <= doc_id < 450 (no score)
    o["search_bool"] = f"""
        WITH t AS (SELECT doc_id AS id, source, lang, {_antoks("text")} AS toks
                   FROM documents WHERE doc_id >= 10 AND doc_id < 450),
        s AS (SELECT id, source, lang,
                     {_antf("toks", "table")} + {_antf("toks", "scan")} AS must_s,
                     {_antf("toks", "merge")} AS merge_s
              FROM t)
        SELECT id,
               round(must_s + merge_s
                     + CASE WHEN source = 'src3' THEN 1 ELSE 0 END, 6)::DOUBLE AS score
        FROM s
        WHERE must_s > 0 AND lang <> 'de'
        ORDER BY score DESC, id ASC LIMIT 15
    """

    # nested bool: must = sub-bool(should: match table | match stream,
    # msm=1 per-level default) scored as the TF sum; should =
    # match_phrase over the injected phrase (adds occurrence count, no
    # gating since must present); filters = terms(lang) + exists +
    # prefix; must_not = term(source=src11)
    o["search_bool_nested"] = f"""
        WITH d AS (
          SELECT doc_id AS id, lang, source,
                 text || CASE WHEN doc_id % 5 = 2
                              THEN ' The fused vector kernel wins.'
                              ELSE '' END AS c
          FROM documents),
        t AS (SELECT id, lang, source, {_antoks("c")} AS toks FROM d),
        s AS (SELECT id, lang, source,
                     {_antf("toks", "table")} + {_antf("toks", "stream")} AS must_s,
                     CASE WHEN len(toks) >= 3 THEN
                       len([i for i in range(1, len(toks) - 1)
                            if toks[i:i+2] = ['fused', 'vector', 'kernel']])
                     ELSE 0 END AS ph
              FROM t)
        SELECT id, round(must_s + ph, 6)::DOUBLE AS score
        FROM s
        WHERE must_s > 0
          AND lang IN ('en', 'fr', 'es')
          AND source IS NOT NULL
          AND source LIKE 'src1%'
          AND source <> 'src11'
        ORDER BY score DESC, id ASC LIMIT 15
    """

    # match_phrase: same analyzer, consecutive-window slice equality
    o["search_match_phrase"] = f"""
        WITH d AS (
          SELECT doc_id AS id,
                 text || CASE WHEN doc_id % 6 = 1
                              THEN ' The distributed query engine wins.'
                              ELSE '' END AS c
          FROM documents),
        t AS (SELECT id, {_antoks("c")} AS toks FROM d),
        s AS (SELECT id,
                     CASE WHEN len(toks) >= 3 THEN
                       len([i for i in range(1, len(toks) - 1)
                            if toks[i:i+2] = ['distributed', 'query', 'engine']])
                     ELSE 0 END AS score
              FROM t)
        SELECT id, score::DOUBLE AS score FROM s
        WHERE score > 0 ORDER BY score DESC, id ASC LIMIT 12
    """

    o["search_multimatch"] = f"""
        WITH t AS (SELECT doc_id AS id, {_antoks("text")} AS tt, {_antoks("source")} AS ts
                   FROM documents)
        SELECT id,
               (1.0::DOUBLE * ({_antf("tt", "spark")} + {_antf("tt", "window")} + {_antf("tt", "src3")})
              + 2.0::DOUBLE * ({_antf("ts", "spark")} + {_antf("ts", "window")} + {_antf("ts", "src3")}))::DOUBLE AS score
        FROM t
        WHERE (1.0::DOUBLE * ({_antf("tt", "spark")} + {_antf("tt", "window")} + {_antf("tt", "src3")})
             + 2.0::DOUBLE * ({_antf("ts", "spark")} + {_antf("ts", "window")} + {_antf("ts", "src3")})) > 0
        ORDER BY score DESC, id ASC LIMIT 10
    """

    _bm_terms = ["window", "batch", "spark"]
    _tf_exprs = ",\n".join(
        rf"len(list_filter(toks, x -> x = '{t}')) AS tf_{i}" for i, t in enumerate(_bm_terms)
    )
    _score_terms = " + ".join(
        f"""(CASE WHEN s.df_{i} > 0 THEN
              ln(1.0::DOUBLE + (s.n_docs - s.df_{i} + 0.5::DOUBLE) / (s.df_{i} + 0.5::DOUBLE))
              * d.tf_{i}::DOUBLE
              / (d.tf_{i}::DOUBLE + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE + 0.75::DOUBLE * d.dl / s.avgdl))
            ELSE 0.0::DOUBLE END)"""
        for i in range(len(_bm_terms))
    )
    o["search_bm25"] = rf"""
        WITH d0 AS (
          SELECT doc_id AS id, {_antoks("text")} AS toks
          FROM documents),
        d AS (SELECT id, len(toks)::DOUBLE AS dl, {_tf_exprs} FROM d0),
        s AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl,
                     {", ".join(f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END)::DOUBLE AS df_{i}" for i in range(len(_bm_terms)))}
              FROM d)
        SELECT d.id, round({_score_terms}, 6) AS score
        FROM d, s
        WHERE round({_score_terms}, 6) > 0
        ORDER BY score DESC, id ASC LIMIT 10
    """

    # MaxScore pruning is lossless, so the index-path oracle IS the
    # full-scan BM25 SQL — equality proves no document was lost
    o["search_bm25_maxscore"] = o["search_bm25"]

    # search_rank_eval: same one-pass BM25 (generic (id, term, tf)
    # shape instead of per-term columns), same md5 judgment pool, same
    # position-ordered folds for score / DCG / ideal-DCG sums — every
    # float op sequence mirrors rankeval.rank_eval exactly
    from gocrawl_spark.search import analyze_query as _rq_analyze

    _rq_rows = ", ".join(
        f"('{rid}', {pos}, '{term}')"
        for rid, query in _RANK_EVAL_REQUESTS
        for pos, term in enumerate(_rq_analyze(query))
    )
    _rq_ids = ", ".join(f"('{rid}')" for rid, _ in _RANK_EVAL_REQUESTS)
    _rq_terms = ", ".join(
        f"'{t}'"
        for t in sorted({t for _, qq in _RANK_EVAL_REQUESTS for t in _rq_analyze(qq)})
    )
    o["search_rank_eval"] = f"""
        WITH reqs(request_id, pos, term) AS (VALUES {_rq_rows}),
        rids(request_id) AS (VALUES {_rq_ids}),
        d0 AS (SELECT doc_id AS id, {_antoks("text")} AS toks FROM documents),
        tf AS (
          SELECT id, dl, term, count(*)::BIGINT AS tf
          FROM (SELECT id, len(toks)::BIGINT AS dl, unnest(toks) AS term FROM d0)
          WHERE term IN ({_rq_terms})
          GROUP BY id, dl, term),
        s AS (SELECT count(*)::DOUBLE AS n_docs,
                     avg(len(toks))::DOUBLE AS avgdl
              FROM d0),
        dfq AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        lp AS (
          SELECT r.request_id, t.id, r.pos,
                 ln(1.0::DOUBLE + (s.n_docs - f.df + 0.5::DOUBLE) / (f.df + 0.5::DOUBLE))
                 * t.tf::DOUBLE
                 / (t.tf::DOUBLE + 1.2::DOUBLE
                    * (1.0::DOUBLE - 0.75::DOUBLE
                       + 0.75::DOUBLE * t.dl::DOUBLE / s.avgdl)) AS lp
          FROM tf t JOIN reqs r USING (term) JOIN dfq f USING (term), s),
        sc AS (
          SELECT request_id, id,
                 round(list_reduce(list_prepend(0.0, list(lp ORDER BY pos)),
                                   (acc, x) -> acc + x), 6) AS score
          FROM lp GROUP BY request_id, id),
        topk AS (
          SELECT request_id, id, score,
                 row_number() OVER (PARTITION BY request_id
                                    ORDER BY score DESC, id ASC) AS rank
          FROM sc WHERE score > 0
          QUALIFY rank <= 10),
        pool AS (SELECT DISTINCT request_id, id FROM lp),
        rat AS (
          SELECT request_id, id,
                 CASE WHEN h % 10 < 6 THEN ((h // 10) % 3 + 1)::INT
                      ELSE 0 END AS rating
          FROM (SELECT request_id, id,
                       ('0x' || substr(md5(request_id || ':' || id::VARCHAR
                                           || ':' || 'rank-eval'), 1, 8))::UBIGINT AS h
                FROM pool)),
        rt AS (
          SELECT t.request_id, t.rank, coalesce(r.rating, 0) AS rating
          FROM topk t LEFT JOIN rat r USING (request_id, id)),
        pr AS (
          SELECT request_id, count(*)::BIGINT AS retrieved,
                 sum(CASE WHEN rating >= 1 THEN 1 ELSE 0 END)::BIGINT AS n_rel_ret,
                 min(CASE WHEN rating >= 1 THEN rank END) AS first_rel,
                 list_reduce(
                   list_prepend(0.0,
                     list((pow(2.0::DOUBLE, rating::DOUBLE) - 1.0::DOUBLE)
                          / (ln(rank::DOUBLE + 1.0::DOUBLE) / ln(2.0::DOUBLE))
                          ORDER BY rank)),
                   (acc, x) -> acc + x) AS dcg
          FROM rt GROUP BY request_id),
        idl0 AS (
          SELECT request_id,
                 sum(CASE WHEN rating >= 1 THEN 1 ELSE 0 END)::BIGINT AS n_rel_all,
                 list_slice(list_reverse_sort(list(rating::DOUBLE)), 1, 10) AS top_r
          FROM rat WHERE rating > 0 GROUP BY request_id),
        idl AS (
          SELECT request_id, n_rel_all,
                 list_reduce(
                   list_prepend(0.0,
                     list_transform(range(1, len(top_r) + 1),
                       i -> (pow(2.0::DOUBLE, top_r[i]) - 1.0::DOUBLE)
                            / (ln(i::DOUBLE + 1.0::DOUBLE) / ln(2.0::DOUBLE)))),
                   (acc, x) -> acc + x) AS idcg
          FROM idl0)
        SELECT r.request_id,
               coalesce(p.retrieved, 0)::INT AS retrieved,
               round(coalesce(p.n_rel_ret::DOUBLE / p.retrieved, 0.0), 6) AS precision_k,
               round(CASE WHEN coalesce(i.n_rel_all, 0) > 0
                          THEN coalesce(p.n_rel_ret, 0)::DOUBLE / i.n_rel_all
                          ELSE 0.0 END, 6) AS recall_k,
               round(coalesce(1.0::DOUBLE / p.first_rel, 0.0), 6) AS mrr,
               round(CASE WHEN coalesce(i.idcg, 0.0) > 0
                          THEN coalesce(p.dcg, 0.0) / i.idcg
                          ELSE 0.0 END, 6) AS ndcg_k
        FROM rids r
        LEFT JOIN pr p USING (request_id)
        LEFT JOIN idl i USING (request_id)
    """

    # percolator: identical registered-query table (VALUES), identical
    # analyzer, identical distinct-(doc, term) inverted formulation
    _perc_rows = ", ".join(
        f"('{qid}', '{t}', {len(terms)}, '{op}')"
        for qid, qs, op in _PERCOLATE_QUERIES
        for terms in [sorted(set(search.analyze_query(qs)))]
        for t in terms
    )
    o["search_percolate"] = f"""
        WITH qt(query_id, term, n_terms, operator) AS (VALUES {_perc_rows}),
        pairs AS (
          SELECT doc_id AS id, unnest(list_distinct({_antoks("text")})) AS term
          FROM documents),
        m AS (
          SELECT query_id, id, n_terms, operator,
                 count(*)::BIGINT AS n_matched
          FROM pairs JOIN qt USING (term)
          GROUP BY query_id, id, n_terms, operator)
        SELECT query_id, id, n_matched
        FROM m WHERE operator = 'or' OR n_matched = n_terms
    """

    _tv_ids = ", ".join(str(i) for i in _TERMVECTOR_DOC_IDS)
    o["search_termvectors"] = f"""
        WITH per AS (
          SELECT id, term, count(*)::BIGINT AS term_freq
          FROM (SELECT doc_id AS id, unnest({_antoks("text")}) AS term
                FROM documents)
          GROUP BY id, term),
        stats AS (
          SELECT term, sum(term_freq)::BIGINT AS ttf,
                 count(*)::BIGINT AS doc_freq
          FROM per GROUP BY term)
        SELECT id, term, term_freq, doc_freq, ttf
        FROM per JOIN stats USING (term)
        WHERE id IN ({_tv_ids})
    """

    # corpus_zipf: same norm_words stream, same (cnt DESC, word) rank,
    # same five left-to-right regression folds and formula op order
    o["corpus_zipf"] = f"""
        WITH w AS (SELECT {_SQL_WORDS} AS w FROM documents),
        cnt AS (SELECT u AS word, count(*)::BIGINT AS cnt
                FROM (SELECT unnest(w) AS u FROM w) GROUP BY u),
        tot AS (SELECT count(*)::BIGINT AS n_types, sum(cnt)::BIGINT AS n_tokens
                FROM cnt),
        r AS (SELECT word, cnt,
                     row_number() OVER (ORDER BY cnt DESC, word ASC) AS rank
              FROM cnt),
        p AS (SELECT rank, ln(rank::DOUBLE) AS x, ln(cnt::DOUBLE) AS y
              FROM r WHERE rank <= 1000),
        s AS (SELECT count(*)::BIGINT AS fit_n,
                 list_reduce(list_prepend(0.0, list(x ORDER BY rank)),
                             (a, b) -> a + b) AS sx,
                 list_reduce(list_prepend(0.0, list(y ORDER BY rank)),
                             (a, b) -> a + b) AS sy,
                 list_reduce(list_prepend(0.0, list(x * y ORDER BY rank)),
                             (a, b) -> a + b) AS sxy,
                 list_reduce(list_prepend(0.0, list(x * x ORDER BY rank)),
                             (a, b) -> a + b) AS sxx,
                 list_reduce(list_prepend(0.0, list(y * y ORDER BY rank)),
                             (a, b) -> a + b) AS syy
              FROM p)
        SELECT t.n_types, t.n_tokens, s.fit_n,
               round((s.fit_n::DOUBLE * s.sxy - s.sx * s.sy)
                     / (s.fit_n::DOUBLE * s.sxx - s.sx * s.sx), 6) AS zipf_slope,
               round((s.sy - (s.fit_n::DOUBLE * s.sxy - s.sx * s.sy)
                             / (s.fit_n::DOUBLE * s.sxx - s.sx * s.sx)
                             * s.sx) / s.fit_n::DOUBLE, 6) AS zipf_intercept,
               round(CASE WHEN (s.fit_n::DOUBLE * s.syy - s.sy * s.sy) > 0
                          THEN (s.fit_n::DOUBLE * s.sxy - s.sx * s.sy)
                               * (s.fit_n::DOUBLE * s.sxy - s.sx * s.sy)
                               / ((s.fit_n::DOUBLE * s.sxx - s.sx * s.sx)
                                  * (s.fit_n::DOUBLE * s.syy - s.sy * s.sy))
                          ELSE 0.0 END, 6) AS zipf_r2
        FROM tot t, s
    """

    # corpus_heaps: integer-only — identical ceil-division bucketing
    o["corpus_heaps"] = f"""
        WITH w AS (SELECT doc_id AS id, {_SQL_WORDS} AS w FROM documents),
        mx AS (SELECT max(doc_id)::BIGINT AS mx FROM documents),
        grid AS (SELECT i::INT AS checkpoint, (i * mx) // 10 AS id_bound
                 FROM range(1, 11) t(i), mx),
        fw AS (SELECT u AS word, min(id) AS first_id
               FROM (SELECT id, unnest(w) AS u FROM w) GROUP BY u),
        tp AS (SELECT greatest(1, (first_id * 10 + mx - 1) // mx) AS checkpoint,
                      count(*)::BIGINT AS new_types
               FROM fw, mx GROUP BY 1),
        dp AS (SELECT greatest(1, (id * 10 + mx - 1) // mx) AS checkpoint,
                      count(*)::BIGINT AS new_docs,
                      sum(len(w))::BIGINT AS new_tokens
               FROM w, mx GROUP BY 1)
        SELECT g.checkpoint, g.id_bound,
               (sum(coalesce(d.new_docs, 0)) OVER (ORDER BY g.checkpoint))::BIGINT AS cum_docs,
               (sum(coalesce(d.new_tokens, 0)) OVER (ORDER BY g.checkpoint))::BIGINT AS cum_tokens,
               (sum(coalesce(t.new_types, 0)) OVER (ORDER BY g.checkpoint))::BIGINT AS cum_types
        FROM grid g
        LEFT JOIN tp t USING (checkpoint)
        LEFT JOIN dp d USING (checkpoint)
        ORDER BY g.checkpoint
    """

    # text_distinct_ngrams: same norm_words / shingle fragments
    o["text_distinct_ngrams"] = f"""
        WITH w0 AS (SELECT doc_id AS id, {_SQL_WORDS} AS w FROM documents),
        g AS (SELECT id, w,
                     {_sql_shingles(2)} AS g2,
                     {_sql_shingles(3)} AS g3
              FROM w0)
        SELECT id,
               len(w)::INT AS n1_total,
               round(CASE WHEN len(w) > 0
                          THEN len(list_distinct(w))::DOUBLE / len(w)
                          ELSE 0.0 END, 6) AS distinct_1,
               len(g2)::INT AS n2_total,
               round(CASE WHEN len(g2) > 0
                          THEN len(list_distinct(g2))::DOUBLE / len(g2)
                          ELSE 0.0 END, 6) AS distinct_2,
               len(g3)::INT AS n3_total,
               round(CASE WHEN len(g3) > 0
                          THEN len(list_distinct(g3))::DOUBLE / len(g3)
                          ELSE 0.0 END, 6) AS distinct_3
        FROM g
    """

    # corpus_length_hist: bucket = bin-string length (identical int
    # semantics in both engines; no float log at 2^k boundaries)
    o["corpus_length_hist"] = """
        SELECT lang AS grp,
               length(bin(n_chars::BIGINT))::INT AS log2_bucket,
               count(*)::BIGINT AS n_docs,
               sum(n_chars::BIGINT)::BIGINT AS total_len,
               min(n_chars::BIGINT)::BIGINT AS min_len,
               max(n_chars::BIGINT)::BIGINT AS max_len
        FROM documents
        GROUP BY grp, log2_bucket
        ORDER BY grp, log2_bucket
    """

    # corpus_key_skew: rank-selected order statistics, no interpolation
    o["corpus_key_skew"] = """
        WITH freq AS (SELECT lang AS k, count(*)::BIGINT AS cnt
                      FROM documents GROUP BY lang),
        r AS (SELECT k, cnt,
                     row_number() OVER (ORDER BY cnt DESC, k ASC) AS r
              FROM freq),
        base AS (SELECT count(*)::BIGINT AS n_keys, sum(cnt)::BIGINT AS n_rows,
                        max(cnt)::BIGINT AS max_cnt
                 FROM freq),
        picks AS (SELECT
                    max(CASE WHEN r.r = b.n_keys - ceil(b.n_keys * 0.5) + 1
                             THEN cnt END)::BIGINT AS p50_cnt,
                    max(CASE WHEN r.r = b.n_keys - ceil(b.n_keys * 0.99) + 1
                             THEN cnt END)::BIGINT AS p99_cnt
                  FROM r, base b)
        SELECT b.n_keys, b.n_rows, b.max_cnt, p.p50_cnt, p.p99_cnt,
               round(b.max_cnt::DOUBLE / b.n_rows, 6) AS top_share,
               round(b.max_cnt::DOUBLE / p.p50_cnt, 6) AS skew_ratio
        FROM base b, picks p
    """

    # corpus_mixture_temperature: p_i ∝ n_i^τ over whitespace-token
    # totals per language
    o["corpus_mixture_temperature"] = r"""
        WITH a AS (
            SELECT lang AS stratum, count(*)::BIGINT AS n_docs,
                   sum(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                                       x -> x <> '')))::BIGINT AS n_tokens
            FROM documents GROUP BY lang),
        w AS (SELECT *, pow(n_tokens::DOUBLE, 0.7) AS pw FROM a)
        SELECT stratum, n_docs, n_tokens,
               round(pw / sum(pw) OVER (), 6) AS weight,
               round(round(pw / sum(pw) OVER (), 6) * 1000000.0
                     / n_tokens, 6) AS sample_epochs
        FROM w
    """

    # emb_project: same literal Rademacher planes, same left-to-right
    # fold — list_sum(list_transform(...)) is sequential like the
    # Spark aggregate, so values match bit-for-bit before rounding
    def _sql_proj_literals():
        from gocrawl_spark.similarity import rademacher_planes

        planes = rademacher_planes(64, 16)
        scale = 1.0 / 16.0 ** 0.5
        cols = []
        for j in range(16):
            arr = "[" + ", ".join(
                f"{planes[i, j]:.1f}" for i in range(64)
            ) + "]"
            cols.append(
                f"round(list_sum(list_transform(range(1, 65), "
                f"i -> embedding[i]::DOUBLE * ({arr}::DOUBLE[])[i])) "
                f"* {scale!r}, 6)"
            )
        return "[" + ", ".join(cols) + "]"

    o["emb_project"] = f"""
        WITH p AS (SELECT vec_id AS id, {_sql_proj_literals()} AS proj
                   FROM embeddings)
        SELECT id, generate_subscripts(proj, 1) - 1 AS j,
               unnest(proj) AS val
        FROM p
    """

    # search_significant_terms: JLH over per-doc distinct analyzer
    # tokens; fg = docs containing any analyzed query term
    o["search_significant_terms"] = f"""
        WITH d AS (SELECT doc_id AS id,
                          list_distinct({_antoks("text")}) AS toks
                   FROM documents),
        b AS (SELECT id, toks,
                     CASE WHEN list_contains(toks, 'spark')
                          THEN 1 ELSE 0 END AS fg
              FROM d),
        s AS (SELECT count(*)::DOUBLE AS n_all, sum(fg)::DOUBLE AS n_fg
              FROM b),
        tc AS (SELECT term, count(*)::BIGINT AS bg_count,
                      sum(fg)::BIGINT AS fg_count
               FROM (SELECT fg, unnest(toks) AS term FROM b)
               GROUP BY term),
        j AS (SELECT term, fg_count, bg_count,
                     fg_count / s.n_fg AS fgp,
                     bg_count / s.n_all AS bgp
              FROM tc, s)
        SELECT term, fg_count, bg_count,
               round((fgp - bgp) * (fgp / bgp), 6) AS score
        FROM j
        WHERE fgp > bgp AND fg_count >= 3
              AND round((fgp - bgp) * (fgp / bgp), 6) > 0
        ORDER BY score DESC, term ASC LIMIT 15
    """

    o["search_count_a1"] = """
        SELECT lang, count(*) AS n_docs FROM documents
        WHERE text LIKE '%spark%' GROUP BY lang
    """

    o["agg_events_rollup"] = """
        SELECT event_type, count(*) AS n_events,
               count(DISTINCT user_id) AS n_users,
               sum(round(value, 4)::DECIMAL(18,4))::DOUBLE AS sum_value
        FROM events GROUP BY event_type
    """

    o["join_segment_revenue"] = """
        SELECT c_mktsegment, count(*) AS n_orders,
               sum(round(o_totalprice, 2)::DECIMAL(18,2))::DOUBLE AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """

    o["tpch_q1_lite"] = """
        SELECT l_returnflag, l_linestatus,
               sum(round(l_quantity, 2)::DECIMAL(18,2))::DOUBLE AS sum_qty,
               sum(round(l_extendedprice * (1 - l_discount), 4)::DECIMAL(18,4))::DOUBLE AS sum_disc_price,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """

    o["tpch_q3_lite"] = """
        SELECT l_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
               sum(round(l_extendedprice * (1 - l_discount), 4)
                   ::DECIMAL(18,4))::DOUBLE AS revenue
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING'
          AND c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
          AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
        GROUP BY 1, 2
        ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
    """

    o["tpch_q5_lite"] = """
        SELECT n_name,
               sum(round(l_extendedprice * (1 - l_discount), 4)
                   ::DECIMAL(18,4))::DOUBLE AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY 1
    """

    o["tpch_q10_lite"] = """
        SELECT c_custkey, c_name, n_name,
               sum(round(l_extendedprice * (1 - l_discount), 4)
                   ::DECIMAL(18,4))::DOUBLE AS revenue
        FROM customer, orders, lineitem, nation
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
          AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, c_custkey ASC LIMIT 20
    """

    o["search_aggs_terms_a2"] = """
        SELECT event_type AS key, count(*) AS doc_count,
               CAST(sum(CAST(round(value, 4) AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
               count(DISTINCT user_id) AS n_users
        FROM events GROUP BY 1
        ORDER BY doc_count DESC, key ASC LIMIT 4
    """

    o["search_aggs_minmax_a2"] = """
        SELECT event_type AS key, count(*) AS doc_count,
               CAST(min(CAST(round(value, 4) AS DECIMAL(18,4))) AS DOUBLE) AS min_value,
               CAST(max(CAST(round(value, 4) AS DECIMAL(18,4))) AS DOUBLE) AS max_value,
               count(value) AS n_vals
        FROM events GROUP BY 1
        ORDER BY doc_count DESC, key ASC LIMIT 3
    """

    o["search_aggs_cardinality_a2"] = """
        SELECT count(DISTINCT user_id) AS users FROM events
    """

    o["search_aggs_datehist_a2"] = """
        SELECT strftime(date_trunc('month', ts), '%Y-%m-%d') AS key, count(*) AS doc_count
        FROM events GROUP BY 1 ORDER BY key
    """

    # search_aggs_pipeline_a2: ordered window over the filled bucket
    # series (same empty-bucket fill as the histogram oracle)
    o["search_aggs_pipeline_a2"] = """
        WITH b AS MATERIALIZED (
          SELECT (floor(n_chars / 100.0) * 100.0)::DOUBLE AS key,
                 count(*) AS doc_count,
                 avg(n_chars) AS avg_raw
          FROM documents GROUP BY 1),
        dom AS (
          SELECT (unnest(range(
                   (SELECT floor(min(key) / 100.0)::BIGINT FROM b),
                   (SELECT floor(max(key) / 100.0)::BIGINT FROM b) + 1))
                  * 100.0)::DOUBLE AS key),
        f AS (
          SELECT dom.key, coalesce(b.doc_count, 0) AS doc_count, b.avg_raw
          FROM dom LEFT JOIN b ON b.key = dom.key)
        SELECT key, doc_count,
               round(avg_raw, 6) AS avg_chars,
               sum(doc_count) OVER (ORDER BY key
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_docs,
               doc_count - lag(doc_count) OVER (ORDER BY key) AS d_docs,
               round(avg_raw - lag(avg_raw) OVER (ORDER BY key), 6) AS d_avg
        FROM f ORDER BY key
    """

    # search_aggs_pipeline2_a2: moving/sibling/script windows over the
    # filled series, selector filter applied last (post-window)
    o["search_aggs_pipeline2_a2"] = """
        WITH b AS MATERIALIZED (
          SELECT (floor(n_chars / 25.0) * 25.0)::DOUBLE AS key,
                 count(*) AS doc_count,
                 sum(n_chars)::BIGINT AS sum_chars
          FROM documents GROUP BY 1),
        dom AS (
          SELECT (unnest(range(
                   (SELECT floor(min(key) / 25.0)::BIGINT FROM b),
                   (SELECT floor(max(key) / 25.0)::BIGINT FROM b) + 1))
                  * 25.0)::DOUBLE AS key),
        f AS (
          SELECT dom.key, coalesce(b.doc_count, 0) AS doc_count, b.sum_chars
          FROM dom LEFT JOIN b ON b.key = dom.key),
        p AS (
          SELECT key, doc_count, sum_chars,
                 round(avg(doc_count) OVER (ORDER BY key
                   ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), 6) AS mv_docs,
                 round(sum_chars / doc_count, 6) AS chars_per_doc,
                 sum(doc_count) OVER ()::BIGINT AS total_docs,
                 max(doc_count) OVER ()::BIGINT AS peak_docs
          FROM f)
        SELECT key, doc_count, sum_chars, mv_docs, chars_per_doc,
               total_docs, peak_docs
        FROM p WHERE doc_count > 0 ORDER BY key
    """

    # search_aggs_extstats_a2: exact LONG sums, then the identical
    # two-division op sequence soq/cnt − (s/cnt)·(s/cnt)
    o["search_aggs_extstats_a2"] = """
        WITH s AS (
          SELECT lang AS key, count(*) AS doc_count,
                 count(n_chars) AS cs_count,
                 min(n_chars) AS cs_min, max(n_chars) AS cs_max,
                 sum(n_chars)::BIGINT AS cs_sum,
                 sum(n_chars * n_chars)::BIGINT AS cs_sum_of_squares
          FROM documents GROUP BY 1)
        SELECT key, doc_count, cs_count, cs_min, cs_max,
               round(cs_sum / cs_count, 6) AS cs_avg,
               cs_sum, cs_sum_of_squares,
               round(cs_sum_of_squares / cs_count
                     - (cs_sum / cs_count) * (cs_sum / cs_count), 6)
                 AS cs_variance,
               round(sqrt(cs_sum_of_squares / cs_count
                     - (cs_sum / cs_count) * (cs_sum / cs_count)), 6)
                 AS cs_std_deviation
        FROM s ORDER BY doc_count DESC, key ASC LIMIT 10
    """

    # search_aggs_rare_a2: HAVING cut on the aggregated side,
    # count-asc-then-key ordering (exact, no CuckooFilter)
    o["search_aggs_rare_a2"] = """
        SELECT n_chars AS key, count(*) AS doc_count,
               min(doc_id) AS min_doc
        FROM documents GROUP BY 1 HAVING count(*) <= 1
        ORDER BY doc_count ASC, key ASC
    """

    # search_aggs_multiterms_a2: composite-key groupBy, deterministic
    # count-desc-keys-asc cut
    o["search_aggs_multiterms_a2"] = """
        SELECT lang, source, count(*) AS doc_count,
               round(avg(n_chars), 6) AS avg_chars
        FROM documents GROUP BY lang, source
        ORDER BY doc_count DESC, lang ASC, source ASC LIMIT 8
    """

    # search_aggs_daterange_a2: conditional aggregates per declared
    # window, unpivoted in order, empty buckets kept (null sum)
    o["search_aggs_daterange_a2"] = """
        WITH s AS MATERIALIZED (
          SELECT
            count(CASE WHEN ts < TIMESTAMP '2024-01-10' THEN 1 END) AS dc0,
            sum(CASE WHEN ts < TIMESTAMP '2024-01-10'
                     THEN event_id END)::BIGINT AS v0,
            count(CASE WHEN ts >= TIMESTAMP '2024-01-10'
                        AND ts < TIMESTAMP '2024-01-20' THEN 1 END) AS dc1,
            sum(CASE WHEN ts >= TIMESTAMP '2024-01-10'
                      AND ts < TIMESTAMP '2024-01-20'
                     THEN event_id END)::BIGINT AS v1,
            count(CASE WHEN ts >= TIMESTAMP '2024-01-20' THEN 1 END) AS dc2,
            sum(CASE WHEN ts >= TIMESTAMP '2024-01-20'
                     THEN event_id END)::BIGINT AS v2,
            count(CASE WHEN ts >= TIMESTAMP '2025-01-01' THEN 1 END) AS dc3,
            sum(CASE WHEN ts >= TIMESTAMP '2025-01-01'
                     THEN event_id END)::BIGINT AS v3
          FROM events)
        SELECT 'w1' AS key, dc0 AS doc_count, v0 AS v FROM s
        UNION ALL SELECT 'w2', dc1, v1 FROM s
        UNION ALL SELECT 'w3', dc2, v2 FROM s
        UNION ALL SELECT 'empty', dc3, v3 FROM s
    """

    # search_aggs_missing_a2: one null-slice conditional bucket
    o["search_aggs_missing_a2"] = """
        SELECT 'no_source' AS key,
               count(CASE WHEN doc_id % 7 = 0 THEN 1 END) AS doc_count,
               round(avg(CASE WHEN doc_id % 7 = 0 THEN n_chars END), 6)
                 AS avg_chars
        FROM documents
    """

    # search_aggs_terms_opts_a2: anchored include minus exclude
    o["search_aggs_terms_opts_a2"] = """
        SELECT source AS key, count(*) AS doc_count
        FROM documents
        WHERE regexp_full_match(source, 'src1.*')
          AND NOT regexp_full_match(source, 'src1[23]')
        GROUP BY 1 ORDER BY doc_count DESC, key ASC LIMIT 20
    """

    # search_aggs_terms_mindoc_a2: HAVING before the size cut
    o["search_aggs_terms_mindoc_a2"] = """
        SELECT n_chars AS key, count(*) AS doc_count
        FROM documents GROUP BY 1 HAVING count(*) >= 3
        ORDER BY key ASC LIMIT 12
    """

    # search_aggs_adjmatrix_a2: 6 conditional cells in one scan,
    # empty cells dropped
    o["search_aggs_adjmatrix_a2"] = """
        WITH s AS MATERIALIZED (
          SELECT
            count(CASE WHEN n_chars >= 400 THEN 1 END) AS dc_big,
            round(avg(CASE WHEN n_chars >= 400 THEN n_chars END), 6) AS a_big,
            count(CASE WHEN lang = 'en' THEN 1 END) AS dc_en,
            round(avg(CASE WHEN lang = 'en' THEN n_chars END), 6) AS a_en,
            count(CASE WHEN source LIKE 'src1%' THEN 1 END) AS dc_s1,
            round(avg(CASE WHEN source LIKE 'src1%' THEN n_chars END), 6) AS a_s1,
            count(CASE WHEN n_chars >= 400 AND lang = 'en' THEN 1 END) AS dc_be,
            round(avg(CASE WHEN n_chars >= 400 AND lang = 'en'
                      THEN n_chars END), 6) AS a_be,
            count(CASE WHEN n_chars >= 400 AND source LIKE 'src1%'
                       THEN 1 END) AS dc_bs,
            round(avg(CASE WHEN n_chars >= 400 AND source LIKE 'src1%'
                      THEN n_chars END), 6) AS a_bs,
            count(CASE WHEN lang = 'en' AND source LIKE 'src1%'
                       THEN 1 END) AS dc_es,
            round(avg(CASE WHEN lang = 'en' AND source LIKE 'src1%'
                      THEN n_chars END), 6) AS a_es
          FROM documents)
        SELECT * FROM (
          SELECT 'big' AS key, dc_big AS doc_count, a_big AS avg_chars FROM s
          UNION ALL SELECT 'en', dc_en, a_en FROM s
          UNION ALL SELECT 's1', dc_s1, a_s1 FROM s
          UNION ALL SELECT 'big&en', dc_be, a_be FROM s
          UNION ALL SELECT 'big&s1', dc_bs, a_bs FROM s
          UNION ALL SELECT 'en&s1', dc_es, a_es FROM s
        ) WHERE doc_count > 0
    """

    # text_lm_moore_lewis: the KN estimator block instantiated twice
    # (in-domain en slice / whole corpus) over ONE shared transitions
    # table; ce and the difference reproduce Spark's op order exactly
    def _kn_block(sfx: str, train_where: str) -> str:
        return f"""
        tw{sfx} AS (SELECT {_SQL_WORDS} AS w FROM documents
                    WHERE {train_where}),
        tb{sfx} AS MATERIALIZED (
          SELECT bg, count(*) AS c2,
                 string_split(bg, ' ')[1] AS w1,
                 string_split(bg, ' ')[2] AS w2
          FROM (SELECT unnest([array_to_string(list_slice(w, i+1, i+2), ' ')
                               for i in range(0, len(w) - 1)]) AS bg
                FROM tw{sfx} WHERE len(w) >= 2)
          GROUP BY bg),
        uni{sfx} AS (SELECT count(DISTINCT u) AS v
                     FROM (SELECT unnest(w) AS u FROM tw{sfx})),
        tt{sfx} AS (SELECT count(*) AS t FROM tb{sfx}),
        ctx{sfx} AS (SELECT w1, sum(c2)::BIGINT AS c1, count(*) AS n1f
                     FROM tb{sfx} GROUP BY w1),
        cont{sfx} AS (SELECT w2, count(*) AS n1b FROM tb{sfx} GROUP BY w2),
        j{sfx} AS (SELECT tr.doc_id, tr.pos,
                     ln(CASE WHEN cx.c1 IS NOT NULL THEN
                          greatest(coalesce(b.c2, 0) - 0.75, 0.0) / cx.c1
                          + (0.75 * cx.n1f) / cx.c1
                            * ((coalesce(cn.n1b, 0) + 1.0)
                               / ((SELECT t FROM tt{sfx})
                                  + (SELECT v FROM uni{sfx})))
                        ELSE (coalesce(cn.n1b, 0) + 1.0)
                             / ((SELECT t FROM tt{sfx})
                                + (SELECT v FROM uni{sfx}))
                        END) AS lp
              FROM trans_all tr
              LEFT JOIN tb{sfx} b ON tr.bg = b.bg
              LEFT JOIN ctx{sfx} cx ON tr.w1 = cx.w1
              LEFT JOIN cont{sfx} cn ON tr.w2 = cn.w2),
        sc{sfx} AS (SELECT doc_id, count(*) AS n_trans,
                      round(list_reduce(
                          list_prepend(0.0, list(lp ORDER BY pos)),
                          (acc, x) -> acc + x), 6) AS sum_lp
               FROM j{sfx} GROUP BY doc_id)"""

    o["text_lm_moore_lewis"] = f"""
        WITH wall AS (SELECT doc_id, {_SQL_WORDS} AS w FROM documents),
        trans_all AS MATERIALIZED (
          SELECT doc_id, u.pos AS pos, u.bg AS bg,
                 string_split(u.bg, ' ')[1] AS w1,
                 string_split(u.bg, ' ')[2] AS w2
          FROM (SELECT doc_id,
                       unnest([{{'pos': i,
                                 'bg': array_to_string(list_slice(w, i+1, i+2), ' ')}}
                               for i in range(0, len(w) - 1)]) AS u
                FROM wall WHERE len(w) >= 2)),
        {_kn_block('i', "lang = 'en'")},
        {_kn_block('o', "1 = 1")}
        SELECT d.doc_id,
               coalesce(si.n_trans, 0)::BIGINT AS n_trans,
               round(CASE WHEN si.n_trans > 0
                          THEN -si.sum_lp / si.n_trans
                          ELSE 0.0 END, 6)::DOUBLE AS ce_in,
               round(CASE WHEN si.n_trans > 0
                          THEN -so.sum_lp / si.n_trans
                          ELSE 0.0 END, 6)::DOUBLE AS ce_out,
               round(CASE WHEN si.n_trans > 0
                          THEN (-si.sum_lp / si.n_trans)
                               - (-so.sum_lp / si.n_trans)
                          ELSE 0.0 END, 6)::DOUBLE AS ml_score
        FROM documents d
        LEFT JOIN sci si USING (doc_id)
        LEFT JOIN sco so USING (doc_id)
    """

    # text_lm_kn3_ppl: the Chen & Goodman trigram recursion — the
    # p2 continuation estimate appears twice (inside the seen-trigram
    # interpolation and as the unseen-context fallback) with the
    # IDENTICAL op sequence, so the doubles match Spark's bit-for-bit
    _KN3_PC = ("(coalesce(cn.n1b, 0) + 1.0)"
               " / ((SELECT t FROM t2) + (SELECT v FROM uni))")
    _KN3_P2 = f"""(CASE WHEN cx2.s_mid IS NOT NULL THEN
                     greatest(coalesce(m.n_mid, 0) - 0.75, 0.0) / cx2.s_mid
                     + (0.75 * cx2.k_mid) / cx2.s_mid * ({_KN3_PC})
                   ELSE {_KN3_PC} END)"""
    o["text_lm_kn3_ppl"] = f"""
        WITH w AS (SELECT doc_id, {_SQL_WORDS} AS w FROM documents),
        uni AS (SELECT count(DISTINCT u) AS v
                FROM (SELECT unnest(w) AS u FROM w)),
        bg2 AS MATERIALIZED (
          SELECT bg, count(*) AS c2, string_split(bg, ' ')[2] AS w3
          FROM (SELECT unnest([array_to_string(list_slice(w, i+1, i+2), ' ')
                               for i in range(0, len(w) - 1)]) AS bg
                FROM w WHERE len(w) >= 2)
          GROUP BY bg),
        t2 AS (SELECT count(*) AS t FROM bg2),
        cont AS (SELECT w3, count(*) AS n1b FROM bg2 GROUP BY w3),
        trans AS MATERIALIZED (
          SELECT doc_id, u.pos AS pos, u.tg AS tg,
                 array_to_string(list_slice(string_split(u.tg, ' '), 1, 2),
                                 ' ') AS w12,
                 array_to_string(list_slice(string_split(u.tg, ' '), 2, 3),
                                 ' ') AS w23,
                 string_split(u.tg, ' ')[2] AS w2,
                 string_split(u.tg, ' ')[3] AS w3
          FROM (SELECT doc_id,
                       unnest([{{'pos': i,
                                 'tg': array_to_string(list_slice(w, i+1, i+3), ' ')}}
                               for i in range(0, len(w) - 2)]) AS u
                FROM w WHERE len(w) >= 3)),
        tb3 AS MATERIALIZED (
          SELECT tg, count(*) AS c3,
                 array_to_string(list_slice(string_split(tg, ' '), 1, 2),
                                 ' ') AS w12,
                 array_to_string(list_slice(string_split(tg, ' '), 2, 3),
                                 ' ') AS w23,
                 string_split(tg, ' ')[2] AS w2
          FROM trans GROUP BY tg),
        ctx3 AS (SELECT w12, sum(c3)::BIGINT AS c12, count(*) AS n1f12
                 FROM tb3 GROUP BY w12),
        cb AS MATERIALIZED (
          SELECT w23, count(*) AS n_mid, any_value(w2) AS w2
          FROM tb3 GROUP BY w23),
        ctx2 AS (SELECT w2, count(*) AS k_mid, sum(n_mid)::BIGINT AS s_mid
                 FROM cb GROUP BY w2),
        j AS (SELECT tr.doc_id, tr.pos,
                 ln(CASE WHEN cx3.c12 IS NOT NULL THEN
                      greatest(coalesce(b3.c3, 0) - 0.75, 0.0) / cx3.c12
                      + (0.75 * cx3.n1f12) / cx3.c12 * {_KN3_P2}
                    ELSE {_KN3_P2} END) AS lp
              FROM trans tr
              LEFT JOIN tb3 b3 ON tr.tg = b3.tg
              LEFT JOIN ctx3 cx3 ON tr.w12 = cx3.w12
              LEFT JOIN cb m ON tr.w23 = m.w23
              LEFT JOIN ctx2 cx2 ON tr.w2 = cx2.w2
              LEFT JOIN cont cn ON tr.w3 = cn.w3),
        sc AS (SELECT doc_id, count(*) AS n_trans,
                      list_reduce(list_prepend(0.0, list(lp ORDER BY pos)),
                                  (acc, x) -> acc + x) AS sum_lp
               FROM j GROUP BY doc_id)
        SELECT d.doc_id,
               coalesce(s.n_trans, 0)::BIGINT AS n_trans,
               round(coalesce(s.sum_lp, 0.0), 6)::DOUBLE AS sum_logp,
               round(CASE WHEN s.n_trans > 0 THEN exp(-s.sum_lp / s.n_trans)
                          ELSE 0.0 END, 6)::DOUBLE AS ppl
        FROM documents d LEFT JOIN sc s USING (doc_id)
    """

    # search_aggs_pipeline3_a2: lag-2 diff + whole-series sibling
    # stats/median over the filled histogram series
    o["search_aggs_pipeline3_a2"] = """
        WITH b AS MATERIALIZED (
          SELECT (floor(n_chars / 50.0) * 50.0)::DOUBLE AS key,
                 count(*) AS doc_count
          FROM documents GROUP BY 1),
        dom AS (
          SELECT (unnest(range(
                   (SELECT floor(min(key) / 50.0)::BIGINT FROM b),
                   (SELECT floor(max(key) / 50.0)::BIGINT FROM b) + 1))
                  * 50.0)::DOUBLE AS key),
        f AS (
          SELECT dom.key, coalesce(b.doc_count, 0) AS doc_count
          FROM dom LEFT JOIN b ON b.key = dom.key)
        SELECT key, doc_count,
               doc_count - lag(doc_count, 2) OVER (ORDER BY key) AS sd2,
               count(doc_count) OVER () AS st_count,
               min(doc_count) OVER () AS st_min,
               max(doc_count) OVER () AS st_max,
               round(avg(doc_count) OVER (), 6) AS st_avg,
               sum(doc_count) OVER ()::BIGINT AS st_sum,
               round(quantile_cont(doc_count, 0.5) OVER (), 6) AS pb_p50
        FROM f ORDER BY key
    """

    # search_aggs_fixedhist_a2: 12h epoch floor; weighted avg =
    # Σ(v·w)::BIGINT / Σ(w)::BIGINT, BIGINT float division
    o["search_aggs_fixedhist_a2"] = """
        SELECT strftime(to_timestamp((epoch(ts)::BIGINT // 43200)
                                     * 43200), '%Y-%m-%d %H:%M:%S') AS key,
               count(*) AS doc_count,
               round(sum(event_id * user_id)::BIGINT
                     / sum(user_id)::BIGINT, 6) AS wa
        FROM events GROUP BY 1 ORDER BY key
    """

    # search_aggs_histopts_a2: offset grid, domain widened to the
    # extended bounds
    o["search_aggs_histopts_a2"] = """
        WITH b AS MATERIALIZED (
          SELECT (floor((n_chars - 25.0) / 100.0) * 100.0 + 25.0)::DOUBLE
                   AS key,
                 count(*) AS doc_count
          FROM documents GROUP BY 1),
        dom AS (
          SELECT (unnest(range(
                   least((SELECT floor((min(key) - 25.0) / 100.0)::BIGINT
                          FROM b), -2),
                   greatest((SELECT floor((max(key) - 25.0) / 100.0)::BIGINT
                             FROM b), 7) + 1))
                  * 100.0 + 25.0)::DOUBLE AS key)
        SELECT dom.key AS key, coalesce(b.doc_count, 0) AS doc_count
        FROM dom LEFT JOIN b ON b.key = dom.key
        ORDER BY dom.key
    """

    # search_aggs_pctranks_a2: exact inverse percentiles — the same
    # count/count*100 op order as the Spark expression
    o["search_aggs_pctranks_a2"] = """
        SELECT lang AS key, count(*) AS doc_count,
               round(count(CASE WHEN n_chars <= 200 THEN 1 END)
                     / count(n_chars) * 100.0, 6) AS cr_r200,
               round(count(CASE WHEN n_chars <= 400 THEN 1 END)
                     / count(n_chars) * 100.0, 6) AS cr_r400
        FROM documents GROUP BY 1
        ORDER BY doc_count DESC, key ASC LIMIT 10
    """

    # agg_events_sessions: gaps-and-islands — break strictly when the
    # gap EXCEEDS 30 min (exact-gap extends, Spark's session_window
    # boundary), end = last event + gap
    o["agg_events_sessions"] = """
        WITH x AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS brk
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        y AS (SELECT user_id, ts, event_id,
                     sum(brk) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
              FROM x)
        SELECT user_id,
               epoch_us(min(ts)) AS session_start_us,
               epoch_us(max(ts)) + 1800000000 AS session_end_us,
               count(*) AS n_events,
               sum(event_id)::BIGINT AS sum_event_id
        FROM y GROUP BY user_id, sid
    """

    # search_sig_terms_scoped: JLH over a keyword field, fg = the
    # request query, bg = everything
    o["search_sig_terms_scoped"] = """
        WITH b AS (SELECT source,
                          CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS fg
                   FROM documents),
        s AS (SELECT count(*)::DOUBLE AS n_all, sum(fg)::DOUBLE AS n_fg
              FROM b),
        tc AS (SELECT source AS key, count(*)::BIGINT AS bg_count,
                      sum(fg)::BIGINT AS fg_count
               FROM b GROUP BY 1),
        j AS (SELECT key, fg_count, bg_count,
                     fg_count / s.n_fg AS fgp,
                     bg_count / s.n_all AS bgp
              FROM tc, s)
        SELECT key, fg_count, bg_count,
               round((fgp - bgp) * (fgp / bgp), 6) AS score
        FROM j
        WHERE fgp > bgp AND fg_count >= 3
              AND round((fgp - bgp) * (fgp / bgp), 6) > 0
        ORDER BY score DESC, key ASC LIMIT 10
    """

    # search_aggs_autodatehist_a2: the 7d tier the ladder picks for a
    # one-month span at buckets=12 — weekly epoch-floor buckets
    o["search_aggs_autodatehist_a2"] = """
        SELECT strftime(to_timestamp((epoch(ts)::BIGINT // 604800)
                                     * 604800), '%Y-%m-%d %H:%M:%S') AS key,
               count(*) AS doc_count,
               count(DISTINCT user_id) AS n_users,
               '7d' AS interval
        FROM events GROUP BY 1 ORDER BY key
    """

    # search_request_after: keyset page 2 ≡ offset rows 6-10 on a
    # static corpus (the Spark side genuinely runs the cursor filter)
    o["search_request_after"] = """
        WITH ranked AS (
          SELECT doc_id AS id, n_chars,
                 row_number() OVER (ORDER BY n_chars DESC, doc_id ASC) AS rn
          FROM documents WHERE lang = 'en')
        SELECT id, n_chars FROM ranked WHERE rn > 5 AND rn <= 10
    """

    # search_request_postfilter: hits = query AND post_filter
    o["search_request_postfilter"] = """
        SELECT doc_id AS id FROM documents
        WHERE lang = 'en' AND n_chars >= 400
    """

    # search_request_collapse: best hit per lang, then global top-k
    o["search_request_collapse"] = f"""
        WITH t AS (SELECT doc_id AS id, lang, {_antoks("text")} AS toks
                   FROM documents),
        s AS (SELECT id, lang,
                     len(list_filter(toks, x -> x = 'spark'))::DOUBLE AS score
              FROM t),
        c AS (SELECT id, lang, score,
                     row_number() OVER (PARTITION BY lang
                                        ORDER BY score DESC, id ASC) AS rn
              FROM s WHERE score > 0)
        SELECT id, lang, score FROM c WHERE rn = 1
        ORDER BY score DESC, id ASC LIMIT 10
    """

    # search_request_rescore: same window cut, same combine op order
    # (score·qw + CASE matched THEN round(pc,6) ELSE 0 END·rqw, round 6)
    o["search_request_rescore"] = f"""
        WITH t AS (SELECT doc_id AS id, {_antoks("text")} AS toks
                   FROM documents),
        s AS (SELECT id, toks,
                     len(list_filter(toks, x -> x = 'spark'))::DOUBLE AS score
              FROM t WHERE len(list_filter(toks, x -> x = 'spark')) > 0),
        w AS (SELECT id, toks, score,
                     row_number() OVER (ORDER BY score DESC, id ASC) AS rn
              FROM s QUALIFY rn <= 20),
        r AS (SELECT id,
                     round(score * 1.0
                           + CASE WHEN len(toks) >= 2 AND
                                       len([i for i in range(1, len(toks))
                                            if toks[i:i+1] = ['window', 'batch']]) > 0
                                  THEN round(len([i for i in range(1, len(toks))
                                                  if toks[i:i+1] = ['window', 'batch']])::DOUBLE, 6)
                                  ELSE 0.0 END * 2.0, 6) AS score
              FROM w)
        SELECT id, score FROM r ORDER BY score DESC, id ASC LIMIT 10
    """

    # search_request_global: whole-index terms despite the fr query
    o["search_request_global"] = """
        SELECT lang AS key, count(*) AS doc_count
        FROM documents GROUP BY 1
        ORDER BY doc_count DESC, key ASC LIMIT 10
    """

    # search_aggs_tophits_a2: per-bucket window row_number, _source
    # tie-break, outer terms ordering then hit rank
    o["search_aggs_tophits_a2"] = """
        WITH b AS MATERIALIZED (
          SELECT lang AS key, count(*) AS doc_count
          FROM documents GROUP BY 1
          ORDER BY doc_count DESC, key ASC LIMIT 3),
        h AS (
          SELECT lang AS key, doc_id, n_chars,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY n_chars DESC, doc_id, n_chars) AS longest_rank
          FROM documents)
        SELECT b.key, b.doc_count, h.longest_rank, h.doc_id, h.n_chars
        FROM b JOIN h ON h.key = b.key AND h.longest_rank <= 2
        ORDER BY b.doc_count DESC, b.key ASC, h.longest_rank
    """

    # search_aggs_composite_a2: keyset pagination = row-value compare
    o["search_aggs_composite_a2"] = """
        SELECT lang, source AS src, count(*) AS doc_count,
               round(avg(n_chars), 6) AS avg_chars
        FROM documents
        GROUP BY lang, source
        HAVING (lang, source) > ('en', 'src12')
        ORDER BY lang, src LIMIT 6
    """

    # search_request_aggs: the terms agg over the bool-filtered scope
    o["search_request_aggs"] = f"""
        WITH t AS (SELECT lang, n_chars, {_antoks("text")} AS toks
                   FROM documents WHERE n_chars >= 150),
        m AS (SELECT lang, n_chars FROM t WHERE {_antf("toks", "data")} > 0)
        SELECT lang AS key, count(*) AS doc_count,
               round(avg(n_chars), 6) AS avg_chars
        FROM m GROUP BY 1
        ORDER BY doc_count DESC, key ASC LIMIT 4
    """

    # search_bool_misc: regexp anchored on source, even ids < 400,
    # exists(lang), prefix(src); score = match TF + regexp hit
    o["search_bool_misc"] = f"""
        WITH t AS (SELECT doc_id AS id, source, lang, {_antoks("text")} AS toks
                   FROM documents),
        s AS (SELECT id, source, lang, {_antf("toks", "data")} AS tf_data
              FROM t)
        SELECT id,
               round(tf_data
                     + CASE WHEN regexp_matches(source, '^(?:src[0-9])$')
                            THEN 1 ELSE 0 END, 6)::DOUBLE AS score
        FROM s
        WHERE tf_data > 0
          AND id % 2 = 0 AND id < 400
          AND lang IS NOT NULL
          AND source LIKE 'src%'
        ORDER BY score DESC, id ASC LIMIT 20
    """

    # search_aggs_filters_a2: one conditional aggregate per named
    # filter clause (match TF predicate re-derived on analyzed tokens)
    o["search_aggs_filters_a2"] = f"""
        WITH t AS (SELECT n_chars, lang, {_antoks("text")} AS toks
                   FROM documents),
        s AS MATERIALIZED (
          SELECT
            count(CASE WHEN {_antf("toks", "table")} > 0 THEN 1 END) AS dc0,
            round(avg(CASE WHEN {_antf("toks", "table")} > 0 THEN n_chars END), 6) AS a0,
            count(CASE WHEN n_chars >= 300 THEN 1 END) AS dc1,
            round(avg(CASE WHEN n_chars >= 300 THEN n_chars END), 6) AS a1,
            count(CASE WHEN lang = 'en' AND n_chars < 200 THEN 1 END) AS dc2,
            round(avg(CASE WHEN lang = 'en' AND n_chars < 200 THEN n_chars END), 6) AS a2
          FROM t)
        SELECT 'mentions_table' AS key, dc0 AS doc_count, a0 AS avg_chars FROM s
        UNION ALL SELECT 'long_docs', dc1, a1 FROM s
        UNION ALL SELECT 'short_en', dc2, a2 FROM s
    """

    # search_aggs_stats_a2: stats components + quantile_cont (linear
    # interpolation, same convention as Spark's exact percentile)
    o["search_aggs_stats_a2"] = """
        SELECT lang AS key, count(*) AS doc_count,
               count(n_chars) AS chars_count,
               min(n_chars) AS chars_min,
               max(n_chars) AS chars_max,
               round(avg(n_chars), 6) AS chars_avg,
               sum(n_chars)::BIGINT AS chars_sum,
               round(quantile_cont(n_chars, 0.50), 6) AS chars_pct_p50,
               round(quantile_cont(n_chars, 0.95), 6) AS chars_pct_p95
        FROM documents GROUP BY 1
        ORDER BY doc_count DESC, key ASC LIMIT 3
    """

    # search_aggs_range_a2: conditional aggregates per declared range
    # (overlap + empty-bucket semantics), unpivoted via UNION ALL
    o["search_aggs_range_a2"] = """
        WITH s AS MATERIALIZED (
          SELECT
            count(CASE WHEN n_chars < 150 THEN 1 END) AS dc0,
            round(avg(CASE WHEN n_chars < 150 THEN n_chars END), 6) AS a0,
            count(CASE WHEN n_chars >= 150 AND n_chars < 300 THEN 1 END) AS dc1,
            round(avg(CASE WHEN n_chars >= 150 AND n_chars < 300 THEN n_chars END), 6) AS a1,
            count(CASE WHEN n_chars >= 250 AND n_chars < 400 THEN 1 END) AS dc2,
            round(avg(CASE WHEN n_chars >= 250 AND n_chars < 400 THEN n_chars END), 6) AS a2,
            count(CASE WHEN n_chars >= 400 THEN 1 END) AS dc3,
            round(avg(CASE WHEN n_chars >= 400 THEN n_chars END), 6) AS a3
          FROM documents)
        SELECT '*-150' AS key, dc0 AS doc_count, a0 AS avg_chars FROM s
        UNION ALL SELECT '150-300', dc1, a1 FROM s
        UNION ALL SELECT '250-400', dc2, a2 FROM s
        UNION ALL SELECT '400-*', dc3, a3 FROM s
    """

    # search_bool_wildcard: query_string expands to must(table,
    # scan|merge) + must_not(batch); score = matching TFs summed;
    # wildcard filter = anchored regex on raw source (no score)
    o["search_bool_wildcard"] = f"""
        WITH t AS (SELECT doc_id AS id, source, {_antoks("text")} AS toks
                   FROM documents),
        s AS (SELECT id, source,
                     {_antf("toks", "table")} AS tf_table,
                     {_antf("toks", "scan")} AS tf_scan,
                     {_antf("toks", "merge")} AS tf_merge,
                     {_antf("toks", "batch")} AS tf_batch
              FROM t)
        SELECT id, round(tf_table + tf_scan + tf_merge, 6)::DOUBLE AS score
        FROM s
        WHERE tf_table > 0 AND (tf_scan > 0 OR tf_merge > 0)
          AND tf_batch = 0
          AND regexp_matches(source, '^src.3.*$')
        ORDER BY score DESC, id ASC LIMIT 15
    """

    # search_aggs_nested_a2: outer terms(lang) top-3, inner
    # terms(source) top-2 per lang via a window over the aggregated
    # buckets, inner max metric namespaced under the sub-agg name
    o["search_aggs_nested_a2"] = """
        WITH outer_b AS MATERIALIZED (
          SELECT lang AS key, count(*) AS doc_count,
                 round(avg(n_chars), 6) AS avg_chars
          FROM documents GROUP BY 1
          ORDER BY doc_count DESC, key ASC LIMIT 3),
        inner_b AS (
          SELECT lang AS key, source AS by_source_key,
                 count(*) AS by_source_doc_count,
                 max(n_chars) AS by_source_max_chars,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY count(*) DESC, source ASC) AS rk
          FROM documents GROUP BY 1, 2)
        SELECT o.key, o.doc_count, o.avg_chars,
               i.by_source_key, i.by_source_doc_count, i.by_source_max_chars
        FROM outer_b o LEFT JOIN inner_b i ON i.key = o.key AND i.rk <= 2
        ORDER BY o.doc_count DESC, o.key ASC,
                 i.by_source_doc_count DESC, i.by_source_key ASC
    """

    # search_aggs_histogram_a2: interval buckets over n_chars, empty
    # buckets between data min and max emitted with doc_count 0
    o["search_aggs_histogram_a2"] = """
        WITH b AS MATERIALIZED (
          SELECT (floor(n_chars / 50.0) * 50.0)::DOUBLE AS key,
                 count(*) AS doc_count,
                 round(avg(n_chars), 6) AS avg_chars
          FROM documents GROUP BY 1),
        dom AS (
          SELECT (unnest(range(
                   (SELECT floor(min(key) / 50.0)::BIGINT FROM b),
                   (SELECT floor(max(key) / 50.0)::BIGINT FROM b) + 1))
                  * 50.0)::DOUBLE AS key)
        SELECT dom.key, coalesce(b.doc_count, 0) AS doc_count, b.avg_chars
        FROM dom LEFT JOIN b ON b.key = dom.key
        ORDER BY dom.key
    """

    o["dedup_simhash"] = (
        r"""
        WITH aug AS (%s),
        w AS (
          SELECT doc_id,
                 unnest(list_filter(
                   regexp_split_to_array(lower(regexp_replace(text, '[^a-z0-9\s]', ' ', 'g')), '\s+'),
                   x -> x <> '')) AS word
          FROM aug
        ), h AS (
          SELECT doc_id, ('0x' || substr(md5(word), 1, 16))::UBIGINT AS hv FROM w
        ), bits AS (
          SELECT doc_id, j,
                 SUM(CASE WHEN (hv >> j) & 1 = 1 THEN 1 ELSE -1 END) AS vote
          FROM h, range(64) t(j)
          GROUP BY doc_id, j
        ), sh AS (
          SELECT doc_id,
                 SUM(CASE WHEN vote > 0 THEN (1::UBIGINT << j) ELSE 0::UBIGINT END)::UBIGINT AS sh
          FROM bits GROUP BY doc_id
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               bit_count(xor(a.sh, b.sh)) AS hamming
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sh, b.sh)) <= 3
    """
        % _SQL_AUG_NEAR
    )

    # F1/C1/E-series/V-series flagship: every column of the fused
    # extraction kernel re-derived from documents by pure SQL — no DOM,
    # no selector engine. Closed forms mirror synth.build_html +
    # extract/validate semantics: title = 'Synthetic document {d}: ' +
    # first 6 words; body = whitespace-normalized text padded with the
    # 121-char/20-word pad sentence until len>=400 AND words>=55
    # (n_pads has a closed form, no loop); word_count = title words +
    # 9 fixed template words + body words; V1 trips on /category/ urls,
    # V6 on short (doc_id%23=5) bodies with the exact reason strings;
    # links = nav anchor + 4 junk + fanout(3+d%3) + off-domain (d%6=2).
    o["crawl_extract_articles"] = r"""
        WITH m AS (
          SELECT doc_id AS d,
                 trim(regexp_replace(text, '\s+', ' ', 'g')) AS norm
          FROM documents
        ), b AS (
          SELECT d, norm,
                 length(norm) AS c0,
                 len(list_filter(regexp_split_to_array(norm, ' '), x -> x <> '')) AS w0,
                 CASE WHEN d % 4 = 0 THEN 'site00.example.com'
                      ELSE 'site' || lpad((1 + (d % 15))::VARCHAR, 2, '0') || '.example.com'
                 END AS host,
                 (d % 3 <> 0) AS is_article,
                 (d % 17 = 3) AS is_category,
                 (d % 23 = 5) AS is_short,
                 3 + d % 3 AS fanout
          FROM m
        ), u AS (
          SELECT *,
                 'https://' || host ||
                   (CASE WHEN is_category THEN '/category/'
                         WHEN is_article THEN '/article/' ELSE '/page/' END) || d AS url,
                 CASE WHEN norm = '' THEN 'Synthetic document ' || d
                      ELSE 'Synthetic document ' || d || ': ' ||
                           array_to_string(list_slice(
                             list_filter(regexp_split_to_array(norm, ' '), x -> x <> ''),
                             1, 6), ' ')
                 END AS title,
                 CASE WHEN is_short THEN NULL
                      WHEN norm = '' THEN 4
                      ELSE greatest(0,
                        CASE WHEN c0 >= 400 THEN 0 ELSE (400 - c0 + 121) // 122 END,
                        CASE WHEN w0 >= 55 THEN 0 ELSE (55 - w0 + 19) // 20 END)
                 END AS n_pads
          FROM b
        ), w AS (
          SELECT *,
                 CASE WHEN is_short THEN
                        CASE WHEN norm = '' THEN 2
                             ELSE len(list_filter(regexp_split_to_array(
                                    trim(substr(norm, 1, 60)), ' '), x -> x <> '')) END
                      WHEN norm = '' THEN 80
                      ELSE w0 + 20 * n_pads END AS body_words,
                 CASE WHEN is_short THEN
                        CASE WHEN norm = '' THEN 9
                             ELSE length(trim(substr(norm, 1, 60))) END
                      WHEN norm = '' THEN 487
                      ELSE least(c0 + 122 * n_pads, 50000) END AS body_chars
          FROM u
        ), v AS (
          SELECT *,
                 len(list_filter(regexp_split_to_array(title, ' '), x -> x <> ''))
                   + 9 + body_words AS wc,
                 length(title) + 1
                   + length('Intro paragraph for document ' || d || '.') + 1
                   + length('Reporter ' || (d % 11)) + 1
                   + length('section-' || (d % 5)) + 1
                   + length('published') + 1
                   + body_chars AS assembled_len
          FROM w
        )
        SELECT url,
               CASE WHEN is_article THEN 'article' ELSE 'page' END AS content_type,
               CASE WHEN is_article THEN sha256(url) ELSE '' END AS article_id,
               CASE WHEN is_article THEN wc ELSE -1 END AS word_count,
               CASE WHEN NOT is_article THEN TRUE
                    WHEN is_category THEN FALSE
                    WHEN assembled_len < 100 THEN FALSE
                    WHEN wc < 50 THEN FALSE
                    ELSE TRUE END AS article_valid,
               CASE WHEN NOT is_article THEN ''
                    WHEN is_category THEN 'URL matches skip pattern: /category/'
                    WHEN assembled_len < 100 THEN
                      'Content too short: ' || assembled_len || ' characters (minimum 100)'
                    WHEN wc < 50 THEN
                      'Word count too low: ' || wc || ' words (minimum 50)'
                    ELSE '' END AS skip_reason,
               5 + fanout + (CASE WHEN d % 6 = 2 THEN 1 ELSE 0 END) AS n_links
        FROM v
    """

    # P3 politeness pop: a pure deterministic per-domain top-k — the
    # salted two-stage window must equal one exact window (P4), so the
    # oracle IS the single-window form.
    o["crawl_frontier_pop"] = """
        WITH f AS (
          SELECT 'https://site' || lpad((doc_id % 7)::VARCHAR, 2, '0')
                   || '.example.com/doc/' || doc_id AS url,
                 'site' || lpad((doc_id % 7)::VARCHAR, 2, '0') || '.example.com' AS domain,
                 (doc_id % 10) AS priority,
                 doc_id AS discovery_seq
          FROM documents
        ), r AS (
          SELECT url, domain, priority,
                 row_number() OVER (
                   PARTITION BY domain
                   ORDER BY priority DESC, discovery_seq ASC, sha256(url) ASC) AS rn
          FROM f
        )
        SELECT url, domain, priority FROM r WHERE rn <= 5
    """

    o["robots_gate_s3"] = r"""
        WITH u AS (
          SELECT doc_id,
                 doc_id % 16 AS hi,
                 CASE doc_id % 4
                   WHEN 0 THEN '/article/' || doc_id
                   WHEN 1 THEN '/category/' || doc_id
                   WHEN 2 THEN '/page/' || doc_id
                   ELSE '/page/1' || doc_id
                 END AS path
          FROM documents
        )
        SELECT doc_id,
               'https://site' || lpad(hi::VARCHAR, 2, '0') || '.example.com' || path AS url
        FROM u
        WHERE CASE
          -- longest-match semantics of synth_robots' ruleset:
          -- Disallow /category/ everywhere; hosts hi%3=0 add
          -- Disallow /page/ + Allow /page/1; hosts hi%5=2 Disallow /
          WHEN path LIKE '/category/%' THEN FALSE
          WHEN hi % 3 = 0 AND path LIKE '/page/1%' THEN TRUE
          WHEN hi % 3 = 0 AND path LIKE '/page/%' THEN FALSE
          WHEN hi % 5 = 2 THEN FALSE
          ELSE TRUE END
    """

    o["parse_date_e10"] = r"""
        WITH t AS (
          SELECT doc_id,
                 TIMESTAMP '2023-01-01 00:00:00'
                   + to_days((doc_id % 365)::INT)
                   + to_hours((doc_id % 24)::INT) AS ts
          FROM documents
        )
        SELECT doc_id,
               CASE doc_id % 4
                 WHEN 0 THEN strftime(ts, '%Y-%m-%dT%H:%M:%SZ')
                 WHEN 1 THEN strftime(ts, '%Y-%m-%d')
                 WHEN 2 THEN strftime(ts, '%Y-%m-%d %H:%M:%S')
                 ELSE strftime(ts, '%Y-%m-%dT%H:%M:%S')
               END AS date_str,
               CASE doc_id % 4 WHEN 1 THEN date_trunc('day', ts) ELSE ts END AS parsed
        FROM t
    """

    o["prepare_v9"] = r"""
        WITH a AS (
          SELECT doc_id,
                 'Doc ' || doc_id AS title,
                 CASE WHEN doc_id % 2 = 0 THEN 'Doc ' || doc_id
                      ELSE 'OG ' || doc_id END AS og_title_raw,
                 CASE WHEN doc_id % 3 = 0 THEN '   '
                      ELSE 'desc ' || doc_id END AS desc_raw,
                 ['tag' || (doc_id % 5), ' tag' || (doc_id % 5) || ' ',
                  'x' || (doc_id % 3), ''] AS tags_raw
          FROM documents
        ), b AS (
          SELECT doc_id, title, og_title_raw, desc_raw,
                 list_transform(tags_raw, x -> trim(x)) AS tr
          FROM a
        ), c AS (
          SELECT doc_id, title, og_title_raw, desc_raw,
                 list_filter(tr, (x, i) -> x <> '' AND list_position(tr, x) = i) AS tags
          FROM b
        )
        SELECT doc_id,
               CASE WHEN trim(og_title_raw) = trim(title) THEN '' ELSE og_title_raw END AS og_title,
               CASE WHEN trim(desc_raw) = '' THEN '' ELSE desc_raw END AS description,
               CASE WHEN len(tags) = 0 THEN NULL
                    ELSE array_to_string(tags, '|') END AS tags_s
        FROM c
    """

    # --- multimodal: payload layouts re-derived in closed form ---
    # image payload = PNG(sig 8 + IHDR 25 + IDAT 12+16·reps + IEND 12),
    # audio = WAV(44-byte header + 2000·reps data @ 16 kB/s), video =
    # raw md5-digest·reps; reps = 4 + doc_id%13 (multimodal.synth_media).
    # payload_sha is sha256 over UPPERCASE HEX of the payload (module
    # doc); md5() returns lowercase hex in both engines.
    o["media_features"] = """
        SELECT doc_id * 10 + 3 AS media_id,
               sha256(upper(repeat(md5(text), 4 + doc_id % 13))) AS payload_sha,
               (16 * (4 + doc_id % 13))::BIGINT AS n_bytes,
               (1000 + doc_id % 9000)::INT AS duration_ms,
               greatest(1, (1000 + doc_id % 9000) // 1000)::INT AS frames_sampled
        FROM documents
    """

    # media_phash_pairs: closed-form video payload_sha (as in
    # media_features), bit i = MSB of digest byte i (hex digit 2i >=
    # 8), 4x8-bit band blocking, exact hamming <= 3
    o["media_phash_pairs"] = """
        WITH d AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 130000, text FROM documents WHERE doc_id < 50),
        m AS MATERIALIZED (
          SELECT doc_id * 10 + 3 AS media_id,
                 sha256(upper(repeat(md5(text), 4 + doc_id % 13))) AS sha
          FROM d),
        h AS MATERIALIZED (
          SELECT media_id,
                 list_transform(range(0, 32), i ->
                   CASE WHEN strpos('89abcdef', substr(sha, 2*i + 1, 1)) > 0
                        THEN 1 ELSE 0 END) AS bits
          FROM m),
        bk AS (
          SELECT media_id, b.b AS band,
                 array_to_string(list_transform(range(0, 8),
                   j -> bits[b.b * 8 + j + 1]::VARCHAR), '') AS key
          FROM h, (SELECT unnest(range(0, 4)) AS b) b),
        cand AS (
          SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b
          FROM bk a JOIN bk b USING (band, key)
          WHERE a.media_id < b.media_id),
        scored AS (
          SELECT id_a, id_b,
                 len(list_filter(range(1, 33),
                     i -> ha.bits[i] <> hb.bits[i])) AS hamming
          FROM cand
          JOIN h ha ON ha.media_id = cand.id_a
          JOIN h hb ON hb.media_id = cand.id_b)
        SELECT id_a, id_b, hamming FROM scored WHERE hamming <= 3
    """

    # media_decode: the decoder's integer stats, closed-form — the
    # synth tiles the md5 digest into the pixel array (3·w·h bytes,
    # both dims multiples of 32 so the 48-byte channel cycle and the
    # 16-byte digest cycle divide it exactly) and into 2000·reps WAV
    # data bytes (8-sample digest cycle)
    _db = (
        "list_transform(range(0, 16), i ->"
        " (strpos('0123456789abcdef', substr(md5(text), 2*i+1, 1)) - 1) * 16"
        " + (strpos('0123456789abcdef', substr(md5(text), 2*i+2, 1)) - 1))"
    )

    def _chsum(c: int) -> str:
        return (
            f"list_sum(list_transform(list_filter(range(0, 48),"
            f" q -> q % 3 = {c}), q -> db[(q % 16) + 1]))::BIGINT"
        )

    o["media_decode"] = f"""
        WITH d AS MATERIALIZED (
          SELECT doc_id, {_db} AS db FROM documents),
        img AS (
          SELECT doc_id, db,
                 (64 + (doc_id % 8) * 32) AS w,
                 (64 + (doc_id % 5) * 32) AS h
          FROM d),
        imgstats AS (
          SELECT doc_id, w, h, (3 * w * h)::BIGINT AS p,
                 list_sum(db)::BIGINT AS dsum,
                 list_aggregate(db, 'min')::INT AS dmin,
                 list_aggregate(db, 'max')::INT AS dmax,
                 {_chsum(0)} AS s0, {_chsum(1)} AS s1, {_chsum(2)} AS s2
          FROM img),
        aud AS (
          SELECT doc_id, (4 + doc_id % 13) AS reps,
                 list_transform(range(0, 8), j ->
                   CASE WHEN db[2*j + 1] + 256 * db[2*j + 2] >= 32768
                        THEN db[2*j + 1] + 256 * db[2*j + 2] - 65536
                        ELSE db[2*j + 1] + 256 * db[2*j + 2] END) AS sv
          FROM d)
        SELECT doc_id * 10 + 5 AS media_id, 'bmp' AS modality,
               'bmp' AS codec, w::INT AS width, h::INT AS height,
               p AS n_values, (p // 16 * dsum)::BIGINT AS value_sum,
               dmin AS value_min, dmax AS value_max,
               (p // 48 * s0)::BIGINT AS sum_c0,
               (p // 48 * s1)::BIGINT AS sum_c1,
               (p // 48 * s2)::BIGINT AS sum_c2
        FROM imgstats
        UNION ALL
        SELECT doc_id * 10 + 6, 'ppm', 'ppm', w::INT, h::INT,
               p, (p // 16 * dsum)::BIGINT, dmin, dmax,
               (p // 48 * s0)::BIGINT, (p // 48 * s1)::BIGINT,
               (p // 48 * s2)::BIGINT
        FROM imgstats
        UNION ALL
        SELECT doc_id * 10 + 2, 'audio', 'pcm_wav', -1, -1,
               (1000 * reps)::BIGINT,
               (125 * reps * list_sum(sv))::BIGINT,
               list_aggregate(sv, 'min')::INT,
               list_aggregate(sv, 'max')::INT,
               (-1)::BIGINT, (-1)::BIGINT, (-1)::BIGINT
        FROM aud
    """

    o["media_parse"] = """
        SELECT doc_id * 10 + 1 AS media_id, 'image' AS modality,
               (64 + (doc_id % 8) * 32)::INT AS width,
               (64 + (doc_id % 5) * 32)::INT AS height,
               (-1)::INT AS duration_ms,
               (57 + 16 * (4 + doc_id % 13))::BIGINT AS n_bytes
        FROM documents
        UNION ALL
        SELECT doc_id * 10 + 4, 'jpeg',
               (64 + (doc_id % 8) * 32)::INT,
               (64 + (doc_id % 5) * 32)::INT,
               (-1)::INT,
               (55 + 16 * (4 + doc_id % 13))::BIGINT
        FROM documents
        UNION ALL
        SELECT doc_id * 10 + 2, 'audio', -1, -1,
               (125 * (4 + doc_id % 13))::INT,
               (44 + 2000 * (4 + doc_id % 13))::BIGINT
        FROM documents
    """

    o["media_stats"] = """
        SELECT 'image' AS modality, count(*) AS n_media,
               sum(57 + 16 * (4 + doc_id % 13))::BIGINT AS total_bytes,
               count(*)::BIGINT AS total_frames,
               count(DISTINCT md5(text) || '#' || (doc_id % 13) || '#'
                     || (doc_id % 8) || '#' || (doc_id % 5)) AS distinct_payloads
        FROM documents
        UNION ALL
        SELECT 'audio', count(*),
               sum(44 + 2000 * (4 + doc_id % 13))::BIGINT,
               sum(greatest(1, (125 * (4 + doc_id % 13)) // 1000))::BIGINT,
               count(DISTINCT md5(text) || '#' || (doc_id % 13))
        FROM documents
    """

    o["upsert_articles_s5"] = """
        SELECT doc_id, version, source FROM (
          SELECT doc_id, 0 AS version, source FROM documents
          UNION ALL
          SELECT doc_id, 1 AS version, 'updated' AS source
          FROM documents WHERE doc_id % 10 = 0
        ) QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY version DESC) = 1
    """

    o["get_document_s8"] = """
        SELECT sha256('https://example.com/doc/' || doc_id) AS id,
               doc_id, source, sha256(text) AS text_sha
        FROM documents WHERE doc_id IN (7, 42, 421)
    """

    # E15: supports re-derived from the fixture templates — article
    # pages (doc_id%3<>0) carry article/og:*/time/p.lead, plain pages
    # carry main/.content/.sidebar, both carry h1/title/script/nav
    # (synth.build_html); min_support 0.2, score = support×confidence.
    o["discover_selectors_e15"] = """
        WITH c AS (
          SELECT count(*)::DOUBLE AS n,
                 sum(CASE WHEN doc_id % 3 <> 0 THEN 1 ELSE 0 END)::DOUBLE AS n_art,
                 sum(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END)::DOUBLE AS n_page
          FROM documents),
        cand(field, selector, confidence, kind) AS (VALUES
          ('title', 'h1', 0.9, 'all'),
          ('title', 'meta[property=''og:title'']', 0.8, 'art'),
          ('title', 'title', 0.5, 'all'),
          ('body', 'article', 0.9, 'art'),
          ('body', 'main', 0.7, 'page'),
          ('body', '.content', 0.6, 'page'),
          ('published_time', 'time[datetime]', 0.9, 'art'),
          ('image', 'meta[property=''og:image'']', 0.9, 'art'),
          ('intro', 'p.lead', 0.8, 'art'),
          ('exclude', 'script', 0.9, 'all'),
          ('exclude', 'nav', 0.8, 'all'),
          ('exclude', '.sidebar', 0.7, 'page'))
        SELECT field, selector,
               round((CASE kind WHEN 'all' THEN n WHEN 'art' THEN n_art
                      ELSE n_page END / n) * confidence, 6) AS score
        FROM cand, c
        WHERE (CASE kind WHEN 'all' THEN n WHEN 'art' THEN n_art
               ELSE n_page END / n) >= 0.2
    """

    # text_boilerplate_host: line_dedup re-derived with the (host, hash)
    # grouping and the ≥max(min_docs, ceil(frac·n_host)) threshold
    o["text_boilerplate_host"] = r"""
        WITH aug AS (
          SELECT doc_id, source,
                 text || chr(10) || 'Footer of ' || source || ' site.'
                      || CASE WHEN doc_id % 50 = 0
                              THEN chr(10) || 'Breaking: shared headline quoted everywhere.'
                              ELSE '' END
                      || chr(10) || 'Unique line for doc ' || doc_id::VARCHAR AS text
          FROM documents),
        ls AS (SELECT doc_id, source, string_split(text, chr(10)) AS l FROM aug),
        ex AS (SELECT doc_id, source, u.pos, u.line
               FROM ls, LATERAL (SELECT unnest(l) AS line,
                                        unnest(range(1, len(l)+1)) AS pos) u),
        h AS (SELECT doc_id, source, pos, line,
                     md5(trim(regexp_replace(lower(line), '\s+', ' ', 'g'))) AS hh
              FROM ex),
        ht AS (SELECT source, count(DISTINCT doc_id) AS n_host FROM aug GROUP BY source),
        boiler AS (SELECT h.source, h.hh
                   FROM h JOIN ht ON h.source = ht.source
                   GROUP BY h.source, h.hh, ht.n_host
                   HAVING count(DISTINCT h.doc_id) >= 2
                      AND count(DISTINCT h.doc_id) >= ceil(0.25 * ht.n_host)),
        kept AS (SELECT h.* FROM h LEFT JOIN boiler b
                   ON h.source = b.source AND h.hh = b.hh
                 WHERE b.hh IS NULL),
        reb AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text,
                       count(*) AS n_kept FROM kept GROUP BY doc_id),
        tot AS (SELECT doc_id, len(l)::INTEGER AS n_lines FROM ls)
        SELECT t.doc_id, coalesce(r.text, '') AS text, t.n_lines,
               coalesce(r.n_kept, 0)::INTEGER AS n_kept
        FROM tot t LEFT JOIN reb r ON t.doc_id = r.doc_id
    """

    # curate_host_stats: the quality expression is the text_quality
    # twin verbatim; dup injection is _SQL_AUG_EXACT
    o["curate_host_stats"] = rf"""
        WITH aug AS ({_SQL_AUG_EXACT}),
        t AS (
          SELECT source AS host, doc_id, lang, md5(text) AS th,
                 len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                                 x -> x <> '')) AS tok,
                 len(regexp_extract_all(lower(text), '{_stop}', 1)) AS stop_hits,
                 len(regexp_extract_all(text, '([.,;:!?])', 1)) AS punct_cnt,
                 length(text)::DOUBLE AS n_chars
          FROM aug),
        tq AS (
          SELECT host, doc_id, lang, th, tok,
                 round(0.5::DOUBLE * least(1.0::DOUBLE, n_chars / 500.0::DOUBLE)
                     + 0.3::DOUBLE * least(1.0::DOUBLE,
                         (CASE WHEN tok > 0 THEN stop_hits / tok::DOUBLE
                               ELSE 0.0::DOUBLE END) / 0.4::DOUBLE)
                     + 0.2::DOUBLE * (1.0::DOUBLE - least(1.0::DOUBLE,
                         (CASE WHEN n_chars > 0 THEN punct_cnt / n_chars
                               ELSE 0.0::DOUBLE END) * 5.0::DOUBLE)), 6) AS q
          FROM t),
        a AS (
          SELECT host, count(*) AS n_docs, sum(tok)::BIGINT AS n_tokens,
                 count(DISTINCT lang) AS n_langs,
                 count(DISTINCT th) AS n_uniq,
                 round(avg(q), 4) AS mean_quality
          FROM tq GROUP BY host)
        SELECT host, n_docs, n_tokens, n_langs,
               round(1.0 - n_uniq::DOUBLE / n_docs, 6) AS dup_rate,
               mean_quality,
               (mean_quality >= 0.5 AND
                round(1.0 - n_uniq::DOUBLE / n_docs, 6) <= 0.5) AS keep
        FROM a
    """

    # text_quality_clf: dsir_select's hashed-bucket feature stream,
    # md5 stand-in weights, round(sum,6) → sigmoid → round 6
    o["text_quality_clf"] = rf"""
        WITH w AS (SELECT doc_id, {_SQL_WORDS} AS w FROM documents),
        f AS (SELECT doc_id,
                     unnest(w || [w[i+1] || ' ' || w[i+2] for i in range(0, len(w)-1)]) AS f
              FROM w),
        b AS (SELECT doc_id,
                     (('0x' || substr(md5(f), 1, 8))::UBIGINT % 1024)::INT AS bucket
              FROM f),
        wt AS (SELECT i::INT AS bucket,
                      round((('0x' || substr(md5('quality-clf:' || i), 1, 8))::UBIGINT::DOUBLE
                             / 4294967296.0) * 2 - 1, 6) AS weight
               FROM range(0, 1024) t(i)),
        agg AS (SELECT b.doc_id, count(*) AS n_feats, round(sum(wt.weight), 6) AS s
                FROM b JOIN wt USING (bucket) GROUP BY b.doc_id),
        sc AS (SELECT d.doc_id,
                      coalesce(a.n_feats, 0)::INTEGER AS n_feats,
                      round(1.0 / (1.0 + exp(-(coalesce(a.s, 0.0)
                          / greatest(coalesce(a.n_feats, 0)::DOUBLE, 1.0)))), 6) AS score
               FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id)
        SELECT doc_id, n_feats, score, score >= 0.5 AS keep FROM sc
    """

    # corpus_mixture_select: the naive per-language global ordered
    # cumsum — the bucket-split engine plan must match it exactly
    o["corpus_mixture_select"] = r"""
        WITH q AS (SELECT * FROM (VALUES
            ('en', 3000), ('de', 1000), ('fr', 1000000), ('es', 0))
            AS v(lang, quota)),
        t AS (SELECT doc_id, lang,
                     len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                                     x -> x <> '')) AS n_tokens,
                     md5(doc_id::VARCHAR || ':gocrawl') AS k
              FROM documents),
        c AS (SELECT doc_id, lang, n_tokens,
                     coalesce(sum(n_tokens) OVER (PARTITION BY lang
                         ORDER BY k, doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS cb
              FROM t)
        SELECT c.doc_id, c.lang, c.n_tokens::BIGINT AS n_tokens,
               (c.cb < q.quota) AS keep
        FROM c JOIN q USING (lang)
    """

    # search_fuzzy: vocab-expanded Levenshtein-1 match, same analyzer,
    # same (distance, term) 50-cap, same per-query-term score sum
    o["search_fuzzy"] = f"""
        WITH t AS (SELECT doc_id AS id, {_antoks("text")} AS toks FROM documents),
        v AS (SELECT DISTINCT unnest(toks) AS term FROM t),
        e1 AS (SELECT term FROM (
                 SELECT term, levenshtein(term, 'tble') AS d FROM v
                 WHERE abs(length(term) - 4) <= 1 AND substr(term, 1, 1) = 't'
                   AND levenshtein(term, 'tble') <= 1
                 ORDER BY d, term LIMIT 50)),
        e2 AS (SELECT term FROM (
                 SELECT term, levenshtein(term, 'scann') AS d FROM v
                 WHERE abs(length(term) - 5) <= 1 AND substr(term, 1, 1) = 's'
                   AND levenshtein(term, 'scann') <= 1
                 ORDER BY d, term LIMIT 50)),
        exp AS (SELECT term FROM e1 UNION ALL SELECT term FROM e2),
        p AS (SELECT id, unnest(toks) AS term FROM t),
        sc AS (SELECT p.id, count(*)::DOUBLE AS score
               FROM p JOIN exp USING (term) GROUP BY p.id)
        SELECT id, score FROM sc ORDER BY score DESC, id LIMIT 10
    """

    # suggest: distinct (doc, term) pairs = per-doc array_distinct;
    # doc_freq over the prefix slice only
    o["search_suggest"] = f"""
        WITH t AS (SELECT doc_id, {_antoks("text")} AS toks FROM documents),
        p AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM t)
        SELECT term, count(*)::BIGINT AS doc_freq
        FROM p WHERE term LIKE 's%'
        GROUP BY term
        ORDER BY doc_freq DESC, term LIMIT 10
    """

    # more_like_this: same postings/df/selection pipeline; the score
    # fold is the canonical order-pinned list_reduce twin
    o["search_mlt"] = f"""
        WITH t AS (SELECT doc_id AS id, {_antoks("text")} AS toks FROM documents),
        p AS MATERIALIZED (
          SELECT id, term, count(*)::BIGINT AS tf
          FROM (SELECT id, unnest(toks) AS term FROM t) GROUP BY id, term),
        dfreq AS (SELECT term, count(*)::BIGINT AS df FROM p GROUP BY term),
        n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
        sel AS MATERIALIZED (
          SELECT term,
                 ln(1.0 + ((SELECT n_docs FROM n) - df + 0.5)/(df + 0.5)) AS idf,
                 round(ln(1.0 + ((SELECT n_docs FROM n) - df + 0.5)/(df + 0.5))
                       * tf, 9) AS s
          FROM p JOIN dfreq USING (term)
          WHERE id = 7 AND tf >= 1 AND df >= 2
          ORDER BY s DESC, term LIMIT 10),
        ns AS (SELECT count(*)::BIGINT AS n_sel FROM sel),
        contrib AS (SELECT p.id, p.term, sel.idf * p.tf AS c
                    FROM p JOIN sel USING (term) WHERE p.id <> 7),
        folded AS (SELECT id,
                          list_reduce(list_prepend(0.0::DOUBLE,
                                                   list(c ORDER BY term)),
                                      (a, b) -> a + b) AS score,
                          count(*)::BIGINT AS n_matched
                   FROM contrib GROUP BY id)
        SELECT id, round(score, 6) AS score
        FROM folded
        WHERE n_matched >= ((SELECT n_sel FROM ns) * 30 + 99) // 100
        ORDER BY score DESC, id LIMIT 10
    """

    # DSL MLT: same selection CTE; scoring is the TF sum over the
    # selected terms (exact integer agg) with the integer-ceil msm
    # gate and the like doc excluded
    o["search_bool_mlt"] = f"""
        WITH t AS (SELECT doc_id AS id, {_antoks("text")} AS toks FROM documents),
        p AS MATERIALIZED (
          SELECT id, term, count(*)::BIGINT AS tf
          FROM (SELECT id, unnest(toks) AS term FROM t) GROUP BY id, term),
        dfreq AS (SELECT term, count(*)::BIGINT AS df FROM p GROUP BY term),
        n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
        sel AS MATERIALIZED (
          SELECT term,
                 round(ln(1.0 + ((SELECT n_docs FROM n) - df + 0.5)/(df + 0.5))
                       * tf, 9) AS s
          FROM p JOIN dfreq USING (term)
          WHERE id = 7 AND tf >= 1 AND df >= 2
          ORDER BY s DESC, term LIMIT 10),
        ns AS (SELECT count(*)::BIGINT AS n_sel FROM sel),
        sc AS (SELECT p.id, sum(p.tf)::DOUBLE AS score,
                      count(*)::BIGINT AS m
               FROM p JOIN sel USING (term) GROUP BY p.id)
        SELECT id, round(score, 6) AS score
        FROM sc
        WHERE m >= greatest(1, ((SELECT n_sel FROM ns) * 30 + 99) // 100)
          AND id <> 7
        ORDER BY score DESC, id LIMIT 10
    """

    # search_bool_fuzzy: expansion sets re-derived in SQL (same vocab
    # prefilter + levenshtein + (distance, term) cap as search_fuzzy);
    # must-fuzzy gates on any e1 hit, should-fuzzy adds its TF sum,
    # must_not excludes lang='de'
    o["search_bool_fuzzy"] = f"""
        WITH t AS (SELECT doc_id AS id, lang, {_antoks("text")} AS toks
                   FROM documents),
        v AS (SELECT DISTINCT unnest(toks) AS term FROM t),
        e1 AS (SELECT term FROM (
                 SELECT term, levenshtein(term, 'tble') AS d FROM v
                 WHERE abs(length(term) - 4) <= 1 AND substr(term, 1, 1) = 't'
                   AND levenshtein(term, 'tble') <= 1
                 ORDER BY d, term LIMIT 50)),
        e2 AS (SELECT term FROM (
                 SELECT term, levenshtein(term, 'merg') AS d FROM v
                 WHERE abs(length(term) - 4) <= 1 AND substr(term, 1, 1) = 'm'
                   AND levenshtein(term, 'merg') <= 1
                 ORDER BY d, term LIMIT 50)),
        p AS (SELECT id, unnest(toks) AS term FROM t),
        s1 AS (SELECT id, count(*)::DOUBLE AS sc FROM p JOIN e1 USING (term) GROUP BY id),
        s2 AS (SELECT id, count(*)::DOUBLE AS sc FROM p JOIN e2 USING (term) GROUP BY id)
        SELECT t.id, round(coalesce(s1.sc, 0) + coalesce(s2.sc, 0), 6) AS score
        FROM t LEFT JOIN s1 ON s1.id = t.id LEFT JOIN s2 ON s2.id = t.id
        WHERE coalesce(s1.sc, 0) > 0 AND t.lang <> 'de'
        ORDER BY score DESC, t.id ASC LIMIT 12
    """

    # search_highlight: same analyzer TF score; snippet = 80-char
    # window of the ORIGINAL text around the earliest term occurrence
    # (strpos on lower(text)), position ties to query-term order
    o["search_highlight"] = f"""
        WITH t AS (SELECT doc_id AS id, text, {_antoks("text")} AS toks FROM documents),
        s AS (SELECT id, text,
                     ({_antf("toks", "window")} + {_antf("toks", "batch")})::DOUBLE AS score,
                     strpos(lower(text), 'window') AS p1,
                     strpos(lower(text), 'batch') AS p2
              FROM t),
        c AS (SELECT id, text, score,
                     CASE WHEN p2 > 0 AND (p1 = 0 OR p2 < p1) THEN p2 ELSE p1 END AS pos,
                     CASE WHEN p2 > 0 AND (p1 = 0 OR p2 < p1) THEN 5 ELSE 6 END AS l
              FROM s WHERE score > 0)
        SELECT id, score,
               substr(text, greatest(1, pos - 30), pos - greatest(1, pos - 30))
               || '<em>' || substr(text, pos, l) || '</em>'
               || substr(text, pos + l,
                         greatest(0, greatest(1, pos - 30) + 80 - (pos + l))) AS snippet
        FROM c ORDER BY score DESC, id LIMIT 10
    """

    # dedup_cluster_reps: the dedup_clusters component CTEs verbatim,
    # plus the text_quality score and the per-cluster election window
    _cc_cte = o["dedup_clusters"][: o["dedup_clusters"].index("SELECT l.doc_id")]
    o["dedup_cluster_reps"] = _cc_cte + rf""", q0 AS (
          SELECT doc_id,
                 round(0.5::DOUBLE * least(1.0::DOUBLE, n_chars / 500.0::DOUBLE)
                     + 0.3::DOUBLE * least(1.0::DOUBLE,
                         (CASE WHEN ntok > 0 THEN sh / ntok ELSE 0.0::DOUBLE END) / 0.4::DOUBLE)
                     + 0.2::DOUBLE * (1.0::DOUBLE - least(1.0::DOUBLE,
                         (CASE WHEN n_chars > 0 THEN pc / n_chars
                               ELSE 0.0::DOUBLE END) * 5.0::DOUBLE)), 6) AS score
          FROM (SELECT doc_id,
                       len(regexp_extract_all(lower(text), '{_stop}', 1))::DOUBLE AS sh,
                       len(regexp_extract_all(text, '([.,;:!?])', 1))::DOUBLE AS pc,
                       len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                                       x -> x <> ''))::DOUBLE AS ntok,
                       length(text)::DOUBLE AS n_chars
                FROM aug)),
        r AS (SELECT l.doc_id, l.cluster_id, s.cluster_size, q0.score,
                     row_number() OVER (PARTITION BY l.cluster_id
                         ORDER BY q0.score DESC, l.doc_id) AS rn
              FROM lab l JOIN sz s USING (cluster_id) JOIN q0 USING (doc_id))
        SELECT doc_id, cluster_id, cluster_size, score, rn = 1 AS is_kept FROM r
    """

    # crawl_anchor_index: the synth link layer rebuilt closed-form
    # (link_targets/url_of/host_of_id), every anchor text is 'link'
    o["crawl_anchor_index"] = r"""
        WITH nn AS (SELECT count(*) AS n FROM documents),
        d AS (SELECT doc_id AS d FROM documents),
        e AS (SELECT d, unnest(range(0, 3 + (d % 3))) AS j FROM d),
        t AS (SELECT e.d, ((e.d * 31 + 7 * (e.j + 1) + 1) % nn.n) AS tgt
              FROM e CROSS JOIN nn),
        p AS (
          SELECT CASE WHEN d % 4 = 0 THEN 'site00.example.com'
                      ELSE 'site' || lpad((1 + (d % 15))::VARCHAR, 2, '0')
                           || '.example.com' END AS src_host,
                 'https://' ||
                 CASE WHEN tgt % 4 = 0 THEN 'site00.example.com'
                      ELSE 'site' || lpad((1 + (tgt % 15))::VARCHAR, 2, '0')
                           || '.example.com' END ||
                 CASE WHEN tgt % 17 = 3 THEN '/category/'
                      WHEN tgt % 3 <> 0 THEN '/article/'
                      ELSE '/page/' END || tgt AS url
          FROM t
          UNION ALL
          SELECT CASE WHEN d % 4 = 0 THEN 'site00.example.com'
                      ELSE 'site' || lpad((1 + (d % 15))::VARCHAR, 2, '0')
                           || '.example.com' END AS src_host,
                 'https://external-' || (d % 5) || '.other.com/x/' || d AS url
          FROM d WHERE d % 6 = 2)
        SELECT url, count(*) AS in_degree,
               count(DISTINCT src_host) AS n_src_hosts,
               'link' AS anchors_csv
        FROM p GROUP BY url
    """

    # train_token_ids: same BPE-ish piece regex as text_token_stats,
    # same first-8-hex→uint32 shard contract for the hashed vocab
    o["train_token_ids"] = r"""
        WITH p AS (SELECT doc_id,
                          regexp_extract_all(text, '([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])', 1) AS pieces
                   FROM documents),
        i AS (SELECT doc_id,
                     list_transform(pieces,
                         x -> (('0x' || substr(md5(x), 1, 8))::UBIGINT % 32768)::INT) AS ids
              FROM p)
        SELECT doc_id,
               len(ids) AS n_ids,
               array_to_string(list_transform(list_slice(ids, 1, 12),
                                              x -> x::VARCHAR), ',') AS head_ids,
               md5(array_to_string(list_transform(ids, x -> x::VARCHAR), ',')) AS ids_md5
        FROM i
    """

    # rag_chunk_windows: the same piece stream cut into 64-token
    # windows at stride 48; integer // grid, fully-contained-tail
    # suppression via the CASE nch formula (identical in Spark)
    o["rag_chunk_windows"] = r"""
        WITH p AS (SELECT doc_id,
                          regexp_extract_all(text, '([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])', 1) AS pieces
                   FROM documents),
        n AS (SELECT doc_id, pieces, len(pieces)::BIGINT AS n FROM p),
        c AS (SELECT doc_id, pieces, n,
                     CASE WHEN n <= 0 THEN 0
                          WHEN n <= 64 THEN 1
                          ELSE 1 + ((n - 64 + 47) // 48) END AS nch
              FROM n),
        g AS (SELECT doc_id, pieces, n, unnest(range(nch)) AS chunk
              FROM c WHERE nch > 0),
        s AS (SELECT doc_id, chunk::INT AS chunk,
                     (chunk * 48)::BIGINT AS start_tok,
                     least(64, n - chunk * 48)::BIGINT AS n_tokens,
                     array_to_string(
                         list_slice(pieces, chunk * 48 + 1,
                                    chunk * 48 + least(64, n - chunk * 48)),
                         ' ') AS chunk_text
              FROM g)
        SELECT doc_id, chunk, start_tok, n_tokens,
               substr(chunk_text, 1, 40) AS head,
               md5(chunk_text) AS text_md5
        FROM s
    """

    # train_split: the sample_stratified md5-uniform, cumulative bands
    o["train_split"] = r"""
        WITH u AS (SELECT doc_id,
            ('0x' || substr(md5(doc_id::VARCHAR || ':split'), 1, 8))::UBIGINT::DOUBLE
              / 4294967296.0 AS u
          FROM documents)
        SELECT doc_id,
               CASE WHEN u < 0.75 THEN 'train'
                    WHEN u < 0.875 THEN 'val'
                    ELSE 'test' END AS split
        FROM u
    """

    # train_split_decon: the train_split bands over the exact-dup aug,
    # plus the decontaminate shingle join train-vs-heldout
    o["train_split_decon"] = f"""
        WITH aug AS ({_SQL_AUG_EXACT}),
        u AS (SELECT doc_id, text,
                ('0x' || substr(md5(doc_id::VARCHAR || ':split'), 1, 8))::UBIGINT::DOUBLE
                  / 4294967296.0 AS u
              FROM aug),
        s AS (SELECT doc_id, text,
                     CASE WHEN u < 0.75 THEN 'train'
                          WHEN u < 0.875 THEN 'val'
                          ELSE 'test' END AS split
              FROM u),
        w0 AS (SELECT doc_id, split, {_SQL_WORDS} AS w FROM s),
        tsh AS (SELECT doc_id, unnest(list_distinct(sh)) AS g
                FROM (SELECT doc_id, {_sql_shingles(8)} AS sh
                      FROM w0 WHERE split = 'train')),
        hsh AS (SELECT DISTINCT g
                FROM (SELECT unnest(list_distinct(sh)) AS g
                      FROM (SELECT {_sql_shingles(8)} AS sh
                            FROM w0 WHERE split <> 'train'))),
        hit AS (SELECT DISTINCT doc_id FROM tsh JOIN hsh USING (g))
        SELECT s.doc_id, s.split, (h.doc_id IS NOT NULL) AS tainted
        FROM s LEFT JOIN hit h ON s.doc_id = h.doc_id
    """

    # train_pack_boundaries: same chunk arithmetic; a slice starting at
    # its document's own offset marks a doc boundary inside the window
    o["train_pack_boundaries"] = r"""
        WITH p AS (SELECT doc_id,
                          regexp_extract_all(text, '([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])', 1) AS pieces
                   FROM documents),
        i AS (SELECT doc_id,
                     list_transform(pieces,
                         x -> (('0x' || substr(md5(x), 1, 8))::UBIGINT % 32768)::INT) AS ids
              FROM p),
        k AS (SELECT doc_id, ids,
                     md5(doc_id::VARCHAR || ':gocrawl') AS key,
                     (('0x' || substr(md5(doc_id::VARCHAR || ':gocrawl'), 1, 8))::UBIGINT % 8)::INT AS shard
              FROM i),
        o1 AS (SELECT *, coalesce(sum(len(ids)) OVER (PARTITION BY shard
                   ORDER BY key, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS off
               FROM k),
        c AS (SELECT shard, off, ids,
                     unnest(range(off // 128, (off + len(ids) - 1) // 128 + 1)) AS seq
              FROM o1 WHERE len(ids) > 0),
        sl AS (SELECT shard, seq,
                      greatest(off, seq * 128) AS sa,
                      (greatest(off, seq * 128) = off) AS is_start,
                      list_slice(ids,
                                 (greatest(off, seq * 128) - off + 1)::INT,
                                 (least(off + len(ids), (seq + 1) * 128) - off)::INT) AS part
               FROM c),
        g AS (SELECT shard, seq,
                     flatten(list(part ORDER BY sa)) AS ids,
                     list(sa - seq * 128 ORDER BY sa)
                         FILTER (WHERE is_start) AS starts
              FROM sl GROUP BY shard, seq)
        SELECT shard, seq, len(ids) AS n_ids,
               md5(array_to_string(list_transform(ids, x -> x::VARCHAR), ',')) AS ids_md5,
               coalesce(len(starts), 0) AS n_docs,
               coalesce(array_to_string(
                   list_transform(starts, x -> x::VARCHAR), ','), '') AS doc_starts_csv
        FROM g
    """

    # bpe_pair_counts: iteration-0 adjacent pair counts over the
    # word-frequency table
    _BPE_W0 = r"""
        w0 AS MATERIALIZED (
            SELECT word, string_split(word, '') AS syms,
                   count(*)::BIGINT AS cnt
            FROM (SELECT unnest(regexp_extract_all(
                      text, '([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])', 1)) AS word
                  FROM documents)
            GROUP BY word
        )
    """
    o["bpe_pair_counts"] = f"""
        WITH {_BPE_W0},
        e AS (SELECT word, cnt, unnest(syms) AS sym,
                     generate_subscripts(syms, 1) AS pos
              FROM w0),
        l AS (SELECT cnt, sym,
                     lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
              FROM e)
        SELECT sym AS lft, nxt AS rgt, sum(cnt)::BIGINT AS pair_count
        FROM l WHERE nxt IS NOT NULL
        GROUP BY sym, nxt
        ORDER BY pair_count DESC, lft, rgt
        LIMIT 30
    """

    # bpe_train_merges: the full trainer unrolled — each iteration is
    # pair counts → argmax → greedy islands rewrite (consecutive
    # candidate runs alternate match-starts, exactly the sequential
    # left-to-right merge), chained w0 → w8 in one generated SQL
    def _bpe_iter(i: int) -> str:
        return f"""
        e{i} AS MATERIALIZED (SELECT word, cnt, unnest(syms) AS sym,
                        generate_subscripts(syms, 1) AS pos
                 FROM w{i}),
        l{i} AS MATERIALIZED (SELECT word, cnt, sym, pos,
                        lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
                 FROM e{i}),
        p{i} AS MATERIALIZED (SELECT sym AS lft, nxt AS rgt, sum(cnt)::BIGINT AS c
                 FROM l{i} WHERE nxt IS NOT NULL GROUP BY sym, nxt),
        b{i} AS MATERIALIZED (SELECT lft, rgt, c FROM p{i}
                 ORDER BY c DESC, lft, rgt LIMIT 1),
        c{i} AS MATERIALIZED (SELECT word, cnt, sym, pos,
                        coalesce(sym = (SELECT lft FROM b{i})
                                 AND nxt = (SELECT rgt FROM b{i}),
                                 false) AS cand
                 FROM l{i}),
        r{i} AS MATERIALIZED (SELECT *, pos - row_number() OVER
                        (PARTITION BY word, cand ORDER BY pos) AS grp
                 FROM c{i}),
        m{i} AS MATERIALIZED (SELECT *, CASE WHEN cand THEN
                        ((pos - min(pos) OVER
                          (PARTITION BY word, cand, grp)) % 2 = 0)
                        ELSE false END AS mst
                 FROM r{i}),
        x{i} AS MATERIALIZED (SELECT word, cnt, pos, sym, mst,
                        coalesce(lag(mst) OVER
                          (PARTITION BY word ORDER BY pos), false) AS pm
                 FROM m{i}),
        w{i + 1} AS MATERIALIZED (SELECT word,
                        list(CASE WHEN mst THEN
                                 (SELECT lft || rgt FROM b{i})
                             ELSE sym END ORDER BY pos)
                            FILTER (WHERE NOT pm) AS syms,
                        any_value(cnt) AS cnt
                     FROM x{i} GROUP BY word)
        """

    _n_bpe = 8
    o["bpe_train_merges"] = (
        "WITH "
        + _BPE_W0
        + ","
        + ",".join(_bpe_iter(i) for i in range(_n_bpe))
        + " "
        + " UNION ALL ".join(
            f'SELECT {i} AS "rank", lft, rgt, c AS pair_count FROM b{i}'
            for i in range(_n_bpe)
        )
        + ' ORDER BY "rank"'
    )

    # bpe_encode_corpus: chain the same unrolled trainer to w8, then
    # encode = per-doc piece lookup in the final symbol table + dense
    # vocab ids ordered by token string
    o["bpe_encode_corpus"] = (
        "WITH "
        + _BPE_W0
        + ","
        + ",".join(_bpe_iter(i) for i in range(_n_bpe))
        + f""",
        pieces AS MATERIALIZED (
            SELECT doc_id,
                   unnest(regexp_extract_all(
                       text, '([A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s])', 1)) AS word,
                   generate_subscripts(regexp_extract_all(
                       text, '([A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s])', 1), 1) AS i
            FROM documents),
        tok AS MATERIALIZED (
            SELECT p.doc_id,
                   flatten(list(w.syms ORDER BY p.i)) AS toks
            FROM pieces p JOIN w{_n_bpe} w USING (word)
            GROUP BY p.doc_id),
        vocab AS MATERIALIZED (
            SELECT token,
                   (row_number() OVER (ORDER BY token) - 1)::INT AS id
            FROM (SELECT DISTINCT unnest(syms) AS token FROM w{_n_bpe})),
        e AS (SELECT doc_id, unnest(toks) AS token,
                     generate_subscripts(toks, 1) AS j
              FROM tok),
        ids AS (SELECT doc_id, list(v.id ORDER BY j) AS ids
                FROM e JOIN vocab v USING (token)
                GROUP BY doc_id)
        SELECT doc_id, len(ids) AS n_tokens,
               md5(array_to_string(
                   list_transform(ids, x -> x::VARCHAR), ',')) AS ids_md5
        FROM ids
    """
    )

    # bpe_fertility: trainer chain to w8, per-language rollup of the
    # piece stream joined to its final segmentation
    o["bpe_fertility"] = (
        "WITH "
        + _BPE_W0
        + ","
        + ",".join(_bpe_iter(i) for i in range(_n_bpe))
        + f""",
        wl AS MATERIALIZED (
            SELECT lang,
                   unnest(regexp_extract_all(
                       text, '([A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s])', 1)) AS word
            FROM documents),
        j AS (SELECT wl.lang, len(w.syms) AS nt, length(wl.word) AS nc
              FROM wl JOIN w{_n_bpe} w USING (word))
        SELECT lang,
               count(*)::BIGINT AS n_words,
               sum(nt)::BIGINT AS n_tokens,
               sum(nc)::BIGINT AS n_chars,
               round(sum(nt)::DOUBLE / count(*), 6) AS fertility,
               round(sum(nc)::DOUBLE / sum(nt), 6) AS chars_per_token
        FROM j GROUP BY lang
    """
    )

    # WordPiece: the BPE unroll with the argmax swapped to the
    # likelihood score c/(c_lft*c_rgt) — u{i} adds the unary symbol
    # counts; the double division of exact BIGINTs (< 2^53) is
    # engine-identical, ties break (lft, rgt). Rewrite CTEs are the
    # proven BPE greedy-islands machinery verbatim.
    def _wp_iter(i: int) -> str:
        return f"""
        e{i} AS MATERIALIZED (SELECT word, cnt, unnest(syms) AS sym,
                        generate_subscripts(syms, 1) AS pos
                 FROM w{i}),
        u{i} AS MATERIALIZED (SELECT sym, sum(cnt)::BIGINT AS c
                 FROM e{i} GROUP BY sym),
        l{i} AS MATERIALIZED (SELECT word, cnt, sym, pos,
                        lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
                 FROM e{i}),
        p{i} AS MATERIALIZED (SELECT sym AS lft, nxt AS rgt, sum(cnt)::BIGINT AS c
                 FROM l{i} WHERE nxt IS NOT NULL GROUP BY sym, nxt),
        b{i} AS MATERIALIZED (
            SELECT p.lft, p.rgt, p.c,
                   p.c::DOUBLE / (ul.c * ur.c)::DOUBLE AS score
            FROM p{i} p
            JOIN u{i} ul ON ul.sym = p.lft
            JOIN u{i} ur ON ur.sym = p.rgt
            ORDER BY score DESC, p.lft, p.rgt LIMIT 1),
        c{i} AS MATERIALIZED (SELECT word, cnt, sym, pos,
                        coalesce(sym = (SELECT lft FROM b{i})
                                 AND nxt = (SELECT rgt FROM b{i}),
                                 false) AS cand
                 FROM l{i}),
        r{i} AS MATERIALIZED (SELECT *, pos - row_number() OVER
                        (PARTITION BY word, cand ORDER BY pos) AS grp
                 FROM c{i}),
        m{i} AS MATERIALIZED (SELECT *, CASE WHEN cand THEN
                        ((pos - min(pos) OVER
                          (PARTITION BY word, cand, grp)) % 2 = 0)
                        ELSE false END AS mst
                 FROM r{i}),
        x{i} AS MATERIALIZED (SELECT word, cnt, pos, sym, mst,
                        coalesce(lag(mst) OVER
                          (PARTITION BY word ORDER BY pos), false) AS pm
                 FROM m{i}),
        w{i + 1} AS MATERIALIZED (SELECT word,
                        list(CASE WHEN mst THEN
                                 (SELECT lft || rgt FROM b{i})
                             ELSE sym END ORDER BY pos)
                            FILTER (WHERE NOT pm) AS syms,
                        any_value(cnt) AS cnt
                     FROM x{i} GROUP BY word)
        """

    o["wp_pair_scores"] = f"""
        WITH {_BPE_W0},
        e AS (SELECT word, cnt, unnest(syms) AS sym,
                     generate_subscripts(syms, 1) AS pos
              FROM w0),
        u AS (SELECT sym, sum(cnt)::BIGINT AS c FROM e GROUP BY sym),
        l AS (SELECT cnt, sym,
                     lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
              FROM e),
        p AS (SELECT sym AS lft, nxt AS rgt, sum(cnt)::BIGINT AS c
              FROM l WHERE nxt IS NOT NULL GROUP BY sym, nxt)
        SELECT p.lft, p.rgt, p.c AS pair_count,
               round(p.c::DOUBLE / (ul.c * ur.c)::DOUBLE, 9) AS score
        FROM p JOIN u ul ON ul.sym = p.lft JOIN u ur ON ur.sym = p.rgt
        ORDER BY p.c::DOUBLE / (ul.c * ur.c)::DOUBLE DESC, p.lft, p.rgt
        LIMIT 30
    """

    _n_wp = 6
    o["wp_train_merges"] = (
        "WITH "
        + _BPE_W0
        + ","
        + ",".join(_wp_iter(i) for i in range(_n_wp))
        + " "
        + " UNION ALL ".join(
            f'SELECT {i} AS "rank", lft, rgt, c AS pair_count, '
            f"round(score, 9) AS score FROM b{i}"
            for i in range(_n_wp)
        )
        + ' ORDER BY "rank"'
    )

    # greedy encode: vocab = base chars ∪ one piece per merge; a
    # precomputed longest-match jump table per (word, pos) drives a
    # recursive CTE — one deterministic path per word
    o["wp_encode_greedy"] = (
        "WITH RECURSIVE "
        + _BPE_W0
        + ","
        + ",".join(_wp_iter(i) for i in range(_n_wp))
        + f""",
        vocab AS MATERIALIZED (
            SELECT DISTINCT sym AS piece FROM e0
            {"".join(f" UNION SELECT lft || rgt FROM b{i}" for i in range(_n_wp))}),
        wl AS MATERIALIZED (SELECT DISTINCT word FROM w0),
        pos0 AS (SELECT word, unnest(range(0, length(word))) AS pos FROM wl),
        jmp AS MATERIALIZED (
            SELECT word, pos, piece FROM (
              SELECT p.word, p.pos, v.piece,
                     row_number() OVER (PARTITION BY p.word, p.pos
                                        ORDER BY length(v.piece) DESC) AS rn
              FROM pos0 p JOIN vocab v
                ON substr(p.word, p.pos + 1, length(v.piece)) = v.piece)
            WHERE rn = 1),
        seg AS (
            SELECT word, 0::BIGINT AS pos, []::VARCHAR[] AS toks FROM wl
            UNION ALL
            SELECT s.word, s.pos + length(j.piece),
                   list_append(s.toks,
                     CASE WHEN s.pos = 0 THEN j.piece
                          ELSE '##' || j.piece END)
            FROM seg s JOIN jmp j ON j.word = s.word AND j.pos = s.pos
            WHERE s.pos < length(s.word)),
        fin AS MATERIALIZED (
            SELECT word, toks FROM seg WHERE pos = length(word)),
        pieces AS MATERIALIZED (
            SELECT doc_id,
                   unnest(regexp_extract_all(
                       text, '([A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s])', 1)) AS word,
                   generate_subscripts(regexp_extract_all(
                       text, '([A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s])', 1), 1) AS i
            FROM documents),
        tok AS (SELECT p.doc_id, flatten(list(f.toks ORDER BY p.i)) AS toks
                FROM pieces p JOIN fin f USING (word)
                GROUP BY p.doc_id)
        SELECT doc_id, len(toks) AS n_tokens,
               array_to_string(list_slice(toks, 1, 10), ' ') AS head_toks,
               md5(array_to_string(toks, ',')) AS toks_md5
        FROM tok
    """
    )

    # wp_coverage: the SAME 6-merge trainer replay with W0 filtered to
    # the English slice; the jump-table segmentation then walks EVERY
    # language's distinct words — a word whose recursion stalls (some
    # position has no vocab piece) never reaches pos = length(word),
    # i.e. LEFT-JOIN-null = [UNK], counted as one piece
    _W0_EN = _BPE_W0.replace(
        "FROM documents)", "FROM documents WHERE lang = 'en')"
    )
    o["wp_coverage"] = (
        "WITH RECURSIVE "
        + _W0_EN
        + ","
        + ",".join(_wp_iter(i) for i in range(_n_wp))
        + f""",
        vocab AS MATERIALIZED (
            SELECT DISTINCT sym AS piece FROM e0
            {"".join(f" UNION SELECT lft || rgt FROM b{i}" for i in range(_n_wp))}),
        wl AS MATERIALIZED (
            SELECT DISTINCT unnest(regexp_extract_all(
                text, '([A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s])', 1)) AS word
            FROM documents),
        pos0 AS (SELECT word, unnest(range(0, length(word))) AS pos FROM wl),
        jmp AS MATERIALIZED (
            SELECT word, pos, piece FROM (
              SELECT p.word, p.pos, v.piece,
                     row_number() OVER (PARTITION BY p.word, p.pos
                                        ORDER BY length(v.piece) DESC) AS rn
              FROM pos0 p JOIN vocab v
                ON substr(p.word, p.pos + 1, length(v.piece)) = v.piece)
            WHERE rn = 1),
        seg AS (
            SELECT word, 0::BIGINT AS pos, 0::BIGINT AS n FROM wl
            UNION ALL
            SELECT s.word, s.pos + length(j.piece), s.n + 1
            FROM seg s JOIN jmp j ON j.word = s.word AND j.pos = s.pos
            WHERE s.pos < length(s.word)),
        fin AS MATERIALIZED (
            SELECT word, n FROM seg WHERE pos = length(word)),
        stream AS (
            SELECT lang, unnest(regexp_extract_all(
                text, '([A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s])', 1)) AS word
            FROM documents),
        enc AS (SELECT s.lang, f.n FROM stream s LEFT JOIN fin f USING (word))
        SELECT lang, count(*)::BIGINT AS n_words,
               sum(CASE WHEN n IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_unk_words,
               sum(coalesce(n, 1))::BIGINT AS n_pieces,
               round(sum(CASE WHEN n IS NULL THEN 1 ELSE 0 END)::DOUBLE
                     / count(*)::DOUBLE, 6) AS unk_rate,
               round(sum(coalesce(n, 1))::DOUBLE / count(*)::DOUBLE, 6)
                   AS pieces_per_word
        FROM enc GROUP BY lang
    """
    )

    # train_pack_bins: next-fit-decreasing replayed with a recursive
    # CTE marching each shard's (tokens DESC, doc_id, chunk) order one
    # unit per step, carrying the single open-bin state
    o["train_pack_bins"] = r"""
        WITH RECURSIVE t AS (
            SELECT doc_id,
                   len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                                   x -> x <> ''))::BIGINT AS n
            FROM documents
        ),
        s AS (SELECT doc_id, n,
                     (('0x' || substr(md5(doc_id::VARCHAR || ':gocrawl'), 1, 8))::UBIGINT % 8)::INT AS shard
              FROM t WHERE n > 0),
        u AS (SELECT shard, doc_id, n,
                     ((n + 255) // 256)::BIGINT AS nch,
                     unnest(range(0, (n + 255) // 256)) AS chunk
              FROM s),
        units AS (SELECT shard, doc_id, chunk::INT AS chunk,
                         CASE WHEN chunk < nch - 1 THEN 256
                              ELSE n - (nch - 1) * 256 END::BIGINT AS tok
                  FROM u),
        ord AS (SELECT *, row_number() OVER (PARTITION BY shard
                          ORDER BY tok DESC, doc_id, chunk) AS rn
                FROM units),
        fill AS (
            SELECT shard, rn, doc_id, chunk, tok,
                   0::BIGINT AS bin, 0::BIGINT AS pos
            FROM ord WHERE rn = 1
            UNION ALL
            SELECT o.shard, o.rn, o.doc_id, o.chunk, o.tok,
                   CASE WHEN f.pos + f.tok + o.tok <= 256 THEN f.bin
                        ELSE f.bin + 1 END,
                   CASE WHEN f.pos + f.tok + o.tok <= 256 THEN f.pos + f.tok
                        ELSE 0::BIGINT END
            FROM fill f JOIN ord o ON o.shard = f.shard AND o.rn = f.rn + 1
        )
        SELECT shard, doc_id, chunk, tok AS n_tokens, bin, pos
        FROM fill
    """

    # train_pack_tokens: the same hashed-vocab ids, shard contract and
    # per-shard offsets; windows rebuilt via the chunk arithmetic
    o["train_pack_tokens"] = r"""
        WITH p AS (SELECT doc_id,
                          regexp_extract_all(text, '([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])', 1) AS pieces
                   FROM documents),
        i AS (SELECT doc_id,
                     list_transform(pieces,
                         x -> (('0x' || substr(md5(x), 1, 8))::UBIGINT % 32768)::INT) AS ids
              FROM p),
        k AS (SELECT doc_id, ids,
                     md5(doc_id::VARCHAR || ':gocrawl') AS key,
                     (('0x' || substr(md5(doc_id::VARCHAR || ':gocrawl'), 1, 8))::UBIGINT % 8)::INT AS shard
              FROM i),
        o1 AS (SELECT *, coalesce(sum(len(ids)) OVER (PARTITION BY shard
                   ORDER BY key, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS off
               FROM k),
        c AS (SELECT shard, off, ids,
                     unnest(range(off // 128, (off + len(ids) - 1) // 128 + 1)) AS seq
              FROM o1 WHERE len(ids) > 0),
        sl AS (SELECT shard, seq,
                      greatest(off, seq * 128) AS sa,
                      list_slice(ids,
                                 (greatest(off, seq * 128) - off + 1)::INT,
                                 (least(off + len(ids), (seq + 1) * 128) - off)::INT) AS part
               FROM c),
        g AS (SELECT shard, seq, flatten(list(part ORDER BY sa)) AS ids
              FROM sl GROUP BY shard, seq)
        SELECT shard, seq, len(ids) AS n_ids,
               md5(array_to_string(list_transform(ids, x -> x::VARCHAR), ',')) AS ids_md5
        FROM g
    """

    # dis_max: per-sub-query TF scores (each self-gates to 0 on no
    # match), score = best + tie_breaker·(sum − best), doc-id range
    # filter, ES round-6 display
    o["search_bool_dismax"] = f"""
        WITH t AS (SELECT doc_id AS id, {_antoks("text")} AS toks
                   FROM documents WHERE doc_id >= 5 AND doc_id < 480),
        s AS (SELECT id,
                     {_antf("toks", "table")} + {_antf("toks", "scan")} AS m1,
                     {_antf("toks", "merge")} + {_antf("toks", "join")} AS m2
              FROM t)
        SELECT id,
               round(greatest(m1, m2)
                     + 0.3::DOUBLE * (m1 + m2 - greatest(m1, m2)),
                     6)::DOUBLE AS score
        FROM s WHERE m1 > 0 OR m2 > 0
        ORDER BY score DESC, id ASC LIMIT 15
    """

    # function_score: match TF (table+scan, OR) × [2.0 if lang=en] +
    # sqrt(0.01·n_chars) summed over matching functions (the fvf
    # function always matches so the no-match→1 fallback never fires);
    # sqrt is IEEE-exact in both engines so the hash compares bit-equal
    o["search_function_score"] = f"""
        WITH t AS (SELECT doc_id AS id, lang, n_chars,
                          {_antoks("text")} AS toks
                   FROM documents),
        s AS (SELECT id, lang, n_chars,
                     {_antf("toks", "table")} + {_antf("toks", "scan")} AS q
              FROM t)
        SELECT id,
               round(q::DOUBLE *
                     (CASE WHEN lang = 'en' THEN 2.0::DOUBLE
                           ELSE 0.0::DOUBLE END
                      + sqrt(coalesce(n_chars::DOUBLE, 1.0) * 0.01)),
                     6)::DOUBLE AS score
        FROM s WHERE q > 0
        ORDER BY score DESC, id ASC LIMIT 15
    """

    # terms_set: per-doc required count req_terms = doc_id%3+1;
    # matches when #distinct present query terms ≥ req; score = Σ TF
    o["search_terms_set"] = f"""
        WITH t AS (SELECT doc_id AS id, {_antoks("text")} AS toks
                   FROM documents WHERE doc_id < 400),
        s AS (SELECT id,
                     {_antf("toks", "table")} AS tf1,
                     {_antf("toks", "merge")} AS tf2,
                     {_antf("toks", "vector")} AS tf3
              FROM t)
        SELECT id, round(tf1 + tf2 + tf3, 6)::DOUBLE AS score
        FROM s
        WHERE (CASE WHEN tf1 > 0 THEN 1 ELSE 0 END
               + CASE WHEN tf2 > 0 THEN 1 ELSE 0 END
               + CASE WHEN tf3 > 0 THEN 1 ELSE 0 END) >= (id % 3 + 1)
        ORDER BY score DESC, id ASC LIMIT 15
    """

    # pinned: ids [42,7,99] score 1e6−position; organic = match
    # "merge join" under its TF score; pinned ∪ organic matches
    o["search_pinned"] = f"""
        WITH t AS (SELECT doc_id AS id, {_antoks("text")} AS toks
                   FROM documents),
        s AS (SELECT id,
                     {_antf("toks", "merge")} + {_antf("toks", "join")} AS q
              FROM t)
        SELECT id,
               round(CASE id WHEN 42 THEN 1000000.0::DOUBLE
                             WHEN 7  THEN  999999.0::DOUBLE
                             WHEN 99 THEN  999998.0::DOUBLE
                     ELSE q::DOUBLE END, 6)::DOUBLE AS score
        FROM s WHERE q > 0 OR id IN (42, 7, 99)
        ORDER BY score DESC, id ASC LIMIT 15
    """

    # span_near in_order slop=2: anchors at 'table' whose 3-position
    # lookahead window holds a 'scan' (window n+slop=4 ⇔ gap ≤ slop);
    # score = anchor count
    o["search_span_near"] = f"""
        WITH t AS (SELECT doc_id AS id, {_antoks("text")} AS toks
                   FROM documents),
        s AS (SELECT id,
                     len(list_filter(range(1, len(toks) + 1),
                         i -> toks[i] = 'table'
                              AND list_contains(toks[i+1:i+3], 'scan')))
                       AS cnt
              FROM t)
        SELECT id, round(cnt, 6)::DOUBLE AS score
        FROM s WHERE cnt > 0
        ORDER BY score DESC, id ASC LIMIT 15
    """

    # rank_feature (saturation, pivot 300, boost 5): match TF +
    # 5·v/(v+300) where the feature is positive — IEEE division only
    o["search_rank_feature"] = f"""
        WITH t AS (SELECT doc_id AS id, n_chars,
                          {_antoks("text")} AS toks
                   FROM documents),
        s AS (SELECT id, n_chars, {_antf("toks", "table")} AS q FROM t)
        SELECT id,
               round(q::DOUBLE
                     + CASE WHEN n_chars > 0 THEN
                         5.0::DOUBLE * (n_chars::DOUBLE
                                        / (n_chars::DOUBLE + 300.0))
                       ELSE 0.0::DOUBLE END, 6)::DOUBLE AS score
        FROM s WHERE q > 0
        ORDER BY score DESC, id ASC LIMIT 15
    """

    # as-of join: DuckDB's native ASOF JOIN is the differential twin;
    # views pre-deduped to the max view_id per (user, ts) so both
    # engines resolve equal-timestamp duplicates identically
    o["events_asof_join"] = """
        WITH clicks AS (
          SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'click'),
        views AS (
          SELECT user_id, ts, max(event_id) AS view_id FROM events
          WHERE event_type = 'view' GROUP BY user_id, ts)
        SELECT c.event_id, c.user_id, v.view_id,
               epoch_us(c.ts) - epoch_us(v.ts) AS gap_us
        FROM clicks c ASOF JOIN views v
          ON c.user_id = v.user_id AND c.ts >= v.ts
    """

    # interval join: plain BETWEEN containment join in SQL (the
    # granule bucketing is a physical rewrite only); empty incident
    # windows keep a zero row via LEFT JOIN
    o["events_interval_join"] = """
        WITH err AS (
          SELECT event_id AS incident_id, user_id, ts AS s,
                 ts + INTERVAL 600 SECOND AS e
          FROM events WHERE event_type = 'error'),
        clk AS (
          SELECT user_id, ts, event_id, value FROM events
          WHERE event_type = 'click')
        SELECT err.incident_id, err.user_id,
               count(clk.event_id) AS n_clicks,
               coalesce(sum(round(clk.value * 100)::BIGINT), 0) / 100.0
                 AS sum_value
        FROM err LEFT JOIN clk
          ON err.user_id = clk.user_id AND clk.ts BETWEEN err.s AND err.e
        GROUP BY 1, 2
    """

    # time rollup: UNION of per-granularity GROUP BYs (the GROUPING
    # SETS single-pass is a physical rewrite only); integer-cents sums
    o["events_time_rollup"] = """
        SELECT 'hour' AS granularity,
               strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS bucket,
               event_type,
               count(*) AS n_events,
               sum(round(value * 100)::BIGINT) / 100.0 AS sum_value
        FROM events GROUP BY 2, 3
        UNION ALL
        SELECT 'day',
               strftime(date_trunc('day', ts), '%Y-%m-%d'),
               event_type, count(*),
               sum(round(value * 100)::BIGINT) / 100.0
        FROM events GROUP BY 2, 3
    """

    # intervals any_of: best of the two anchored ordered-proximity
    # counts (window n+max_gaps ⇒ 2-position lookahead for 2 terms)
    o["search_intervals"] = f"""
        WITH t AS (SELECT doc_id AS id, {_antoks("text")} AS toks
                   FROM documents),
        s AS (SELECT id,
                     len(list_filter(range(1, len(toks) + 1),
                         i -> toks[i] = 'table'
                              AND list_contains(toks[i+1:i+2], 'scan')))
                       AS c1,
                     len(list_filter(range(1, len(toks) + 1),
                         i -> toks[i] = 'merge'
                              AND list_contains(toks[i+1:i+2], 'join')))
                       AS c2
              FROM t)
        SELECT id, round(greatest(c1, c2), 6)::DOUBLE AS score
        FROM s WHERE greatest(c1, c2) > 0
        ORDER BY score DESC, id ASC LIMIT 15
    """

    # combined_fields: per-term boost-weighted TF sums across the two
    # analyzed fields, OR semantics
    o["search_combined_fields"] = f"""
        WITH t AS (SELECT doc_id AS id,
                          {_antoks("text")} AS toks,
                          {_antoks("source")} AS stoks
                   FROM documents),
        s AS (SELECT id,
                     1.0::DOUBLE * {_antf("toks", "table")}
                       + 2.0::DOUBLE * {_antf("stoks", "table")} AS tf1,
                     1.0::DOUBLE * {_antf("toks", "src3")}
                       + 2.0::DOUBLE * {_antf("stoks", "src3")} AS tf2
              FROM t)
        SELECT id, round(tf1 + tf2, 6)::DOUBLE AS score
        FROM s WHERE tf1 + tf2 > 0
        ORDER BY score DESC, id ASC LIMIT 15
    """

    # KMV bottom-k resemblance: same md5 hash order in both engines,
    # integer DIV ppm; exact twin via the full outer join
    o["corpus_kmv_users"] = """
        WITH a AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS v
                   FROM events
                   WHERE ts < TIMESTAMP '2024-01-16 00:00:00'),
        b AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS v
              FROM events
              WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'),
        m AS (SELECT coalesce(a.v, b.v) AS v, md5(coalesce(a.v, b.v)) AS h,
                     CASE WHEN a.v IS NOT NULL THEN 1 ELSE 0 END AS in_a,
                     CASE WHEN b.v IS NOT NULL THEN 1 ELSE 0 END AS in_b
              FROM a FULL OUTER JOIN b ON a.v = b.v),
        bk AS (SELECT * FROM m ORDER BY h ASC, v ASC LIMIT 64),
        s AS (SELECT count(*) AS k_used, sum(in_a * in_b) AS n_both FROM bk),
        e AS (SELECT sum(in_a) AS n_a, sum(in_b) AS n_b,
                     sum(in_a * in_b) AS n_inter, count(*) AS n_union
              FROM m)
        SELECT s.k_used::BIGINT AS k_used, s.n_both::BIGINT AS n_both,
               (CASE WHEN s.k_used > 0
                     THEN s.n_both * 1000000 // s.k_used
                ELSE 0 END)::BIGINT AS est_jaccard_ppm,
               e.n_a::BIGINT AS n_a, e.n_b::BIGINT AS n_b,
               e.n_inter::BIGINT AS n_inter, e.n_union::BIGINT AS n_union,
               (CASE WHEN e.n_union > 0
                     THEN e.n_inter * 1000000 // e.n_union
                ELSE 0 END)::BIGINT AS exact_jaccard_ppm
        FROM s, e
    """

    # JSON-path extraction parity: json_extract_string ≡
    # get_json_object; integer sums, exact-ratio mean
    o["events_json_props"] = """
        WITH e AS (
          SELECT event_type,
                 json_extract_string(props, '$.k')::INT AS k
          FROM events)
        SELECT event_type,
               count(*) AS n_events,
               count(k) AS n_k,
               sum(k)::BIGINT AS sum_k,
               min(k) AS min_k,
               max(k) AS max_k,
               sum(k)::BIGINT / count(k)::DOUBLE AS avg_k
        FROM e GROUP BY 1
    """

    # bitext filter battery: same norm_words stream per side, exact
    # integer ratio bounds, distinct-token Jaccard in integer-ppm
    def _bt_words(col: str) -> str:
        return (
            r"list_filter(regexp_split_to_array(trim(regexp_replace("
            rf"lower({col}), '[^a-z0-9\s]', ' ', 'g')), '\s+'),"
            r" x -> x <> '')"
        )

    o["curate_bitext_filters"] = f"""
        WITH src AS (
          SELECT doc_id // 2 AS pair_id, text AS src_text,
                 lang AS src_lang
          FROM documents WHERE doc_id % 2 = 0),
        tgt AS (
          SELECT doc_id // 2 AS pair_id, text AS tgt_text,
                 lang AS tgt_lang
          FROM documents WHERE doc_id % 2 = 1),
        p AS (SELECT * FROM src JOIN tgt USING (pair_id)),
        w AS (
          SELECT pair_id, src_text, tgt_text, src_lang, tgt_lang,
                 list_distinct({_bt_words("src_text")}) AS ds,
                 list_distinct({_bt_words("tgt_text")}) AS dt,
                 len({_bt_words("src_text")}) AS n_tok_src,
                 len({_bt_words("tgt_text")}) AS n_tok_tgt
          FROM p),
        f AS (
          SELECT pair_id, n_tok_src, n_tok_tgt,
                 (src_text = tgt_text) AS identical,
                 len(list_filter(ds, x -> list_contains(dt, x)))::BIGINT
                   AS inter,
                 (len(ds) + len(dt)
                  - len(list_filter(ds, x -> list_contains(dt, x))))::BIGINT
                   AS un,
                 (src_lang = tgt_lang) AS lang_match
          FROM w)
        SELECT pair_id, n_tok_src, n_tok_tgt,
               (n_tok_src * 2 >= n_tok_tgt * 1
                AND n_tok_src * 2 <= n_tok_tgt * 4) AS ratio_ok,
               identical,
               (CASE WHEN un > 0 THEN inter * 1000000 // un
                ELSE 0 END)::BIGINT AS overlap_ppm,
               (n_tok_src = 0 OR n_tok_tgt = 0) AS empty,
               ((n_tok_src * 2 >= n_tok_tgt * 1
                 AND n_tok_src * 2 <= n_tok_tgt * 4)
                AND NOT identical
                AND NOT (n_tok_src = 0 OR n_tok_tgt = 0)
                AND (CASE WHEN un > 0 THEN inter * 1000000 // un
                     ELSE 0 END) <= 600000) AS keep,
               lang_match
        FROM f
    """

    # rollup merge: the oracle is the DIRECT full rollup — green ⇔
    # the two half-rollups merged associatively to the truth
    o["events_rollup_merge"] = """
        SELECT 'hour' AS granularity,
               strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS bucket,
               event_type,
               count(*) AS n_events,
               sum(round(value * 100)::BIGINT) / 100.0 AS sum_value
        FROM events GROUP BY 2, 3
        UNION ALL
        SELECT 'day',
               strftime(date_trunc('day', ts), '%Y-%m-%d'),
               event_type, count(*),
               sum(round(value * 100)::BIGINT) / 100.0
        FROM events GROUP BY 2, 3
    """

    # rate anomaly: identical rank-selected lower medians (rank
    # (m+1)//2 under the (value, bucket) order) for median and MAD
    o["events_rate_anomaly"] = """
        WITH c AS (
          SELECT event_type,
                 strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS bucket,
                 count(*)::BIGINT AS n
          FROM events GROUP BY 1, 2),
        r AS (
          SELECT *, row_number() OVER (PARTITION BY event_type
                                       ORDER BY n ASC, bucket ASC) AS rn,
                    count(*) OVER (PARTITION BY event_type) AS m
          FROM c),
        med AS (
          SELECT *, max(CASE WHEN rn = (m + 1) // 2 THEN n END)
                      OVER (PARTITION BY event_type) AS median_n
          FROM r),
        d AS (
          SELECT *, abs(n - median_n) AS dev,
                    row_number() OVER (PARTITION BY event_type
                                       ORDER BY abs(n - median_n) ASC,
                                                bucket ASC) AS rn2
          FROM med),
        mad AS (
          SELECT *, max(CASE WHEN rn2 = (m + 1) // 2 THEN dev END)
                      OVER (PARTITION BY event_type) AS mad
          FROM d)
        SELECT event_type, bucket, n, median_n, mad,
               (dev > 3 * mad) AS anomaly
        FROM mad
    """

    # rule attribution: winner per URL hardcoded for synth_robots'
    # literal-prefix ruleset (longest match, Allow wins ties)
    o["crawl_rule_attribution"] = """
        WITH u AS (
          SELECT doc_id, doc_id % 16 AS hi,
                 CASE doc_id % 4
                   WHEN 0 THEN '/article/' || doc_id
                   WHEN 1 THEN '/category/' || doc_id
                   WHEN 2 THEN '/page/' || doc_id
                   ELSE '/page/1' || doc_id
                 END AS path
          FROM documents),
        w AS (
          SELECT 'site' || lpad(hi::VARCHAR, 2, '0') || '.example.com'
                   AS host,
                 CASE
                   WHEN path LIKE '/category/%' THEN '/category/'
                   WHEN hi % 3 = 0 AND path LIKE '/page/1%' THEN '/page/1'
                   WHEN hi % 3 = 0 AND path LIKE '/page/%' THEN '/page/'
                   WHEN hi % 5 = 2 THEN '/'
                   ELSE NULL END AS pattern,
                 CASE
                   WHEN path LIKE '/category/%' THEN FALSE
                   WHEN hi % 3 = 0 AND path LIKE '/page/1%' THEN TRUE
                   WHEN hi % 3 = 0 AND path LIKE '/page/%' THEN FALSE
                   WHEN hi % 5 = 2 THEN FALSE
                   ELSE NULL END AS allow
          FROM u)
        SELECT host, pattern,
               coalesce(allow, TRUE) AS verdict_allowed,
               count(*)::BIGINT AS n_urls
        FROM w GROUP BY 1, 2, 3
    """

    # CUSUM: same rank-selected median/MAD, prefix sum − running min
    o["events_cusum"] = """
        WITH c AS (
          SELECT event_type,
                 strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS bucket,
                 count(*)::BIGINT AS n
          FROM events GROUP BY 1, 2),
        r AS (
          SELECT *, row_number() OVER (PARTITION BY event_type
                                       ORDER BY n ASC, bucket ASC) AS rn,
                    count(*) OVER (PARTITION BY event_type) AS m
          FROM c),
        med AS (
          SELECT *, max(CASE WHEN rn = (m + 1) // 2 THEN n END)
                      OVER (PARTITION BY event_type) AS med
          FROM r),
        d AS (
          SELECT *, abs(n - med) AS dev,
                    row_number() OVER (PARTITION BY event_type
                                       ORDER BY abs(n - med) ASC,
                                                bucket ASC) AS rn2
          FROM med),
        mad AS (
          SELECT *, max(CASE WHEN rn2 = (m + 1) // 2 THEN dev END)
                      OVER (PARTITION BY event_type) AS mad
          FROM d),
        st AS (
          SELECT *, n - med - mad AS x FROM mad),
        p0 AS (
          SELECT *,
                 sum(x) OVER (PARTITION BY event_type ORDER BY bucket
                              ROWS UNBOUNDED PRECEDING) AS pp
          FROM st),
        p AS (
          SELECT *,
                 min(pp) OVER (PARTITION BY event_type ORDER BY bucket
                               ROWS UNBOUNDED PRECEDING) AS pmin
          FROM p0)
        SELECT event_type, bucket, n,
               (pp - least(0, pmin))::BIGINT AS cusum,
               ((pp - least(0, pmin)) > 5 * mad) AS alarm
        FROM p
    """

    # dup-rate curve: first id per content md5, integer checkpoint
    # bucketing (ceil(id·cp/mx)), cumulative over 10 rows, ppm DIV
    o["corpus_dup_rate_curve"] = f"""
        WITH aug AS ({_SQL_AUG_EXACT}),
        mx AS (SELECT max(doc_id) AS mx FROM aug),
        h AS (SELECT doc_id AS id, md5(text) AS h FROM aug),
        first AS (SELECT h, min(id) AS first_id FROM h GROUP BY h),
        grid AS (
          SELECT i::INT AS checkpoint, (i * mx.mx) // 10 AS id_bound
          FROM range(1, 11) t(i), mx),
        up AS (
          SELECT greatest(1, (first_id * 10 + mx.mx - 1) // mx.mx)
                   AS checkpoint,
                 count(*) AS new_uniques
          FROM first, mx GROUP BY 1),
        dp AS (
          SELECT greatest(1, (id * 10 + mx.mx - 1) // mx.mx) AS checkpoint,
                 count(*) AS new_docs
          FROM h, mx GROUP BY 1),
        cum AS (
          SELECT g.checkpoint, g.id_bound,
                 sum(coalesce(dp.new_docs, 0))
                   OVER (ORDER BY g.checkpoint
                         ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_docs,
                 sum(coalesce(up.new_uniques, 0))
                   OVER (ORDER BY g.checkpoint
                         ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_uniques
          FROM grid g
          LEFT JOIN up ON up.checkpoint = g.checkpoint
          LEFT JOIN dp ON dp.checkpoint = g.checkpoint)
        SELECT checkpoint, id_bound, cum_docs, cum_uniques,
               (cum_docs - cum_uniques)::BIGINT AS cum_dups,
               (CASE WHEN cum_docs > 0
                     THEN (cum_docs - cum_uniques) * 1000000 // cum_docs
                ELSE 0 END)::BIGINT AS dup_ppm
        FROM cum ORDER BY checkpoint
    """

    # windowed funnel: the same chained CTE windows with a 24 h
    # integer-µs gap bound on each transition
    o["events_funnel_windowed"] = """
        WITH s0 AS (
          SELECT user_id, ts, event_type,
                 min(CASE WHEN event_type = 'view' THEN ts END)
                   OVER w AS d0
          FROM events
          WINDOW w AS (PARTITION BY user_id
                       ORDER BY ts,
                         CASE event_type WHEN 'view' THEN 0
                              WHEN 'click' THEN 1
                              WHEN 'purchase' THEN 2 ELSE 3 END,
                         event_type
                       ROWS UNBOUNDED PRECEDING)),
        s1 AS (
          SELECT user_id, ts, event_type, d0,
                 min(CASE WHEN event_type = 'click'
                          AND d0 IS NOT NULL AND ts >= d0
                          AND epoch_us(ts) - epoch_us(d0) <= 86400000000
                     THEN ts END) OVER w AS d1
          FROM s0
          WINDOW w AS (PARTITION BY user_id
                       ORDER BY ts,
                         CASE event_type WHEN 'view' THEN 0
                              WHEN 'click' THEN 1
                              WHEN 'purchase' THEN 2 ELSE 3 END,
                         event_type
                       ROWS UNBOUNDED PRECEDING)),
        s2 AS (
          SELECT user_id, d0, d1,
                 min(CASE WHEN event_type = 'purchase'
                          AND d1 IS NOT NULL AND ts >= d1
                          AND epoch_us(ts) - epoch_us(d1) <= 86400000000
                     THEN ts END) OVER w AS d2
          FROM s1
          WINDOW w AS (PARTITION BY user_id
                       ORDER BY ts,
                         CASE event_type WHEN 'view' THEN 0
                              WHEN 'click' THEN 1
                              WHEN 'purchase' THEN 2 ELSE 3 END,
                         event_type
                       ROWS UNBOUNDED PRECEDING)),
        u AS (
          SELECT user_id,
                 max(CASE WHEN d0 IS NOT NULL THEN 1 ELSE 0 END) AS c0,
                 max(CASE WHEN d1 IS NOT NULL THEN 1 ELSE 0 END) AS c1,
                 max(CASE WHEN d2 IS NOT NULL THEN 1 ELSE 0 END) AS c2
          FROM s2 GROUP BY user_id),
        t AS (SELECT sum(c0) AS n0, sum(c1) AS n1, sum(c2) AS n2 FROM u)
        SELECT 0 AS step_index, 'view' AS step, n0::BIGINT AS n_users FROM t
        UNION ALL SELECT 1, 'click', n1::BIGINT FROM t
        UNION ALL SELECT 2, 'purchase', n2::BIGINT FROM t
    """

    # funnel durations: the events_funnel chained windows + per-user
    # completion minima, µs gaps DIV'd to seconds, rank-lower medians
    o["events_funnel_durations"] = """
        WITH s0 AS (
          SELECT user_id, ts, event_type,
                 min(CASE WHEN event_type = 'view' THEN ts END)
                   OVER w AS d0
          FROM events
          WINDOW w AS (PARTITION BY user_id
                       ORDER BY ts,
                         CASE event_type WHEN 'view' THEN 0
                              WHEN 'click' THEN 1
                              WHEN 'purchase' THEN 2 ELSE 3 END,
                         event_type
                       ROWS UNBOUNDED PRECEDING)),
        s1 AS (
          SELECT user_id, ts, event_type, d0,
                 min(CASE WHEN event_type = 'click'
                          AND d0 IS NOT NULL AND ts >= d0
                     THEN ts END) OVER w AS d1
          FROM s0
          WINDOW w AS (PARTITION BY user_id
                       ORDER BY ts,
                         CASE event_type WHEN 'view' THEN 0
                              WHEN 'click' THEN 1
                              WHEN 'purchase' THEN 2 ELSE 3 END,
                         event_type
                       ROWS UNBOUNDED PRECEDING)),
        s2 AS (
          SELECT user_id, d0, d1,
                 min(CASE WHEN event_type = 'purchase'
                          AND d1 IS NOT NULL AND ts >= d1
                     THEN ts END) OVER w AS d2
          FROM s1
          WINDOW w AS (PARTITION BY user_id
                       ORDER BY ts,
                         CASE event_type WHEN 'view' THEN 0
                              WHEN 'click' THEN 1
                              WHEN 'purchase' THEN 2 ELSE 3 END,
                         event_type
                       ROWS UNBOUNDED PRECEDING)),
        u AS (
          SELECT user_id, min(d0) AS t0, min(d1) AS t1, min(d2) AS t2
          FROM s2 GROUP BY user_id),
        g01 AS (
          SELECT user_id AS u,
                 (epoch_us(t1) - epoch_us(t0)) // 1000000 AS gap_s
          FROM u WHERE t1 IS NOT NULL),
        g12 AS (
          SELECT user_id AS u,
                 (epoch_us(t2) - epoch_us(t1)) // 1000000 AS gap_s
          FROM u WHERE t2 IS NOT NULL),
        r01 AS (
          SELECT *, row_number() OVER (ORDER BY gap_s ASC, u ASC) AS rn,
                    count(*) OVER () AS m
          FROM g01),
        r12 AS (
          SELECT *, row_number() OVER (ORDER BY gap_s ASC, u ASC) AS rn,
                    count(*) OVER () AS m
          FROM g12)
        SELECT 0 AS step_index, 'view' AS step_from, 'click' AS step_to,
               count(*)::BIGINT AS n_converted,
               max(CASE WHEN rn = (m + 1) // 2 THEN gap_s END)::BIGINT
                 AS median_gap_s
        FROM r01
        UNION ALL
        SELECT 1, 'click', 'purchase',
               count(*)::BIGINT,
               max(CASE WHEN rn = (m + 1) // 2 THEN gap_s END)::BIGINT
        FROM r12
    """

    # judge agreement: identical per-doc verdicts, one contingency
    # pass, κ arithmetic in the same double operand order
    o["corpus_judge_agreement"] = rf"""
        WITH t AS (
          SELECT doc_id, n_chars,
                 list_filter(regexp_split_to_array(trim(text), '\s+'),
                             x -> x <> '') AS ws,
                 len(regexp_extract_all(text, '([.,;:!?])', 1)) AS punct,
                 len(regexp_extract_all(lower(text), '{_stop}', 1))
                   AS stop_hits
          FROM documents),
        v AS (
          SELECT doc_id,
                 (len(ws) >= 50
                  AND (list_sum(list_transform(ws, x -> length(x)))::DOUBLE
                       / len(ws)::DOUBLE) BETWEEN 3.0 AND 10.0
                  AND (len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
                       / len(ws)::DOUBLE) >= 0.8
                  AND (punct::DOUBLE / len(ws)::DOUBLE) <= 0.1) AS ja,
                 (round(0.5::DOUBLE * least(1.0::DOUBLE, n_chars::DOUBLE / 500.0::DOUBLE)
                   + 0.3::DOUBLE * least(1.0::DOUBLE,
                       (CASE WHEN len(ws) > 0
                             THEN stop_hits / len(ws)::DOUBLE
                        ELSE 0.0::DOUBLE END) / 0.4::DOUBLE)
                   + 0.2::DOUBLE * (1.0::DOUBLE - least(1.0::DOUBLE,
                       (CASE WHEN n_chars > 0
                             THEN punct / n_chars::DOUBLE
                        ELSE 0.0::DOUBLE END) * 5.0::DOUBLE)), 6)
                  >= 0.5) AS jb,
                 (n_chars >= 200) AS jc
          FROM t),
        agg AS (
          SELECT count(*) AS n,
                 sum(CASE WHEN ja AND jb THEN 1 ELSE 0 END) AS ab_tt,
                 sum(CASE WHEN ja AND NOT jb THEN 1 ELSE 0 END) AS ab_tf,
                 sum(CASE WHEN NOT ja AND jb THEN 1 ELSE 0 END) AS ab_ft,
                 sum(CASE WHEN ja AND jc THEN 1 ELSE 0 END) AS ac_tt,
                 sum(CASE WHEN ja AND NOT jc THEN 1 ELSE 0 END) AS ac_tf,
                 sum(CASE WHEN NOT ja AND jc THEN 1 ELSE 0 END) AS ac_ft,
                 sum(CASE WHEN jb AND jc THEN 1 ELSE 0 END) AS bc_tt,
                 sum(CASE WHEN jb AND NOT jc THEN 1 ELSE 0 END) AS bc_tf,
                 sum(CASE WHEN NOT jb AND jc THEN 1 ELSE 0 END) AS bc_ft,
                 sum(ja::INT + jb::INT + jc::INT) AS fl_t,
                 sum((ja::INT + jb::INT + jc::INT) * (ja::INT + jb::INT + jc::INT)
                     + (3 - ja::INT - jb::INT - jc::INT)
                       * (3 - ja::INT - jb::INT - jc::INT)) AS fl_sq
          FROM v),
        pairs AS (
          SELECT 'j_gopher' AS judge_a, 'j_quality' AS judge_b,
                 n, ab_tt AS tt, ab_tf AS tf, ab_ft AS ft FROM agg
          UNION ALL
          SELECT 'j_gopher', 'j_len', n, ac_tt, ac_tf, ac_ft FROM agg
          UNION ALL
          SELECT 'j_quality', 'j_len', n, bc_tt, bc_tf, bc_ft FROM agg),
        pk AS (
          SELECT judge_a, judge_b, n::BIGINT AS n_items,
                 (tt + (n - tt - tf - ft))::BIGINT AS n_agree,
                 ((tt + (n - tt - tf - ft)) * 1000000 // n)::BIGINT
                   AS agree_ppm,
                 round(
                   ((tt::DOUBLE + (n::DOUBLE - tt::DOUBLE - tf::DOUBLE
                                   - ft::DOUBLE)) / n::DOUBLE
                    - ((tt::DOUBLE + tf::DOUBLE) * (tt::DOUBLE + ft::DOUBLE)
                       + (ft::DOUBLE + (n::DOUBLE - tt::DOUBLE - tf::DOUBLE
                                        - ft::DOUBLE))
                         * (tf::DOUBLE + (n::DOUBLE - tt::DOUBLE
                                          - tf::DOUBLE - ft::DOUBLE)))
                      / (n::DOUBLE * n::DOUBLE))
                   / (1.0::DOUBLE
                      - ((tt::DOUBLE + tf::DOUBLE) * (tt::DOUBLE + ft::DOUBLE)
                         + (ft::DOUBLE + (n::DOUBLE - tt::DOUBLE - tf::DOUBLE
                                          - ft::DOUBLE))
                           * (tf::DOUBLE + (n::DOUBLE - tt::DOUBLE
                                            - tf::DOUBLE - ft::DOUBLE)))
                        / (n::DOUBLE * n::DOUBLE)), 6) AS kappa
          FROM pairs),
        fl AS (
          SELECT 'fleiss' AS judge_a, 'all' AS judge_b,
                 n::BIGINT AS n_items,
                 NULL::BIGINT AS n_agree, NULL::BIGINT AS agree_ppm,
                 round(
                   ((fl_sq::DOUBLE - n::DOUBLE * 3.0::DOUBLE)
                    / (n::DOUBLE * 3.0::DOUBLE * 2.0::DOUBLE)
                    - ((fl_t::DOUBLE / (n::DOUBLE * 3.0::DOUBLE))
                         * (fl_t::DOUBLE / (n::DOUBLE * 3.0::DOUBLE))
                       + (1.0::DOUBLE - fl_t::DOUBLE / (n::DOUBLE * 3.0::DOUBLE))
                         * (1.0::DOUBLE - fl_t::DOUBLE / (n::DOUBLE * 3.0::DOUBLE))))
                   / (1.0::DOUBLE
                      - ((fl_t::DOUBLE / (n::DOUBLE * 3.0::DOUBLE))
                           * (fl_t::DOUBLE / (n::DOUBLE * 3.0::DOUBLE))
                         + (1.0::DOUBLE - fl_t::DOUBLE / (n::DOUBLE * 3.0::DOUBLE))
                           * (1.0::DOUBLE - fl_t::DOUBLE / (n::DOUBLE * 3.0::DOUBLE)))),
                   6) AS kappa
          FROM agg)
        SELECT * FROM pk UNION ALL SELECT * FROM fl
    """

    # reliability: same clf scores and gopher labels, rank bins by
    # (score, id), integer-ppm positive rates
    o["text_clf_reliability"] = rf"""
        WITH w AS (SELECT doc_id, {_SQL_WORDS} AS w FROM documents),
        f AS (SELECT doc_id,
                     unnest(w || [w[i+1] || ' ' || w[i+2] for i in range(0, len(w)-1)]) AS f
              FROM w),
        b AS (SELECT doc_id,
                     (('0x' || substr(md5(f), 1, 8))::UBIGINT % 1024)::INT AS bucket
              FROM f),
        wt AS (SELECT i::INT AS bucket,
                      round((('0x' || substr(md5('quality-clf:' || i), 1, 8))::UBIGINT::DOUBLE
                             / 4294967296.0) * 2 - 1, 6) AS weight
               FROM range(0, 1024) t(i)),
        agg AS (SELECT b.doc_id, count(*) AS n_feats, round(sum(wt.weight), 6) AS s
                FROM b JOIN wt USING (bucket) GROUP BY b.doc_id),
        sc AS (SELECT d.doc_id AS id,
                      round(1.0 / (1.0 + exp(-(coalesce(a.s, 0.0)
                          / greatest(coalesce(a.n_feats, 0)::DOUBLE, 1.0)))), 6) AS score
               FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id),
        lab AS (
          SELECT doc_id AS id,
                 (len(ws) >= 50
                  AND (list_sum(list_transform(ws, x -> length(x)))::DOUBLE
                       / len(ws)::DOUBLE) BETWEEN 3.0 AND 10.0
                  AND (len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
                       / len(ws)::DOUBLE) >= 0.8
                  AND (punct::DOUBLE / len(ws)::DOUBLE) <= 0.1) AS label
          FROM (SELECT doc_id,
                       list_filter(regexp_split_to_array(trim(text), '\s+'),
                                   x -> x <> '') AS ws,
                       len(regexp_extract_all(text, '([.,;:!?])', 1)) AS punct
                FROM documents)),
        j AS (SELECT sc.id, sc.score, lab.label
              FROM sc JOIN lab ON sc.id = lab.id),
        r AS (SELECT *,
                     row_number() OVER (ORDER BY score ASC, id ASC) AS rn,
                     count(*) OVER () AS nn
              FROM j)
        SELECT ((rn - 1) * 10 // nn)::BIGINT AS bin,
               count(*)::BIGINT AS n,
               sum(label::INT)::BIGINT AS n_pos,
               (sum(label::INT) * 1000000 // count(*))::BIGINT AS pos_ppm,
               min(score) AS min_score,
               max(score) AS max_score
        FROM r GROUP BY 1
    """

    # M4: rank-1 rows under the four struct orders; bucket via exact
    # integer // on epoch microseconds
    o["events_m4_downsample"] = """
        WITH e AS (
          SELECT event_type, epoch_us(ts)::BIGINT AS t,
                 value::DOUBLE AS v
          FROM events WHERE value IS NOT NULL),
        b AS (SELECT event_type, t // 21600000000 AS bucket, t, v FROM e),
        r AS (
          SELECT *,
            row_number() OVER (PARTITION BY event_type, bucket
                               ORDER BY t ASC, v ASC) AS rf,
            row_number() OVER (PARTITION BY event_type, bucket
                               ORDER BY t DESC, v DESC) AS rl,
            row_number() OVER (PARTITION BY event_type, bucket
                               ORDER BY v ASC, t ASC) AS rmn,
            row_number() OVER (PARTITION BY event_type, bucket
                               ORDER BY v DESC, t DESC) AS rmx,
            count(*) OVER (PARTITION BY event_type, bucket) AS n
          FROM b)
        SELECT event_type, bucket, n::BIGINT AS n,
               max(CASE WHEN rf = 1 THEN t END) AS t_first,
               max(CASE WHEN rf = 1 THEN v END) AS v_first,
               max(CASE WHEN rl = 1 THEN t END) AS t_last,
               max(CASE WHEN rl = 1 THEN v END) AS v_last,
               max(CASE WHEN rmn = 1 THEN t END) AS t_min,
               max(CASE WHEN rmn = 1 THEN v END) AS v_min,
               max(CASE WHEN rmx = 1 THEN t END) AS t_max,
               max(CASE WHEN rmx = 1 THEN v END) AS v_max
        FROM r GROUP BY event_type, bucket, n
    """

    # asof nearest: backward and forward ASOF candidates, closer gap
    # wins (backward on ties), 120 s tolerance on the winner
    o["events_asof_nearest"] = """
        WITH clicks AS (
          SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'click'),
        views AS (
          SELECT user_id, ts, max(event_id) AS view_id FROM events
          WHERE event_type = 'view' GROUP BY user_id, ts),
        back AS (
          SELECT c.event_id, v.view_id AS b_id, v.ts AS b_ts
          FROM clicks c ASOF JOIN views v
            ON c.user_id = v.user_id AND c.ts >= v.ts),
        fwd AS (
          SELECT c.event_id, v.view_id AS f_id, v.ts AS f_ts
          FROM clicks c ASOF JOIN views v
            ON c.user_id = v.user_id AND c.ts <= v.ts),
        m AS (
          SELECT c.event_id, c.user_id, c.ts,
                 b.b_id, b.b_ts, f.f_id, f.f_ts,
                 epoch_us(c.ts) - epoch_us(b.b_ts) AS bgap,
                 epoch_us(f.f_ts) - epoch_us(c.ts) AS fgap
          FROM clicks c
          LEFT JOIN back b ON b.event_id = c.event_id
          LEFT JOIN fwd f ON f.event_id = c.event_id),
        pick AS (
          SELECT event_id, user_id,
                 CASE WHEN b_id IS NULL THEN f_id
                      WHEN f_id IS NULL THEN b_id
                      WHEN bgap <= fgap THEN b_id ELSE f_id END AS view_id,
                 CASE WHEN b_id IS NULL THEN -fgap
                      WHEN f_id IS NULL THEN bgap
                      WHEN bgap <= fgap THEN bgap ELSE -fgap END AS gap_us
          FROM m)
        SELECT event_id, user_id, view_id, gap_us
        FROM pick
        WHERE view_id IS NOT NULL AND abs(gap_us) <= 86400000000
    """

    # funnel: the same chained running-earliest-completion windows,
    # layered CTEs so each step's window scans the previous step's
    # per-row prefix value (identical tie order: ts, event_type)
    o["events_funnel"] = """
        WITH s0 AS (
          SELECT user_id, ts, event_type,
                 min(CASE WHEN event_type = 'view' THEN ts END)
                   OVER w AS d0
          FROM events
          WINDOW w AS (PARTITION BY user_id
                       ORDER BY ts,
                         CASE event_type WHEN 'view' THEN 0
                              WHEN 'click' THEN 1
                              WHEN 'purchase' THEN 2 ELSE 3 END,
                         event_type
                       ROWS UNBOUNDED PRECEDING)),
        s1 AS (
          SELECT user_id, ts, event_type, d0,
                 min(CASE WHEN event_type = 'click'
                          AND d0 IS NOT NULL AND ts >= d0
                     THEN ts END) OVER w AS d1
          FROM s0
          WINDOW w AS (PARTITION BY user_id
                       ORDER BY ts,
                         CASE event_type WHEN 'view' THEN 0
                              WHEN 'click' THEN 1
                              WHEN 'purchase' THEN 2 ELSE 3 END,
                         event_type
                       ROWS UNBOUNDED PRECEDING)),
        s2 AS (
          SELECT user_id, d0, d1,
                 min(CASE WHEN event_type = 'purchase'
                          AND d1 IS NOT NULL AND ts >= d1
                     THEN ts END) OVER w AS d2
          FROM s1
          WINDOW w AS (PARTITION BY user_id
                       ORDER BY ts,
                         CASE event_type WHEN 'view' THEN 0
                              WHEN 'click' THEN 1
                              WHEN 'purchase' THEN 2 ELSE 3 END,
                         event_type
                       ROWS UNBOUNDED PRECEDING)),
        u AS (
          SELECT user_id,
                 max(CASE WHEN d0 IS NOT NULL THEN 1 ELSE 0 END) AS c0,
                 max(CASE WHEN d1 IS NOT NULL THEN 1 ELSE 0 END) AS c1,
                 max(CASE WHEN d2 IS NOT NULL THEN 1 ELSE 0 END) AS c2
          FROM s2 GROUP BY user_id),
        t AS (SELECT sum(c0) AS n0, sum(c1) AS n1, sum(c2) AS n2 FROM u)
        SELECT 0 AS step_index, 'view' AS step, n0::BIGINT AS n_users FROM t
        UNION ALL SELECT 1, 'click', n1::BIGINT FROM t
        UNION ALL SELECT 2, 'purchase', n2::BIGINT FROM t
    """

    # cohort retention: first-active day per user, distinct active
    # days, integer counts, exact-ratio retention
    o["events_cohort_retention"] = """
        WITH days AS (
          SELECT DISTINCT user_id AS u, ts::DATE AS d FROM events),
        first AS (
          SELECT u, min(d) AS cohort_day FROM days GROUP BY u),
        sizes AS (
          SELECT cohort_day, count(*) AS cohort_size FROM first
          GROUP BY cohort_day),
        grid AS (
          SELECT f.cohort_day, (dy.d - f.cohort_day) AS offset_days,
                 count(*) AS n_active
          FROM days dy JOIN first f ON dy.u = f.u
          WHERE (dy.d - f.cohort_day) <= 30
          GROUP BY 1, 2)
        SELECT strftime(g.cohort_day, '%Y-%m-%d') AS cohort_day,
               g.offset_days::INT AS offset_days,
               g.n_active,
               s.cohort_size,
               g.n_active / s.cohort_size::DOUBLE AS retention
        FROM grid g JOIN sizes s ON g.cohort_day = s.cohort_day
    """

    # transition matrix: lag over (ts, event_id) per user, exact pair
    # counts, row-normalized exact-integer probabilities
    o["events_transitions"] = """
        WITH p AS (
          SELECT user_id,
                 lag(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev_type,
                 event_type AS next_type
          FROM events),
        c AS (
          SELECT prev_type, next_type, count(*) AS n FROM p
          WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        SELECT prev_type, next_type, n,
               n / (sum(n) OVER (PARTITION BY prev_type))::DOUBLE AS p
        FROM c
    """

    # boosting: positive TF ×0.2 when the negative (lang=de) matches;
    # constant_score should adds a flat 2.5 on source=src3
    o["search_bool_boosting"] = f"""
        WITH t AS (SELECT doc_id AS id, lang, source,
                          {_antoks("text")} AS toks
                   FROM documents),
        s AS (SELECT id, lang, source,
                     {_antf("toks", "table")} AS pos FROM t)
        SELECT id,
               round(pos * CASE WHEN lang = 'de' THEN 0.2::DOUBLE
                           ELSE 1.0::DOUBLE END
                     + CASE WHEN source = 'src3' THEN 2.5::DOUBLE
                       ELSE 0.0::DOUBLE END, 6)::DOUBLE AS score
        FROM s WHERE pos > 0
        ORDER BY score DESC, id ASC LIMIT 15
    """

    # match_phrase_prefix: windows where the head terms match exactly
    # and the closing token starts with the final (prefix) term
    o["search_phrase_prefix"] = f"""
        WITH d AS (
          SELECT doc_id AS id,
                 text || CASE WHEN doc_id % 5 = 2
                              THEN ' The fused vector kernel wins.'
                              ELSE '' END AS c
          FROM documents),
        t AS (SELECT id, {_antoks("c")} AS toks FROM d),
        s AS (SELECT id, CASE WHEN len(toks) >= 3 THEN
                 len([i for i in range(1, len(toks) - 1)
                      if toks[i:i+1] = ['fused', 'vector']
                         and starts_with(toks[i+2], 'ker')])
               ELSE 0 END AS ph
              FROM t)
        SELECT id, round(ph, 6)::DOUBLE AS score
        FROM s WHERE ph > 0
        ORDER BY score DESC, id ASC LIMIT 15
    """

    # significant_text: JLH over per-doc-distinct ANALYZED terms,
    # fg = docs matching the request query (match merge)
    o["search_significant_text"] = f"""
        WITH b AS (SELECT list_distinct({_antoks("text")}) AS toks
                   FROM documents),
        bf AS (SELECT toks,
                      CASE WHEN list_contains(toks, 'merge')
                           THEN 1 ELSE 0 END AS fg
               FROM b),
        s AS (SELECT count(*)::DOUBLE AS n_all, sum(fg)::DOUBLE AS n_fg
              FROM bf),
        tc AS (SELECT unnest(toks) AS term, fg FROM bf),
        g AS (SELECT term, count(*)::BIGINT AS bg_count,
                     sum(fg)::BIGINT AS fg_count
              FROM tc GROUP BY 1),
        j AS (SELECT term, fg_count, bg_count,
                     fg_count / s.n_fg AS fgp,
                     bg_count / s.n_all AS bgp
              FROM g, s)
        SELECT term, fg_count, bg_count,
               round((fgp - bgp) * (fgp / bgp), 6) AS score
        FROM j
        WHERE fgp > bgp AND fg_count >= 3
              AND round((fgp - bgp) * (fgp / bgp), 6) > 0
        ORDER BY score DESC, term ASC LIMIT 10
    """

    # diversified_sampler: cap 2 docs per source by (score desc, id),
    # global top-20 sample, terms agg over the sample + its doc_count
    o["search_request_sampler"] = f"""
        WITH t AS (SELECT doc_id AS id, source, lang,
                          {_antf(_antoks("text"), "table")} AS sc
                   FROM documents),
        m AS (SELECT * FROM t WHERE sc > 0),
        d AS (SELECT *, row_number() OVER (
                 PARTITION BY source ORDER BY sc DESC, id ASC) AS rn
              FROM m),
        smp AS (SELECT * FROM (
                  SELECT *, row_number() OVER (
                    ORDER BY sc DESC, id ASC) AS gr
                  FROM d WHERE rn <= 2)
                WHERE gr <= 20),
        c AS (SELECT count(*)::BIGINT AS samp_doc_count FROM smp)
        SELECT lang AS key, count(*)::BIGINT AS doc_count,
               c.samp_doc_count
        FROM smp, c GROUP BY lang, c.samp_doc_count
        ORDER BY doc_count DESC, key ASC LIMIT 10
    """

    # minhash recall: both shipped pipelines (banded LSH + exact
    # inverted-index Jaccard) replayed at the same k=5 / t=0.5 point,
    # three counts + one rounded ratio
    o["dedup_minhash_recall"] = rf"""
        WITH aug AS ({_SQL_AUG_NEAR}),
        w AS (SELECT doc_id AS id, {_SQL_WORDS} AS w FROM aug),
        sh AS (SELECT id, {_sql_shingles(5)} AS shingles FROM w),
        s AS (SELECT id, list_distinct(shingles) AS shd FROM sh),
        inv AS (SELECT id, unnest(shd) AS g FROM s),
        ecand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
                  FROM inv a JOIN inv b ON a.g = b.g AND a.id < b.id),
        exact AS (SELECT c.id_a, c.id_b
                  FROM ecand c JOIN s sa ON sa.id = c.id_a
                               JOIN s sb ON sb.id = c.id_b
                  WHERE (len(list_intersect(sa.shd, sb.shd))::DOUBLE
                         / (len(sa.shd) + len(sb.shd)
                            - len(list_intersect(sa.shd, sb.shd)))::DOUBLE)
                        >= 0.5::DOUBLE),
        sig AS (SELECT id,
                 [list_min([md5(h::VARCHAR || '#' || s) for s in shingles]) for h in range(0,16)] AS sig
                FROM sh),
        bands AS (SELECT id, band,
                   md5(array_to_string(list_slice(sig, band*4+1, band*4+4), '|')) AS key
                  FROM (SELECT id, sig, unnest(range(0,4)) AS band FROM sig)),
        cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
                 FROM bands a JOIN bands b
                   ON a.band = b.band AND a.key = b.key AND a.id < b.id),
        lsh AS (SELECT c.id_a, c.id_b
                FROM cand c JOIN sig sa ON sa.id = c.id_a
                            JOIN sig sb ON sb.id = c.id_b
                WHERE (len(list_filter(range(1,17), i -> sa.sig[i] = sb.sig[i]))::DOUBLE
                       / 16.0::DOUBLE) >= 0.5::DOUBLE),
        common AS (SELECT count(*) AS c FROM exact e
                   JOIN lsh l ON l.id_a = e.id_a AND l.id_b = e.id_b)
        SELECT (SELECT count(*) FROM exact)::BIGINT AS n_exact,
               (SELECT count(*) FROM lsh)::BIGINT AS n_lsh,
               (SELECT c FROM common)::BIGINT AS n_common,
               round((SELECT c FROM common)::DOUBLE
                     / (SELECT count(*) FROM exact)::DOUBLE, 4) AS recall
    """

    # matryoshka recall: per prefix-dim d the SAME brute-cosine chain
    # folded over range(1, d+1), top-10 per query, joined against the
    # full-64-dim list
    def _mrl_top(d: int, name: str) -> str:
        dot = (
            f"list_sum(list_transform(range(1, {d + 1}),"
            " i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))"
        )
        na = (
            f"sqrt(list_sum(list_transform(range(1, {d + 1}),"
            " i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE)))"
        )
        nb = (
            f"sqrt(list_sum(list_transform(range(1, {d + 1}),"
            " i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)))"
        )
        return f"""
        scored_{name} AS (
          SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                 round({dot} / ({na} * {nb}), 6) AS score
          FROM embeddings a JOIN embeddings b
            ON a.vec_id < 5 AND b.vec_id <> a.vec_id),
        top_{name} AS (
          SELECT query_id, neighbor_id FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                        ORDER BY score DESC, neighbor_id) AS rank
            FROM scored_{name})
          WHERE rank <= 10)"""

    _mrl_rows = " UNION ALL ".join(
        f"""
        SELECT {d} AS dim,
               (SELECT count(*) FROM top_full)::BIGINT AS n_full,
               (SELECT count(*) FROM top_full f
                 JOIN top_d{d} t ON t.query_id = f.query_id
                               AND t.neighbor_id = f.neighbor_id)::BIGINT
                   AS n_common,
               round((SELECT count(*) FROM top_full f
                       JOIN top_d{d} t ON t.query_id = f.query_id
                                     AND t.neighbor_id = f.neighbor_id)::DOUBLE
                     / (SELECT count(*) FROM top_full)::DOUBLE, 4) AS recall
        """
        for d in (8, 16, 32)
    )
    o["emb_matryoshka_recall"] = (
        "WITH "
        + ",".join(
            [_mrl_top(64, "full")] + [_mrl_top(d, f"d{d}") for d in (8, 16, 32)]
        )
        + _mrl_rows
    )

    # mixture epochs: one fold to #sources rows, the same exact
    # floored-DIV / capped-ceil integer arithmetic
    o["corpus_mixture_epochs"] = r"""
        WITH avail AS (
          SELECT lang AS source,
                 sum(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                                     x -> x <> '')))::BIGINT AS avail_tokens
          FROM documents WHERE lang IN ('en', 'de', 'fr', 'es')
          GROUP BY 1),
        t AS (SELECT source, avail_tokens,
                     floor((150000::BIGINT
                            * (CASE source WHEN 'en' THEN 5
                                           WHEN 'de' THEN 2
                                           WHEN 'fr' THEN 2
                                           ELSE 1 END)::BIGINT)::DOUBLE
                           / 10.0::DOUBLE)::BIGINT AS target_tokens
              FROM avail),
        e AS (SELECT *,
                     least(3::BIGINT,
                           floor((target_tokens + avail_tokens - 1)::DOUBLE
                                 / avail_tokens::DOUBLE)::BIGINT) AS eps
              FROM t)
        SELECT source, avail_tokens, target_tokens, eps::INT AS epochs,
               least(target_tokens, avail_tokens * eps) AS yield_tokens,
               target_tokens
                 - least(target_tokens, avail_tokens * eps) AS deficit
        FROM e
    """

    # hybrid RRF: the SAME bm25 CTE chain (query 'window batch spark',
    # LIMIT 20) + the brute-cosine chain pinned to query vec 3, fused
    # by 1/(60+rank) with absent-rank 0
    o["search_hybrid_rrf"] = rf"""
        WITH d0 AS (
          SELECT doc_id AS id, {_antoks("text")} AS toks
          FROM documents),
        d AS (SELECT id, len(toks)::DOUBLE AS dl, {_tf_exprs} FROM d0),
        s AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl,
                     {", ".join(f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END)::DOUBLE AS df_{i}" for i in range(len(_bm_terms)))}
              FROM d),
        lex0 AS (SELECT d.id, round({_score_terms}, 6) AS score
                 FROM d, s WHERE round({_score_terms}, 6) > 0
                 ORDER BY score DESC, id ASC LIMIT 20),
        lex AS (SELECT id, row_number() OVER (
                  ORDER BY score DESC, id ASC) AS lex_rank FROM lex0),
        scored AS (
          SELECT b.vec_id AS id, {_cos} AS score
          FROM embeddings a JOIN embeddings b
            ON a.vec_id = 3 AND b.vec_id <> a.vec_id),
        sem AS (SELECT id, sem_rank FROM (
                  SELECT id, row_number() OVER (
                    ORDER BY score DESC, id) AS sem_rank FROM scored)
                WHERE sem_rank <= 20),
        j AS (SELECT coalesce(l.id, m.id) AS id,
                     coalesce(l.lex_rank, 0)::INT AS lex_rank,
                     coalesce(m.sem_rank, 0)::INT AS sem_rank,
                     round(coalesce(1.0::DOUBLE / (60.0::DOUBLE + l.lex_rank), 0.0::DOUBLE)
                           + coalesce(1.0::DOUBLE / (60.0::DOUBLE + m.sem_rank), 0.0::DOUBLE),
                           6) AS rrf_score
              FROM lex l FULL OUTER JOIN sem m ON l.id = m.id)
        SELECT id, lex_rank, sem_rank, rrf_score
        FROM j ORDER BY rrf_score DESC, id ASC LIMIT 10
    """

    # curriculum: same quality expression as text_quality, exact
    # interpolated decile boundaries (quantile_cont ≡ Spark percentile),
    # stage = 9 − (#boundaries ≤ score), md5 intra-stage key
    _q_expr = r"""
          round(0.5::DOUBLE * least(1.0::DOUBLE, length(text)::DOUBLE / 500.0::DOUBLE)
              + 0.3::DOUBLE * least(1.0::DOUBLE,
                  (CASE WHEN len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) > 0
                        THEN len(regexp_extract_all(lower(text), '{stop}', 1))::DOUBLE
                             / len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> ''))::DOUBLE
                        ELSE 0.0::DOUBLE END) / 0.4::DOUBLE)
              + 0.2::DOUBLE * (1.0::DOUBLE - least(1.0::DOUBLE,
                  (CASE WHEN length(text) > 0
                        THEN len(regexp_extract_all(text, '([.,;:!?])', 1))::DOUBLE
                             / length(text)::DOUBLE
                        ELSE 0.0::DOUBLE END) * 5.0::DOUBLE)),
              6)
    """.replace("{stop}", _stop)
    _qb = ", ".join(
        f"quantile_cont(quality, {i / 10}) AS b{i - 1}" for i in range(1, 10)
    )
    _qs = " + ".join(
        f"(CASE WHEN quality >= b.b{i} THEN 1 ELSE 0 END)" for i in range(9)
    )
    o["train_curriculum"] = f"""
        WITH t AS (SELECT doc_id, {_q_expr} AS quality FROM documents),
        b AS (SELECT {_qb} FROM t)
        SELECT doc_id, quality,
               (9 - ({_qs}))::INT AS stage,
               md5(doc_id::VARCHAR || ':gocrawl') AS sort_key
        FROM t, b
    """

    # C4 span dedup: identical RE2-safe sentence transform, 3-window
    # md5 keys, (doc_id, start)-first election, anti-join removal
    o["text_c4_span_dedup"] = r"""
        WITH aug AS (
          SELECT doc_id,
                 text || CASE WHEN doc_id % 7 = 3
                              THEN ' Spam alpha beta. Buy gold now.'
                                   || ' Offer ends soon. Act fast today.'
                              ELSE '' END AS text
          FROM documents),
        sarr AS (
          SELECT doc_id,
                 list_filter(
                   list_transform(
                     string_split(
                       regexp_replace(text, '([.!?])\s+', '\1' || chr(30), 'g'),
                       chr(30)),
                     x -> trim(x)),
                   x -> x <> '') AS sents
          FROM aug),
        spans AS (
          SELECT doc_id, i AS start,
                 md5(lower(array_to_string(sents[i:i+2], ' '))) AS key
          FROM (SELECT doc_id, sents, unnest(range(1, len(sents) - 1)) AS i
                FROM sarr WHERE len(sents) >= 3)),
        marked AS (
          SELECT doc_id, start,
                 row_number() OVER (PARTITION BY key
                                    ORDER BY doc_id, start) AS rn,
                 count(*) OVER (PARTITION BY key) AS cnt
          FROM spans),
        removals AS (
          SELECT DISTINCT doc_id, unnest(range(start, start + 3)) AS pos
          FROM marked WHERE cnt >= 2 AND rn > 1),
        sents AS (
          SELECT doc_id, i AS pos, sents[i] AS sent
          FROM (SELECT doc_id, sents, unnest(range(1, len(sents) + 1)) AS i
                FROM sarr)),
        kept AS (
          SELECT s.doc_id, s.pos, s.sent FROM sents s
          ANTI JOIN removals r ON r.doc_id = s.doc_id AND r.pos = s.pos),
        rebuilt AS (
          SELECT doc_id, string_agg(sent, ' ' ORDER BY pos) AS text,
                 count(*)::INT AS n_kept
          FROM kept GROUP BY doc_id),
        tot AS (SELECT doc_id, len(sents)::INT AS n_sentences FROM sarr)
        SELECT t.doc_id, coalesce(r.text, '') AS text, t.n_sentences,
               coalesce(r.n_kept, 0)::INT AS n_kept
        FROM tot t LEFT JOIN rebuilt r USING (doc_id)
    """

    # bucket_sort: histogram series (empty buckets filled), re-ordered
    # by doc_count desc (key-asc tiebreak), paged from=1 size=4
    o["search_aggs_bucketsort_a2"] = """
        WITH b AS MATERIALIZED (
          SELECT (floor(n_chars / 50.0) * 50.0)::DOUBLE AS key,
                 count(*) AS doc_count,
                 round(avg(n_chars), 6) AS avg_chars
          FROM documents GROUP BY 1),
        dom AS (
          SELECT (unnest(range(
                   (SELECT floor(min(key) / 50.0)::BIGINT FROM b),
                   (SELECT floor(max(key) / 50.0)::BIGINT FROM b) + 1))
                  * 50.0)::DOUBLE AS key),
        f AS (SELECT dom.key, coalesce(b.doc_count, 0) AS doc_count,
                     b.avg_chars
              FROM dom LEFT JOIN b ON b.key = dom.key),
        r AS (SELECT *, row_number() OVER (
                ORDER BY doc_count DESC, key ASC) AS rk
              FROM f)
        SELECT key, doc_count, avg_chars
        FROM r WHERE rk > 1 AND rk <= 5
        ORDER BY doc_count DESC, key ASC
    """

    # corpus_dup_ngrams: same md5-hashed 5-gram counting; integer
    # ratios divided once and rounded 6 dp
    o["corpus_dup_ngrams"] = f"""
        WITH w AS (SELECT lang, {_SQL_WORDS} AS w FROM documents),
        g AS (SELECT lang, unnest({_sql_shingles(5)}) AS g FROM w),
        gg AS (SELECT lang AS grp, md5(g) AS h, count(*) AS c
               FROM g WHERE g <> '' GROUP BY 1, 2),
        agg AS (SELECT grp,
                 sum(c)::BIGINT AS total_grams,
                 count(*)::BIGINT AS distinct_grams,
                 sum(CASE WHEN c > 1 THEN 1 ELSE 0 END)::BIGINT AS dup_grams,
                 sum(CASE WHEN c > 1 THEN c ELSE 0 END)::BIGINT AS dup_mass
                FROM gg GROUP BY grp)
        SELECT grp, total_grams, distinct_grams, dup_grams, dup_mass,
               round(dup_grams::DOUBLE / distinct_grams, 6) AS frac_dup_grams,
               round(dup_mass::DOUBLE / total_grams, 6) AS frac_dup_mass
        FROM agg
    """

    # text_char_entropy: per-doc char histogram; the c·log2(c) fold
    # runs over SORTED distinct chars in both engines (list_reduce ≡
    # F.aggregate), so the float op sequence matches bit-for-bit
    o["text_char_entropy"] = """
        WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c
                    FROM documents WHERE length(text) > 0),
        cnt AS (SELECT doc_id, c, count(*)::DOUBLE AS cnt
                FROM ch GROUP BY 1, 2),
        agg AS (SELECT doc_id, count(*) AS nd,
                       list_reduce(
                         list_prepend(0.0,
                           list(cnt * log2(cnt) ORDER BY c)),
                         (a, x) -> a + x) AS s
                FROM cnt GROUP BY doc_id)
        SELECT d.doc_id AS id,
               length(d.text)::BIGINT AS n_chars,
               coalesce(agg.nd, 0)::BIGINT AS n_distinct_chars,
               CASE WHEN length(d.text) > 0
                    THEN round(log2(length(d.text)::DOUBLE)
                               - agg.s / length(d.text)::DOUBLE, 6)
                    ELSE 0.0 END AS entropy_bits
        FROM documents d LEFT JOIN agg USING (doc_id)
    """

    # train_length_batches: the shared shard contract, length-sorted
    # row_number cut into batches of 8, integer padding arithmetic
    o["train_length_batches"] = f"""
        WITH k AS (
          SELECT doc_id,
                 len({_SQL_WORDS}) AS n_tokens,
                 md5(doc_id::VARCHAR || ':' || 'gocrawl') AS key,
                 (('0x' || substr(md5(doc_id::VARCHAR || ':' || 'gocrawl'), 1, 8))::UBIGINT
                  % 8)::INTEGER AS shard
          FROM documents),
        numbered AS (
          SELECT shard, n_tokens,
                 ((row_number() OVER (
                     PARTITION BY shard ORDER BY n_tokens, key) - 1)
                  // 8)::INTEGER AS batch
          FROM k),
        agg AS (
          SELECT shard, batch, count(*)::BIGINT AS n_seqs,
                 max(n_tokens)::BIGINT AS max_len,
                 sum(n_tokens)::BIGINT AS sum_len
          FROM numbered GROUP BY shard, batch)
        SELECT shard, batch, n_seqs, max_len, sum_len,
               (n_seqs * max_len)::BIGINT AS padded,
               round(CASE WHEN n_seqs * max_len > 0
                          THEN 1.0 - sum_len::DOUBLE / (n_seqs * max_len)
                          ELSE 0.0 END, 6) AS pad_frac
        FROM agg
    """

    # corpus_cms_hosts: identical md5-row hashing (HLL's hex15->long
    # convention), min-over-rows probe of the (r,b)-grouped sketch
    o["corpus_cms_hosts"] = """
        WITH stream AS (
          SELECT 'h' || (CASE WHEN doc_id % 20 < 10 THEN 0
                              ELSE doc_id % 20 END)::VARCHAR AS host
          FROM documents),
        cells AS (
          SELECT r.i AS r,
                 ('0x' || substr(md5(r.i::VARCHAR || ':' || host), 1, 15))
                   ::UBIGINT::BIGINT % 32 AS b
          FROM stream, (SELECT unnest([0, 1, 2, 3]) AS i) r),
        sk AS (SELECT r, b, count(*)::BIGINT AS c
               FROM cells GROUP BY r, b),
        exact AS (SELECT host, count(*)::BIGINT AS exact
                  FROM stream GROUP BY host),
        probes AS (
          SELECT e.host, r.i AS r,
                 ('0x' || substr(md5(r.i::VARCHAR || ':' || e.host), 1, 15))
                   ::UBIGINT::BIGINT % 32 AS b
          FROM exact e, (SELECT unnest([0, 1, 2, 3]) AS i) r),
        est AS (SELECT p.host, min(coalesce(sk.c, 0))::BIGINT AS est
                FROM probes p LEFT JOIN sk USING (r, b)
                GROUP BY p.host)
        SELECT e.host, e.exact, est.est, est.est - e.exact AS over
        FROM exact e JOIN est USING (host)
    """

    # corpus_doremi_weights: the moore_lewis twin grouped by lang —
    # per-doc excess from the 6 dp-rounded ml_score, #langs-row window
    o["corpus_doremi_weights"] = f"""
        WITH ml AS ({o["text_lm_moore_lewis"]}),
        ex AS (SELECT d.lang AS grp, greatest(-ml.ml_score, 0.0) AS ex
               FROM ml JOIN documents d USING (doc_id)),
        agg AS (SELECT grp, count(*)::BIGINT AS n_docs,
                       round(sum(ex) / count(*), 6) AS avg_excess
                FROM ex GROUP BY grp)
        SELECT grp, n_docs, avg_excess,
               CASE WHEN sum(avg_excess) OVER () > 0
                    THEN round(avg_excess / sum(avg_excess) OVER (), 6)
                    ELSE round(1.0 / count(*) OVER (), 6)
               END AS weight
        FROM agg
    """

    # crawl_fetch_gini: identical rank construction (cnt ASC, key ASC) and
    # operand order in the three ratios; dec_cnt only feeds a division so
    # its integer width is irrelevant to the stringified compare
    o["crawl_fetch_gini"] = """
        WITH s AS (SELECT CASE WHEN doc_id % 4 = 0 THEN 'hot.example'
                               ELSE source END AS k FROM documents),
        f AS (SELECT k, count(*) AS cnt FROM s GROUP BY k),
        r AS (SELECT k, cnt,
                     row_number() OVER (ORDER BY cnt ASC, k ASC) AS r FROM f),
        b AS (SELECT count(*)::BIGINT AS n_hosts, sum(cnt)::BIGINT AS n_fetches,
                     max(cnt)::BIGINT AS max_cnt,
                     sum(r::DOUBLE * cnt) AS src,
                     sum(cnt::DOUBLE * cnt) AS sc2 FROM r),
        d AS (SELECT coalesce(sum(cnt), 0)::BIGINT AS dec_cnt
              FROM r, b WHERE b.n_hosts - r.r + 1 <= ceil(b.n_hosts / 10.0))
        SELECT n_hosts, n_fetches, max_cnt,
               round(2.0 * src / (n_hosts::DOUBLE * n_fetches::DOUBLE)
                     - (n_hosts + 1.0) / n_hosts, 6) AS gini,
               round(sc2 / (n_fetches::DOUBLE * n_fetches::DOUBLE), 6) AS hhi,
               round(dec_cnt::DOUBLE / n_fetches, 6) AS top_decile_share
        FROM b, d
    """

    # corpus_report_card: quality expression is the text_quality twin
    # verbatim (same as curate_host_stats), grouped by lang; the exact
    # lower median replays the same frequency-table cumulative cut
    o["corpus_report_card"] = rf"""
        WITH aug AS ({_SQL_AUG_EXACT}),
        t AS (
          SELECT lang, source AS host, doc_id, md5(text) AS th,
                 len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                                 x -> x <> '')) AS tok,
                 len(regexp_extract_all(lower(text), '{_stop}', 1)) AS stop_hits,
                 len(regexp_extract_all(text, '([.,;:!?])', 1)) AS punct_cnt,
                 length(text)::DOUBLE AS n_chars
          FROM aug),
        tq AS (
          SELECT lang, host, th, tok,
                 round(0.5::DOUBLE * least(1.0::DOUBLE, n_chars / 500.0::DOUBLE)
                     + 0.3::DOUBLE * least(1.0::DOUBLE,
                         (CASE WHEN tok > 0 THEN stop_hits / tok::DOUBLE
                               ELSE 0.0::DOUBLE END) / 0.4::DOUBLE)
                     + 0.2::DOUBLE * (1.0::DOUBLE - least(1.0::DOUBLE,
                         (CASE WHEN n_chars > 0 THEN punct_cnt / n_chars
                               ELSE 0.0::DOUBLE END) * 5.0::DOUBLE)), 6) AS q
          FROM t),
        a AS (
          SELECT lang, count(*)::BIGINT AS n_docs,
                 count(DISTINCT host)::BIGINT AS n_hosts,
                 sum(tok)::BIGINT AS n_tokens,
                 count(DISTINCT th)::BIGINT AS n_uniq,
                 round(avg(tok), 4) AS mean_doc_tokens,
                 round(avg(q), 4) AS mean_quality,
                 sum(CASE WHEN tok < 50 THEN 1 ELSE 0 END)::BIGINT AS n_short
          FROM tq GROUP BY lang),
        ft AS (SELECT lang, tok, count(*) AS cnt FROM tq GROUP BY lang, tok),
        cum AS (SELECT lang, tok,
                       sum(cnt) OVER (PARTITION BY lang ORDER BY tok ASC
                                      ROWS UNBOUNDED PRECEDING) AS cum
                FROM ft),
        med AS (SELECT c.lang, min(c.tok) AS p50_doc_tokens
                FROM cum c JOIN a ON c.lang = a.lang
                WHERE c.cum >= ceil(a.n_docs / 2.0) GROUP BY c.lang)
        SELECT a.lang, a.n_docs, a.n_hosts, a.n_tokens, a.mean_doc_tokens,
               m.p50_doc_tokens,
               round(1.0 - n_uniq::DOUBLE / n_docs, 6) AS dup_rate,
               a.mean_quality,
               round(n_short::DOUBLE / n_docs, 6) AS short_frac
        FROM a JOIN med m ON a.lang = m.lang
    """

    # search_hard_negatives: the search_rank_eval pool/rating CTEs with
    # pool_k=20, rating<1 survivors cut to the top 5 by pool rank
    o["search_hard_negatives"] = f"""
        WITH reqs(request_id, pos, term) AS (VALUES {_rq_rows}),
        d0 AS (SELECT doc_id AS id, {_antoks("text")} AS toks FROM documents),
        tf AS (
          SELECT id, dl, term, count(*)::BIGINT AS tf
          FROM (SELECT id, len(toks)::BIGINT AS dl, unnest(toks) AS term FROM d0)
          WHERE term IN ({_rq_terms})
          GROUP BY id, dl, term),
        s AS (SELECT count(*)::DOUBLE AS n_docs,
                     avg(len(toks))::DOUBLE AS avgdl
              FROM d0),
        dfq AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        lp AS (
          SELECT r.request_id, t.id, r.pos,
                 ln(1.0::DOUBLE + (s.n_docs - f.df + 0.5::DOUBLE) / (f.df + 0.5::DOUBLE))
                 * t.tf::DOUBLE
                 / (t.tf::DOUBLE + 1.2::DOUBLE
                    * (1.0::DOUBLE - 0.75::DOUBLE
                       + 0.75::DOUBLE * t.dl::DOUBLE / s.avgdl)) AS lp
          FROM tf t JOIN reqs r USING (term) JOIN dfq f USING (term), s),
        sc AS (
          SELECT request_id, id,
                 round(list_reduce(list_prepend(0.0, list(lp ORDER BY pos)),
                                   (acc, x) -> acc + x), 6) AS score
          FROM lp GROUP BY request_id, id),
        topk AS (
          SELECT request_id, id, score,
                 row_number() OVER (PARTITION BY request_id
                                    ORDER BY score DESC, id ASC) AS rank
          FROM sc WHERE score > 0
          QUALIFY rank <= 20),
        pool AS (SELECT DISTINCT request_id, id FROM lp),
        rat AS (
          SELECT request_id, id,
                 CASE WHEN h % 10 < 6 THEN ((h // 10) % 3 + 1)::INT
                      ELSE 0 END AS rating
          FROM (SELECT request_id, id,
                       ('0x' || substr(md5(request_id || ':' || id::VARCHAR
                                           || ':' || 'rank-eval'), 1, 8))::UBIGINT AS h
                FROM pool))
        SELECT request_id, id, score, rank,
               row_number() OVER (PARTITION BY request_id
                                  ORDER BY rank ASC) AS neg_rank
        FROM (SELECT t.request_id, t.id, t.score, t.rank,
                     coalesce(r.rating, 0) AS rating
              FROM topk t LEFT JOIN rat r USING (request_id, id))
        WHERE rating < 1
        QUALIFY neg_rank <= 5
    """

    # crawl_ucb_schedule: same synthesized variable-depth history, same
    # lag-based change counting, UCB1 bonus with N folded as a scalar
    o["crawl_ucb_schedule"] = r"""
        WITH hist AS (
          SELECT 'https://h.example.com/doc/' || doc_id::VARCHAR AS url,
                 g AS generation,
                 CASE WHEN doc_id % 3 = 0 THEN g
                      WHEN doc_id % 3 = 1 AND g >= 2 THEN 1
                      ELSE 0 END AS page_ts
          FROM documents,
               unnest(range(0, CASE WHEN doc_id % 4 = 0 THEN 6 ELSE 3 END)) AS t(g)),
        obs AS (
          SELECT url, generation, page_ts,
                 lag(page_ts) OVER (PARTITION BY url ORDER BY generation) AS prev
          FROM hist),
        agg AS (
          SELECT url, count(*) AS n_obs,
                 sum(CASE WHEN prev IS NOT NULL AND page_ts <> prev
                          THEN 1 ELSE 0 END)::BIGINT AS n_changes
          FROM obs GROUP BY url HAVING count(*) >= 2),
        tot AS (SELECT sum(n_obs - 1)::DOUBLE AS N FROM agg)
        SELECT url, n_obs, n_changes,
               round(n_changes::DOUBLE / (n_obs - 1), 6) AS mean_change,
               round(n_changes::DOUBLE / (n_obs - 1)
                     + sqrt(2.0 * ln(N) / (n_obs - 1)::DOUBLE), 6) AS ucb
        FROM agg, tot
    """

    # text_quality_roc: clf score CTEs (text_quality_clf twin) joined to
    # the gopher keep verdict (text_gopher twin) as labels; AUC folds off
    # the score frequency table with the 0.5 tie credit
    o["text_quality_roc"] = rf"""
        WITH w AS (SELECT doc_id, {_SQL_WORDS} AS w FROM documents),
        f AS (SELECT doc_id,
                     unnest(w || [w[i+1] || ' ' || w[i+2] for i in range(0, len(w)-1)]) AS f
              FROM w),
        b AS (SELECT doc_id,
                     (('0x' || substr(md5(f), 1, 8))::UBIGINT % 1024)::INT AS bucket
              FROM f),
        wt AS (SELECT i::INT AS bucket,
                      round((('0x' || substr(md5('quality-clf:' || i), 1, 8))::UBIGINT::DOUBLE
                             / 4294967296.0) * 2 - 1, 6) AS weight
               FROM range(0, 1024) t(i)),
        agg AS (SELECT b.doc_id, count(*) AS n_feats, round(sum(wt.weight), 6) AS s
                FROM b JOIN wt USING (bucket) GROUP BY b.doc_id),
        sc AS (SELECT d.doc_id,
                      round(1.0 / (1.0 + exp(-(coalesce(a.s, 0.0)
                          / greatest(coalesce(a.n_feats, 0)::DOUBLE, 1.0)))), 6) AS score
               FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id),
        gt AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ws,
                 len(regexp_extract_all(text, '([.,;:!?])', 1)) AS punct
          FROM documents),
        lab AS (
          SELECT doc_id,
                 (len(ws) >= 50
                  AND list_sum(list_transform(ws, x -> length(x)))::DOUBLE
                      / len(ws)::DOUBLE BETWEEN 3.0 AND 10.0
                  AND len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
                      / len(ws)::DOUBLE >= 0.8
                  AND punct::DOUBLE / len(ws)::DOUBLE <= 0.1) AS y
          FROM gt),
        j AS (SELECT sc.score AS s, lab.y FROM sc JOIN lab USING (doc_id)),
        freq AS (SELECT s,
                        sum(CASE WHEN y THEN 1 ELSE 0 END)::BIGINT AS np,
                        sum(CASE WHEN y THEN 0 ELSE 1 END)::BIGINT AS nn
                 FROM j GROUP BY s),
        r AS (SELECT s, np, nn,
                     coalesce(sum(nn) OVER (ORDER BY s ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cnb
              FROM freq),
        tot AS (SELECT sum(np)::BIGINT AS P, sum(nn)::BIGINT AS N,
                       sum((np * (2 * cnb + nn))::HUGEINT) AS U2 FROM r),
        a2 AS (SELECT CASE WHEN P > 0 AND N > 0
                           THEN round(U2::DOUBLE / 2.0 / (P::DOUBLE * N::DOUBLE), 6)
                           ELSE 0.0 END AS auc FROM tot),
        thr AS (SELECT unnest([0.3, 0.4, 0.5, 0.6, 0.7]::DOUBLE[]) AS threshold),
        conf AS (SELECT threshold,
                        sum(CASE WHEN s >= threshold THEN np ELSE 0 END)::BIGINT AS tp,
                        sum(CASE WHEN s >= threshold THEN nn ELSE 0 END)::BIGINT AS fp,
                        sum(CASE WHEN s <  threshold THEN np ELSE 0 END)::BIGINT AS fn,
                        sum(CASE WHEN s <  threshold THEN nn ELSE 0 END)::BIGINT AS tn
                 FROM r, thr GROUP BY threshold)
        SELECT threshold, tp, fp, fn, tn,
               CASE WHEN tp + fp > 0
                    THEN round(tp / (tp + fp)::DOUBLE, 6) ELSE 0.0 END AS precision,
               CASE WHEN tp + fn > 0
                    THEN round(tp / (tp + fn)::DOUBLE, 6) ELSE 0.0 END AS recall,
               CASE WHEN 2 * tp + fp + fn > 0
                    THEN round(2.0 * tp / (2 * tp + fp + fn)::DOUBLE, 6)
                    ELSE 0.0 END AS f1,
               auc
        FROM conf, a2
    """

    # corpus_pipeline_funnel: exact-survivor election (dedup_exact twin),
    # gopher verdict (text_gopher twin), contamination shingle join
    # (decontaminate twin), folded once and unpivoted to 4 stage rows
    o["corpus_pipeline_funnel"] = rf"""
        WITH t AS (
          SELECT doc_id,
                 len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                                 x -> x <> ''))::BIGINT AS tok,
                 md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS tk
          FROM documents),
        surv AS (SELECT doc_id, tok,
                        row_number() OVER (PARTITION BY tk ORDER BY doc_id) = 1 AS surv
                 FROM t),
        gt AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ws,
                 len(regexp_extract_all(text, '([.,;:!?])', 1)) AS punct
          FROM documents),
        lab AS (
          SELECT doc_id,
                 (len(ws) >= 50
                  AND list_sum(list_transform(ws, x -> length(x)))::DOUBLE
                      / len(ws)::DOUBLE BETWEEN 3.0 AND 10.0
                  AND len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
                      / len(ws)::DOUBLE >= 0.8
                  AND punct::DOUBLE / len(ws)::DOUBLE <= 0.1) AS y
          FROM gt),
        w0 AS (SELECT doc_id, {_SQL_WORDS} AS w FROM documents),
        dsh AS (SELECT doc_id, unnest(list_distinct(sh)) AS g
                FROM (SELECT doc_id, CASE WHEN len(w) >= 8
            THEN [array_to_string(list_slice(w, i+1, i+8), ' ') for i in range(0, len(w)-7)]
            ELSE [array_to_string(w, ' ')] END AS sh FROM w0)),
        bw AS (SELECT doc_id AS bench_id, list_slice(w, 3, 12) AS w
               FROM w0 WHERE doc_id % 50 = 10),
        bsh AS (SELECT bench_id, unnest(list_distinct(sh)) AS g
                FROM (SELECT bench_id, CASE WHEN len(w) >= 8
            THEN [array_to_string(list_slice(w, i+1, i+8), ' ') for i in range(0, len(w)-7)]
            ELSE [array_to_string(w, ' ')] END AS sh FROM bw)),
        dirty AS (SELECT DISTINCT d.doc_id FROM dsh d JOIN bsh b USING (g)),
        fl AS (SELECT s.doc_id, s.tok, s.surv, l.y,
                      (dy.doc_id IS NOT NULL) AS dirty
               FROM surv s JOIN lab l USING (doc_id)
               LEFT JOIN dirty dy USING (doc_id)),
        agg AS (SELECT
            count(*)::BIGINT AS n1, sum(tok)::BIGINT AS t1,
            sum(CASE WHEN surv THEN 1 ELSE 0 END)::BIGINT AS n2,
            sum(CASE WHEN surv THEN tok ELSE 0 END)::BIGINT AS t2,
            sum(CASE WHEN surv AND y THEN 1 ELSE 0 END)::BIGINT AS n3,
            sum(CASE WHEN surv AND y THEN tok ELSE 0 END)::BIGINT AS t3,
            sum(CASE WHEN surv AND y AND NOT dirty THEN 1 ELSE 0 END)::BIGINT AS n4,
            sum(CASE WHEN surv AND y AND NOT dirty THEN tok ELSE 0 END)::BIGINT AS t4
          FROM fl),
        stages(stage_no, stage) AS (VALUES
            (1, 'raw'), (2, 'exact_dedup'),
            (3, 'quality_gate'), (4, 'decontaminated'))
        SELECT stage_no, stage,
               CASE stage_no WHEN 1 THEN n1 WHEN 2 THEN n2
                             WHEN 3 THEN n3 ELSE n4 END AS n_docs,
               CASE stage_no WHEN 1 THEN t1 WHEN 2 THEN t2
                             WHEN 3 THEN t3 ELSE t4 END AS n_tokens,
               round((CASE stage_no WHEN 1 THEN n1 WHEN 2 THEN n2
                                    WHEN 3 THEN n3 ELSE n4 END)::DOUBLE
                     / n1::DOUBLE, 6) AS doc_frac,
               round((CASE stage_no WHEN 1 THEN t1 WHEN 2 THEN t2
                                    WHEN 3 THEN t3 ELSE t4 END)::DOUBLE
                     / t1::DOUBLE, 6) AS token_frac
        FROM stages, agg
    """

    # crawl_seed_expansion: same doc_edges + host mapping as the host
    # graph twin, same per-page host-ASC cap, same src-keyed pairing
    o["crawl_seed_expansion"] = r"""
        WITH e AS (
          SELECT doc_id AS src,
                 (doc_id * 31 + 7 * (j + 1) + 1) % (SELECT count(*) FROM documents) AS dst
          FROM documents, range(0, 6) t(j)
          WHERE j < 3 + doc_id % 3),
        h AS (SELECT DISTINCT src,
                'site' || lpad((CASE WHEN dst % 4 = 0 THEN 0
                                     ELSE 1 + dst % 15 END)::VARCHAR, 2, '0')
                       || '.example.com' AS host
              FROM e),
        seeds(host) AS (VALUES ('site01.example.com'), ('site05.example.com')),
        sc AS (SELECT h.src, h.host AS seed_host
               FROM h JOIN seeds s ON h.host = s.host),
        cand AS (SELECT h.src, h.host,
                        row_number() OVER (PARTITION BY h.src
                                           ORDER BY h.host ASC) AS rn
                 FROM h LEFT JOIN seeds s ON h.host = s.host
                 WHERE s.host IS NULL QUALIFY rn <= 32)
        SELECT cand.host,
               count(DISTINCT cand.src)::BIGINT AS n_pages,
               count(DISTINCT sc.seed_host)::BIGINT AS n_seed_hosts
        FROM cand JOIN sc ON cand.src = sc.src
        GROUP BY cand.host
    """

    # text_para_prune: the text_lm_ppl trainer CTEs over the noisy
    # corpus, transitions keyed (doc, paragraph), position-ordered
    # fold, keep = unscoreable OR rounded ppl <= 100, ordered re-join
    _para_words = _SQL_WORDS.replace("lower(text)", "lower(para)")
    o["text_para_prune"] = rf"""
        WITH nd AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 5 = 0 THEN text || chr(10)
                        || 'zz' || doc_id::VARCHAR || ' qq' || doc_id::VARCHAR
                        || ' wx' || doc_id::VARCHAR || ' kv' || doc_id::VARCHAR
                      ELSE text END AS text
          FROM documents),
        w AS (SELECT doc_id, {_SQL_WORDS} AS w FROM nd),
        uni AS (SELECT u AS w1, count(*) AS c1
                FROM (SELECT unnest(w) AS u FROM w) GROUP BY u),
        v AS (SELECT count(*) AS v FROM uni),
        bgc AS (SELECT bg, count(*) AS c2 FROM (
                  SELECT unnest([array_to_string(list_slice(w, i+1, i+2), ' ')
                                 for i in range(0, len(w) - 1)]) AS bg
                  FROM w WHERE len(w) >= 2) GROUP BY bg),
        p0 AS (SELECT doc_id, u.pidx, u.para FROM (
                 SELECT doc_id,
                        unnest([{{'pidx': i, 'para': parts[i+1]}}
                                for i in range(0, len(parts))]) AS u
                 FROM (SELECT doc_id, string_split(text, chr(10)) AS parts
                       FROM nd))
               WHERE trim(u.para) <> ''),
        pw AS (SELECT doc_id, pidx, {_para_words} AS w FROM p0),
        trans AS (
          SELECT doc_id, pidx, u.pos, u.bg,
                 string_split(u.bg, ' ')[1] AS w1
          FROM (SELECT doc_id, pidx,
                       unnest([{{'pos': i,
                                 'bg': array_to_string(list_slice(w, i+1, i+2), ' ')}}
                               for i in range(0, len(w) - 1)]) AS u
                FROM pw WHERE len(w) >= 2)),
        j AS (SELECT t.doc_id, t.pidx, t.pos,
                     ln((coalesce(b.c2, 0) + 1.0)
                        / (coalesce(u.c1, 0) + 1.0 * (SELECT v FROM v))) AS lp
              FROM trans t
              LEFT JOIN bgc b ON t.bg = b.bg
              LEFT JOIN uni u ON t.w1 = u.w1),
        sc AS (SELECT doc_id, pidx, count(*) AS n_trans,
                      list_reduce(list_prepend(0.0, list(lp ORDER BY pos)),
                                  (acc, x) -> acc + x) AS sum_lp
               FROM j GROUP BY doc_id, pidx),
        fl AS (SELECT p.doc_id, p.pidx, p.para,
                      (s.n_trans IS NULL
                       OR round(exp(-s.sum_lp / s.n_trans), 6) <= 100.0) AS keep
               FROM p0 p LEFT JOIN sc s USING (doc_id, pidx)),
        g AS (
          SELECT doc_id,
                 count(*)::BIGINT AS n_paras,
                 sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_kept,
                 array_to_string(
                   list_transform(
                     list_filter(
                       list(struct_pack(pidx := pidx, para := para, keep := keep)
                            ORDER BY pidx),
                       x -> x.keep),
                     x -> x.para),
                   chr(10)) AS text
          FROM fl GROUP BY doc_id)
        SELECT d.doc_id,
               coalesce(g.n_paras, 0)::BIGINT AS n_paras,
               coalesce(g.n_kept, 0)::BIGINT AS n_kept,
               coalesce(g.text, '') AS text
        FROM documents d LEFT JOIN g USING (doc_id)
    """

    # crawl_refetch_waste: same synthesized history + hosts, lag-based
    # unchanged counting, one host rollup
    o["crawl_refetch_waste"] = r"""
        WITH hist AS (
          SELECT 'https://h.example.com/doc/' || doc_id::VARCHAR AS url,
                 'h' || (doc_id % 7)::VARCHAR || '.example.com' AS host,
                 g AS generation,
                 CASE WHEN doc_id % 3 = 0 THEN g
                      WHEN doc_id % 3 = 1 AND g >= 2 THEN 1
                      ELSE 0 END AS page_ts
          FROM documents, unnest(range(0, 4)) AS t(g)),
        obs AS (
          SELECT url, host, page_ts,
                 lag(page_ts) OVER (PARTITION BY url ORDER BY generation) AS prev
          FROM hist),
        agg AS (
          SELECT host,
                 count(DISTINCT url)::BIGINT AS n_urls,
                 sum(CASE WHEN prev IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_refetches,
                 sum(CASE WHEN prev IS NOT NULL AND page_ts = prev
                          THEN 1 ELSE 0 END)::BIGINT AS n_unchanged
          FROM obs GROUP BY host)
        SELECT host, n_urls, n_refetches, n_unchanged,
               CASE WHEN n_refetches > 0
                    THEN round(n_unchanged::DOUBLE / n_refetches, 6)
                    ELSE 0.0 END AS waste_share
        FROM agg
    """

    # curate_host_cap: the text_quality score twin ranked per host,
    # (quality DESC, doc_id ASC) election cut at 10
    o["curate_host_cap"] = rf"""
        WITH t AS (
          SELECT doc_id, source AS host,
                 len(regexp_extract_all(lower(text), '{_stop}', 1)) AS stop_hits,
                 len(regexp_extract_all(text, '([.,;:!?])', 1)) AS punct_cnt,
                 length(text)::DOUBLE AS n_chars,
                 len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                                 x -> x <> ''))::DOUBLE AS n_tok
          FROM documents),
        q AS (
          SELECT doc_id, host,
                 round(0.5::DOUBLE * least(1.0::DOUBLE, n_chars / 500.0::DOUBLE)
                     + 0.3::DOUBLE * least(1.0::DOUBLE,
                         (CASE WHEN n_tok > 0 THEN stop_hits / n_tok
                               ELSE 0.0::DOUBLE END) / 0.4::DOUBLE)
                     + 0.2::DOUBLE * (1.0::DOUBLE - least(1.0::DOUBLE,
                         (CASE WHEN n_chars > 0 THEN punct_cnt / n_chars
                               ELSE 0.0::DOUBLE END) * 5.0::DOUBLE)), 6) AS quality
          FROM t)
        SELECT doc_id, host, quality,
               row_number() OVER (PARTITION BY host
                                  ORDER BY quality DESC, doc_id ASC) AS host_rank
        FROM q QUALIFY host_rank <= 10
    """

    # train_quality_clf: the clf feature/label CTEs with 3 GD sweeps
    # unrolled (the bpe_train_merges pattern) in the SAME integer
    # micro-unit arithmetic: per-doc long sums, sigma one rounded float
    # op, per-occurrence contribution rounded to a micro-unit before
    # the exact fold, update round(0.5*g) half-away-from-zero
    o["train_quality_clf"] = rf"""
        WITH w AS (SELECT doc_id, {_SQL_WORDS} AS w FROM documents),
        f AS (SELECT doc_id,
                     unnest(w || [w[i+1] || ' ' || w[i+2] for i in range(0, len(w)-1)]) AS f
              FROM w),
        b AS (SELECT doc_id,
                     (('0x' || substr(md5(f), 1, 8))::UBIGINT % 1024)::INT AS bucket
              FROM f),
        nd AS (SELECT doc_id, count(*)::BIGINT AS n FROM b GROUP BY doc_id),
        gt AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ws,
                 len(regexp_extract_all(text, '([.,;:!?])', 1)) AS punct
          FROM documents),
        lab AS (
          SELECT doc_id,
                 (len(ws) >= 50
                  AND list_sum(list_transform(ws, x -> length(x)))::DOUBLE
                      / len(ws)::DOUBLE BETWEEN 3.0 AND 10.0
                  AND len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
                      / len(ws)::DOUBLE >= 0.8
                  AND punct::DOUBLE / len(ws)::DOUBLE <= 0.1) AS y
          FROM gt),
        -- sweep 1: w0 = 0, sigma = round(1/(1+exp(0)), 6) = 0.5
        r1 AS (SELECT nd.doc_id, nd.n,
                      round((0.5 - CASE WHEN y THEN 1.0 ELSE 0.0 END) * 1e6)::BIGINT AS r
               FROM nd JOIN lab USING (doc_id)),
        g1 AS (SELECT b.bucket,
                      sum(round(r1.r::DOUBLE / r1.n)::BIGINT)::BIGINT AS g
               FROM b JOIN r1 USING (doc_id) GROUP BY b.bucket),
        w1 AS (SELECT bucket, (0 - round(0.5 * g)::BIGINT)::BIGINT AS wv FROM g1),
        -- sweep 2
        s2 AS (SELECT b.doc_id, count(*)::BIGINT AS n,
                      sum(coalesce(w1.wv, 0))::BIGINT AS s
               FROM b LEFT JOIN w1 USING (bucket) GROUP BY b.doc_id),
        r2 AS (SELECT s2.doc_id, s2.n,
                      round((round(1.0 / (1.0 + exp(-(s2.s::DOUBLE / 1e6 / s2.n))), 6)
                             - CASE WHEN y THEN 1.0 ELSE 0.0 END) * 1e6)::BIGINT AS r
               FROM s2 JOIN lab USING (doc_id)),
        g2 AS (SELECT b.bucket,
                      sum(round(r2.r::DOUBLE / r2.n)::BIGINT)::BIGINT AS g
               FROM b JOIN r2 USING (doc_id) GROUP BY b.bucket),
        w2 AS (SELECT coalesce(w1.bucket, g2.bucket) AS bucket,
                      (coalesce(w1.wv, 0) - round(0.5 * coalesce(g2.g, 0))::BIGINT)::BIGINT AS wv
               FROM w1 FULL JOIN g2 ON w1.bucket = g2.bucket),
        -- sweep 3
        s3 AS (SELECT b.doc_id, count(*)::BIGINT AS n,
                      sum(coalesce(w2.wv, 0))::BIGINT AS s
               FROM b LEFT JOIN w2 USING (bucket) GROUP BY b.doc_id),
        r3 AS (SELECT s3.doc_id, s3.n,
                      round((round(1.0 / (1.0 + exp(-(s3.s::DOUBLE / 1e6 / s3.n))), 6)
                             - CASE WHEN y THEN 1.0 ELSE 0.0 END) * 1e6)::BIGINT AS r
               FROM s3 JOIN lab USING (doc_id)),
        g3 AS (SELECT b.bucket,
                      sum(round(r3.r::DOUBLE / r3.n)::BIGINT)::BIGINT AS g
               FROM b JOIN r3 USING (doc_id) GROUP BY b.bucket),
        w3 AS (SELECT coalesce(w2.bucket, g3.bucket) AS bucket,
                      (coalesce(w2.wv, 0) - round(0.5 * coalesce(g3.g, 0))::BIGINT)::BIGINT AS wv
               FROM w2 FULL JOIN g3 ON w2.bucket = g3.bucket)
        SELECT bucket, wv / 1e6 AS weight FROM w3
    """

    # crawl_robots_drift: the robots_gate_s3 longest-match CASE as a
    # per-host disallowed rollup over the same URL mix
    o["crawl_robots_drift"] = r"""
        WITH u AS (
          SELECT doc_id,
                 doc_id % 16 AS hi,
                 CASE doc_id % 4
                   WHEN 0 THEN '/article/' || doc_id
                   WHEN 1 THEN '/category/' || doc_id
                   WHEN 2 THEN '/page/' || doc_id
                   ELSE '/page/1' || doc_id
                 END AS path
          FROM documents),
        v AS (
          SELECT 'site' || lpad(hi::VARCHAR, 2, '0') || '.example.com' AS host,
                 CASE
                   WHEN path LIKE '/category/%' THEN FALSE
                   WHEN hi % 3 = 0 AND path LIKE '/page/1%' THEN TRUE
                   WHEN hi % 3 = 0 AND path LIKE '/page/%' THEN FALSE
                   WHEN hi % 5 = 2 THEN FALSE
                   ELSE TRUE END AS ok
          FROM u),
        agg AS (
          SELECT host, count(*)::BIGINT AS n_fetched,
                 sum(CASE WHEN ok THEN 0 ELSE 1 END)::BIGINT AS n_disallowed
          FROM v GROUP BY host)
        SELECT host, n_fetched, n_disallowed,
               round(n_disallowed::DOUBLE / n_fetched, 6) AS disallowed_share
        FROM agg
    """

    # search_knn: the deterministic IVF assignment + probe replayed in
    # SQL (the ann_ivf twin) for the vec_id-7 query vector
    def _qcos(x: str) -> str:
        return (
            f"round(list_sum(list_transform(range(1, 65), i -> q.v[i]::DOUBLE * {x}[i]::DOUBLE))"
            f" / (sqrt(list_sum(list_transform(range(1, 65), i -> q.v[i]::DOUBLE * q.v[i]::DOUBLE)))"
            f" * sqrt(list_sum(list_transform(range(1, 65), i -> {x}[i]::DOUBLE * {x}[i]::DOUBLE)))), 6)"
        )

    _knn_chain = f"""
        cents AS (SELECT vec_id AS centroid_id, embedding FROM embeddings
                  WHERE vec_id < 16),
        qvq AS (SELECT embedding AS v FROM embeddings WHERE vec_id = 7),
        kprobes AS (
          SELECT centroid_id FROM (
            SELECT c.centroid_id,
                   row_number() OVER (ORDER BY {_qcos("c.embedding")} DESC,
                                      c.centroid_id) AS rn
            FROM qvq q, cents c)
          WHERE rn <= 4),
        kasgn AS (
          SELECT vec_id, embedding, centroid_id FROM (
            SELECT a.vec_id, a.embedding, b.centroid_id,
                   row_number() OVER (PARTITION BY a.vec_id
                                      ORDER BY {_cos} DESC, b.centroid_id) AS rn
            FROM embeddings a
            JOIN (SELECT centroid_id, embedding FROM cents) b ON true)
          WHERE rn = 1),
        kscored AS (
          SELECT v.vec_id AS id, {_qcos("v.embedding")} AS kscore
          FROM qvq q, kasgn v JOIN kprobes p USING (centroid_id)),
        ktop AS (
          SELECT id, kscore FROM (
            SELECT *, row_number() OVER (ORDER BY kscore DESC, id) AS rn
            FROM kscored)
          WHERE rn <= 10)"""

    o["search_knn"] = f"""
        WITH {_knn_chain}
        SELECT id, kscore AS score FROM ktop
    """

    o["search_knn_hybrid"] = f"""
        WITH {_knn_chain},
        qh AS (
          SELECT d.doc_id AS id,
                 {_antf(_antoks("d.text"), "table")}::DOUBLE AS qscore
          FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
          WHERE {_antf(_antoks("d.text"), "table")} > 0),
        merged AS (
          SELECT coalesce(qh.id, ktop.id) AS id,
                 round(coalesce(qh.qscore, 0) + coalesce(ktop.kscore, 0), 6)
                   AS score
          FROM qh FULL OUTER JOIN ktop ON qh.id = ktop.id)
        SELECT id, score FROM (
          SELECT *, row_number() OVER (ORDER BY score DESC, id) AS rn
          FROM merged)
        WHERE rn <= 15
    """

    # two-sided CUSUM: densified hourly grid (types × span hours),
    # same integer median/MAD + prefix-sum/running-extreme recurrences
    # in both directions
    o["events_cusum_twosided"] = """
        WITH ev AS (
          SELECT * FROM events
          WHERE NOT (event_type = 'error'
                     AND ts >= TIMESTAMP '2024-01-20 00:00:00')),
        span AS (
          SELECT date_trunc('hour', min(ts)) AS t0,
                 date_trunc('hour', max(ts)) AS t1
          FROM ev),
        grid AS (
          SELECT t.event_type,
                 strftime(unnest(generate_series(span.t0, span.t1,
                                                 INTERVAL 1 HOUR)),
                          '%Y-%m-%d %H:00') AS bucket
          FROM (SELECT DISTINCT event_type FROM ev) t, span),
        c0 AS (
          SELECT event_type,
                 strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS bucket,
                 count(*)::BIGINT AS n
          FROM ev GROUP BY 1, 2),
        c AS (
          SELECT g.event_type, g.bucket, coalesce(c0.n, 0)::BIGINT AS n
          FROM grid g LEFT JOIN c0
            ON g.event_type = c0.event_type AND g.bucket = c0.bucket),
        r AS (
          SELECT *, row_number() OVER (PARTITION BY event_type
                                       ORDER BY n ASC, bucket ASC) AS rn,
                    count(*) OVER (PARTITION BY event_type) AS m
          FROM c),
        med AS (
          SELECT *, max(CASE WHEN rn = (m + 1) // 2 THEN n END)
                      OVER (PARTITION BY event_type) AS med
          FROM r),
        d AS (
          SELECT *, abs(n - med) AS dev,
                    row_number() OVER (PARTITION BY event_type
                                       ORDER BY abs(n - med) ASC,
                                                bucket ASC) AS rn2
          FROM med),
        mad AS (
          SELECT *, max(CASE WHEN rn2 = (m + 1) // 2 THEN dev END)
                      OVER (PARTITION BY event_type) AS mad
          FROM d),
        st AS (
          SELECT *, n - med - mad AS x, med - n - mad AS xd FROM mad),
        p0 AS (
          SELECT *,
                 sum(x) OVER (PARTITION BY event_type ORDER BY bucket
                              ROWS UNBOUNDED PRECEDING) AS pp,
                 sum(xd) OVER (PARTITION BY event_type ORDER BY bucket
                               ROWS UNBOUNDED PRECEDING) AS ppd
          FROM st),
        p AS (
          SELECT *,
                 min(pp) OVER (PARTITION BY event_type ORDER BY bucket
                               ROWS UNBOUNDED PRECEDING) AS pmin,
                 min(ppd) OVER (PARTITION BY event_type ORDER BY bucket
                                ROWS UNBOUNDED PRECEDING) AS pdmin
          FROM p0)
        SELECT event_type, bucket, n,
               (pp - least(0, pmin))::BIGINT AS cusum,
               (ppd - least(0, pdmin))::BIGINT AS cusum_down,
               ((pp - least(0, pmin)) > 5 * mad
                OR (ppd - least(0, pdmin)) > 5 * mad) AS alarm
        FROM p
    """

    # partial update: field-level CASE on the patched keys, stored
    # values elsewhere — upsert's keep-latest-whole-row this is not
    o["update_document_partial"] = """
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 0 THEN 'patched' ELSE source END
                 AS source,
               CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS lang,
               n_chars
        FROM documents
    """

    # skewed funnel: the events_funnel recursion verbatim over the
    # bot-rekeyed stream (event_id % 10 = 0 → user 0) — derived from
    # the funnel oracle so the two can never drift apart
    o["events_funnel_skewed"] = o["events_funnel"].replace(
        "FROM events",
        "FROM (SELECT * REPLACE (CASE WHEN event_id % 10 = 0 THEN 0 "
        "ELSE user_id END AS user_id) FROM events)",
    )

    return o

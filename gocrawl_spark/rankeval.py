"""Search-quality evaluation — the ES ``_rank_eval`` API surface.

The reference talks to Elasticsearch through a raw request passthrough
(reference: internal/storage/storage.go:212-257 — arbitrary ES endpoint
bodies go through unmodified), so its users evaluate ranking quality
with ES's own ``GET /index/_rank_eval`` endpoint: a set of rated search
requests comes in, ES runs each request, joins the hits against the
provided relevance judgments, and returns one quality metric per
request (precision@k / recall@k / MRR / (n)DCG@k).

This module re-expresses that endpoint Spark-first, and fixes the one
thing that does NOT survive 100 TB: ES evaluates the N requests as N
independent searches over the whole index.  Here the corpus work is
INDEPENDENT of the request count — a constant number of
column-pruned scans (the tokenized tf/dl pass plus the corpus-stats
aggregate), however many rated requests arrive (the plan contract in
tests/test_plan_shapes.py pins this):

  * the scan tokenizes every document (dl + per-query-term tf rows —
    only terms that appear in some request survive the explode, so the
    tf table is O(docs × matched terms), not O(docs × vocab));
  * corpus statistics (N, avgdl) and per-term document frequencies are
    tiny aggregates broadcast back into the scoring join;
  * the request table (request id, term position, term) is broadcast —
    scoring all requests is a map-side join against the shared tf
    table, so adding a request adds zero corpus scans.

(At a real deployment the tokenized (id, dl, term, tf) table is the
materialized inverted-index scan these constant passes hit, so "per
request" cost is purely the broadcast-join width.)

Scoring is the same Lucene-form BM25 as :func:`search.bm25_topk`
(idf = ln(1+(N-df+0.5)/(df+0.5)), tf saturation k1/b), and per-document
scores fold over query-term positions in sorted order (F.aggregate over
an array_sort'd collect_list) so multi-term sums are bit-reproducible
at any parallelism — the cross-engine convention every oracle-matched
float op in this repo follows.

Metric semantics follow the ES documentation for the four built-in
``_rank_eval`` metrics at ``k``:

  precision@k  relevant-retrieved / retrieved       (unrated hit = 0)
  recall@k     relevant-retrieved / total-relevant  (0 when no judged
                                                     relevant doc)
  MRR@k        1 / rank of first relevant hit       (0 when none)
  nDCG@k       DCG@k / ideal-DCG@k, gain (2^rating − 1)/log2(rank+1),
               ideal from the request's judged ratings sorted desc

`relevant_at` is ES's ``relevant_rating_threshold`` (default 1).  DCG
positions use ln(r+1)/ln 2 spelled identically in the DuckDB oracle so
the division sequence is bit-equal.

Judgments normally arrive as a real ``ratings`` DataFrame
(request_id, doc id, integer rating) — the shape ES takes in the
request body.  :func:`synth_ratings` provides the repo's deterministic
md5 stand-in for tests/benchmarks: every document matching at least one
query term is "pooled" for judgment (the classic IR pooling setup) and
rated 0-3 from md5(request:doc:seed), rebuildable bit-for-bit by any
engine — same contract as curation.hash_weights.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from gocrawl_spark.search import analyze_query, tokens

__all__ = ["rank_eval", "synth_ratings", "hard_negatives"]


def _md5_u32(*cols: Column) -> Column:
    """First 8 md5 hex chars of ':'-joined cols → uint32 (cross-engine:
    DuckDB ('0x' || substr(md5(..),1,8))::UBIGINT)."""
    return F.conv(F.substring(F.md5(F.concat_ws(":", *cols)), 1, 8), 16, 10).cast(
        "long"
    )


def synth_ratings(
    judged: DataFrame, seed: str = "rank-eval"
) -> DataFrame:
    """Deterministic graded judgments over (request_id, id) pool rows:
    60% of pooled docs are relevant with grade 1-3, 40% judged
    irrelevant (rating 0) — md5-derived, so any engine rebuilds the
    identical table. Stands in for human qrels; production passes a
    real ratings frame instead."""
    return judged.select("request_id", "id", _synth_rating_col(seed))


def _synth_rating_col(seed: str) -> Column:
    h = _md5_u32(F.col("request_id"), F.col("id").cast("string"), F.lit(seed))
    return (
        F.when(h % 10 < 6, ((h / F.lit(10)).cast("long") % 3 + 1).cast("int"))
        .otherwise(F.lit(0))
        .alias("rating")
    )


def _seq_fold(arr: Column) -> Column:
    """Left-to-right IEEE sum of a double array (F.aggregate seeded
    0.0) — DuckDB twin: list_reduce(list_prepend(0.0, ...))."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def _ln2() -> Column:
    # built lazily: a Column literal needs an active SparkContext
    return F.log(F.lit(2.0))


def _pooled_scores(
    df: DataFrame,
    requests: list[tuple[str, str]],
    text_col: str,
    id_col: str,
    k1: float,
    b: float,
):
    """Shared-scan BM25 pool for a request batch — the module-docstring
    plan: ONE tokenized corpus pass (dl + tf rows for request terms
    only), tiny broadcast stats, request table broadcast into the
    scoring join. Returns (req_ids, partials, scores); partials is
    (request_id, id, pos, lp) for every pooled pair, scores the 6-dp
    position-ordered fold per (request_id, id). partials/scores are
    None when no request has an analyzable term."""
    spark = df.sparkSession
    req_rows = []
    for rid, query in requests:
        for pos, term in enumerate(analyze_query(query)):
            req_rows.append((rid, pos, term))
    req_ids = spark.createDataFrame(
        [(rid,) for rid, _ in requests], "request_id string"
    )
    if not req_rows:
        return req_ids, None, None
    reqs = spark.createDataFrame(req_rows, "request_id string, pos int, term string")
    all_terms = sorted({t for _, _, t in req_rows})

    # ONE corpus pass: dl + tf rows for request terms only
    toked = df.select(F.col(id_col).alias("id"), tokens(text_col).alias("toks"))
    tf = (
        toked.select("id", F.size("toks").alias("dl"), F.explode("toks").alias("term"))
        .filter(F.col("term").isin(all_terms))
        .groupBy("id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    stats = toked.agg(
        F.count("*").alias("n_docs"), F.avg(F.size("toks")).alias("avgdl")
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))

    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_c = F.col("tf").cast("double")
    denom = tf_c + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    partials = (
        tf.join(F.broadcast(reqs), "term")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select("request_id", "id", "pos", (idf * tf_c / denom).alias("lp"))
    )
    # per-(request, doc) score: position-ordered sequential fold
    scores = partials.groupBy("request_id", "id").agg(
        F.round(
            _seq_fold(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "lp"))),
                    lambda s: s["lp"],
                )
            ),
            6,
        ).alias("score")
    )
    return req_ids, partials, scores


def rank_eval(
    df: DataFrame,
    requests: list[tuple[str, str]],
    text_col: str = "content",
    id_col: str = "id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    relevant_at: int = 1,
    ratings: DataFrame | None = None,
    rating_seed: str = "rank-eval",
) -> DataFrame:
    """Evaluate ``requests`` = [(request_id, query), ...] against
    ``df`` and return one row per request:

      (request_id, retrieved, precision_k, recall_k, mrr, ndcg_k)

    all metric columns rounded to 6 dp.  ``ratings`` is an optional
    (request_id, id, rating:int) judgments frame; when omitted the
    deterministic md5 pool of :func:`synth_ratings` is used.  Requests
    whose query matches nothing still emit a row (metrics 0.0) — ES
    does the same.
    """
    req_ids, partials, scores = _pooled_scores(
        df, requests, text_col, id_col, k1, b
    )
    if partials is None:
        return req_ids.select(
            "request_id",
            F.lit(0).alias("retrieved"),
            F.lit(0.0).alias("precision_k"),
            F.lit(0.0).alias("recall_k"),
            F.lit(0.0).alias("mrr"),
            F.lit(0.0).alias("ndcg_k"),
        )
    w = Window.partitionBy("request_id").orderBy(F.desc("score"), F.asc("id"))
    topk = (
        scores.filter(F.col("score") > 0)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )

    if ratings is None:
        pool = partials.select("request_id", "id").distinct()
        ratings = pool.select("request_id", "id", _synth_rating_col(rating_seed))

    rated_topk = topk.join(ratings, ["request_id", "id"], "left").withColumn(
        "rating", F.coalesce(F.col("rating"), F.lit(0))
    )
    gain = (F.pow(F.lit(2.0), F.col("rating").cast("double")) - 1.0) / (
        F.log(F.col("rank").cast("double") + 1.0) / _ln2()
    )
    rel = (F.col("rating") >= relevant_at).cast("int")
    per_req = rated_topk.select(
        "request_id", "rank", rel.alias("rel"), gain.alias("gain")
    ).groupBy("request_id").agg(
        F.count("*").alias("retrieved"),
        F.sum("rel").alias("n_rel_ret"),
        F.min(F.when(F.col("rel") == 1, F.col("rank"))).alias("first_rel"),
        _seq_fold(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rank", "gain"))),
                lambda s: s["gain"],
            )
        ).alias("dcg"),
    )

    # ideal DCG from ALL judged ratings (ES: ideal ordering of the
    # request's rated docs, cut at k) — ratings sorted desc, positions
    # 1..min(k, n); ties in rating are position-interchangeable so the
    # sort needs no id tiebreak
    ideal = (
        ratings.filter(F.col("rating") > 0)
        .groupBy("request_id")
        .agg(
            F.slice(
                F.reverse(F.array_sort(F.collect_list(F.col("rating").cast("double")))),
                1,
                k,
            ).alias("top_r"),
            F.sum((F.col("rating") >= relevant_at).cast("long")).alias("n_rel_all"),
        )
        .select(
            "request_id",
            "n_rel_all",
            _seq_fold(
                F.transform(
                    F.sequence(F.lit(1), F.size("top_r")),
                    lambda i: (F.pow(F.lit(2.0), F.element_at(F.col("top_r"), i)) - 1.0)
                    / (F.log(i.cast("double") + 1.0) / _ln2()),
                )
            ).alias("idcg"),
        )
    )

    out = (
        req_ids.join(per_req, "request_id", "left")
        .join(ideal, "request_id", "left")
        .select(
            "request_id",
            F.coalesce(F.col("retrieved"), F.lit(0)).cast("int").alias("retrieved"),
            F.round(
                F.coalesce(
                    F.col("n_rel_ret").cast("double") / F.col("retrieved"), F.lit(0.0)
                ),
                6,
            ).alias("precision_k"),
            F.round(
                F.when(
                    F.coalesce(F.col("n_rel_all"), F.lit(0)) > 0,
                    F.coalesce(F.col("n_rel_ret"), F.lit(0)).cast("double")
                    / F.col("n_rel_all"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("recall_k"),
            F.round(
                F.coalesce(F.lit(1.0) / F.col("first_rel"), F.lit(0.0)), 6
            ).alias("mrr"),
            F.round(
                F.when(
                    F.coalesce(F.col("idcg"), F.lit(0.0)) > 0,
                    F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("ndcg_k"),
        )
    )
    return out


def hard_negatives(
    df: DataFrame,
    requests: list[tuple[str, str]],
    text_col: str = "content",
    id_col: str = "id",
    pool_k: int = 50,
    n_neg: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    relevant_at: int = 1,
    ratings: DataFrame | None = None,
    rating_seed: str = "rank-eval",
) -> DataFrame:
    """BM25 hard-negative mining — the retriever-training-data step
    (DPR, Karpukhin et al. 2020; Contriever): for each training query,
    pool the top-``pool_k`` BM25 documents, drop everything judged
    relevant (rating ≥ ``relevant_at``), and keep the ``n_neg``
    highest-ranked survivors as contrastive negatives — lexically
    close to the query yet labeled non-relevant, the hardest kind.
    Unjudged pool members count as negatives (the standard BM25-negs
    recipe; judged-0 docs qualify too).

    Output one row per kept negative:

      (request_id, id, score, rank, neg_rank)

    rank = position in the BM25 pool (score DESC, id ASC); neg_rank =
    1..``n_neg`` within the survivors in pool order.

    Scale shape (10^10 docs × many training queries): the request
    batch shares ONE tokenized corpus pass (`_pooled_scores`, same
    constant-scan contract as :func:`rank_eval` — adding a request
    adds zero corpus scans); per-request state is one top-``pool_k``
    window keyed on request_id; judgments join on (request_id, id) at
    qrel scale. When ``ratings`` is omitted the deterministic md5
    judgment pool of :func:`synth_ratings` stands in.
    """
    req_ids, partials, scores = _pooled_scores(
        df, requests, text_col, id_col, k1, b
    )
    if partials is None:
        return df.sparkSession.createDataFrame(
            [], "request_id string, id long, score double, rank int, neg_rank int"
        )
    w = Window.partitionBy("request_id").orderBy(F.desc("score"), F.asc("id"))
    topk = (
        scores.filter(F.col("score") > 0)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= pool_k)
    )
    if ratings is None:
        pool = partials.select("request_id", "id").distinct()
        ratings = pool.select("request_id", "id", _synth_rating_col(rating_seed))
    rated = topk.join(ratings, ["request_id", "id"], "left").withColumn(
        "rating", F.coalesce(F.col("rating"), F.lit(0))
    )
    wn = Window.partitionBy("request_id").orderBy(F.asc("rank"))
    return (
        rated.filter(F.col("rating") < relevant_at)
        .withColumn("neg_rank", F.row_number().over(wn))
        .filter(F.col("neg_rank") <= n_neg)
        .select("request_id", "id", "score", "rank", "neg_rank")
    )

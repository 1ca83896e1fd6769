"""P5 completion: the recurring re-crawl scheduler.

The reference runs a 1-minute ticker that re-dispatches every source's
crawl job when its schedule fires (internal/job/scheduler.go:59-141 —
``processJobs`` walks sources and calls the crawl command per tick).
The batch-engine analogue: each tick starts a new crawl GENERATION —
a fresh seed of every source's start URLs into its own snapshot
lineage ``base_dir/gen=NNNN`` — so periodic re-crawls are first-class
snapshots, diffable across generations, while within a generation the
round loop (rounds.py, P5/P6) provides resume.

Crash semantics mirror the round loop's manifest-last rule: a
generation directory gets a ``GENERATION.json`` marker only after its
crawl loop finishes; on startup the scheduler first RESUMES the latest
unfinished generation (CrawlRun.run(resume=True) continues from the
last committed round) before starting new ones.

``sleep`` is injectable so tests tick instantly; the CLI wires
``time.sleep`` with the reference's 60 s default interval.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gocrawl_spark.rounds import CrawlConfig, CrawlRun


def _gen_dir(base_dir: str, gen: int) -> str:
    return os.path.join(base_dir, f"gen={gen:04d}")


def _marker(base_dir: str, gen: int) -> str:
    return os.path.join(_gen_dir(base_dir, gen), "GENERATION.json")


def generations(base_dir: str) -> list[int]:
    if not os.path.isdir(base_dir):
        return []
    return sorted(
        int(d.split("=")[1]) for d in os.listdir(base_dir) if d.startswith("gen=")
    )


def last_finished_generation(base_dir: str) -> int | None:
    done = [g for g in generations(base_dir) if os.path.exists(_marker(base_dir, g))]
    return max(done) if done else None


def seeds_of(sources) -> list[str]:
    """Every source's entry URL + start_urls, in source order (the
    scheduler re-dispatches each source's full seed list per tick)."""
    return [u for s in sources for u in ([s.url] + list(s.start_urls))]


def generation_rank(
    spark: SparkSession, base_dir: str, gen: int, base: int = 5
) -> "DataFrame | None":
    """(url_hash, priority) overrides from a FINISHED generation's own
    link graph (graphrank.rank_from_extracted ∘ rank_priorities) — the
    between-generations feedback loop: generation G's hubs spend
    generation G+1's politeness budget first. None when the generation
    is unfinished or extracted nothing."""
    from gocrawl_spark import graphrank

    if not os.path.exists(_marker(base_dir, gen)):
        return None
    run = CrawlRun(spark, None, [], _gen_dir(base_dir, gen))
    try:
        ext = run.extracted()
    except Exception:
        return None  # no committed rounds with extraction output
    return graphrank.rank_priorities(graphrank.rank_from_extracted(ext), base=base)


def generation_diff(
    spark: SparkSession, base_dir: str, gen_a: int, gen_b: int
) -> DataFrame:
    """What changed between two crawl generations: per-URL change
    status (added | removed | changed | unchanged) from the extracted
    content — articles diff on body, pages on content. The recurring
    re-crawl's incremental-ingest feed: downstream consumers re-process
    only `change != 'unchanged'` rows instead of the whole snapshot
    (curation.diff_corpus does the hashing; content bytes never
    shuffle)."""
    from gocrawl_spark.curation import diff_corpus

    def snap(gen: int) -> DataFrame:
        from pyspark.sql import functions as F

        ext = CrawlRun(spark, None, [], _gen_dir(base_dir, gen)).extracted()
        return ext.select(
            "url",
            F.coalesce(
                F.col("article.body"), F.col("page.content"), F.lit("")
            ).alias("content"),
        )

    return diff_corpus(snap(gen_a), snap(gen_b), key="url", content="content")


def _lagged_obs(
    history: DataFrame,
    url_col: str,
    ts_col: str,
    gen_col: str,
    extra: tuple[str, ...] = (),
) -> DataFrame:
    """Shared change-detection fold: one row per observation as
    (url[, extra...], gen, ts, _prev) with `_prev` the previous
    generation's version stamp (url-keyed lag window). change_rates,
    ucb_schedule and refetch_waste all start here, so the
    change-counting convention lives in exactly one place."""
    from pyspark.sql import Window as W

    cols = [F.col(url_col).alias("url")]
    cols += [F.col(c).alias(c) for c in extra]
    cols += [F.col(gen_col).alias("gen"), F.col(ts_col).alias("ts")]
    return history.select(*cols).withColumn(
        "_prev", F.lag("ts").over(W.partitionBy("url").orderBy("gen"))
    )


def _changed():
    """An observation that is a refetch AND came back different."""
    return F.col("_prev").isNotNull() & (F.col("ts") != F.col("_prev"))


def change_rates(
    history: DataFrame,
    url_col: str = "url",
    ts_col: str = "page_ts",
    gen_col: str = "generation",
) -> DataFrame:
    """Per-URL change-frequency estimate from per-generation page
    version stamps — Cho & Garcia-Molina's estimator (TOIT 2003,
    "Estimating frequency of change"): with n observation intervals of
    which X showed a changed version,

        change_rate = −ln((n − X + 0.5) / (n + 0.5))

    (the Poisson MLE with the 0.5 continuity correction, consistent
    even though multiple changes inside one interval are observed as
    one). Input rows: one observation per (url, generation) with any
    comparable version stamp (``page_ts`` from reuse_unchanged
    generations, a warc_ts, or a content hash). URLs with fewer than
    two observations are dropped. One url-keyed window + one groupBy —
    O(history) at any scale. Returns
    (url, n_obs, n_changes, change_rate)."""
    obs = _lagged_obs(history, url_col, ts_col, gen_col)
    agg = obs.groupBy("url").agg(
        F.count("*").alias("n_obs"),
        F.sum(F.when(_changed(), 1).otherwise(0)).alias("n_changes"),
    )
    n_int = (F.col("n_obs") - 1).cast("double")
    x = F.col("n_changes").cast("double")
    return agg.filter(F.col("n_obs") >= 2).select(
        "url",
        "n_obs",
        "n_changes",
        # + 0.0 folds IEEE −0.0 (from −ln(1) on never-changing urls)
        # to +0.0 so the value is engine- and repr-stable
        (F.round(-F.log((n_int - x + 0.5) / (n_int + 0.5)), 6) + F.lit(0.0)).alias(
            "change_rate"
        ),
    )


def refresh_priorities(rates: DataFrame, base: int = 5) -> DataFrame:
    """(url_hash, priority) overrides for CrawlRun(rank_priority=...):
    fast-changing pages re-crawl first. Fixed rate thresholds (pure
    map-side expression, no sort): ≥1.0 changes/interval → base+3,
    ≥0.5 → base+2, ≥0.2 → base+1; slower pages keep the default and
    are dropped from the override table. Compose with the scheduler:
    gen N's rates (from change_rates over gens ≤ N) prioritize gen
    N+1's frontier — the freshness-driven analogue of the link-rank
    feedback loop."""
    from gocrawl_spark import udfs

    r = F.col("change_rate")
    pri = (
        F.when(r >= 1.0, base + 3)
        .when(r >= 0.5, base + 2)
        .when(r >= 0.2, base + 1)
        .otherwise(base)
    )
    out = rates.select("url", pri.cast("int").alias("priority")).filter(
        F.col("priority") > base
    )
    return udfs.with_url_identity(out).select("url_hash", "priority")


def ucb_schedule(
    history: DataFrame,
    url_col: str = "url",
    ts_col: str = "page_ts",
    gen_col: str = "generation",
    top_k: int = 0,
) -> DataFrame:
    """UCB1 explore/exploit recrawl ordering over the same
    per-generation observation history `change_rates` consumes.

    `change_rates` is pure exploitation: a URL observed twice with no
    change gets rate 0 and is never revisited, even though two
    observations say almost nothing. The bandit view (Auer, Cesa-
    Bianchi & Fischer, Machine Learning 2002, UCB1) treats each URL as
    an arm whose reward is "the page had changed when we refetched
    it", and adds the optimism bonus that shrinks as evidence
    accumulates:

        ucb = mean_change + sqrt(2 · ln(N) / n)

    with n = the URL's observation intervals (n_obs − 1), mean_change
    = n_changes / n, and N = Σ n over all URLs (total pulls). Rarely-
    observed URLs float up until their change behaviour is actually
    known — the standard fix for the change-rate cold-start, used by
    freshness crawlers as "optimism in the face of staleness
    uncertainty". Returns (url, n_obs, n_changes, mean_change, ucb)
    with mean/ucb rounded to 6 dp; `top_k > 0` keeps only the k best
    arms (ties broken by url ASC so the cut is deterministic).

    Scale shape (10^10 URLs): the per-URL fold is `change_rates`'
    one url-keyed window + groupBy; N folds from that ≈#urls-row
    table into ONE scalar broadcast back as a literal cross join
    (1-row build side — Spark broadcasts it, no shuffle). The top-k
    cut is a TakeOrdered-style sort only when requested, and only
    over the already-aggregated per-URL table.
    """
    from pyspark.sql import Window as W

    obs = _lagged_obs(history, url_col, ts_col, gen_col)
    per_url = (
        obs.groupBy("url")
        .agg(
            F.count("*").alias("n_obs"),
            F.sum(F.when(_changed(), 1).otherwise(0)).alias("n_changes"),
        )
        .filter(F.col("n_obs") >= 2)
    )
    n_int = (F.col("n_obs") - 1).cast("double")
    total = per_url.agg(F.sum(F.col("n_obs") - 1).cast("double").alias("_N"))
    scored = per_url.crossJoin(F.broadcast(total)).select(
        "url",
        "n_obs",
        "n_changes",
        F.round(F.col("n_changes") / n_int, 6).alias("mean_change"),
        F.round(
            F.col("n_changes") / n_int
            + F.sqrt(F.lit(2.0) * F.log(F.col("_N")) / n_int),
            6,
        ).alias("ucb"),
    )
    if top_k > 0:
        scored = (
            scored.withColumn(
                "_rk",
                F.row_number().over(W.orderBy(F.desc("ucb"), F.asc("url"))),
            )
            .filter(F.col("_rk") <= top_k)
            .drop("_rk")
        )
    return scored


def refetch_waste(
    history: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    ts_col: str = "page_ts",
    gen_col: str = "generation",
) -> DataFrame:
    """Revalidation audit: per host, how many refetches brought back
    an UNCHANGED page — the fetches a conditional-GET (If-None-Match /
    If-Modified-Since, RFC 9110 §13) or a smarter `change_rates`-fed
    schedule would have turned into 304s. The reference refetches
    unconditionally on its 1-minute ticker (internal/job/
    scheduler.go:78); this quantifies what that costs per host, the
    ops report that justifies turning the UCB/change-rate scheduling
    on.

    Input is the change_rates observation history plus a host column:
    one row per (url, generation) with any comparable version stamp.
    A row with a predecessor is a REFETCH; unchanged = stamp equal to
    the previous generation's. Returns
    (host, n_urls, n_refetches, n_unchanged, waste_share) with
    waste_share = n_unchanged / n_refetches rounded to 6 dp (0.0 when
    a host was never refetched — first-visit-only hosts are not
    "wasteful", just new).

    Scale shape (10^10 rows): change_rates' one url-keyed lag window,
    then ONE host-keyed map-side-combining groupBy — output ≈ #hosts
    rows. No driver state, no second scan.
    """
    obs = _lagged_obs(history, url_col, ts_col, gen_col, extra=(host_col,))
    if host_col != "host":
        obs = obs.withColumnRenamed(host_col, "host")
    agg = obs.groupBy("host").agg(
        F.count_distinct("url").alias("n_urls"),
        F.sum(F.when(F.col("_prev").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_refetches"),
        F.sum(
            F.when(
                F.col("_prev").isNotNull() & (F.col("ts") == F.col("_prev")), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_unchanged"),
    )
    return agg.select(
        "host",
        "n_urls",
        "n_refetches",
        "n_unchanged",
        F.when(
            F.col("n_refetches") > 0,
            F.round(
                F.col("n_unchanged") / F.col("n_refetches").cast("double"), 6
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("waste_share"),
    )


def run_schedule(
    spark: SparkSession,
    corpus: DataFrame,
    sources,
    base_dir: str,
    cfg: CrawlConfig | None = None,
    ticks: int = 1,
    interval_s: float = 60.0,
    sleep=time.sleep,
    robots: DataFrame | None = None,
    rank_frontier: bool = False,
) -> list[dict]:
    """Run `ticks` scheduler fires. Each fire either resumes the latest
    unfinished generation or seeds a new one; returns one summary dict
    per fire. Generations are independent snapshot lineages, so any
    fire is crash-resumable and generations are diffable.

    ``rank_frontier=True`` turns on the feedback loop: each NEW
    generation pops its frontier with the previous finished
    generation's link-rank priorities (OPT-IN — the default keeps the
    reference's static priority ordering).

    ``cfg.reuse_unchanged=True`` turns on incremental re-crawl
    extraction: each generation reads the previous finished
    generation's extracted table and skips the kernel for pages whose
    corpus warc_ts is unchanged (CrawlRun._extract)."""
    cfg = cfg or CrawlConfig()
    results: list[dict] = []
    for i in range(ticks):
        gens = generations(base_dir)
        unfinished = [g for g in gens if not os.path.exists(_marker(base_dir, g))]
        gen = min(unfinished) if unfinished else (max(gens) + 1 if gens else 0)
        resumed = gen in gens
        rank_priority = None
        prev = last_finished_generation(base_dir)
        if rank_frontier and prev is not None:
            rank_priority = generation_rank(spark, base_dir, prev)
        prior_extracted = None
        validators = None
        if cfg.reuse_unchanged and prev is not None:
            glob = os.path.join(
                _gen_dir(base_dir, prev), "rounds", "round=*", "extracted"
            )
            prior = spark.read.parquet(glob)
            # only a generation that was itself stamped can be reused
            if "page_ts" in prior.columns:
                prior_extracted = prior
            if cfg.fetch_mode == "http":
                # live re-crawl: conditional GETs against the previous
                # generation's validator cache (ETag -> 304 -> carry)
                prev_run = CrawlRun(spark, None, [], _gen_dir(base_dir, prev))
                try:
                    validators = prev_run.validators()
                    prior_extracted = prior  # 304 carry needs the rows
                except Exception:
                    validators = None  # prior gen ran corpus-mode
        run = CrawlRun(
            spark,
            corpus,
            seeds_of(sources),
            _gen_dir(base_dir, gen),
            cfg,
            robots=robots,
            sources=sources,
            rank_priority=rank_priority,
            prior_extracted=prior_extracted,
            validators=validators,
        )
        history = run.run(resume=True)
        # a resumed generation's history covers only the post-resume
        # rounds; the committed metrics table covers EVERY round of the
        # generation — derive the marker's totals there so
        # GENERATION.json never understates an interrupted-then-resumed
        # generation
        from pyspark.sql import functions as F

        tot = {
            r["metric"]: int(r["s"])
            for r in run.metrics()
            .filter(F.col("metric").isin("fetched", "articles"))
            .groupBy("metric")
            .agg(F.sum("value").alias("s"))
            .collect()
        }
        summary = {
            "generation": gen,
            "resumed": resumed,
            "rounds": run.metrics().select("round").distinct().count(),
            "fetched": tot.get("fetched", 0),
            "articles": tot.get("articles", 0),
        }
        with open(_marker(base_dir, gen), "w") as f:
            json.dump(summary, f)
        results.append(summary)
        if i + 1 < ticks:
            sleep(interval_s)
    return results


__all__ = [
    "run_schedule", "generations", "last_finished_generation", "seeds_of",
    "generation_rank", "generation_diff", "change_rates", "refresh_priorities",
    "ucb_schedule", "refetch_waste",
]

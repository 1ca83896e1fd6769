"""F9 retry-with-backoff: transient failures re-enqueue with attempt+1
until max_retries, then count as visited (link_handler.go:60-107).
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from gocrawl_spark import synth
from gocrawl_spark.rounds import CrawlConfig, CrawlRun


@pytest.fixture(scope="module")
def faulty_crawl(spark, sf_dir):
    corpus = synth.with_transient_faults(
        synth.corpus_from_documents(spark, sf_dir), every=5, attempts=2
    )
    run_dir = tempfile.mkdtemp(prefix="retry_crawl_")
    # depth 0 over a full-corpus seed: every URL pops in round 0, the
    # faulty ~20% heal at attempt 2 → rounds 1 and 2 are pure retries
    cfg = CrawlConfig(max_depth=0, round_wall_s=3600.0, max_rounds=5, use_bloom=False)
    crawl = CrawlRun(spark, corpus, corpus.select("url"), run_dir, cfg)
    history = crawl.run(resume=False)
    return crawl, history, corpus


def test_retries_heal_and_converge(faulty_crawl):
    crawl, history, corpus = faulty_crawl
    n = corpus.count()
    n_faulty = corpus.filter(F.col("fail_attempts") > 0).count()
    assert n_faulty > 0
    # round 0: everything pops, healthy URLs fetch, faulty ones re-enqueue
    assert history[0]["popped"] == n
    assert history[0]["fetched"] == n - n_faulty
    assert history[0]["retried"] == n_faulty
    # round 1: only the faulty pop again, still failing (attempt 1 < 2)
    assert history[1]["popped"] == n_faulty
    assert history[1]["fetched"] == 0
    assert history[1]["retried"] == n_faulty
    # round 2: attempt 2 >= fail_attempts → all heal; crawl then stops
    assert history[2]["popped"] == n_faulty
    assert history[2]["fetched"] == n_faulty
    assert history[2]["retried"] == 0
    assert len(history) == 3
    # every URL fetched exactly once overall
    assert sum(h["fetched"] for h in history) == n
    seen = crawl.seen_final()
    assert seen.count() == n == seen.select("url_hash").distinct().count()


def test_gave_up_after_max_retries(spark, sf_dir):
    corpus = synth.with_transient_faults(
        synth.corpus_from_documents(spark, sf_dir), every=5, attempts=99
    )
    run_dir = tempfile.mkdtemp(prefix="giveup_crawl_")
    cfg = CrawlConfig(
        max_depth=0, round_wall_s=3600.0, max_rounds=6, use_bloom=False, max_retries=3
    )
    crawl = CrawlRun(spark, corpus, corpus.select("url"), run_dir, cfg)
    history = crawl.run(resume=False)
    n = corpus.count()
    n_faulty = corpus.filter(F.col("fail_attempts") > 0).count()
    # attempts 0,1,2 run; attempt 2+1 == max_retries → give up in round 2
    assert len(history) == 3
    assert sum(h["fetched"] for h in history) == n - n_faulty
    # gave-up URLs still count as seen (non-retryable-error semantics)
    assert crawl.seen_final().count() == n


def test_compact_preserves_state(spark, sf_dir):
    """P7: compaction folds old seen/host_state deltas into a base and
    drops the old rounds' mutable-state dirs; readers and resume see
    identical state."""
    import os

    from gocrawl_spark.rounds import CrawlRun, _round_dir

    corpus = synth.corpus_from_documents(spark, sf_dir)
    run_dir = tempfile.mkdtemp(prefix="compact_crawl_")
    cfg = CrawlConfig(max_depth=2, round_wall_s=10.0, max_rounds=4)
    crawl = CrawlRun(spark, corpus, corpus.select("url").limit(8), run_dir, cfg)
    crawl.run(resume=False)

    before_seen = sorted(r.url for r in crawl.seen_final().collect())
    before_hosts = {(r.domain, r.fetched_total) for r in crawl.host_state().collect()}
    upto = crawl.compact(keep_rounds=1)
    assert upto is not None and upto >= 0
    # old mutable-state dirs gone, product (extracted) kept
    assert not os.path.exists(os.path.join(_round_dir(run_dir, 0), "seen"))
    assert os.path.exists(os.path.join(_round_dir(run_dir, 0), "extracted"))
    assert sorted(r.url for r in crawl.seen_final().collect()) == before_seen
    assert {(r.domain, r.fetched_total) for r in crawl.host_state().collect()} == before_hosts
    # idempotent: nothing new to fold
    assert crawl.compact(keep_rounds=1) is None

    # resume after compaction continues from the last committed round
    crawl2 = CrawlRun(
        spark, corpus, corpus.select("url").limit(8), run_dir,
        CrawlConfig(max_depth=2, round_wall_s=10.0, max_rounds=1),
    )
    hist = crawl2.run(resume=True)
    sf = crawl2.seen_final()
    assert sf.count() == sf.select("url_hash").distinct().count()

"""Co-located fetch join over a bucketed corpus: the html side must
not shuffle (exactly one Exchange — the frontier side), and crawl
results over the bucketed table must equal the plain-parquet path."""

from __future__ import annotations

import pytest

from gocrawl_spark import storage, synth
from gocrawl_spark.rounds import CrawlConfig, CrawlRun


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    corpus = synth.corpus_from_documents(spark, sf_dir)
    storage.write_bucketed_corpus(corpus, table="t_corpus_bucketed", buckets=8)
    yield storage.bucketed_corpus(spark, "t_corpus_bucketed")
    spark.sql("DROP TABLE IF EXISTS t_corpus_bucketed")


def test_bucketed_join_shuffles_only_frontier(spark, sf_dir, bucketed, tmp_path):
    """J2 plan contract at scale: the corpus (html payload) side of the
    fetch join reads straight from its buckets — no Exchange above the
    corpus scan. An external (snapshot-read) frontier pays the ONLY
    shuffle; a frontier derived from the bucketed table inherits the
    distribution and the join is fully exchange-free."""
    from gocrawl_spark.rounds import init_frontier_df

    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.shuffle.partitions", "8")  # = bucket count
    try:
        # external frontier (the per-round snapshot read): 1 Exchange,
        # on the narrow frontier side only
        init_frontier_df(bucketed.select("url")).write.parquet(str(tmp_path / "f"))
        external = spark.read.parquet(str(tmp_path / "f"))
        assert storage.n_exchanges(external.join(bucketed, "url", "inner")) == 1
        # bucket-aligned frontier: fully exchange-free
        aligned = init_frontier_df(bucketed.select("url"))
        assert storage.n_exchanges(aligned.join(bucketed, "url", "inner")) == 0
        # plain parquet corpus: both sides shuffle (incl. the html)
        unbucketed = synth.corpus_from_documents(spark, sf_dir)
        assert storage.n_exchanges(external.join(unbucketed, "url", "inner")) == 2
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)


def test_crawl_over_bucketed_corpus_equivalent(spark, sf_dir, bucketed, tmp_path):
    """A crawl against the bucketed table yields the identical seen set
    as against the plain parquet corpus."""
    n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    seeds = synth.seed_urls(n, k=8)
    cfg = CrawlConfig(max_depth=1, round_wall_s=10.0, max_rounds=3, use_bloom=False)
    run_b = CrawlRun(spark, bucketed, seeds, str(tmp_path / "b"), cfg)
    run_b.run(resume=False)
    plain = synth.corpus_from_documents(spark, sf_dir)
    run_p = CrawlRun(spark, plain, seeds, str(tmp_path / "p"), cfg)
    run_p.run(resume=False)
    sb = sorted((r["url"], r["fetched_round"]) for r in run_b.seen_final().collect())
    sp = sorted((r["url"], r["fetched_round"]) for r in run_p.seen_final().collect())
    assert sb == sp and len(sb) > 8


def test_seen_index_anti_join_shuffles_only_candidates(spark, sf_dir, tmp_path):
    """F7/J3 plan contract at 10^10-seen scale: the exact-backstop
    anti-join over the bucketed seen index reads the seen set straight
    from its buckets — the ONLY Exchange is on the (small) maybe-seen
    candidate side — and membership equals the plain delta-union path,
    including after a second (append) round."""
    from pyspark.sql import functions as F

    from gocrawl_spark import frontier as fr
    from gocrawl_spark.rounds import init_frontier_df

    corpus = synth.corpus_from_documents(spark, sf_dir).select("url")
    rows = init_frontier_df(corpus)
    parity = F.conv(F.substring("url_hash", 1, 2), 16, 10) % 2
    d0 = rows.filter(parity == 0).select("url_hash", "url").withColumn(
        "fetched_round", F.lit(0)
    )
    d1 = (
        rows.filter(parity == 1)
        .limit(50)
        .select("url_hash", "url")
        .withColumn("fetched_round", F.lit(1))
    )
    store = storage.BucketedSeenStore(spark, str(tmp_path / "run"), buckets=8)
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.shuffle.partitions", "8")  # = bucket count
    try:
        store.append(d0, 0)
        store.append(d1, 1)  # append keeps the bucket metadata valid
        assert store.watermark() == 1
        # externally-materialized candidates (the snapshot-read shape)
        rows.write.parquet(str(tmp_path / "cand"))
        cand = spark.read.parquet(str(tmp_path / "cand"))
        out = fr.filter_unseen(cand, store.df(), None, spark)
        assert storage.n_exchanges(out) == 1
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan
        # the delta-union path shuffles BOTH sides (what the index removes)
        d0.unionByName(d1).write.parquet(str(tmp_path / "deltas"))
        exact_seen = spark.read.parquet(str(tmp_path / "deltas"))
        exact = fr.filter_unseen(cand, exact_seen, None, spark)
        assert storage.n_exchanges(exact) == 2
        got = sorted(r["url_hash"] for r in out.collect())
        want = sorted(r["url_hash"] for r in exact.collect())
        assert got == want and 0 < len(got) < cand.count()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        store.drop()


def _table_parquet_files(spark, table: str) -> list[str]:
    import os

    loc = (
        spark.sql(f"DESCRIBE FORMATTED {table}")
        .filter("col_name = 'Location'")
        .collect()[0]["data_type"]
    ).removeprefix("file:")
    return [
        os.path.join(root, f)
        for root, _, files in os.walk(loc)
        for f in files
        if f.endswith(".parquet")
    ]


def test_bucketed_seen_compact_folds_to_one_file_per_bucket(spark, sf_dir, tmp_path):
    """Per-round appends leave one file set per round in every bucket
    (R-way merge per anti-join task after R rounds); compact() must
    fold the index to exactly one sorted file per bucket while
    preserving membership, bucketing metadata (one-Exchange plan), and
    the watermark."""
    from pyspark.sql import functions as F

    from gocrawl_spark import frontier as fr
    from gocrawl_spark.rounds import init_frontier_df

    corpus = synth.corpus_from_documents(spark, sf_dir).select("url")
    rows = init_frontier_df(corpus)
    store = storage.BucketedSeenStore(spark, str(tmp_path / "run"), buckets=8)
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        parity = F.conv(F.substring("url_hash", 1, 2), 16, 10) % 3
        deltas = [
            rows.filter(parity == r)
            .select("url_hash", "url")
            .withColumn("fetched_round", F.lit(r))
            for r in range(3)
        ]
        for r, d in enumerate(deltas):
            store.append(d, r)
        n_before = len(_table_parquet_files(spark, store.table))
        assert n_before > 8  # one file set per append per bucket
        want = sorted(r["url_hash"] for r in store.df().collect())

        seen = deltas[0].unionByName(deltas[1]).unionByName(deltas[2])
        store.compact(seen, 2)

        files = _table_parquet_files(spark, store.table)
        assert len(files) == 8  # exactly one file per bucket
        assert store.watermark() == 2
        assert sorted(r["url_hash"] for r in store.df().collect()) == want
        # bucketing metadata survives: anti-join still one-Exchange
        rows.write.parquet(str(tmp_path / "cand"))
        cand = spark.read.parquet(str(tmp_path / "cand"))
        out = fr.filter_unseen(cand, store.df(), None, spark)
        assert storage.n_exchanges(out) == 1
        assert "Bucketed: true" in out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        store.drop()


def test_watermark_survives_truncated_file(spark, tmp_path):
    """Crash-consistency: a truncated WATERMARK.json (killed mid-write)
    must read as 'missing' — triggering the rebuild/catch-up path —
    not crash the resume; and writes go through a rename so new
    truncation can't happen."""
    import json
    import os

    store = storage.BucketedSeenStore(spark, str(tmp_path / "run"), buckets=8)
    store._set_watermark(3)
    assert store.watermark() == 3
    assert not os.path.exists(store._wm_path + ".tmp")  # atomic rename
    with open(store._wm_path, "w") as f:
        f.write('{"upto": 3, "buck')  # simulate a mid-write crash
    assert store.watermark() is None
    store._set_watermark(4)
    assert store.watermark() == 4

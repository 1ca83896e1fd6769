"""Unit tests for the frontier operators (F7/F8, P1-P4) in isolation."""

from __future__ import annotations

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from gocrawl_spark import frontier as fr
from gocrawl_spark import synth
from gocrawl_spark.rounds import CrawlConfig, CrawlRun, last_committed_round


def sha(u: str) -> str:
    return hashlib.sha256(u.encode()).hexdigest()


def _frontier_df(spark, rows):
    """rows: (url, domain, depth, priority, seq, budget)"""
    data = [(u, sha(u), dom, dom, dep, p, 0, s, 0, b) for (u, dom, dep, p, s, b) in rows]
    return spark.createDataFrame(
        data,
        "url string, url_hash string, host string, domain string, depth int, "
        "priority int, discovered_round int, discovery_seq long, attempt int, budget int",
    )


@pytest.fixture(scope="module")
def small_frontier(spark):
    rows = []
    for dom, n in (("a.com", 6), ("b.com", 3)):
        for i in range(n):
            # priorities 9,8,7,... so the expected pop order is obvious
            rows.append((f"https://{dom}/p/{i}", dom, 0, 9 - i, i, 2))
    return _frontier_df(spark, rows)


def test_pop_batch_budget_and_priority(small_frontier):
    batch = fr.pop_batch(small_frontier, n_salts=4)
    got = {(r.domain, r.url) for r in batch.collect()}
    # budget 2 per domain; highest priority first
    assert got == {
        ("a.com", "https://a.com/p/0"),
        ("a.com", "https://a.com/p/1"),
        ("b.com", "https://b.com/p/0"),
        ("b.com", "https://b.com/p/1"),
    }


def test_pop_batch_salting_invariant(small_frontier):
    one = sorted(r.url for r in fr.pop_batch(small_frontier, n_salts=1).collect())
    many = sorted(r.url for r in fr.pop_batch(small_frontier, n_salts=16).collect())
    assert one == many


def test_pop_split_partitions_frontier(small_frontier):
    batch, rest, cached = fr.pop_split(small_frontier, n_salts=4)
    b = {r.url for r in batch.collect()}
    r_ = {r.url for r in rest.collect()}
    assert b == {r.url for r in fr.pop_batch(small_frontier, n_salts=4).collect()}
    assert not (b & r_)
    assert len(b) + len(r_) == small_frontier.count()
    for df in cached:
        df.unpersist()


def test_pop_split_degenerate_budget_fast_path(spark):
    """k ≥ n per domain → the pop is the identity: whole frontier
    admitted, nothing ranked, rest empty."""
    rows = [(f"https://{d}/p/{i}", d, 0, 5, i, 10) for d in ("a.com", "b.com") for i in range(4)]
    f = _frontier_df(spark, rows)
    batch, rest, cached = fr.pop_split(f, n_salts=4)
    assert {r.url for r in batch.collect()} == {r.url for r in f.collect()}
    assert rest.count() == 0 and cached == []


def test_pop_split_hot_cold_equals_full_ranking(spark):
    """Mixed budgets: over-budget domains ranked, under-budget domains
    passed through — output must equal pop_batch's full ranking."""
    rows = [(f"https://hot.com/p/{i}", "hot.com", 0, 9 - i, i, 2) for i in range(6)]
    rows += [(f"https://cold.com/p/{i}", "cold.com", 0, 5, i, 9) for i in range(3)]
    f = _frontier_df(spark, rows)
    batch, rest, cached = fr.pop_split(f, n_salts=4)
    b = {r.url for r in batch.collect()}
    assert b == {r.url for r in fr.pop_batch(f, n_salts=4).collect()}
    assert {r.url for r in rest.collect()} == {f"https://hot.com/p/{i}" for i in range(2, 6)}
    assert all(u.startswith("https://cold.com/") or "p/0" in u or "p/1" in u for u in b)
    for df in cached:
        df.unpersist()


def test_host_budget():
    # 60s round, 2s delay, parallelism 2 → 60 tokens (30 × 2)
    assert fr.host_budget(60.0, 2000, 2) == 60
    assert fr.host_budget(10.0, 20000, 1) == 1  # floor but ≥ 1
    assert fr.host_budget(10.0, 0, 3) >= 1


def test_bloom_no_false_negatives(spark):
    seen_urls = [f"https://s.com/{i}" for i in range(500)]
    seen = spark.createDataFrame(
        [(sha(u), u, 0) for u in seen_urls], "url_hash string, url string, fetched_round int"
    )
    bloom = fr.build_bloom(seen, n_shards=8, m_bits=1 << 14)
    assert all(bloom.might_contain(sha(u)) for u in seen_urls)


def test_filter_unseen_bloom_matches_exact(spark):
    seen_urls = [f"https://s.com/{i}" for i in range(300)]
    cand_urls = [f"https://s.com/{i}" for i in range(200, 600)]  # 100 overlap
    seen = spark.createDataFrame(
        [(sha(u), u, 0) for u in seen_urls], "url_hash string, url string, fetched_round int"
    )
    cand = spark.createDataFrame([(sha(u), u) for u in cand_urls], "url_hash string, url string")
    exact = sorted(
        r.url for r in fr.filter_unseen(cand, seen, None, spark).collect()
    )
    bloom = fr.build_bloom(seen, n_shards=8, m_bits=1 << 14)
    with_bloom = sorted(
        r.url for r in fr.filter_unseen(cand, seen, bloom, spark).collect()
    )
    assert exact == with_bloom
    assert len(exact) == 300  # 300..599 unseen


def test_apply_rules_priority_wins(spark):
    df = spark.createDataFrame(
        [
            ("https://x.com/keep/1",),
            ("https://x.com/draft/1",),
            ("https://x.com/draft/special/1",),
        ],
        "url string",
    )
    rules = [
        {"pattern": "/draft/", "action": "disallow", "priority": 5},
        {"pattern": "/draft/special/", "action": "allow", "priority": 9},
    ]
    kept = {r.url for r in fr.apply_rules(df, rules).collect()}
    assert kept == {"https://x.com/keep/1", "https://x.com/draft/special/1"}
    # empty/None rules = reference runtime behavior: everything allowed
    assert fr.apply_rules(df, None).count() == 3


def test_filter_unseen_sharded_matches_broadcast_and_exact(spark):
    """The sharded (cogrouped, per-shard bits) application must return
    exactly the same rows as the broadcast fast path and the exact
    anti-join — deltas pre-merge is NOT required (the task ORs them)."""
    seen_urls = [f"https://s.com/{i}" for i in range(300)]
    cand_urls = [f"https://s.com/{i}" for i in range(200, 600)]
    seen = spark.createDataFrame(
        [(sha(u), u, 0) for u in seen_urls], "url_hash string, url string, fetched_round int"
    )
    cand = spark.createDataFrame([(sha(u), u) for u in cand_urls], "url_hash string, url string")
    # tiny m_bits → plenty of false positives → both branches exercised
    half_a = seen.filter(F.col("url_hash") < "8")
    half_b = seen.filter(F.col("url_hash") >= "8")
    deltas = fr.build_bloom_df(half_a, n_shards=8, m_bits=1 << 10).unionByName(
        fr.build_bloom_df(half_b, n_shards=8, m_bits=1 << 10)
    )
    exact = sorted(r.url for r in fr.filter_unseen(cand, seen, None, spark).collect())
    sharded = sorted(
        r.url for r in fr.filter_unseen(cand, seen, deltas, spark, n_shards=8).collect()
    )
    bloom = fr.build_bloom(seen, n_shards=8, m_bits=1 << 10)
    bcast = sorted(r.url for r in fr.filter_unseen(cand, seen, bloom, spark).collect())
    assert exact == sharded == bcast and len(exact) == 300


def test_sharded_filter_peak_bytes_is_one_shard(spark):
    """O(1-shard) memory contract: each cogroup task materializes ONE
    shard's merged bitset (m_bits/8 bytes), never the whole filter, and
    the plan is a FlatMapCoGroupsInPandas — no bloom broadcast."""
    n_shards, m_bits = 8, 1 << 10
    seen_urls = [f"https://s.com/{i}" for i in range(200)]
    seen = spark.createDataFrame(
        [(sha(u), u, 0) for u in seen_urls], "url_hash string, url string, fetched_round int"
    )
    cand = spark.createDataFrame(
        [(sha(f"https://s.com/{i}"), f"https://s.com/{i}") for i in range(100, 400)],
        "url_hash string, url string",
    )
    deltas = fr.build_bloom_df(seen, n_shards=n_shards, m_bits=m_bits).persist()
    n_groups = deltas.count()  # shards that actually hold bits
    acc = spark.sparkContext.accumulator(0)
    out = fr.filter_unseen_sharded(
        cand, seen, deltas, n_shards=n_shards, probe_acc=acc
    )
    assert out.count() == 200
    # every group allocated exactly one shard's bitset. The union's two
    # branches may re-evaluate the cogroup from the reused shuffle, so
    # allow 1× or 2× — a whole-filter materialization would read
    # n_groups × n_shards × shard_bytes (8× more) and fail this.
    shard_bytes = m_bits // 8
    assert acc.value in (n_groups * shard_bytes, 2 * n_groups * shard_bytes)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan
    deltas.unpersist()


def test_fold_bloom_df_bitwise_equals_driver_merge(spark):
    """Distributed compaction fold ≡ BloomFilter.merge, bitwise."""
    urls_a = [f"https://a.com/{i}" for i in range(150)]
    urls_b = [f"https://b.com/{i}" for i in range(150)]
    mk = lambda urls: spark.createDataFrame(
        [(sha(u), u, 0) for u in urls], "url_hash string, url string, fetched_round int"
    )
    d1 = fr.build_bloom_df(mk(urls_a), n_shards=8, m_bits=1 << 12)
    d2 = fr.build_bloom_df(mk(urls_b), n_shards=8, m_bits=1 << 12)
    folded = {
        r["shard"]: bytes(r["bits"])
        for r in fr.fold_bloom_df(d1.unionByName(d2)).collect()
    }
    merged = fr.build_bloom(mk(urls_a), n_shards=8, m_bits=1 << 12).merge(
        fr.build_bloom(mk(urls_b), n_shards=8, m_bits=1 << 12)
    )
    assert folded == {s: bytes(b) for s, b in merged.to_rows()}


def test_or_bits_mixed_lengths_raises_with_cause(spark):
    """Deltas from different bloom_bits generations must fail loudly,
    not with numpy's opaque broadcast error."""
    with pytest.raises(ValueError, match="mixed bloom m_bits"):
        fr._or_bits([b"\x00" * 8, b"\x00" * 16])


def test_filter_unseen_empty_df_falls_back_to_exact(spark):
    """An EMPTY (shard, bits) DataFrame means 'no filter', exactly like
    an empty BloomFilter — the exact anti-join backstop must still
    apply (a complete-but-empty-filter reading would wrongly mark every
    candidate definite-new)."""
    seen_urls = [f"https://s.com/{i}" for i in range(50)]
    seen = spark.createDataFrame(
        [(sha(u), u, 0) for u in seen_urls], "url_hash string, url string, fetched_round int"
    )
    cand = spark.createDataFrame(
        [(sha(u), u) for u in seen_urls[:30]] + [(sha("https://n.com/x"), "https://n.com/x")],
        "url_hash string, url string",
    )
    empty = spark.createDataFrame([], "shard int, bits binary")
    out = sorted(r.url for r in fr.filter_unseen(cand, seen, empty, spark, n_shards=8).collect())
    assert out == ["https://n.com/x"]


def test_bloom_config_change_rebuilds_not_corrupts(spark, sf_dir, tmp_path):
    """Resuming with a different bloom_shards/bloom_bits must NEVER
    apply the old deltas under the new routing (Bloom false negatives
    would silently re-admit seen URLs past the skipped anti-join):
    the tagged-delta compatibility gate routes both application forms
    to a rebuild under the new config, and the rebuilt filter is
    complete."""
    corpus = synth.corpus_from_documents(spark, sf_dir)
    n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    base = dict(max_depth=1, round_wall_s=10.0, max_rounds=2, use_bloom=True,
                bloom_bits=1 << 14, bloom_min_seen=0)
    run_dir = str(tmp_path / "bloomcfg")
    CrawlRun(
        spark, corpus, synth.seed_urls(n, k=6), run_dir,
        CrawlConfig(**base, bloom_shards=8, bloom_apply="sharded"),
    ).run()
    last = last_committed_round(run_dir)

    for new_shards in (4, 16):  # decrease AND increase
        run2 = CrawlRun(
            spark, corpus, synth.seed_urls(n, k=6), run_dir,
            CrawlConfig(**base, bloom_shards=new_shards, bloom_apply="sharded"),
        )
        # broadcast form refuses the incompatible deltas outright
        assert run2._bloom_upto(last) is None
        # sharded form returns the REBUILT filter under the new config
        bdf = run2._bloom_df_upto(last)
        rows = bdf.collect()
        assert rows and all(r["shard"] < new_shards for r in rows)
        # completeness: filtering the seen set against it yields nothing
        seen = run2.seen_final()
        out = fr.filter_unseen(
            seen.select("url_hash"), seen, bdf, spark, n_shards=new_shards
        )
        assert out.count() == 0

    # unchanged config still reuses the deltas (no rebuild regression):
    # the broadcast form assembles, and the sharded form returns the
    # 8-shard deltas, not a rebuild under some other config
    run3 = CrawlRun(
        spark, corpus, synth.seed_urls(n, k=6), run_dir,
        CrawlConfig(**base, bloom_shards=8, bloom_apply="sharded"),
    )
    assert run3._bloom_upto(last) is not None
    assert not os.path.isdir(
        os.path.join(run_dir, "bloom_rebuild", f"upto={last:04d}_s8_b{1 << 14}")
    )
    assert all(r["shard"] < 8 for r in run3._bloom_df_upto(last).collect())


def test_allocate_budgets(spark):
    from gocrawl_spark import frontier as fr

    stats = spark.createDataFrame(
        [
            ("big.com", 1000, 900),   # would get 90% of budget -> capped
            ("mid.com", 50, 90),
            ("tiny.com", 3, 9),       # share floors at 1 -> floor=2 wins
            ("drained.com", 0, 100),  # nothing queued -> dropped
            ("thin.com", 1, 1),       # queued clamps below the floor
        ],
        "host string, queued long, weight long",
    )
    got = {r["host"]: r["quota"] for r in
           fr.allocate_budgets(stats, round_budget=100, politeness_cap=20,
                               floor=2).collect()}
    assert "drained.com" not in got
    assert got["big.com"] == 20          # politeness cap
    assert got["mid.com"] == 8           # 100*90 DIV 1100
    assert got["tiny.com"] == 2          # floor
    assert got["thin.com"] == 1          # queued clamp beats floor


def test_politeness_audit_gaps_and_violations(spark):
    log = spark.createDataFrame(
        [
            ("a.com", 0, "https://a.com/1"),
            ("a.com", 50, "https://a.com/2"),      # gap 50 → violation
            ("a.com", 1000, "https://a.com/3"),    # gap 950 → ok
            ("b.com", 7, "https://b.com/only"),    # single fetch: no gap
            ("c.com", 5, "https://c.com/zz"),
            ("c.com", 5, "https://c.com/aa"),      # ts tie → url order, gap 0
        ],
        "host string, ts_us long, url string",
    )
    got = {r["host"]: r for r in fr.politeness_audit(log, 100).collect()}
    a = got["a.com"]
    assert (a["n_fetches"], a["min_gap_us"], a["n_violations"]) == (3, 50, 1)
    b = got["b.com"]
    assert b["n_fetches"] == 1 and b["min_gap_us"] is None
    assert b["n_violations"] == 0
    c = got["c.com"]
    assert (c["min_gap_us"], c["n_violations"]) == (0, 1)


def _cuckoo_hashes(n, tag=""):
    return [hashlib.sha256(f"cuckoo{tag}{i}".encode()).hexdigest() for i in range(n)]


def test_cuckoo_filter_no_false_negatives(spark):
    """Output must equal the exact anti-join even with a deliberately
    undersized table (64 buckets × 4 slots per shard for ~375 inserts
    per shard) — overflow goes to the stash, never to a false negative
    (a lost URL)."""
    seen_h = _cuckoo_hashes(3000)
    new_h = _cuckoo_hashes(1000, tag="new")
    seen = spark.createDataFrame([(h,) for h in seen_h], "url_hash string")
    cand = spark.createDataFrame(
        [(h,) for h in seen_h[::2] + new_h], "url_hash string"
    )
    cu = fr.build_cuckoo_df(seen, n_shards=8, m_buckets=64)
    # stash actually engaged (the capacity is ~256/shard for ~375)
    assert any(len(r["stash"]) > 0 for r in cu.collect())
    got = {
        r["url_hash"]
        for r in fr.filter_unseen_cuckoo(cand, seen, cu, n_shards=8).collect()
    }
    exact = {
        r["url_hash"]
        for r in cand.join(seen, "url_hash", "left_anti").collect()
    }
    assert got == exact == set(new_h)


def test_cuckoo_fold_and_delta_equivalence(spark):
    """Per-round deltas checked delta-by-delta ≡ folded single table ≡
    exact — the same contract the Bloom shards pin."""
    a, b = _cuckoo_hashes(800), _cuckoo_hashes(800, tag="b")
    da = spark.createDataFrame([(h,) for h in a], "url_hash string")
    db = spark.createDataFrame([(h,) for h in b], "url_hash string")
    seen = da.unionAll(db)
    deltas = fr.build_cuckoo_df(da, n_shards=4, m_buckets=256).unionAll(
        fr.build_cuckoo_df(db, n_shards=4, m_buckets=256)
    )
    folded = fr.fold_cuckoo_df(deltas)
    assert folded.count() <= 4  # one row per shard after the fold
    cand = spark.createDataFrame(
        [(h,) for h in a[:100] + _cuckoo_hashes(100, tag="x")], "url_hash string"
    )
    exact = {r["url_hash"] for r in cand.join(seen, "url_hash", "left_anti").collect()}
    for filt in (deltas, folded):
        got = {
            r["url_hash"]
            for r in fr.filter_unseen_cuckoo(cand, seen, filt, n_shards=4).collect()
        }
        assert got == exact


def test_cuckoo_delete_and_copy_survival(spark):
    """Deleting URLs un-sees them (the Bloom-impossible operation);
    a colliding URL that shares (bucket, fingerprint) keeps its own
    stored copy and stays seen."""
    # two hand-crafted hashes: same shard ([:8]), same bucket ([8:16]),
    # same fingerprint ([32:36]) — distinct URLs colliding in the filter
    h1 = "00000000" + "000000ff" + "0" * 16 + "abcd" + "1" * 28
    h2 = "00000000" + "000000ff" + "0" * 16 + "abcd" + "2" * 28
    rest = _cuckoo_hashes(500)
    seen_all = spark.createDataFrame(
        [(h,) for h in [h1, h2] + rest], "url_hash string"
    )
    cu = fr.build_cuckoo_df(seen_all, n_shards=4, m_buckets=128)

    dels = [h1] + rest[:200]
    cu2 = fr.cuckoo_delete_df(
        cu, spark.createDataFrame([(h,) for h in dels], "url_hash string"),
        n_shards=4,
    )
    seen2 = seen_all.join(
        spark.createDataFrame([(h,) for h in dels], "url_hash string"),
        "url_hash", "left_anti",
    )
    # deleted URLs now pass through as new; kept URLs stay filtered;
    # h2 (the collider) must STILL be seen — its copy survived h1's delete
    cand = spark.createDataFrame(
        [(h,) for h in dels + [h2] + rest[200:300]], "url_hash string"
    )
    got = {
        r["url_hash"]
        for r in fr.filter_unseen_cuckoo(cand, seen2, cu2, n_shards=4).collect()
    }
    assert got == set(dels)
    assert h2 not in got


def test_cuckoo_build_deterministic_across_partitioning(spark):
    """Table and stash bytes are bit-equal regardless of input
    partitioning — snapshot-grade determinism, like the Bloom shards."""
    seen = spark.createDataFrame(
        [(h,) for h in _cuckoo_hashes(2000)], "url_hash string"
    )
    def snap(df):
        return {
            r["shard"]: (bytes(r["table"]), bytes(r["stash"]))
            for r in fr.build_cuckoo_df(df, n_shards=8, m_buckets=128).collect()
        }
    assert snap(seen.repartition(3)) == snap(seen.repartition(11))


def test_filter_unseen_dispatches_cuckoo_df(spark):
    """filter_unseen routes a (shard, m_buckets, table, stash) frame to
    the cuckoo path — the drop-in swap for the Bloom shards."""
    seen_h = _cuckoo_hashes(400)
    seen = spark.createDataFrame([(h,) for h in seen_h], "url_hash string")
    cand = spark.createDataFrame(
        [(h,) for h in seen_h[:50] + _cuckoo_hashes(50, tag="n")],
        "url_hash string",
    )
    cu = fr.build_cuckoo_df(seen, n_shards=4, m_buckets=256)
    got = {
        r["url_hash"]
        for r in fr.filter_unseen(cand, seen, cu, spark, n_shards=4).collect()
    }
    assert got == {h for h in _cuckoo_hashes(50, tag="n")}


def test_colocated_budgets_shares_server_cap(spark):
    """Hosts in one /24 block split server_cap proportionally to
    queued depth (integer DIV, floored); unresolved hosts degrade to a
    private per-host block and keep their full (capped) quota."""
    from gocrawl_spark.frontier import colocated_budgets

    stats = spark.createDataFrame(
        [("a.com", 30), ("b.com", 10), ("c.com", 5), ("d.com", 100)],
        "host string, queued long",
    )
    res = spark.createDataFrame(
        [("a.com", "10.0.1.7"), ("b.com", "10.0.1.9"), ("c.com", "10.0.2.1")],
        "host string, ip string",
    )
    got = {
        r["host"]: (r["ip_block"], r["quota"])
        for r in colocated_budgets(stats, res, server_cap=20).collect()
    }
    # block 10.0.1: queued 40 -> a gets 20*30//40=15, b gets 20*10//40=5
    assert got["a.com"] == ("10.0.1", 15)
    assert got["b.com"] == ("10.0.1", 5)
    # alone in its block: min(queued, cap)
    assert got["c.com"] == ("10.0.2", 5)
    # unresolved: private block, full cap
    assert got["d.com"] == ("host:d.com", 20)


def test_rendezvous_shard_stability(spark):
    """HRW assignment is uniform-ish and resize-stable: going 8→9
    shards moves roughly 1/9 of keys (well under 30%), while hash%n
    moves the vast majority; assignments are deterministic."""
    from pyspark.sql import functions as F

    from gocrawl_spark.frontier import rendezvous_shard

    urls = spark.range(2000).select(
        F.concat(F.lit("https://h.com/p/"), F.col("id").cast("string")).alias(
            "url"
        )
    )
    df = rendezvous_shard(rendezvous_shard(urls, "url", 8, "s8"), "url", 9, "s9")
    rows = df.collect()
    moved = sum(1 for r in rows if r["s8"] != r["s9"])
    assert moved / len(rows) < 0.3
    # every key lands in range, every shard is populated
    assert {r["s8"] for r in rows} == set(range(8))
    assert {r["s9"] for r in rows} == set(range(9))
    # determinism: recompute matches
    again = {
        r["url"]: r["s8"]
        for r in rendezvous_shard(urls, "url", 8, "s8").collect()
    }
    assert all(again[r["url"]] == r["s8"] for r in rows)


def test_aimd_delays_fold_and_clamps(spark):
    """AIMD politeness: success shaves dec_ms (floored), failure
    doubles (capped); the fold replays outcomes in (ts, ok) order with
    failures first on a timestamp tie — all integer, both engines
    replay the identical sequence."""
    from gocrawl_spark.frontier import aimd_delays, aimd_policy

    rows = []
    # a: ok ok ok → 500-300 = 200
    rows += [("a", t, True) for t in (1, 2, 3)]
    # b: ok fail ok → 400 → 800 → 700
    rows += [("b", 1, True), ("b", 2, False), ("b", 3, True)]
    # c: 8 failures → doubling capped at 60000
    rows += [("c", t, False) for t in range(8)]
    # d: 10 successes → floored at 100
    rows += [("d", t, True) for t in range(10)]
    # e: tie at ts=5 — fail sorts before ok: 500→1000→900 (not 400→800)
    rows += [("e", 5, True), ("e", 5, False)]
    df = spark.createDataFrame(rows, "host string, ts_us long, ok boolean")
    got = {
        r["host"]: (r["delay_ms"], r["n_ok"], r["n_err"])
        for r in aimd_delays(df).collect()
    }
    assert got == {
        "a": (200, 3, 0),
        "b": (700, 2, 1),
        "c": (60000, 0, 8),
        "d": (100, 10, 0),
        "e": (900, 1, 1),
    }
    pol = aimd_policy(aimd_delays(df), parallelism=2)
    assert pol.columns == ["domain", "delay_ms", "parallelism"]
    prow = {r["domain"]: r["parallelism"] for r in pol.collect()}
    assert set(prow) == set("abcde") and all(v == 2 for v in prow.values())

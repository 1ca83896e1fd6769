"""Adversarial-skew evidence: a pathological hot key must not produce
a pathological hot TASK.

Two skew sources the 10^10-URL design calls out:

- frontier pop (P3): a hub domain holding a large share of the
  frontier. The salted two-stage window (frontier._salt) spreads the
  hot domain over n_salts reducers — asserted here by measuring
  per-task rows AND per-task wall time through the exact exchange
  layouts the two window stages use.
- minhash band self-join: a duplicate cluster collapses into ONE
  (band, key) bucket on both join sides. AQE's skew-join split keeps
  the sort-merge partitions bounded — asserted on the executed
  adaptive plan.

Row counts are the deterministic signal; wall-clock ratios use loose
bounds (uniform per-row work, ~μs scale) so the test stays stable on
a noisy host.
"""

from __future__ import annotations

import hashlib
import statistics
import time

import pandas as pd
from pyspark.sql import functions as F

from gocrawl_spark import dedup
from gocrawl_spark.frontier import _salt


def _task_profile(df, col: str):
    """One (partition_id, rows, secs) row per task, with a fixed
    per-row workload so rows→time is a faithful proxy of an
    extraction-shaped stage."""

    def probe(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        t0 = time.perf_counter()
        n = 0
        for pdf in batches:
            for u in pdf[col]:
                h = str(u).encode()
                for _ in range(40):
                    h = hashlib.sha256(h).digest()
            n += len(pdf)
        yield pd.DataFrame(
            {"pid": [pid], "rows": [n], "secs": [time.perf_counter() - t0]}
        )

    return df.mapInPandas(probe, "pid int, rows long, secs double").collect()


def _hot_frontier(spark, n_cold_hosts=576, cold_rows=100, hot_rows=6400):
    """~10% of the frontier in ONE domain (the pathological hub) —
    at 64 shuffle partitions the fair share is ~1.5%, so the hot key
    is ~7x over fair share, the shape a 1%-hot key takes at cluster
    partition counts."""
    cold = spark.range(n_cold_hosts * cold_rows).select(
        F.concat(
            F.lit("https://cold"),
            (F.col("id") % n_cold_hosts).cast("string"),
            F.lit(".example.com/p/"),
            F.col("id").cast("string"),
        ).alias("url"),
        F.concat(
            F.lit("cold"),
            (F.col("id") % n_cold_hosts).cast("string"),
            F.lit(".example.com"),
        ).alias("domain"),
    )
    hot = spark.range(hot_rows).select(
        F.concat(
            F.lit("https://hub.example.com/p/"), F.col("id").cast("string")
        ).alias("url"),
        F.lit("hub.example.com").alias("domain"),
    )
    return (
        cold.unionByName(hot)
        .withColumn("url_hash", F.sha2("url", 256))
        .persist()
    )


def _ratios(prof):
    live = [p for p in prof if p["rows"] > 0]
    max_rows = max(p["rows"] for p in live)
    med_rows = statistics.median(p["rows"] for p in live)
    max_secs = max(p["secs"] for p in live)
    med_secs = statistics.median(p["secs"] for p in live)
    return max_rows / med_rows, max_secs / med_secs, max_rows


def test_salted_pop_exchange_bounds_hot_domain_task(spark):
    """The stage-1 exchange layout — hash(domain, salt) — must keep
    max/median task rows AND task time bounded where the unsalted
    hash(domain) layout concentrates the hub in one task."""
    frontier = _hot_frontier(spark)
    try:
        unsalted = frontier.repartition(64, "domain")
        salted = frontier.repartition(64, "domain", _salt(8))
        u_rows, u_secs, u_max = _ratios(_task_profile(unsalted, "url"))
        s_rows, s_secs, s_max = _ratios(_task_profile(salted, "url"))
        fair = (576 * 100 + 6400) / 64  # total rows / partitions
        # unsalted: the hub domain IS one task — max holds all 6400 hub
        # rows (plus colliding cold hosts), >=5x over both median and fair
        assert u_rows >= 5.0, u_rows
        assert u_max >= 6400, u_max
        # salted: the hub spreads over 8 salt groups; the max task is a
        # bounded multiple of FAIR SHARE (a few 800-row salt chunks can
        # still co-hash with cold hosts — bounded, not perfectly uniform)
        assert s_rows <= 3.5, s_rows
        assert s_max <= 4 * fair, (s_max, fair)
        assert s_max * 2 <= u_max, (s_max, u_max)
        # task-TIME follows rows. Row ratios above are deterministic;
        # wall time on a loaded shared host is not (a preempted task
        # inflates either ratio arbitrarily), so give the TIMING leg
        # alone a couple of fresh measurements before failing.
        for attempt in range(3):
            if u_secs >= 3.0 and s_secs <= 4.0:
                break
            _, u_secs, _ = _ratios(_task_profile(unsalted, "url"))
            _, s_secs, _ = _ratios(_task_profile(salted, "url"))
        assert u_secs >= 3.0, u_secs
        assert s_secs <= 4.0, s_secs
    finally:
        frontier.unpersist()


def test_event_funnel_hot_user_task_bounds(spark):
    """Event ops shuffle on the user key (funnel's chained window +
    same-partition aggregate; transitions' lag window). The
    adversarial-but-realistic hot key — ONE user holding 1% of all
    events (a bot account; no real log concentrates more into a
    single user id) — must stay within a bounded multiple of the fair
    task share under the hash(user_id) exchange layout both operators
    use: 1% ≪ the ~1.6% fair share at 64 partitions, so the hot user
    never dominates a task the way an unsalted hub domain does.
    Rows are the deterministic signal; the timing leg retries, as in
    the frontier-pop test."""
    import datetime as dt

    from gocrawl_spark import eventops

    hot_n, cold_users, cold_n = 1000, 495, 200
    base = dt.datetime(2024, 1, 1)
    rows = []
    # the hot user cycles the funnel steps in order, seconds apart
    for i in range(hot_n):
        rows.append(
            (i, 0, base + dt.timedelta(seconds=i),
             ("view", "click", "purchase")[i % 3])
        )
    for u in range(1, cold_users + 1):
        for j in range(cold_n):
            rows.append(
                (hot_n + u * cold_n + j, u,
                 base + dt.timedelta(seconds=u * 7 + j * 11),
                 ("view", "click", "purchase", "error")[j % 4])
            )
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    ).persist()
    try:
        total = hot_n + cold_users * cold_n
        assert abs(hot_n / total - 0.01) < 0.001  # the 1% hot user
        layout = ev.repartition(64, "user_id")
        r_rows, r_secs, r_max = _ratios(_task_profile(layout, "event_type"))
        fair = total / 64
        # bounded: the hot user's 1000 rows plus co-hashed cold users
        # stay within a few fair shares — no pathological task
        assert r_max <= 4 * fair, (r_max, fair)
        assert r_rows <= 3.5, r_rows
        for _ in range(3):
            if r_secs <= 4.0:
                break
            _, r_secs, _ = _ratios(_task_profile(layout, "event_type"))
        assert r_secs <= 4.0, r_secs

        # the operators stay CORRECT on the skewed stream, and funnel
        # keeps its one-Exchange contract under skew
        fun = eventops.funnel(ev, ["view", "click", "purchase"])
        got = {r["step"]: r["n_users"] for r in fun.collect()}
        # every user views; every user click-converts (cold users see
        # view→click→purchase inside their first four events)
        assert got["view"] == cold_users + 1
        assert got["click"] == cold_users + 1
        assert got["purchase"] == cold_users + 1
        # plan contract on an un-executed twin (post-collect AQE
        # output repeats the plan in its Initial Plan section)
        plan = (
            eventops.funnel(ev, ["view", "click", "purchase"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]

        tr = eventops.transitions(ev)
        by_pair = {
            (r["prev_type"], r["next_type"]): r["n"] for r in tr.collect()
        }
        # hot user: strict view→click→purchase cycle, 999 transitions
        assert by_pair[("view", "click")] >= 333
        assert sum(by_pair.values()) == total - (cold_users + 1)
    finally:
        ev.unpersist()


def test_minhash_band_join_aqe_skew_split(spark):
    """A duplicate cluster of identical text → every band hashes those
    docs into ONE bucket on both sides of the band self-join. With the
    skew thresholds scaled to test data (cluster defaults are 256 MB /
    factor 5 — same shape), AQE must mark and split the skewed
    sort-merge partition, and the pair output must still be exact:
    all C(m,2) duplicate pairs at est_jaccard 1.0."""
    m = 200
    dup_text = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while the pipeline keeps scanning tables and merging batches"
    )
    rows = [(i, dup_text) for i in range(m)]
    rows += [
        (m + i, f"unique document {i} with its own words number {i * 7}")
        for i in range(800)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "512b",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        pairs = dedup.minhash_pairs(df, bands=4, threshold=0.5)
        got = pairs.collect()
        plan = pairs._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    hot = [r for r in got if r["id_a"] < m and r["id_b"] < m]
    assert len(hot) == m * (m - 1) // 2
    assert all(r["est_jaccard"] == 1.0 for r in hot)
    # the adaptive plan actually split the skewed partition
    assert "skewed" in plan.lower(), plan[:2000]

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

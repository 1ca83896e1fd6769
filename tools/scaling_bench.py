"""N-vs-4N scaling-efficiency evidence (BASELINE.json north rule).

No real cluster exists in this sandbox, so the contract is evidenced
by running the SAME crawl job at two parallelism levels — local[8]
(N) and local[32] (4N) — on the same input and reporting throughput
at both plus efficiency = T(4N)/(4·T(N)).

The measured job is the steady-state round shape of a 10^10-URL
frontier: the frontier is already wide (every URL seeded), so one
politeness-budgeted round pops, fetches (corpus join), extracts
(fused pandas UDF), updates seen/frontier and commits the snapshot.
The corpus is the sf0.1 synthetic corpus replicated REPLICAS× under
distinct hosts (distinct-host replication keeps the politeness
scheduler balanced, exactly like salting hot domains would).

Each level runs in a fresh subprocess (own JVM). Usage:

    python tools/scaling_bench.py            # orchestrate, write BENCH/BASELINE.md
    python tools/scaling_bench.py --worker 8 # one measured run (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = int(os.environ.get("SPARK_GRAFT_REPLICAS", "64"))
# the N and 4N core counts; "2,8" stays inside the host's linear
# memory-bandwidth region (models N→4N executors with fixed per-node
# parallelism), "8,32" additionally stresses one shared DRAM domain
LEVELS = tuple(
    int(x) for x in os.environ.get("SPARK_GRAFT_LEVELS", "8,32").split(",")
)


def build_replicated_corpus(spark, sf_dir: str, replicas: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    from gocrawl_spark import synth

    corpus = synth.corpus_from_documents(spark, sf_dir)
    parts = [
        corpus.withColumn(
            "url", F.regexp_replace("url", "^https://", f"https://r{k}.")
        )
        for k in range(replicas)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(64).write.mode("overwrite").parquet(out_dir)


def run_level(cpus: int, corpus_dir: str) -> dict:
    """One measured steady-state crawl round at local[cpus].

    The frontier is seeded and materialized to parquet OUTSIDE the
    timed region (seeding is a one-time cost; the metric is
    URLs fetched+extracted/sec of the steady-state round), and the
    python workers are warmed so worker spawn/import isn't billed to
    one leg disproportionately."""
    from pyspark.sql import SparkSession

    from gocrawl_spark import udfs
    from gocrawl_spark.rounds import CrawlConfig, CrawlRun, init_frontier_df

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"scaling-bench-{cpus}")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        # match bench.py's tuned arrow batch: multi-KB html rows
        # pipeline scan→python→write far better at 2048 than 10k
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_GRAFT_ARROW_BATCH", "2048"),
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    corpus = spark.read.parquet(corpus_dir)
    run_dir = tempfile.mkdtemp(prefix=f"scaling_{cpus}_")
    repeat = int(os.environ.get("SPARK_GRAFT_EXTRACT_REPEAT", "1"))
    cfg = CrawlConfig(
        max_depth=0, round_wall_s=3600.0, max_rounds=1, use_bloom=False,
        extract_repeat=repeat,
    )
    crawl = CrawlRun(spark, corpus, [], run_dir, cfg)

    # untimed prep: materialized frontier (steady state reads it from
    # the previous round's snapshot) + python worker warmup
    frontier_path = os.path.join(run_dir, "frontier0")
    init_frontier_df(corpus.select("url")).write.parquet(frontier_path)
    frontier = spark.read.parquet(frontier_path)
    udfs.extract_pages(corpus.limit(cpus * 32).repartition(cpus)).count()

    t0 = time.perf_counter()
    stats = crawl.run_round(0, frontier, crawl._empty_seen(), seen_size=0)
    dt = time.perf_counter() - t0
    fetched = stats["fetched"]
    timings = stats.get("timings", {})
    spark.stop()
    import shutil

    shutil.rmtree(run_dir, ignore_errors=True)
    return {"cpus": cpus, "seconds": round(dt, 2), "fetched": fetched,
            "urls_per_sec": round(fetched / dt, 2), "extract_repeat": repeat,
            "timings": timings}


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        print(json.dumps(run_level(int(sys.argv[2]), sys.argv[3])))
        return

    # shared corpus built once by a throwaway session (or reused via
    # SPARK_GRAFT_CORPUS_DIR when running several level pairs)
    from pyspark.sql import SparkSession

    corpus_dir = os.environ.get("SPARK_GRAFT_CORPUS_DIR") or os.path.join(
        tempfile.mkdtemp(prefix="scaling_corpus_"), "corpus"
    )
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.isdir(corpus_dir):
        build_replicated_corpus(spark, SF_DIR, REPLICAS, corpus_dir)
    n = spark.read.parquet(corpus_dir).count()
    spark.stop()
    print(f"# corpus: {n} pages ({REPLICAS}x {SF_DIR})", file=sys.stderr)

    results = {}
    all_trials: dict[int, list] = {}
    trials = int(os.environ.get("SPARK_GRAFT_TRIALS", "2"))
    for cpus in LEVELS:
        best = None
        all_trials[cpus] = []
        for trial in range(trials):
            # quiesce: let the previous run's page-cache writeback drain
            # so one leg isn't billed for the other's dirty pages
            subprocess.run(["sync"])
            time.sleep(10)
            # pin the whole process tree (JVM + python workers) to
            # exactly `cpus` cores — otherwise the local[N] leg borrows
            # idle cores for its python workers and the N-vs-4N
            # comparison flatters N
            out = subprocess.run(
                ["taskset", "-c", f"0-{cpus - 1}", sys.executable, __file__,
                 "--worker", str(cpus), corpus_dir],
                capture_output=True, text=True, check=True,
            )
            r = json.loads(out.stdout.strip().splitlines()[-1])
            print(f"# local[{cpus}] trial {trial}: {r}", file=sys.stderr)
            all_trials[cpus].append(r["urls_per_sec"])
            if best is None or r["urls_per_sec"] > best["urls_per_sec"]:
                best = r
        results[cpus] = best

    n_, fourn = results[LEVELS[0]], results[LEVELS[1]]
    eff = fourn["urls_per_sec"] / (4 * n_["urls_per_sec"])
    summary = {
        "metric": "scaling_efficiency_N_to_4N",
        "levels": list(LEVELS),
        "N": n_, "fourN": fourn,
        "efficiency": round(eff, 3),
        "all_trials_urls_per_sec": all_trials,
        "replicas": REPLICAS, "sf_dir": SF_DIR, "corpus_pages": n,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()

"""Run one small deterministic crawl at a given parallelism and print a
JSON digest of everything order-sensitive — used by
tests/test_parallelism_determinism.py to assert bit-equal results at
local[2] vs local[8] (SURVEY.md §7.3.3; required by the N-vs-4N
comparison's determinism premise).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"

    from pyspark.sql import SparkSession

    from gocrawl_spark import synth
    from gocrawl_spark.rounds import CrawlConfig, CrawlRun

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(2, cpus)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    corpus = synth.corpus_from_documents(spark, sf_dir)
    run_dir = tempfile.mkdtemp(prefix=f"det_{cpus}_")
    cfg = CrawlConfig(max_depth=2, round_wall_s=10.0, max_rounds=4)
    crawl = CrawlRun(spark, corpus, synth.seed_urls(500, k=8), run_dir, cfg)
    history = crawl.run(resume=False)

    def digest(rows: list[str]) -> str:
        return hashlib.sha256("\n".join(sorted(rows)).encode()).hexdigest()

    seen = [r.url for r in crawl.seen_final().collect()]
    arts = [
        f"{r.id}|{r.title}|{r.word_count}" for r in crawl.articles().collect()
    ]
    pages = [f"{r.id}|{r.title}" for r in crawl.pages().collect()]
    out = {
        "cpus": cpus,
        "rounds": [(h["round"], h["popped"], h["fetched"]) for h in history],
        "seen_digest": digest(seen),
        "articles_digest": digest(arts),
        "pages_digest": digest(pages),
        "n_seen": len(seen),
    }
    print(json.dumps(out, sort_keys=True))
    shutil.rmtree(run_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

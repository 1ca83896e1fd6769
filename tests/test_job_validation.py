"""V10 job validation: a crawl job is rejected up front when its
config or seed list is invalid (reference JobValidator,
internal/content/job.go:59-71 / internal/job/service.go:96-101 — the
job's URL and state are validated before dispatch)."""

from __future__ import annotations

import pytest

from gocrawl_spark.rounds import CrawlConfig, CrawlRun


def test_config_validate_rejects_nonsense():
    for bad in (
        {"max_depth": -1},
        {"max_rounds": 0},
        {"round_wall_s": 0.0},
        {"parallelism": 0},
        {"max_retries": -2},
        {"bloom_shards": 0},
        {"bloom_bits": 0},
        {"n_salts": 0},
        {"fetch_mode": "carrier-pigeon"},
    ):
        with pytest.raises(ValueError):
            CrawlConfig(**bad).validate()
    CrawlConfig().validate()  # defaults are valid


def test_crawlrun_rejects_invalid_job(spark, tmp_path):
    with pytest.raises(ValueError, match="max_depth"):
        CrawlRun(spark, None, [], str(tmp_path), CrawlConfig(max_depth=-3))
    # invalid seed URL = invalid job (job.go URL validation)
    with pytest.raises(ValueError, match="seed"):
        CrawlRun(spark, None, ["not a url"], str(tmp_path), CrawlConfig(fetch_mode="http"))
    # corpus mode requires a corpus table at dispatch time (read-only
    # construction over a run_dir, e.g. the search CLI, stays legal)
    with pytest.raises(ValueError, match="corpus"):
        CrawlRun(spark, None, ["https://ok.example.com/"], str(tmp_path), CrawlConfig()).run()
    # valid http-mode job with no corpus is fine to construct
    CrawlRun(
        spark, None, ["https://ok.example.com/"], str(tmp_path), CrawlConfig(fetch_mode="http")
    )

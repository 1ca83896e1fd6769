"""CLI smoke: crawl → publish → search → index list (cmd/ parity)."""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*args: str) -> str:
    env = dict(os.environ, SPARK_GRAFT_CPUS="4", PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, "-m", "gocrawl_spark", *args],
        capture_output=True, text=True, check=True, timeout=420, cwd=REPO, env=env,
    )
    return out.stdout


@pytest.fixture(scope="module")
def demo(spark, sf_dir):
    from gocrawl_spark import synth

    base = tempfile.mkdtemp(prefix="cli_")
    corpus = os.path.join(base, "corpus")
    synth.corpus_from_documents(spark, sf_dir).write.parquet(corpus)
    return base, corpus


def test_cli_crawl_search_index(demo):
    base, corpus = demo
    run_dir = os.path.join(base, "run")
    wh = os.path.join(base, "wh")
    out = _run(
        "crawl", "--corpus", corpus, "--run-dir", run_dir, "--max-rounds", "2",
        "--max-depth", "1", "--round-wall-s", "10", "--seed-limit", "8",
        "--publish", wh,
    )
    assert "round 0:" in out and "published to warehouse" in out

    out = _run("search", "-q", "spark table", "--run-dir", run_dir, "-s", "3")
    assert "result(s)" in out

    out = _run("index", "list", "--warehouse", wh)
    assert "articles" in out and "pages" in out


def test_cli_crawl_from_warc(demo, spark):
    from gocrawl_spark import warc

    base, corpus = demo
    arch = os.path.join(base, "arch")
    warc.write_warc(spark.read.parquet(corpus), arch)
    out = _run(
        "crawl", "--corpus", arch, "--run-dir", os.path.join(base, "run_warc"),
        "--max-rounds", "1", "--max-depth", "0", "--round-wall-s", "10",
        "--seed-limit", "4",
    )
    assert "round 0:" in out and "total fetched: 4" in out


def test_cli_index_shards(demo, spark):
    """Training delivery verb: `index shards` writes the deterministic
    shard permutation of a warehouse table as partitioned parquet."""
    from gocrawl_spark.catalog import Warehouse

    base, _ = demo
    wh_dir = os.path.join(base, "wh2")
    wh = Warehouse(spark, wh_dir)
    df = spark.createDataFrame(
        [(str(i), f"body {i}") for i in range(40)], "id string, body string"
    )
    wh.upsert("docs", df)
    out_dir = os.path.join(base, "shards")
    out = _run(
        "index", "shards", "docs", "--warehouse", wh_dir,
        "--out", out_dir, "--shards", "4",
    )
    assert "wrote 4 training shards" in out
    back = spark.read.parquet(out_dir)
    assert back.count() == 40
    shards = {r["shard"] for r in back.select("shard").distinct().collect()}
    assert shards <= set(range(4))


def test_cli_sources_list(demo):
    base, _ = demo
    p = os.path.join(base, "sources.yml")
    with open(p, "w") as f:
        f.write("sources:\n  - name: S\n    url: https://site01.example.com\n")
    out = _run("sources", "list", "--sources", p)
    assert "site01.example.com" in out


def test_cli_sources_validate(demo):
    """cmd/sources/validate.go parity: per-field hit rates over corpus
    sample pages, critical-field summary, reference print shape."""
    base, corpus = demo
    p = os.path.join(base, "sources_v.yml")
    with open(p, "w") as f:
        f.write(
            "sources:\n"
            "  - name: Demo\n"
            "    url: https://site00.example.com/\n"
            "    selectors:\n"
            "      article:\n"
            "        title: h1\n"
            "        body: article\n"
            "        author: .author\n"
            "        published_time: time[datetime]\n"
        )
    out = _run(
        "sources", "validate", "--sources", p, "--source", "Demo",
        "--corpus", corpus, "-n", "4",
    )
    assert 'Testing selectors for "Demo"' in out
    assert "Total articles tested: 4" in out
    assert "Articles with all critical fields: 4 (100%)" in out
    assert "✅ title: 100% (4/4)" in out
    assert "✅ body: 100% (4/4)" in out
    assert "✅ published_time: 100% (4/4)" in out
    assert "Sample 1:" in out
    assert "✅ All articles have all critical fields!" in out


def test_cli_sources_validate_explicit_urls_and_misses(demo, spark):
    base, corpus = demo
    p = os.path.join(base, "sources_m.yml")
    with open(p, "w") as f:
        f.write(
            "sources:\n"
            "  - name: Demo\n"
            "    url: https://site00.example.com/\n"
            "    selectors:\n"
            "      article:\n"
            "        title: h1\n"
            "        body: .no-such-container\n"
        )
    urls = [
        r["url"]
        for r in spark.read.parquet(corpus)
        .filter("url LIKE 'https://site00.%'")
        .orderBy("url").limit(2).collect()
    ]
    out = _run(
        "sources", "validate", "--sources", p, "--source", "Demo",
        "--corpus", corpus, "--urls", *urls,
    )
    assert "Total articles tested: 2" in out
    # body selector misses every page: critical failure + failed URLs
    assert "❌ body: 0% (0/2)" in out
    assert f"Failed: {urls[0]}" in out
    assert "Articles with all critical fields: 0 (0%)" in out
    assert "⚠️  Some articles are missing critical fields." in out


def test_cli_sources_generate(demo):
    """cmd/sources/generate.go parity: starter YAML with discovered
    selectors, confidence comments, index names, exclusions."""
    base, corpus = demo
    out_file = os.path.join(base, "gen", "new_source.yml")
    _run(
        "sources", "generate", "--url", "https://site00.example.com/news",
        "--corpus", corpus, "-n", "50", "-o", out_file,
    )
    text = open(out_file).read()
    assert '- name: "Example"' in text
    assert 'url: "https://site00.example.com/news"' in text
    assert 'article_index: "site00_example_com_articles"' in text
    assert 'page_index: "site00_example_com_pages"' in text
    assert 'title: "h1"  # Confidence: 0.90' in text
    assert 'body: "article"  # Confidence:' in text
    assert "exclude: [" in text and '"script",' in text
    # stdout mode prints the same YAML
    out = _run(
        "sources", "generate", "--url", "https://site00.example.com/news",
        "--corpus", corpus, "-n", "50",
    )
    assert out == text


def test_cli_archive_and_cdx(demo):
    """archive → cdx lookup → cdx --fetch replay (full delivery flow)."""
    base, corpus = demo
    run_dir = os.path.join(base, "arun")
    _run("crawl", "--corpus", corpus, "--run-dir", run_dir,
         "--max-rounds", "1", "--max-depth", "0", "--round-wall-s", "10",
         "--seed-limit", "6")
    out_dir = os.path.join(base, "delivery")
    out = _run("archive", "--corpus", corpus, "--run-dir", run_dir,
               "--out", out_dir, "--wat")
    assert "archived" in out and "cdx index:" in out
    assert "wat companion" in out
    import glob as _glob
    assert len(_glob.glob(os.path.join(out_dir, "*.warc.wat.gz"))) >= 1

    out = _run("cdx", "--index", os.path.join(out_dir, "cdx"),
               "--prefix", "com,example,")
    lines = [l for l in out.splitlines() if l.startswith("com,example,")]
    assert len(lines) >= 1
    surt = lines[0].split("\t")[0]

    out = _run("cdx", "--index", os.path.join(out_dir, "cdx"),
               "--prefix", surt, "--fetch")
    assert "WARC/1.0" in out and "WARC-Target-URI:" in out

    out = _run("cdx", "--index", os.path.join(out_dir, "cdx"),
               "--prefix", "com,example,", "--latest")
    assert any(l.split("\t")[1] == "1" for l in out.splitlines()
               if l.startswith("com,example,"))

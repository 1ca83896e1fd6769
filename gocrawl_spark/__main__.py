"""CLI entry points mirroring the reference's commands.

    python -m gocrawl_spark crawl   --corpus DIR --run-dir DIR [--sources FILE] ...
    python -m gocrawl_spark search  --run-dir DIR -q QUERY [-i articles|pages] [-s N]
    python -m gocrawl_spark index   list|delete ... --warehouse DIR
    python -m gocrawl_spark sources list --sources FILE
    python -m gocrawl_spark discover --corpus DIR [--sample N]
    python -m gocrawl_spark httpd   --run-dir DIR|--warehouse DIR [--port N]
    python -m gocrawl_spark schedule --corpus DIR --run-dir DIR --sources FILE ...

Reference: cmd/crawl (crawl.go:108-122), cmd/search (search.go:104-143,
default size 10 search.go:24), cmd/index/list.go:47-130, sources list
(tests/features/sources_test.go), generator discovery, cmd/httpd over
internal/api (httpd.py), job scheduler (scheduler.py).
"""

from __future__ import annotations

import argparse
import os
import re
import sys


def _spark(cpus: int | None = None):
    from pyspark.sql import SparkSession

    # python workers import gocrawl_spark by PYTHONPATH, not the
    # driver's sys.path — export the package root so the CLI works from
    # any cwd (cluster deployments ship it via spark-submit --py-files)
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + existing if existing else "")
        )
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    s = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("gocrawl-spark-cli")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    return s


def _load_corpus(spark, path: str):
    """Parquet by default; a directory of .warc/.warc.gz files (or a
    path ending in .warc[.gz]) loads through the WARC reader."""
    import glob as _glob

    is_warc = path.rstrip("/").endswith((".warc", ".warc.gz")) or (
        os.path.isdir(path)
        and any(_glob.glob(os.path.join(path, "*.warc*")))
    )
    if is_warc:
        from gocrawl_spark import warc

        return warc.warc_corpus(spark, path)
    return spark.read.parquet(path)


def cmd_crawl(args) -> int:
    from gocrawl_spark import robots as rb
    from gocrawl_spark import sources as src
    from gocrawl_spark.rounds import CrawlConfig, CrawlRun

    spark = _spark(args.cpus)
    corpus = _load_corpus(spark, args.corpus)
    sources = src.load_sources(args.sources) if args.sources else None
    if sources and args.source:
        sources = [s for s in sources if s.name.lower() == args.source.lower()]
        if not sources:
            print(f"unknown source: {args.source}", file=sys.stderr)
            return 2
    seeds = (
        [u for s in sources for u in ([s.url] + list(s.start_urls))]
        if sources
        else [r.url for r in corpus.select("url").limit(args.seed_limit).collect()]
    )
    cfg = CrawlConfig(
        max_depth=args.max_depth,
        round_wall_s=args.round_wall_s,
        max_rounds=args.max_rounds,
        respect_robots=args.respect_robots,
        fetch_mode="http" if args.fetch_http else "corpus",
        http_proxy_base=args.proxy_base,
        table_format=args.table_format,
    )
    robots = rb.synth_robots(spark) if args.respect_robots and args.synth_robots else None
    crawl = CrawlRun(spark, corpus, seeds, args.run_dir, cfg, robots=robots, sources=sources)
    history = crawl.run(resume=args.resume)
    for h in history:
        print(
            f"round {h['round']}: popped={h['popped']} fetched={h['fetched']} "
            f"articles={h['articles']} pages={h['pages']} frontier={h['frontier_next']}"
        )
    print(f"total fetched: {sum(h['fetched'] for h in history)}; run dir: {args.run_dir}")
    if args.publish:
        from gocrawl_spark.catalog import Warehouse

        crawl.publish(Warehouse(spark, args.publish))
        print(f"published to warehouse: {args.publish}")
    return 0


def _truncate(s: str, n: int = 100) -> str:  # search.go:283-288
    s = s or ""
    return s if len(s) <= n else s[: n - 3] + "..."


def cmd_search(args) -> int:
    from gocrawl_spark import search
    from gocrawl_spark.rounds import CrawlRun

    spark = _spark(args.cpus)
    if args.run_dir:
        crawl = CrawlRun(spark, None, [], args.run_dir)
        df = crawl.articles() if args.index == "articles" else crawl.pages()
        text_col = "body" if args.index == "articles" else "content"
    else:
        from gocrawl_spark.catalog import Warehouse

        df = Warehouse(spark, args.warehouse).table(args.index)
        text_col = "body" if args.index == "articles" else "content"
    if args.mode == "bm25":
        hits = search.bm25_topk(df, args.query, text_col=text_col, id_col="id", k=args.size)
    elif args.mode == "multi":
        hits = search.multi_match_topk(
            df, args.query, fields={"title": 2.0, text_col: 1.0}, id_col="id", k=args.size
        )
    elif args.mode == "phrase":
        hits = search.match_phrase_topk(
            df, args.query, text_col=text_col, id_col="id", k=args.size
        )
    else:
        hits = search.match_topk(df, args.query, text_col=text_col, id_col="id", k=args.size)
    from pyspark.sql import functions as F

    joined = (
        hits.join(df, "id")
        .select("id", "score", text_col)
        .orderBy(F.desc("score"), F.asc("id"))
    )
    rows = joined.collect()
    print(f"{len(rows)} result(s) for {args.query!r} in {args.index}")
    for r in rows:
        print(f"  {r['score']:8.4f}  {r['id'][:16]}  {_truncate(r[text_col])}")
    return 0


def cmd_index(args) -> int:
    from gocrawl_spark.catalog import Warehouse

    wh = Warehouse(_spark(args.cpus), args.warehouse)
    if args.action == "list":
        # cmd/index/list.go:47-130 table: Index Health Status Docs Size
        # (the reference renders Size as N/A; real bytes here)
        rows = wh.cat_indices()
        print("Index\tHealth\tStatus\tDocs\tSize")
        for r in rows:
            print(
                f"{r['index']}\t{r['health']}\t{r['status']}\t"
                f"{r['docs']}\t{r['size_bytes']}"
            )
    elif args.action == "delete":
        if not args.name:
            print("index delete requires NAME", file=sys.stderr)
            return 2
        wh.drop_table(args.name)
        print(f"deleted {args.name}")
    elif args.action == "export":
        if not (args.name and args.out):
            print("index export requires NAME and --out DIR", file=sys.stderr)
            return 2
        n = wh.export_jsonl(args.name, args.out)
        print(f"exported {n} rows of {args.name} to {args.out} (jsonl)")
    elif args.action == "create":
        # cmd/index/create.go: DefaultMapping, no-op if exists
        if not args.name:
            print("index create requires NAME", file=sys.stderr)
            return 2
        if wh.create_index(args.name):
            print(f"created {args.name}")
        else:
            print(f"index {args.name} already exists")
    elif args.action == "shards":
        # training delivery: deterministic shard shuffle of an index
        # (curation.write_training_shards — same permutation anywhere)
        if not (args.name and args.out):
            print("index shards requires NAME and --out DIR", file=sys.stderr)
            return 2
        from gocrawl_spark import curation

        curation.write_training_shards(
            wh.table(args.name), args.out, args.shards,
            id_col=args.id_col, seed=args.seed,
        )
        print(f"wrote {args.shards} training shards of {args.name} to {args.out}")
    return 0


def cmd_sources(args) -> int:
    from gocrawl_spark import sources as src

    if args.action in ("list", "validate") and not args.sources:
        print(f"sources {args.action} requires --sources", file=sys.stderr)
        return 2
    if args.action in ("validate", "generate") and not args.corpus:
        print(f"sources {args.action} requires --corpus", file=sys.stderr)
        return 2
    if args.action == "list":
        for s in src.load_sources(args.sources):
            print(
                f"{s.name}\t{s.url}\trate={s.rate_limit_ms}ms depth={s.max_depth} "
                f"domains={','.join(s.allowed_domains)}"
            )
        return 0
    if args.action == "validate":
        return cmd_sources_validate(args)
    return cmd_sources_generate(args)


def cmd_sources_validate(args) -> int:
    """cmd/sources/validate.go: test a source's selectors against
    sample article pages; pages come from --corpus (S2 corpus-join
    fetch mode) instead of live HTTP."""
    from pyspark.sql import functions as F

    from gocrawl_spark import generator
    from gocrawl_spark import sources as src

    if not args.source:
        print("sources validate requires --source", file=sys.stderr)
        return 2
    matches = [
        s for s in src.load_sources(args.sources)
        if s.name.lower() == args.source.lower()
    ]
    if not matches:
        print(f"source not found: {args.source}", file=sys.stderr)
        return 1
    source = matches[0]
    spark = _spark(args.cpus)
    corpus = spark.read.parquet(args.corpus)
    if args.urls:
        pages = corpus.filter(F.col("url").isin(list(args.urls)))
    else:
        # batch analogue of discoverArticleURLs (validate.go:249-…):
        # sample the source's host from the corpus, source URL excluded
        host = F.lower(F.regexp_extract("url", r"^[a-z][a-z0-9+.-]*://([^/:]+)", 1))
        pages = corpus.filter(
            host.isin([d.lower() for d in source.allowed_domains])
            & (F.col("url") != source.url)
        )
        print(
            f"📋 Sampling up to {args.samples} article page(s) from the corpus"
        )
    print(f'🧪 Testing selectors for "{source.name}"...')
    result = generator.validate_selectors(
        pages, source.article_selectors, max_samples=args.samples
    )
    print(f"📄 Testing {result['total_articles']} article(s)...\n")
    print(generator.validation_report(result), end="")
    return 0


def cmd_sources_generate(args) -> int:
    """cmd/sources/generate.go: discover selectors for a new source
    over its corpus pages and emit a starter YAML block."""
    from pyspark.sql import functions as F

    from gocrawl_spark import generator

    if not args.url:
        print("sources generate requires --url", file=sys.stderr)
        return 2
    spark = _spark(args.cpus)
    corpus = spark.read.parquet(args.corpus)
    m = re.match(r"^[a-z][a-z0-9+.-]*://([^/:]+)", args.url, re.I)
    host = (m.group(1) if m else args.url).lower()
    sample = corpus.filter(
        F.lower(F.regexp_extract("url", r"^[a-z][a-z0-9+.-]*://([^/:]+)", 1))
        == host
    )
    if not sample.limit(1).count():
        sample = corpus  # host absent from corpus: analyze the whole sample
    print(f"🔍 Analyzing {args.url}...", file=sys.stderr)
    candidates, exclusions = generator.discover_candidates(
        sample, sample=args.samples
    )
    yaml_text = generator.generate_source_yaml(args.url, candidates, exclusions)
    missing = [f for f in ("title", "body") if f not in candidates]
    for f in missing:
        print(f"⚠️  No selector discovered for critical field: {f}",
              file=sys.stderr)
    if args.output:
        os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
        with open(args.output, "w") as fh:
            fh.write(yaml_text)
        print(f"✅ Wrote source config to {args.output}", file=sys.stderr)
    else:
        print(yaml_text, end="")
    return 0


def cmd_schedule(args) -> int:
    """Recurring re-crawl of all sources, one snapshot generation per
    tick (reference internal/job/scheduler.go:59-141)."""
    from gocrawl_spark import scheduler
    from gocrawl_spark import sources as src
    from gocrawl_spark.rounds import CrawlConfig

    spark = _spark(args.cpus)
    corpus = spark.read.parquet(args.corpus)
    sources = src.load_sources(args.sources)
    cfg = CrawlConfig(
        max_depth=args.max_depth,
        round_wall_s=args.round_wall_s,
        max_rounds=args.max_rounds,
        reuse_unchanged=args.reuse_unchanged,
    )
    results = scheduler.run_schedule(
        spark,
        corpus,
        sources,
        args.run_dir,
        cfg,
        ticks=args.ticks,
        interval_s=args.interval,
        rank_frontier=args.rank_frontier,
    )
    for r in results:
        print(
            f"gen {r['generation']}: rounds={r['rounds']} fetched={r['fetched']} "
            f"articles={r['articles']}{' (resumed)' if r['resumed'] else ''}"
        )
    return 0


def cmd_httpd(args) -> int:
    """Serve POST /search + GET /health over a crawl run dir or
    warehouse (reference `httpd` command, internal/api/api.go)."""
    from gocrawl_spark import httpd

    spark = _spark(args.cpus)
    backend = (
        httpd.SearchBackend.from_run_dir(spark, args.run_dir)
        if args.run_dir
        else httpd.SearchBackend.from_warehouse(spark, args.warehouse)
    )
    srv = httpd.serve(
        backend,
        host=args.host,
        port=args.port,
        api_key=args.api_key,
        rate_limit=args.rate_limit,
    )
    host, port = srv.server_address[:2]
    print(f"listening on http://{host}:{port} (indices: {', '.join(backend.tables)})")
    try:
        import threading

        threading.Event().wait()
    except KeyboardInterrupt:
        srv.shutdown()
    return 0


def cmd_discover(args) -> int:
    from gocrawl_spark import discovery

    spark = _spark(args.cpus)
    corpus = spark.read.parquet(args.corpus)
    best = discovery.best_selectors(corpus, sample=args.sample)
    for fld, sel in sorted(best.items()):
        print(f"{fld}: {sel}")
    return 0


def cmd_archive(args) -> int:
    """Deliver a finished crawl as WARC + CDX (CrawlRun.archive)."""
    from gocrawl_spark.rounds import CrawlConfig, CrawlRun

    spark = _spark(args.cpus)
    corpus = _load_corpus(spark, args.corpus)
    run = CrawlRun(spark, corpus, [], args.run_dir, CrawlConfig())
    manifest = run.archive(
        args.out, compress=not args.plain, cdx=not args.no_cdx, wat=args.wat
    ).collect()
    n = sum(r["n_records"] for r in manifest)
    print(f"archived {n} records in {len(manifest)} file(s) to {args.out}")
    if not args.no_cdx:
        print(f"cdx index: {os.path.join(args.out, 'cdx')}")
    if args.wat:
        print(f"wat companion written alongside (*.warc.wat{'' if args.plain else '.gz'})")
    return 0


def cmd_cdx(args) -> int:
    """Query a CDX capture index (prefix range scan; --latest
    collapses to the newest capture per key; --fetch replays the
    first hit's record by ranged read)."""
    from gocrawl_spark import cdx as cdxmod
    from gocrawl_spark import warc

    spark = _spark(args.cpus)
    idx = warc.read_cdx(spark, args.index)
    hits = cdxmod.cdx_lookup(idx, args.prefix, latest_only=args.latest)
    if args.latest:
        rows = hits.orderBy("surt").limit(args.size).collect()
        for r in rows:
            print(f"{r['surt']}\t{r['n_captures']}\t{r['last_ts_us']}\t{r['url']}")
    else:
        rows = hits.orderBy("surt", "ts_us").limit(args.size).collect()
        for r in rows:
            print(f"{r['surt']}\t{r['ts_us']}\t{r['url']}\t{r['length']}")
    if not rows:
        print("no captures match", file=sys.stderr)
        return 1
    if args.fetch:
        first = (
            hits.orderBy("surt", "ts_us")
            .select("file", "offset", "rec_bytes")
            .limit(1)
            .collect()[0]
        ) if not args.latest else None
        if first is None:
            print("--fetch requires a non --latest lookup", file=sys.stderr)
            return 2
        rec = warc.fetch_record(first["file"], first["offset"], first["rec_bytes"])
        head = rec.split(b"\r\n\r\n", 1)[0]
        print(head.decode("utf-8", "replace"))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="gocrawl_spark")
    p.add_argument("--cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl")
    c.add_argument("--corpus", required=True)
    c.add_argument("--run-dir", required=True)
    c.add_argument("--sources")
    c.add_argument("--source")
    c.add_argument("--seed-limit", type=int, default=32)
    c.add_argument("--max-depth", type=int, default=3)
    c.add_argument("--max-rounds", type=int, default=8)
    c.add_argument("--round-wall-s", type=float, default=60.0)
    c.add_argument("--resume", action="store_true")
    c.add_argument("--respect-robots", action="store_true")
    c.add_argument("--fetch-http", action="store_true",
                   help="real HTTP fetch mode instead of the corpus join (S2 variant)")
    c.add_argument("--proxy-base",
                   help="rewrite https://host/path onto BASE/host/path (loopback/forward proxy)")
    c.add_argument("--synth-robots", action="store_true")
    c.add_argument("--table-format", default="manifest",
                   choices=["manifest", "snapshot"],
                   help="round-commit protocol: MANIFEST-last parquet "
                        "layout or the Iceberg-shaped snapshot log")
    c.add_argument("--publish", help="warehouse dir to upsert articles/pages into")
    c.set_defaults(fn=cmd_crawl)

    s = sub.add_parser("search")
    s.add_argument("-q", "--query", required=True)
    s.add_argument("-i", "--index", default="articles", choices=["articles", "pages"])
    s.add_argument("-s", "--size", type=int, default=10)  # DefaultSearchSize
    s.add_argument("--mode", default="match", choices=["match", "multi", "bm25", "phrase"])
    s_src = s.add_mutually_exclusive_group(required=True)
    s_src.add_argument("--run-dir")
    s_src.add_argument("--warehouse")
    s.set_defaults(fn=cmd_search)

    i = sub.add_parser("index")
    i.add_argument("action", choices=["list", "create", "delete", "export", "shards"])
    i.add_argument("name", nargs="?")
    i.add_argument("--warehouse", required=True)
    i.add_argument("--out")  # export/shards: output directory
    i.add_argument("--shards", type=int, default=64)
    i.add_argument("--id-col", default="id")
    i.add_argument("--seed", default="gocrawl")
    i.set_defaults(fn=cmd_index)

    so = sub.add_parser("sources")
    so.add_argument("action", choices=["list", "validate", "generate"])
    so.add_argument("--sources", help="sources file (list/validate)")
    so.add_argument("--source", help="source name to validate")
    so.add_argument("--corpus", help="corpus parquet dir (validate/generate)")
    so.add_argument("--samples", "-n", type=int, default=5)
    so.add_argument("--urls", "-u", nargs="*",
                    help="specific article URLs to test (validate)")
    so.add_argument("--url", help="source URL to analyze (generate)")
    so.add_argument("--output", "-o", help="output file (generate; default stdout)")
    so.set_defaults(fn=cmd_sources)

    ar = sub.add_parser("archive")
    ar.add_argument("--corpus", required=True)
    ar.add_argument("--run-dir", required=True)
    ar.add_argument("--out", required=True)
    ar.add_argument("--plain", action="store_true",
                    help="uncompressed .warc instead of per-record gzip")
    ar.add_argument("--no-cdx", action="store_true")
    ar.add_argument("--wat", action="store_true",
                    help="also write the WAT metadata companion")
    ar.set_defaults(fn=cmd_archive)

    cx = sub.add_parser("cdx")
    cx.add_argument("--index", required=True, help="cdx sidecar dir")
    cx.add_argument("--prefix", required=True, help="SURT prefix, e.g. 'com,example,'")
    cx.add_argument("--latest", action="store_true")
    cx.add_argument("--size", type=int, default=20)
    cx.add_argument("--fetch", action="store_true",
                    help="replay the first hit's WARC headers (ranged read)")
    cx.set_defaults(fn=cmd_cdx)

    d = sub.add_parser("discover")
    d.add_argument("--corpus", required=True)
    d.add_argument("--sample", type=int, default=500)
    d.set_defaults(fn=cmd_discover)

    sc = sub.add_parser("schedule")
    sc.add_argument("--corpus", required=True)
    sc.add_argument("--run-dir", required=True)
    sc.add_argument("--sources", required=True)
    sc.add_argument("--interval", type=float, default=60.0)  # scheduler.go ticker
    # feedback loop: pop each new generation by the previous one's
    # link-rank priorities (graphrank); default = reference ordering
    sc.add_argument("--rank-frontier", action="store_true")
    # incremental re-crawl: skip the extraction kernel for pages whose
    # corpus warc_ts is unchanged vs the previous generation
    sc.add_argument("--reuse-unchanged", action="store_true")
    sc.add_argument("--ticks", type=int, default=1)
    sc.add_argument("--max-depth", type=int, default=3)
    sc.add_argument("--max-rounds", type=int, default=8)
    sc.add_argument("--round-wall-s", type=float, default=60.0)
    sc.set_defaults(fn=cmd_schedule)

    h = sub.add_parser("httpd")
    h_src = h.add_mutually_exclusive_group(required=True)
    h_src.add_argument("--run-dir")
    h_src.add_argument("--warehouse")
    h.add_argument("--host", default="127.0.0.1")
    h.add_argument("--port", type=int, default=8080)
    h.add_argument("--api-key")
    h.add_argument("--rate-limit", type=int, default=0)
    h.set_defaults(fn=cmd_httpd)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())

"""gocrawl_spark — a PySpark-native batch-iterative web-crawl analytics
engine with the query/data-processing capabilities of jonesrussell/gocrawl.

Layers:
- ``htmlmini``      pure-stdlib DOM + CSS engine (goquery-compatible, indexed)
- ``extract``       selector extraction kernel (byte-identical text contract)
- ``validate``      article validation gates V1–V9
- ``canonicalize``  URL resolution/normalization/hashing
- ``udfs``          Arrow-batched pandas UDF wrappers (fused extraction)
- ``frontier``      seen-filter (bloom + exact anti-join), politeness pop
- ``rounds``        batch-iterative crawl driver: snapshots, resume, retries, compaction
- ``fetch``         S2 real-fetch mode: live HTTP GETs, per-host pacing, redirects
- ``robots``        RFC 9309 robots.txt parser + vectorized allow/deny gate
- ``sources``       source configs: loader, URL→source matching, per-source selectors
- ``catalog``       index management: DDL, doc-id upsert, point get/delete
- ``search``        ES-equivalent query surface (match, multi_match, BM25, aggs)
- ``dedup``         exact / MinHash+LSH / SimHash / n-gram-Jaccard dedup
- ``similarity``    embedding similarity search (brute-force, IVF, LSH)
- ``textstats``     lang-id, quality scores, token counts, fingerprints
- ``curation``      training-data curation pipeline (langid ∘ quality ∘ dedup)
- ``multimodal``    binary media columns (real PNG/WAV headers; pixel decode stubbed)
- ``discovery``     selector auto-discovery batch job
- ``streaming``     Structured Streaming ingestion façade
- ``httpd``         HTTP search API (POST /search + security middleware)
- ``scheduler``     recurring re-crawl: one snapshot generation per tick
- ``synth``         deterministic corpus generator (seed=42)

CLI: ``python -m gocrawl_spark
crawl|search|index|sources|discover|schedule|httpd``.
"""

__version__ = "0.1.0"

"""gocrawl_spark — a PySpark-native batch-iterative web-crawl analytics
engine with the query/data-processing capabilities of jonesrussell/gocrawl.

Layers:
- ``htmlmini``      pure-stdlib DOM + CSS engine (goquery-compatible)
- ``extract``       selector extraction kernel (byte-identical text contract)
- ``validate``      article validation gates V1–V9
- ``canonicalize``  URL resolution/normalization/hashing
- ``udfs``          Arrow-batched pandas UDF wrappers
- ``frontier``      seen-filter (bloom + exact anti-join), politeness pop
- ``rounds``        batch-iterative crawl driver loop with resumable snapshots
- ``search``        ES-equivalent query surface (match, multi_match, count)
- ``textops``       training-data ops: dedup, lang-id, quality, fingerprints
- ``simsearch``     embedding similarity search (brute-force + LSH)
- ``synth``         deterministic corpus generator (seed=42)
"""

__version__ = "0.1.0"

"""Co-located storage for the fetch join — the 100 TB scale path.

The fetch stage (J2) joins the popped batch against the pages corpus
on ``url``. Unbucketed, BOTH sides shuffle — including the corpus side
carrying the multi-KB ``html`` payloads, by far the widest data
movement in a round. A Common-Crawl-scale corpus is written ONCE and
fetched against every round, so the classic fix applies: persist the
corpus hash-bucketed (and sorted) by the join key. Spark's bucketing
metadata then satisfies the join's required distribution on the corpus
side — only the (narrow) frontier batch shuffles, and the sorted
buckets skip the sort-merge sort. Payload bytes never cross the
network again after ingest.

This is the parquet-table analogue of the Iceberg layout the north
rule names (``bucket(N, url)`` partition transform + sorted data
files); swap ``saveAsTable`` for an Iceberg catalog write and the plan
shape is identical (storage-partitioned join).

Plan contract (pinned by tests/test_storage.py): the fetch join over a
bucketed corpus contains exactly ONE Exchange — on the frontier side —
and none above the corpus scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_corpus(
    corpus: DataFrame, table: str = "pages_corpus_bucketed", buckets: int = 64
) -> None:
    """Persist the corpus hash-bucketed + sorted by url. `buckets`
    should be sized so one bucket's html fits an executor's task
    comfortably (at 100 TB / 128 MB targets: tens of thousands;
    bucket count must then match spark.sql.shuffle.partitions or be a
    divisor for the exchange-free plan)."""
    (
        corpus.write.bucketBy(buckets, "url")
        .sortBy("url")
        .format("parquet")
        .mode("overwrite")
        .saveAsTable(table)
    )


def bucketed_corpus(spark: SparkSession, table: str = "pages_corpus_bucketed") -> DataFrame:
    """Read the bucketed corpus WITH its bucketing metadata (must go
    through the table catalog — a raw parquet path read loses it)."""
    return spark.table(table)


def n_exchanges(df: DataFrame) -> int:
    """Count Exchange operators in the physical plan (plan-shape
    assertions; run with AQE off for a stable string)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")


class BucketedSeenStore:
    """Hash-bucketed seen-set index — removes the LAST O(total-seen)
    shuffle in the round plan (F7/J3).

    The Bloom prefilter already shrinks the anti-join's *candidate*
    side to "maybe seen" rows (popped URLs + <1% false positives), but
    the exact ``left_anti`` backstop still had to shuffle the entire
    seen set every round to co-partition it with those candidates — at
    10^10 seen URLs that is ~320 GB of url_hash movement per round,
    forever. Fix mirrors the bucketed fetch join above: maintain the
    seen set as a catalog table ``bucketBy(N, url_hash)`` + sorted.
    The bucketing metadata satisfies the anti-join's required
    distribution on the seen side, so Catalyst shuffles ONLY the small
    maybe-side and streams each bucket's sorted run — per-round data
    movement drops from O(total-seen) to O(batch).

    Cost: each round appends its seen delta a second time (O(batch)
    write IO) — the classic index trade. Consistency with the
    manifest-last commit protocol: the snapshot deltas under
    ``rounds/round=NNNN/seen`` stay the source of truth; this table is
    a derived index with a WATERMARK.json advanced only after a
    successful append. A crash between append and watermark just
    re-appends the same rows on resume — duplicates are harmless
    because the anti-join needs membership, not uniqueness (and crawl
    pops are deterministic, so the re-run's delta is identical). A
    missing or stale index (compacted-away deltas, config change)
    rebuilds from the snapshot seen set in one distributed pass.

    Iceberg analogue: ``bucket(N, url_hash)`` partition transform on
    the seen table + storage-partitioned join.
    Reference parity: gocrawl keeps no persistent visited set at all
    (AllowURLRevisit, crawler.go:203) — this is north-rule surface.
    """

    def __init__(self, spark: SparkSession, run_dir: str, buckets: int = 64):
        import hashlib
        import os

        self.spark = spark
        self.run_dir = run_dir
        self.buckets = buckets
        tag = hashlib.md5(os.path.abspath(run_dir).encode()).hexdigest()[:12]
        self.table = f"seen_idx_{tag}"
        self._wm_path = os.path.join(run_dir, "seen_index", "WATERMARK.json")

    # ------------------------------------------------------------ state
    def watermark(self) -> "int | None":
        import json
        import os

        if not os.path.exists(self._wm_path):
            return None
        try:
            with open(self._wm_path) as f:
                wm = json.load(f)
        except ValueError:
            # crash mid-write left a truncated file: treat as missing —
            # the caller's catch-up/rebuild path re-derives the index,
            # which is exactly the class's crash-consistency contract
            return None
        if wm.get("buckets") != self.buckets:
            return None  # bucket-count change: treat as missing → rebuild
        return wm["upto"]

    def _set_watermark(self, rnd: int) -> None:
        import json
        import os

        os.makedirs(os.path.dirname(self._wm_path), exist_ok=True)
        # write-then-rename so a crash can never leave a truncated
        # watermark (the resume path parses this file first thing)
        tmp = self._wm_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"upto": rnd, "buckets": self.buckets, "table": self.table}, f)
        os.replace(tmp, self._wm_path)

    def exists(self) -> bool:
        return self.spark.catalog.tableExists(self.table)

    def df(self) -> "DataFrame | None":
        """The seen index WITH bucketing metadata (must be a catalog
        read — a raw parquet path read loses it). None before the
        first append; callers fall back to the empty seen set."""
        return self.spark.table(self.table) if self.exists() else None

    # ------------------------------------------------------------ writes
    def append(self, seen_delta: DataFrame, rnd: int) -> None:
        """Append one round's seen delta into its buckets (O(batch))
        and advance the watermark. Append-to-bucketed keeps the
        metadata valid: each new file is tagged with its bucket id."""
        (
            seen_delta.write.bucketBy(self.buckets, "url_hash")
            .sortBy("url_hash")
            .format("parquet")
            .mode("append")
            .saveAsTable(self.table)
        )
        self._set_watermark(rnd)

    def rebuild(self, seen: DataFrame, upto: int) -> None:
        """One distributed pass over the snapshot seen set — the
        bootstrap / repair path (first enable on an existing run, or
        needed deltas already compacted away)."""
        self.spark.sql(f"DROP TABLE IF EXISTS {self.table}")
        (
            seen.write.bucketBy(self.buckets, "url_hash")
            .sortBy("url_hash")
            .format("parquet")
            .mode("overwrite")
            .saveAsTable(self.table)
        )
        self._set_watermark(upto)

    def compact(self, seen: DataFrame, upto: int) -> None:
        """Maintenance twin of ``CrawlRun.compact`` (P7): every round's
        ``append`` adds one file set per bucket, so after R rounds each
        bucket is R small sorted runs — at 10^5 rounds that is a
        small-files problem and R-way merges per anti-join task. Fold
        the index back to ONE sorted file per bucket: repartition by
        the bucket column with numPartitions == buckets (Spark's
        bucketing and repartition both use Murmur3 pmod, so each task
        holds exactly one bucket) and rewrite. `seen` must be the
        snapshot-derived seen set ≤ `upto` — the source of truth —
        never a read of this table (rebuild drops it first)."""
        from pyspark.sql import functions as F

        self.rebuild(seen.repartition(self.buckets, F.col("url_hash")), upto)

    def drop(self) -> None:
        import shutil
        import os

        self.spark.sql(f"DROP TABLE IF EXISTS {self.table}")
        shutil.rmtree(os.path.dirname(self._wm_path), ignore_errors=True)


__all__ = [
    "write_bucketed_corpus",
    "bucketed_corpus",
    "n_exchanges",
    "BucketedSeenStore",
]

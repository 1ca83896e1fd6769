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


__all__ = ["write_bucketed_corpus", "bucketed_corpus", "n_exchanges"]

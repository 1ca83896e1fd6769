"""Link-graph rank (frontier prioritization): PageRank semantics,
mass conservation, and the rounding-pinned determinism contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gocrawl_spark import graphrank


@pytest.fixture(scope="module")
def star_edges(spark):
    # 0 is a hub: everyone links to 0; 0 links to 1 (no dangling nodes)
    rows = [(i, 0) for i in range(1, 6)] + [(0, 1)]
    return spark.createDataFrame(rows, "src long, dst long")


def test_hub_outranks_leaves(spark, star_edges):
    ranks = {r["node"]: r["rank"] for r in graphrank.link_rank(star_edges).collect()}
    assert ranks[0] == max(ranks.values())
    assert ranks[1] > ranks[2]  # 1 gets the hub's whole out-mass
    assert ranks[2] == ranks[3] == ranks[4] == ranks[5]


def test_mass_conserved_without_dangling(spark, star_edges):
    total = (
        graphrank.link_rank(star_edges, iters=3)
        .agg(F.sum("rank").alias("s"))
        .collect()[0]["s"]
    )
    assert total == pytest.approx(1.0, abs=1e-5)


def test_rank_deterministic_across_partitioning(spark, star_edges):
    a = sorted(map(tuple, graphrank.link_rank(star_edges).collect()))
    b = sorted(
        map(tuple, graphrank.link_rank(star_edges.repartition(7, "dst")).collect())
    )
    assert a == b  # per-sweep rounding pins the float fixpoint


def test_doc_edges_matches_synth_formula(spark):
    from gocrawl_spark import synth

    docs = spark.range(0, 40).select(F.col("id").alias("doc_id"))
    got = sorted(
        (r["src"], r["dst"]) for r in graphrank.doc_edges(docs, 40).collect()
    )
    want = sorted(
        (i, t) for i in range(40) for t in synth.link_targets(i, 40)
    )
    assert got == want

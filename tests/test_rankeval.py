"""Search-quality evaluation (ES ``_rank_eval``): metric math against
hand-computed BM25 rankings, the deterministic judgment pool, and the
HTTP endpoint (reference exposes this via its ES request passthrough,
internal/storage/storage.go:212-257)."""

from __future__ import annotations

import json
import math
import urllib.request

import pytest

from gocrawl_spark import httpd
from gocrawl_spark.rankeval import rank_eval


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        (1, "apple banana apple"),
        (2, "apple cherry"),
        (3, "banana banana banana"),
        (4, "cherry date"),
        (5, "elderberry fig"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bm25(tf: int, dl: int, df: int, n: int = 5, avgdl: float = 2.4) -> float:
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    return idf * tf / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))


def test_metrics_hand_computed(spark, tiny):
    ratings = spark.createDataFrame(
        [("r1", 1, 0), ("r1", 2, 2), ("r1", 3, 1)],
        "request_id string, id long, rating int",
    )
    out = {
        r["request_id"]: r
        for r in rank_eval(
            tiny, [("r1", "apple"), ("r2", "zzz")],
            text_col="text", id_col="doc_id", k=3, ratings=ratings,
        ).collect()
    }
    r1 = out["r1"]
    # ranking: doc1 (tf2, dl3) above doc2 (tf1, dl2)
    assert _bm25(2, 3, 2) > _bm25(1, 2, 2)
    assert r1["retrieved"] == 2
    # doc1 judged 0, doc2 judged 2 → one relevant of two retrieved
    assert r1["precision_k"] == 0.5
    # judged relevant: doc2, doc3 → recall 1/2
    assert r1["recall_k"] == 0.5
    # first relevant hit at rank 2
    assert r1["mrr"] == 0.5
    dcg = (2**0 - 1) / math.log2(2) + (2**2 - 1) / math.log2(3)
    idcg = (2**2 - 1) / math.log2(2) + (2**1 - 1) / math.log2(3)
    assert r1["ndcg_k"] == pytest.approx(dcg / idcg, abs=1e-6)
    # no hits → zero metrics but the request still reports
    r2 = out["r2"]
    assert r2["retrieved"] == 0
    assert (r2["precision_k"], r2["recall_k"], r2["mrr"], r2["ndcg_k"]) == (
        0.0, 0.0, 0.0, 0.0,
    )


def test_multi_term_fold_and_synth_pool(tiny):
    # multi-term query exercises the position-ordered score fold;
    # the md5 pool makes the run deterministic end-to-end
    a = rank_eval(
        tiny, [("q", "banana cherry")], text_col="text", id_col="doc_id", k=5
    ).collect()
    b = rank_eval(
        tiny, [("q", "banana cherry")], text_col="text", id_col="doc_id", k=5
    ).collect()
    assert a == b
    assert a[0]["retrieved"] == 4  # docs 1-4 match banana or cherry


def test_http_rank_eval_endpoint(spark):
    rows = [
        ("a1", "spark shuffles data across the cluster for every join"),
        ("a3", "spark plans are optimized by catalyst before execution"),
        ("a5", "spark executors run tasks over partitioned data"),
        ("a7", "bloom filters answer maybe or definitely not"),
    ]
    df = spark.createDataFrame(rows, "id string, body string")
    backend = httpd.SearchBackend({"articles": (df, "body")})
    srv = httpd.serve(backend, port=0)
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        body = {
            "index": "articles",
            "requests": [
                {
                    "id": "q_spark",
                    "request": {"query": {"match": {"body": "spark"}}},
                    "ratings": [
                        {"_id": "a5", "rating": 1},
                        {"_id": "a1", "rating": 1},
                    ],
                }
            ],
            "metric": {"precision": {"k": 2}},
        }
        req = urllib.request.Request(
            base + "/search/rank_eval",
            data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req) as resp:
            assert resp.status == 200
            out = json.loads(resp.read())
        # shortest doc wins BM25 at equal tf: a5, a3 retrieved; only a5
        # is judged relevant → precision@2 = 0.5
        assert out["metric_score"] == 0.5
        d = out["details"]["q_spark"]
        assert d["retrieved"] == 2
        assert d["recall_k"] == 0.5  # a5 of {a5, a1}
        assert d["mrr"] == 1.0
    finally:
        srv.shutdown()


def test_hard_negatives_excludes_relevant(spark, tiny):
    from gocrawl_spark.rankeval import hard_negatives

    # explicit qrels: doc 1 relevant for r1; docs 2,3 judged 0
    ratings = spark.createDataFrame(
        [("r1", 1, 2), ("r1", 2, 0), ("r1", 3, 0)],
        "request_id string, id long, rating int",
    )
    out = hard_negatives(
        tiny,
        [("r1", "apple banana")],
        text_col="text",
        id_col="doc_id",
        pool_k=10,
        n_neg=10,
        ratings=ratings,
    ).collect()
    ids = [r["id"] for r in out]
    # pool = docs containing apple or banana = {1,2,3}; 1 is relevant
    assert 1 not in ids
    assert set(ids) == {2, 3}
    # neg_rank contiguous from 1 in pool-rank order
    by_rank = sorted(out, key=lambda r: r["rank"])
    assert [r["neg_rank"] for r in by_rank] == [1, 2]


def test_hard_negatives_caps_and_orders(spark, tiny):
    from gocrawl_spark.rankeval import hard_negatives

    # no relevant judgments → every pooled doc is a negative; n_neg caps
    ratings = spark.createDataFrame(
        [("r1", 1, 0)], "request_id string, id long, rating int"
    )
    out = hard_negatives(
        tiny,
        [("r1", "apple banana cherry")],
        text_col="text",
        id_col="doc_id",
        pool_k=10,
        n_neg=2,
        ratings=ratings,
    ).collect()
    assert len(out) == 2
    # survivors keep BM25 pool order: scores non-increasing
    by_neg = sorted(out, key=lambda r: r["neg_rank"])
    assert by_neg[0]["score"] >= by_neg[1]["score"]
    assert by_neg[0]["rank"] < by_neg[1]["rank"]


def test_hard_negatives_no_terms_is_empty(spark, tiny):
    from gocrawl_spark.rankeval import hard_negatives

    out = hard_negatives(tiny, [("r1", "?!")], text_col="text", id_col="doc_id")
    assert out.count() == 0

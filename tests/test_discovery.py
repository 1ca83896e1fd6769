"""E15 selector auto-discovery (internal/generator/discovery.go:42-810)."""

from __future__ import annotations

from gocrawl_spark import discovery, synth


def test_discovers_corpus_selectors(spark, sf_dir):
    corpus = synth.corpus_from_documents(spark, sf_dir)
    best = discovery.best_selectors(corpus, sample=200)
    # the synthetic corpus is built from the reference fixtures:
    # article > h1 + p.lead + time[datetime]; script/nav/.sidebar bait
    assert best["title"] == "h1"
    assert best["body"] == "article"
    assert best["published_time"] == "time[datetime]"
    assert best["intro"] == "p.lead"
    assert "script" in best["exclude"]
    assert "nav" in best["exclude"]


def test_scores_are_support_times_confidence(spark, sf_dir):
    corpus = synth.corpus_from_documents(spark, sf_dir)
    scored = discovery.discover_selectors(corpus, sample=100).collect()
    assert scored
    for r in scored:
        assert 0.0 < r.support <= 1.0
        assert abs(r.score - r.support * r.confidence) < 1e-9
    # h1 appears on every page → full support
    h1 = [r for r in scored if r.field == "title" and r.selector == "h1"]
    assert h1 and h1[0].support == 1.0

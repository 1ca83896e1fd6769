"""Bit-equal crawl outputs at different parallelism (SURVEY.md §7.3.3).

The politeness pop's total order has no ties (url_hash tiebreak), the
candidate dedup keeps the deterministic earliest discovery, and child
discovery_seq is a pure function of the graph — so the ENTIRE crawl
(per-round pop counts, seen set, article/page tables) must be identical
at local[2] and local[8]. This is the premise the N-vs-4N scaling
comparison rests on.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

TOOL = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools", "crawl_once.py")


def _run(cpus: int) -> dict:
    out = subprocess.run(
        [sys.executable, TOOL, str(cpus)],
        capture_output=True,
        text=True,
        check=True,
        timeout=600,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_crawl_identical_across_parallelism():
    a = _run(2)
    b = _run(8)
    assert a["rounds"] == b["rounds"]
    assert a["seen_digest"] == b["seen_digest"]
    assert a["articles_digest"] == b["articles_digest"]
    assert a["pages_digest"] == b["pages_digest"]
    assert a["n_seen"] == b["n_seen"] > 0

"""Kernel-only multiprocessing calibration (no Spark): measures the
extraction kernel's pages/s at P pinned processes. Used to locate the
host's concurrency ceiling independently of the engine
(BENCH/BASELINE.md §"Why ..."). Usage:

    taskset -c 0-7  python tools/pool_calibration.py 8
    taskset -c 0-31 python tools/pool_calibration.py 32
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PAGES = int(os.environ.get("POOL_PAGES", "20000"))
SF = os.environ.get("POOL_SF", "/root/testdata/sf0.01")

_pages: list[tuple[str, str]] = []


def _init(pages):
    global _pages
    _pages = pages


def _work(args) -> int:
    lo, hi, reps = args
    from gocrawl_spark.extract import ArticleSelectors, PageSelectors, process_html

    a_sel, p_sel = ArticleSelectors.default(), PageSelectors.default()
    n = 0
    for _ in range(reps):
        for url, h in _pages[lo:hi]:
            process_html(h, url, a_sel, p_sel)
            n += 1
    return n


def main() -> None:
    procs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import duckdb

    from gocrawl_spark import synth

    rows = duckdb.sql(
        f"SELECT doc_id, text, lang FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    n_docs = len(rows)
    base = [
        (synth.url_of(d), synth.build_html(d, t, la, n_docs)) for d, t, la in rows
    ]
    pages = [base[i % n_docs] for i in range(N_PAGES)]
    reps = max(1, 3_000 // (N_PAGES // procs)) if procs else 1
    chunk = N_PAGES // procs
    tasks = [(i * chunk, (i + 1) * chunk, 8) for i in range(procs)]
    with mp.Pool(procs, initializer=_init, initargs=(pages,)) as pool:
        pool.map(_work, [(0, 200, 1)] * procs)  # warm imports
        t0 = time.perf_counter()
        done = sum(pool.map(_work, tasks))
        dt = time.perf_counter() - t0
    print(
        f'{{"procs": {procs}, "pages": {done}, "seconds": {dt:.2f}, '
        f'"pages_per_sec": {done / dt:.1f}, "per_core": {done / dt / procs:.1f}}}'
    )


if __name__ == "__main__":
    main()

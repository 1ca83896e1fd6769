"""Full-registry determinism drive: every __spark_entry__.queries()
entry run at TWO parallelism levels, outputs compared as sorted
stringified multisets (the compare_oracle normalization, so float
formatting matches the correctness gate's).

This is the evidence artifact for the north rule's "same answer on a
small and a large cluster" half: a query whose result depends on
partition count, task order, or float reduction order fails here.
Usage:

    python tools/determinism_drive.py [sf_dir] [out.json] [query ...]

Defaults: sf0.01, BENCH/determinism_r4.json, all queries. Levels are
(local[2] x 3 shuffle partitions) vs (local[8] x 17) — deliberately
coprime, off-default widths so accidental alignment can't hide an
order dependence.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from compare_oracle import normalize  # noqa: E402  (same-dir import)

LEVELS = (("local[2]", 3), ("local[8]", 17))


def run_all(master: str, shuffle: int, sf_dir: str, only: set[str]):
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    spark = (
        SparkSession.builder.master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .appName(f"determinism-{master}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, object] = {}
    try:
        for name, fn in E.queries().items():
            if only and name not in only:
                continue
            t0 = time.time()
            try:
                df = fn(spark, sf_dir)
                out[name] = normalize(df.toPandas())
            except Exception as exc:  # noqa: BLE001 — recorded, not raised
                out[name] = f"ERROR: {type(exc).__name__}: {exc}"
            print(f"  {master:9s} {name}: {time.time() - t0:.1f}s", flush=True)
    finally:
        spark.stop()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH/determinism_r4.json"
    only = set(sys.argv[3:])

    results = {}
    for master, shuffle in LEVELS:
        print(f"== {master}, shuffle={shuffle}", flush=True)
        results[master] = run_all(master, shuffle, sf_dir, only)

    (a_name, _), (b_name, _) = LEVELS
    a, b = results[a_name], results[b_name]
    report = {"sf_dir": sf_dir, "levels": [list(l) for l in LEVELS],
              "queries": {}, "mismatches": [], "errors": []}
    for name in a:
        if isinstance(a[name], str) or isinstance(b.get(name), str):
            report["errors"].append(name)
            report["queries"][name] = "error"
        elif a[name] == b[name]:
            report["queries"][name] = "bit-equal"
        else:
            report["mismatches"].append(name)
            report["queries"][name] = "MISMATCH"
    n = len(report["queries"])
    eq = sum(v == "bit-equal" for v in report["queries"].values())
    report["summary"] = f"{eq}/{n} bit-equal across {a_name} vs {b_name}"
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)
    print(report["summary"])
    if report["mismatches"]:
        print("MISMATCHES:", report["mismatches"])
    if report["errors"]:
        print("ERRORS:", report["errors"])
    return 1 if (report["mismatches"] or report["errors"]) else 0


if __name__ == "__main__":
    sys.exit(main())

"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__.queries() entry at a given sf next to its
oracle_sql() DuckDB twin and compares row-count, column names, and an
order-insensitive stringified value multiset. Usage:

    python tools/compare_oracle.py [--json OUT.json] [sf_dir] [query ...]

--json writes one row per query in the DRIVER's CORRECTNESS artifact
shape ({rows_match, schema_match, hash_match, spark_rows, oracle_rows,
err}), so a full-registry sweep produces a machine-readable green row
for every query even when the driver's own gate samples a subset
(VERDICT r4 item 1). Queries with no oracle get hash_match=null and
err="no oracle" semantics replaced by a rows-only record.
"""

from __future__ import annotations

import json
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]

    def cell(v):
        if isinstance(v, float):
            return f"{v:.6f}"
        return str(v)

    rows = [tuple(cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows)


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    records: dict[str, dict] = {}

    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("compare")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        try:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
        except Exception:
            pass

    qs, os_ = E.queries(), E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            records[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": None,
                "oracle_rows": None, "err": f"spark: {ex}"[:300],
            }
            failures += 1
            continue
        spark_s = time.monotonic() - t0
        if name not in os_:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{spark_s:.1f}s]")
            records[name] = {
                "rows_match": True, "schema_match": True,
                "hash_match": None, "spark_rows": len(sdf),
                "oracle_rows": None, "err": None,
            }
            continue
        t0 = time.monotonic()
        try:
            odf = con.sql(os_[name]).df()
        except Exception as ex:
            print(f"FAIL  {name}: oracle error: {ex}")
            records[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": len(sdf),
                "oracle_rows": None, "err": f"oracle: {ex}"[:300],
            }
            failures += 1
            continue
        oracle_s = time.monotonic() - t0
        ok = True
        rows_match = len(sdf) == len(odf)
        schema_match = sorted(sdf.columns) == sorted(odf.columns)
        hash_match = False
        if not rows_match:
            print(f"FAIL  {name}: rowcount spark={len(sdf)} oracle={len(odf)}")
            ok = False
        elif not schema_match:
            print(f"FAIL  {name}: cols spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
            ok = False
        else:
            a, b = normalize(sdf), normalize(odf)
            hash_match = a == b
            if not hash_match:
                diff = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
                print(f"FAIL  {name}: values differ; first diffs:")
                for i in diff:
                    print(f"   spark : {a[i]}\n   oracle: {b[i]}")
                ok = False
        records[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": len(sdf),
            "oracle_rows": len(odf), "err": None,
        }
        if ok:
            print(f"ok    {name}: {len(sdf)} rows [spark {spark_s:.1f}s, oracle {oracle_s:.1f}s]")
        else:
            failures += 1
    n_run = len([n for n in qs if not only or n in only])
    print(f"# sweep: {n_run - failures}/{n_run} ok, {failures} failures")
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(records, fh, indent=1, sort_keys=True)
        print(f"# wrote {len(records)} records to {json_out}")
    # explicit stop so the gateway JVM tears down and the process can
    # exit (a full-registry sweep otherwise parks in wait4 at exit)
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

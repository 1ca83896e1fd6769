"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__.queries() entry at a given sf next to its
oracle_sql() DuckDB twin and compares row-count, column names, and an
order-insensitive stringified value multiset. Usage:

    python tools/compare_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

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
            failures += 1
            continue
        spark_s = time.monotonic() - t0
        if name not in os_:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{spark_s:.1f}s]")
            continue
        t0 = time.monotonic()
        try:
            odf = con.sql(os_[name]).df()
        except Exception as ex:
            print(f"FAIL  {name}: oracle error: {ex}")
            failures += 1
            continue
        oracle_s = time.monotonic() - t0
        ok = True
        if len(sdf) != len(odf):
            print(f"FAIL  {name}: rowcount spark={len(sdf)} oracle={len(odf)}")
            ok = False
        elif sorted(sdf.columns) != sorted(odf.columns):
            print(f"FAIL  {name}: cols spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
            ok = False
        else:
            a, b = normalize(sdf), normalize(odf)
            if a != b:
                diff = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
                print(f"FAIL  {name}: values differ; first diffs:")
                for i in diff:
                    print(f"   spark : {a[i]}\n   oracle: {b[i]}")
                ok = False
        if ok:
            print(f"ok    {name}: {len(sdf)} rows [spark {spark_s:.1f}s, oracle {oracle_s:.1f}s]")
        else:
            failures += 1
    n_run = len([n for n in qs if not only or n in only])
    print(f"# sweep: {n_run - failures}/{n_run} ok, {failures} failures")
    # explicit stop so the gateway JVM tears down and the process can
    # exit (a full-registry sweep otherwise parks in wait4 at exit)
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate (dev tool only — the
engine itself is pure Scala/Spark; this script just lets us check
Spark-vs-DuckDB agreement before the driver does).

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

For every query directory under verify_out_dir:
  - read the Spark result parquet
  - run the matching SQL from oracle_sql.json in DuckDB, with each testdata
    table registered as a view
  - compare row count, column names (sorted), and values (strict equality,
    column-sorted like the driver's hash).
"""
import glob
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    # decimals -> float for comparison symmetry
    import decimal
    if isinstance(v, decimal.Decimal):
        return float(v)
    return v


def values_equal(a, b):
    a, b = norm(a), norm(b)
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_noracle = 0
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = qdir.rstrip("/").split("/")[-1]
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output parquet")
            n_fail += 1
            continue
        spark_tbl = pq.read_table(files[0])
        if name not in oracle:
            print(f"(rows-only) {name}: {spark_tbl.num_rows} rows")
            n_noracle += 1
            continue
        try:
            duck_tbl = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        problems = []
        s_cols, d_cols = sorted(spark_tbl.column_names), sorted(duck_tbl.column_names)
        if s_cols != d_cols:
            problems.append(f"columns differ: spark={s_cols} duck={d_cols}")
        if spark_tbl.num_rows != duck_tbl.num_rows:
            problems.append(
                f"rowcount differs: spark={spark_tbl.num_rows} duck={duck_tbl.num_rows}")
        if not problems:
            sd = spark_tbl.to_pydict()
            dd = duck_tbl.to_pydict()
            for c in s_cols:
                sv, dv = sd[c], dd[c]
                for i, (x, y) in enumerate(zip(sv, dv)):
                    if not values_equal(x, y):
                        problems.append(
                            f"col {c} row {i}: spark={x!r} duck={y!r}")
                        break
                if len(problems) >= 3:
                    break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:3]))
            n_fail += 1
        else:
            print(f"PASS {name} ({spark_tbl.num_rows} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

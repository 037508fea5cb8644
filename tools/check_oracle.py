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


def type_class(t):
    """Collapse an arrow type to the class the driver's value-hash is
    sensitive to. Width differences inside a class (int32 vs int64) hash
    the same python value; cross-class differences (DuckDB HUGEINT/SUM ->
    decimal128(38,0) vs Spark int64) do NOT — Decimal(5) and 5 repr
    differently — so they must be flagged even when values are equal."""
    import pyarrow.types as pt
    if pt.is_integer(t):
        return "int"
    if pt.is_floating(t):
        return "float"
    if pt.is_decimal(t):
        # scale is part of the class: repr(Decimal('5.00')) differs from
        # repr(Decimal('5.000')), so equal-valued decimals of different
        # scale still diverge under a repr-sensitive hash
        return f"decimal(*,{t.scale})"
    if pt.is_boolean(t):
        return "bool"
    if pt.is_string(t) or pt.is_large_string(t):
        return "string"
    if pt.is_timestamp(t):
        return "timestamp"
    if pt.is_date(t):
        return "date"
    if pt.is_binary(t) or pt.is_large_binary(t):
        return "binary"
    if pt.is_list(t) or pt.is_large_list(t) or pt.is_fixed_size_list(t):
        return "list"
    if pt.is_struct(t):
        return "struct"
    if pt.is_map(t):
        return "map"
    return str(t)


def norm(v):
    if v is None:
        return None
    # NOTE: decimals are NOT coerced to float here — cross-class
    # (decimal vs int/float) divergence is caught at the schema level
    # above, and within-class decimal values compare exactly.
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

    import os
    def suffix(t):
        # directory-layout tables (Spark writes a dir of part files)
        return "/*.parquet" if os.path.isdir(f"{sf_dir}/{t}.parquet") else ""
    con = duckdb.connect()
    if len(sys.argv) > 3:  # optional: pin threads (determinism probes)
        con.execute(f"SET threads={int(sys.argv[3])}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet{suffix(t)}')")
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
        else:
            for c in s_cols:
                st = spark_tbl.schema.field(c).type
                dt = duck_tbl.schema.field(c).type
                sc, dc = type_class(st), type_class(dt)
                if sc != dc:
                    problems.append(
                        f"TYPE col {c}: spark {st} ({sc}) vs duck {dt} ({dc})"
                        " — driver hash will mismatch even if values equal")
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

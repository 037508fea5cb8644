#!/usr/bin/env python3
"""Time every oracle twin in DuckDB (dev tool — mirrors the judge's
engine-vs-DuckDB ratio measurement).

Usage: python3 tools/time_duckdb.py <verify_out_dir> <sf_dir> [threads] [--json PATH]

Reads oracle_sql.json from verify_out_dir, registers the testdata tables
as views, runs each query once warm-up-free per round and prints per-query
seconds (best of 2) plus the total. With --json PATH also writes the
per-query seconds to PATH (committed as duckdb_times.json so graft.Bench
can fold engine/duckdb ratio columns into bench_queries.json — the
plan-audit shortlist becomes computable from artifacts alone).
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    args = list(sys.argv[1:])
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        del args[i:i + 2]
    out_dir, sf_dir = args[0], args[1]

    import os
    def suffix(t):
        # directory-layout tables (Spark writes a dir of part files)
        return "/*.parquet" if os.path.isdir(f"{sf_dir}/{t}.parquet") else ""
    threads = args[2] if len(args) > 2 else "32"
    con = duckdb.connect()
    con.execute(f"SET threads={threads}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet{suffix(t)}')")
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))
    times = {}
    for name in sorted(sql):
        best = None
        for _ in range(2):
            t0 = time.time()
            try:
                con.execute(sql[name]).fetchall()
            except Exception as e:
                print(f"ERR  {name}: {e}")
                best = -1.0
                break
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        times[name] = best
    total = sum(v for v in times.values() if v >= 0)
    # Full per-query listing (slowest first) so engine-vs-oracle ratios
    # are auditable per query without re-instrumenting.
    for k, v in sorted(times.items(), key=lambda kv: -kv[1]):
        print(f"{v:8.3f}  {k}")
    print(json.dumps({"total_sec": round(total, 3), "n": len(times),
                      "errors": sum(1 for v in times.values() if v < 0)}))
    if json_path:
        meta = {"sf_dir": sf_dir, "threads": int(threads),
                "total_sec": round(total, 3),
                "generated_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                               time.gmtime())}
        with open(json_path, "w") as f:
            json.dump({"meta": meta,
                       "queries": {k: round(v, 4) for k, v in
                                   sorted(times.items())}}, f, indent=1)
        print(f"wrote {json_path}")


if __name__ == "__main__":
    main()

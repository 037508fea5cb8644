#!/usr/bin/env python3
"""Bisect which CTE of a big oracle twin balloons DuckDB's memory.

Runs `SELECT COUNT(*) FROM <cte>` for each requested CTE of a named
query's twin as a SUBPROCESS with a hard RLIMIT_AS, so a runaway
allocation surfaces as an in-process error instead of the kernel OOM
killer taking out the campaign. Reports per-CTE peak RSS + wall time.

Usage: probe_twin_mem.py <verify_out_dir> <sf_dir> <query> <cte1,cte2,...>
       [--limit-gb 50] [--mem 30GB] [--threads 8]
"""
import json
import os
import re
import resource
import subprocess
import sys
import time

args = list(sys.argv[1:])
def opt(name, default):
    if name in args:
        i = args.index(name)
        v = args[i + 1]
        del args[i:i + 2]
        return v
    return default
limit_gb = float(opt("--limit-gb", "50"))
duck_mem = opt("--mem", "30GB")
threads = opt("--threads", "8")
out_dir, sf_dir, query, ctes = args[0], args[1], args[2], args[3].split(",")

sql = json.load(open(f"{out_dir}/oracle_sql.json"))[query]
m = re.match(r"WITH\s", sql)
assert m, "twin is not a WITH query"
body = sql[m.end():]

CHILD = r'''
import resource, sys, time, os
resource.setrlimit(resource.RLIMIT_AS,
                   (int(float(sys.argv[1])*2**30),)*2)
import duckdb
sf_dir, threads, mem, sql = sys.argv[2], sys.argv[3], sys.argv[4], sys.stdin.read()
con = duckdb.connect()
con.execute(f"SET threads={threads}")
con.execute(f"SET memory_limit='{mem}'")
con.execute("SET preserve_insertion_order=false")
os.makedirs("/root/repo/target/duck_spill", exist_ok=True)
con.execute("SET temp_directory='/root/repo/target/duck_spill'")
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    suf = "/*.parquet" if os.path.isdir(f"{sf_dir}/{t}.parquet") else ""
    try:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet{suf}')")
    except Exception:
        pass
t0 = time.time()
n = con.execute(sql).fetchone()[0]
peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
print(f"OK rows={n} sec={time.time()-t0:.1f} peak_mb={peak}", flush=True)
'''

# locate where the CTE list ends and the final (possibly UNION ALL)
# select begins: the first point at paren depth 0 where, after a CTE's
# closing paren and optional comma/whitespace, the next token is SELECT
depth = 0
final_at = None
i = 0
while i < len(body):
    ch = body[i]
    if ch == "(":
        depth += 1
    elif ch == ")":
        depth -= 1
        if depth == 0:
            j = i + 1
            while j < len(body) and body[j] in ", \n\t\r":
                j += 1
            if body[j:j + 6].upper() == "SELECT":
                final_at = j
                break
    i += 1
assert final_at, "could not find the twin's final select"
cte_list = body[:final_at]

for cte in ctes:
    # DuckDB only evaluates CTEs the final select (transitively) references.
    # `cte:expr` probes SELECT <expr> instead of COUNT(*) — COUNT over a
    # grouped CTE gets optimizer-pruned to a distinct count of the keys,
    # skipping the aggregate whose memory we're trying to measure.
    expr = "COUNT(*)"
    if ":" in cte:
        cte, expr = cte.split(":", 1)
    probe = "WITH " + cte_list + f"\nSELECT {expr} FROM {cte}"
    t0 = time.time()
    p = subprocess.run(
        [sys.executable, "-c", CHILD, str(limit_gb), sf_dir, threads,
         duck_mem],
        input=probe, capture_output=True, text=True, timeout=3600)
    out = (p.stdout + p.stderr).strip().splitlines()
    tail = out[-1][:200] if out else "(no output)"
    print(f"[{cte}] rc={p.returncode} wall={time.time()-t0:.0f}s {tail}",
          flush=True)

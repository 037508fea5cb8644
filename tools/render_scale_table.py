#!/usr/bin/env python3
"""Render a markdown status table from one or more check_oracle_scale JSONs.
Later files override earlier ones per query (second-pass results win).
Usage: render_scale_table.py out1.json [out2.json ...]"""
import json
import sys

merged = {}
for path in sys.argv[1:]:
    d = json.load(open(path))
    for q, v in d.get("queries", d).items():
        if isinstance(v, dict):
            merged[q] = dict(v, src=path.split("/")[-1])

print("| query | status | engine rows | oracle sec | pass |")
print("|---|---|---|---|---|")
tally = {}
for q in sorted(merged):
    v = merged[q]
    st = v.get("status", "?")
    tally[st] = tally.get(st, 0) + 1
    rows = v.get("rows", "")
    rows = f"{rows:,}" if isinstance(rows, int) else rows
    sec = v.get("oracle_sec", "")
    print(f"| {q} | {st} | {rows} | {sec} | {v['src']} |")
print()
print(json.dumps(tally))

#!/usr/bin/env python3
"""Render the SCALE_r15 §5a exponent table from exponents_r15.log.
Usage: render_exponents.py [logfile]"""
import re
import sys

path = sys.argv[1] if len(sys.argv) > 1 else "target/scale/out/exponents_r15.log"
data = {}  # query -> {leg: min}
for line in open(path):
    m = re.match(r"\[(sf[0-9.]+)\] QBENCH (\S+)\s+min=([0-9.]+)", line)
    if m:
        leg, q, v = m.group(1), m.group(2), float(m.group(3))
        data.setdefault(q, {})[leg] = v

legs = ["sf0.1", "sf1", "sf10", "sf100"]
print("| query | sf0.1 | sf1 | sf10 | sf100 | ×/decade (1→10) | ×/decade (10→100) |")
print("|---|---|---|---|---|---|---|")
for q in sorted(data):
    d = data[q]
    def f(leg):
        return f"{d[leg]:.2f}" if leg in d else "—"
    def ratio(a, b):
        return f"{d[b]/d[a]:.1f}×" if a in d and b in d and d[a] > 0 else "—"
    print(f"| {q} | {f('sf0.1')} | {f('sf1')} | {f('sf10')} | {f('sf100')} "
          f"| {ratio('sf1','sf10')} | {ratio('sf10','sf100')} |")

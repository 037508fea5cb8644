#!/usr/bin/env python3
"""Bit-parity probe for the oracle twins' dot product (Similarity.sqlDot).

r16 switched the twins' dot from the explicit left-fold
  list_sum(list_transform(range(1, len(e)+1), i -> CAST(e[i] AS DOUBLE) * c[i]))
to DuckDB's native list_dot_product(e, CAST(c AS DOUBLE[])) — ~17x faster,
which is what makes the Lloyd-chain twins tractable at full sf100
(corpus x sqrt(N) cells per round). That substitution is only sound if the
native kernel runs the IDENTICAL IEEE accumulation chain; this probe
re-verifies it on the actual corpus against two centroid value classes
(raw seeds and mean-like irrationals) plus the float-pair class the
semantic twin's cosine uses, with strict `<>` on raw doubles.

Also records the negative control: list_dot_product over two raw FLOAT[]
accumulates in FLOAT and does NOT match (which is why sqlDot casts the
second operand).

Usage: probe_dot_parity.py [sf_dir]   (default target/scale/sf10)
"""
import sys

import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "target/scale/sf10"
con = duckdb.connect()
con.execute("SET threads=24")
con.execute(
    "CREATE VIEW embeddings AS SELECT * FROM "
    f"read_parquet('{sf}/embeddings.parquet{'/*.parquet' if 'scale' in sf else ''}')")

FOLD = ("list_sum(list_transform(range(1, len(e.embedding)+1), "
        "i -> CAST(e.embedding[i] AS DOUBLE) * c.centroid[i]))")

checks = [
    ("seed centroids (FLOAT[] x DOUBLE[])",
     "SELECT vec_id cid, list_transform(embedding, x->CAST(x AS DOUBLE)) centroid "
     "FROM embeddings WHERE vec_id < 64"),
    ("mean-like centroids (full-precision doubles)",
     "SELECT vec_id cid, list_transform(embedding, "
     "x->CAST(x AS DOUBLE)/3.000000001 + 0.123456789012345) centroid "
     "FROM embeddings WHERE vec_id < 64"),
]
for name, cents in checks:
    n = con.execute(
        f"WITH c AS ({cents}) SELECT COUNT(*) FROM embeddings e, c "
        f"WHERE {FOLD} <> list_dot_product(e.embedding, CAST(c.centroid AS DOUBLE[]))"
    ).fetchone()[0]
    print(f"{name}: {n} mismatches")
    assert n == 0, f"PARITY BROKEN: {name}"

# float-pair class (the semantic twin's cosine numerator)
n = con.execute(
    "SELECT COUNT(*) FROM (SELECT embedding FROM embeddings WHERE vec_id % 1000 = 0) a, "
    "(SELECT embedding FROM embeddings WHERE vec_id % 503 = 0) b "
    "WHERE list_sum(list_transform(range(1, len(a.embedding)+1), "
    "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) "
    "<> list_dot_product(a.embedding, CAST(b.embedding AS DOUBLE[]))").fetchone()[0]
print(f"float pairs with cast: {n} mismatches")
assert n == 0, "PARITY BROKEN: float pairs"

# negative control: raw FLOAT[] x FLOAT[] must NOT be used
n = con.execute(
    "SELECT COUNT(*) FROM (SELECT embedding FROM embeddings WHERE vec_id % 1000 = 0) a, "
    "(SELECT embedding FROM embeddings WHERE vec_id % 503 = 0) b "
    "WHERE list_sum(list_transform(range(1, len(a.embedding)+1), "
    "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) "
    "<> list_dot_product(a.embedding, b.embedding)").fetchone()[0]
print(f"negative control (raw float x float): {n} mismatches (expected > 0)")
assert n > 0, "negative control unexpectedly clean — re-examine the cast rationale"
print("OK")

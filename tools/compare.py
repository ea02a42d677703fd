#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read Verify output
parquet + oracle_sql.json, run each oracle in DuckDB against the same
sf dir, and compare (schema-agnostic: sort columns by name, sort rows,
compare values cell-by-cell)."""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails, passes, skips = [], [], []
for name in sorted(os.listdir(out_dir)):
    p = f"{out_dir}/{name}"
    if not os.path.isdir(p):
        continue
    files = glob.glob(f"{p}/*.parquet")
    if not files:
        fails.append((name, "no parquet output")); continue
    got = pd.concat([pd.read_parquet(f) for f in files])
    if name not in oracle:
        skips.append((name, len(got))); continue
    try:
        exp = con.execute(oracle[name]).df()
    except Exception as e:
        fails.append((name, f"oracle error: {e}")); continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        fails.append((name, f"cols {list(got.columns)} != {list(exp.columns)}")); continue
    if len(got) != len(exp):
        fails.append((name, f"rows {len(got)} != {len(exp)}")); continue
    g = got.sort_values(by=list(got.columns), na_position="first").reset_index(drop=True)
    e = exp.sort_values(by=list(exp.columns), na_position="first").reset_index(drop=True)
    try:
        g = g.astype(e.dtypes.to_dict())
    except Exception:
        pass
    eq = True
    for c in g.columns:
        a, b = g[c], e[c]
        if not (a.isna() == b.isna()).all():
            eq = False; fails.append((name, f"null mismatch col {c}")); break
        mask = ~a.isna()
        av, bv = a[mask], b[mask]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            same = (av.astype(float).values == bv.astype(float).values)
        else:
            same = (av.astype(str).values == bv.astype(str).values)
        if not same.all():
            idx = (~same).nonzero()[0][:3]
            eq = False
            fails.append((name, f"col {c} diff at {idx}: got {av.iloc[idx].tolist()} exp {bv.iloc[idx].tolist()}"))
            break
    if eq:
        passes.append(name)

print(f"PASS {len(passes)}: {passes}")
print(f"SKIP (rows-only) {len(skips)}: {skips}")
print(f"FAIL {len(fails)}:")
for n, why in fails:
    print(f"  {n}: {why}")
sys.exit(1 if fails else 0)

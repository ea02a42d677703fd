#!/usr/bin/env python3
"""HUGEINT-hazard audit: the driver's correctness gate hashes TYPED
values, so an oracle whose DuckDB result column comes back as float64
(e.g. an uncast SUM of an integer -> HUGEINT -> pandas float64) while
Spark emits int64 fails the hash even when every value is equal.
This script compares pandas dtypes of each oracle result against the
Spark Verify parquet dump and flags any integer-vs-float divergence.
"""
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
flagged = 0
for name in sorted(oracle):
    p = f"{out_dir}/{name}"
    files = glob.glob(f"{p}/*.parquet")
    if not files:
        # a missing dump means this oracle was never dtype-checked —
        # that must fail the audit, not silently pass as CLEAN
        print(f"FLAG {name}: no spark output to audit against")
        flagged += 1
        continue
    got = pd.concat([pd.read_parquet(f) for f in files])
    try:
        exp = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); flagged += 1; continue
    for c in sorted(set(got.columns) | set(exp.columns)):
        if c not in got.columns or c not in exp.columns:
            print(f"FLAG {name}.{c}: column missing on one side"); flagged += 1
            continue
        gk, ek = got[c].dtype.kind, exp[c].dtype.kind
        # kinds: i/u integer, f float, O object (string/decimal), b bool,
        # M datetime. integer-vs-float (either direction) is the hash
        # killer; object-vs-numeric (DuckDB HUGEINT -> object) likewise.
        ok = (gk == ek) or ({gk, ek} <= {"i", "u"})
        if not ok:
            print(f"FLAG {name}.{c}: spark={got[c].dtype} duckdb={exp[c].dtype}")
            flagged += 1
print(f"{'CLEAN' if flagged == 0 else 'FLAGGED ' + str(flagged)}: "
      f"{len(oracle)} oracles audited")
sys.exit(1 if flagged else 0)

#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Reads Verify output (parquet per query + oracle_sql.json), runs each oracle
against the same sf dir in DuckDB, and compares: row count, column names,
and exact values (columns sorted by name, rows sorted by all columns).
Usage: compare_oracle.py <sfDir> <verifyOut>
"""
import json, sys
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sfdir, vout = sys.argv[1], sys.argv[2]
# optional: --skip q35_jaccard_pairs,q88_dup_clusters — for cross-sf runs
# where the O(n^2) DuckDB oracles (pair joins / recursive CTEs) are
# impractical; the driver's gate runs at sf0.01 where they are seconds
skip = set()
if len(sys.argv) > 4 and sys.argv[3] == "--skip":
    skip = set(sys.argv[4].split(","))
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{vout}/oracle_sql.json"))
for name in sorted(skip & oracle.keys()):
    print(f"SKIP {name} (--skip)")
    del oracle[name]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # stringify for robust sorting/compare (mimics a value-hash compare)
    s = df.astype(str)
    order = s.sort_values(by=list(s.columns)).index
    return s.loc[order].reset_index(drop=True)

fails = []
for name, sql in sorted(oracle.items()):
    try:
        got = pq.read_table(f"{vout}/{name}").to_pandas()
        exp = con.execute(sql).df()
    except Exception as e:
        fails.append(name); print(f"FAIL {name}: {e}"); continue
    if sorted(got.columns) != sorted(exp.columns):
        fails.append(name)
        print(f"FAIL {name}: columns spark={sorted(got.columns)} duck={sorted(exp.columns)}")
        continue
    if len(got) != len(exp):
        fails.append(name)
        print(f"FAIL {name}: rows spark={len(got)} duck={len(exp)}")
        continue
    g, e = canon(got), canon(exp)
    if not g.equals(e):
        fails.append(name)
        diff = (g != e).any(axis=1)
        print(f"FAIL {name}: {int(diff.sum())}/{len(g)} rows differ; first diffs:")
        bad = diff[diff].index[:3]
        for i in bad:
            print(f"  spark: {g.loc[i].to_dict()}")
            print(f"  duck : {e.loc[i].to_dict()}")
    else:
        print(f"OK   {name} ({len(got)} rows)")

nochk = [d for d in sorted(__import__('os').listdir(vout))
         if d.startswith('q') and d not in oracle]
print(f"\n{len(oracle) - len(fails)}/{len(oracle)} oracle-checked OK; no-oracle (rows-only): {nochk}")
sys.exit(1 if fails else 0)

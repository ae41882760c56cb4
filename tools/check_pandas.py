#!/usr/bin/env python3
"""Stricter mirror of the driver's compare: pandas-based, dtype-sensitive.

The driver loads both result sets into pandas, sorts columns by name, sorts
rows by ALL columns (this throws on array cells), then hashes values. A
DuckDB HUGEINT (e.g. sum(int)) arrives as float64/object while Spark's
bigint arrives as int64 -> value reprs differ -> hash mismatch even when
tuple compare passes. This script replicates those failure modes.

Usage: python3 tools/check_pandas.py [sfDir] [outDir]
"""
import glob, json, sys
import duckdb
import pandas as pd

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SFDIR}/{t}.parquet')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def canon(df):
    df = df.rename(columns=str.lower)
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns))  # throws on ndarray cells
    cells = []
    for row in df.itertuples(index=False):
        cells.append(tuple(round(v, 6) if isinstance(v, float) else v for v in row))
    return list(df.columns), cells

npass = nfail = 0
for name, sql in sorted(oracle.items()):
    try:
        files = glob.glob(f"{OUT}/{name}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        gcols, grows = canon(got)
        wcols, wrows = canon(con.sql(sql).df())
    except Exception as e:
        print(f"FAIL {name}: error {type(e).__name__}: {e}")
        nfail += 1
        continue
    if gcols != wcols:
        print(f"FAIL {name}: columns {gcols} vs {wcols}")
        nfail += 1
    elif len(grows) != len(wrows):
        print(f"FAIL {name}: rowcount {len(grows)} vs {len(wrows)}")
        nfail += 1
    else:
        bad = [(g, w) for g, w in zip(grows, wrows)
               if repr(g) != repr(w)]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(grows)} value-reprs differ; "
                  f"first: spark={bad[0][0]} duck={bad[0][1]}")
            nfail += 1
        else:
            npass += 1

print(f"\n{npass} passed, {nfail} failed, {len(oracle)} total")
sys.exit(1 if nfail else 0)

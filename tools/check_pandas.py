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
        # round BEFORE keying so near-equal floats can't sort differently
        # between engines; normalize -0.0 so the zero's sign can't either
        cells.append(tuple(round(v, 6) + 0.0 if isinstance(v, float) else v
                           for v in row))
    cells.sort(key=lambda t: tuple(str(x) for x in t))
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
        import math
        def cell_eq(a, b):
            # dtype-sensitive on purpose (the driver hash includes reprs of
            # int64-vs-float64 etc.), but float VALUES compare with a
            # tolerance so a last-ulp difference under round(6) can't fail
            if type(a) is not type(b):
                return False
            if isinstance(a, float):
                return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
            return repr(a) == repr(b)
        bad = [(g, w) for g, w in zip(grows, wrows)
               if len(g) != len(w) or not all(cell_eq(x, y) for x, y in zip(g, w))]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(grows)} rows differ; "
                  f"first: spark={bad[0][0]} duck={bad[0][1]}")
            nfail += 1
        else:
            npass += 1

print(f"\n{npass} passed, {nfail} failed, {len(oracle)} total")
sys.exit(1 if nfail else 0)

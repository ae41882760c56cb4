#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir]
  1. expects graft.Verify to have been run:  sbt "runMain graft.Verify <sfDir> <outDir>"
  2. loads outDir/oracle_sql.json, runs each SQL in DuckDB over the same
     parquet tables, and compares with the Spark parquet dump:
     columns sorted by name, rows sorted by all columns, exact value match
     (floats compared to 1e-9 after both sides' own round()).
"""
import json, math, os, sys
import duckdb

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SFDIR}/{t}.parquet')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
            if isinstance(v, list):
                v = tuple(round(x, 6) if isinstance(x, float) else x for x in v)
            rr.append(v)
        out.append(tuple(rr))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out

def close(a, b):
    if isinstance(a, float) and isinstance(b, (int, float)):
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(close(x, y) for x, y in zip(a, b))
    return a == b

npass = nfail = nskip = 0
for name, sql in sorted(oracle.items()):
    # a filtered Verify run (3rd arg) dumps a subset; absent dirs are
    # "not requested", not failures
    if not os.path.isdir(f"{OUT}/{name}"):
        nskip += 1
        continue
    try:
        got = con.sql(f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')")
        gcols, grows = norm(got.fetchall(), [c.lower() for c in got.columns])
        want = con.sql(sql)
        wcols, wrows = norm(want.fetchall(), [c.lower() for c in want.columns])
    except Exception as e:
        print(f"FAIL {name}: error {e}")
        nfail += 1
        continue
    if gcols != wcols:
        print(f"FAIL {name}: columns {gcols} vs {wcols}")
        nfail += 1
        continue
    if len(grows) != len(wrows):
        print(f"FAIL {name}: rowcount {len(grows)} vs {len(wrows)}")
        nfail += 1
        continue
    bad = [(g, w) for g, w in zip(grows, wrows) if not close(g, w)]
    if bad:
        print(f"FAIL {name}: {len(bad)}/{len(grows)} rows differ; first: spark={bad[0][0]} duck={bad[0][1]}")
        nfail += 1
    else:
        print(f"PASS {name} ({len(grows)} rows)")
        npass += 1

skipped = f", {nskip} not dumped" if nskip else ""
print(f"\n{npass} passed, {nfail} failed, {len(oracle)} total{skipped}")
sys.exit(1 if nfail else 0)

#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: load each Verify output
parquet, run the matching oracle SQL in DuckDB over the same testdata
tables, and compare (schema, rowcount, value hash) with columns sorted by
name and rows sorted by all columns. Usage:
  python3 tools/selfcheck.py [sfDir] [outDir]
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import sys, os, json, glob
import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

oracle = json.load(open(f"{OUT_DIR}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for compare: floats rounded at query level already
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

n_pass = n_fail = 0
for name in sorted(oracle):
    res_dir = f"{OUT_DIR}/{name}"
    files = glob.glob(f"{res_dir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); n_fail += 1; continue
    try:
        got = con.execute(f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").fetchdf()
        want = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: {e}"); n_fail += 1; continue
    g, w = canon(got), canon(want)
    if list(g.columns) != list(w.columns):
        print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}"); n_fail += 1; continue
    if len(g) != len(w):
        print(f"FAIL {name}: rows {len(g)} vs {len(w)}"); n_fail += 1; continue
    # value compare (string repr, like a hash would see)
    mism = None
    for c in g.columns:
        a, b = g[c].astype(str).values, w[c].astype(str).values
        bad = (a != b)
        if bad.any():
            i = bad.argmax()
            mism = (c, i, a[i], b[i]); break
    if mism:
        c, i, a, b = mism
        print(f"FAIL {name}: col {c} row {i}: spark={a!r} oracle={b!r}"); n_fail += 1
    else:
        print(f"PASS {name} ({len(g)} rows)"); n_pass += 1

# queries without oracle (rows-only)
spark_only = [os.path.basename(d) for d in glob.glob(f"{OUT_DIR}/*")
              if os.path.isdir(d) and os.path.basename(d) not in oracle]
for name in sorted(spark_only):
    n = con.execute(f"SELECT count(*) FROM read_parquet('{OUT_DIR}/{name}/*.parquet')").fetchone()[0]
    print(f"ROWS-ONLY {name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")

print(f"\n{n_pass} pass, {n_fail} fail, {len(spark_only)} rows-only")

# Bench gate: a round must not close with a failing benchcheck (r8
# shipped with etl_pit_lookup 4x over pin because nothing asserted the
# gate before the end-of-round commits). Checked against the freshest
# bench artifact; absent artifacts only warn (correctness runs happen
# on hosts without a bench).
bench = "tools/bench_last.json"
if os.path.exists(bench):
    import subprocess
    rc = subprocess.run([sys.executable, "tools/benchcheck.py", bench],
                        capture_output=True, text=True)
    tail = rc.stdout.strip().splitlines()[-3:]
    print("\nbenchcheck(tools/bench_last.json): " +
          ("OK" if rc.returncode == 0 else "FAILING") + " — " + " | ".join(tail))
    if rc.returncode != 0:
        n_fail += 1
else:
    print("\n(no tools/bench_last.json — benchcheck gate skipped)")

sys.exit(1 if n_fail else 0)

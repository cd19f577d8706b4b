#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
Loads each <out>/<name> parquet (Spark result), runs oracle_sql.json's
SQL in DuckDB over the sfDir parquet tables, and compares row count,
schema (column names), and a value hash (columns sorted by name, rows
sorted, floats rounded to 6dp before hashing).

Each oracle query runs in its OWN SUBPROCESS: one long-lived process
(even with a fresh duckdb connection per query) accumulates native
allocator state across 100+ giant-CTE oracles until later queries OOM
— and, before that, a shared CONNECTION was caught returning subtly
WRONG aggregates under memory pressure (q29 off by one session).
Process isolation makes every comparison independent and trustworthy;
the ~1 s/query fork overhead is noise next to the heavy oracles.
"""
import sys, os, json, glob, hashlib, subprocess

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("int64")
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    body = df.to_csv(index=False, float_format="%.6f")
    return hashlib.md5(body.encode()).hexdigest()

def check_one(sf_dir, out_dir, name):
    """Run a single oracle compare (called inside the per-query
    subprocess). Prints the PASS/FAIL line; exits 0 on pass."""
    import duckdb
    import pyarrow.parquet as pq
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    sql = oracle[name]
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark output"); return 1
    # read EVERY part file — a query repartitioned to >1 output file
    # must not silently compare a subset of its rows
    import pyarrow as pa
    got = pa.concat_tables([pq.read_table(f) for f in files]).to_pandas()
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: duckdb error {e}"); return 1
    ok_rows = len(got) == len(exp)
    ok_cols = sorted(got.columns) == sorted(exp.columns)
    ok_hash = ok_rows and ok_cols and canon(got) == canon(exp)
    if ok_rows and ok_cols and ok_hash:
        print(f"PASS {name} ({len(got)} rows)"); return 0
    print(f"FAIL {name}: rows {len(got)}vs{len(exp)} cols_ok={ok_cols} hash_ok={ok_hash}")
    if ok_cols and not ok_hash and len(got) == len(exp):
        m = got[sorted(got.columns)].reset_index(drop=True).compare(
            exp[sorted(exp.columns)].reset_index(drop=True))
        if len(m): print(m.head(5))
    elif not ok_cols:
        print("  spark cols:", list(got.columns))
        print("  duck  cols:", list(exp.columns))
    return 1

def main(sf_dir, out_dir):
    import pyarrow.parquet as pq
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), sf_dir, out_dir,
             "--one", name],
            capture_output=True, text=True)
        sys.stdout.write(r.stdout)
        if r.stderr.strip():
            sys.stdout.write(f"  [stderr {name}] {r.stderr.strip()[:300]}\n")
        if r.returncode == 0:
            n_pass += 1
        else:
            if not r.stdout.strip():
                print(f"FAIL {name}: subprocess died rc={r.returncode}")
            n_fail += 1
    # rows-only queries (in output but not oracle)
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name in oracle: continue
        files = glob.glob(f"{d}/*.parquet")
        n = pq.read_table(files[0]).num_rows if files else 0
        print(f"{'ROWS' if n > 0 else 'FAIL'} {name} ({n} rows)")
        if n == 0: n_fail += 1
    print(f"== {n_pass} oracle-pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    if len(sys.argv) >= 5 and sys.argv[3] == "--one":
        sys.exit(check_one(sys.argv[1], sys.argv[2], sys.argv[4]))
    sys.exit(main(sys.argv[1], sys.argv[2]))

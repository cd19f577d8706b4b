#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
Loads each <out>/<name> parquet (Spark result), runs oracle_sql.json's
SQL in DuckDB over the sfDir parquet tables, and compares row count,
schema (column names), and a value hash (columns sorted by name, rows
sorted, floats rounded to 6dp before hashing).
"""
import sys, os, json, glob, hashlib
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("int64")
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    body = df.to_csv(index=False, float_format="%.6f")
    return hashlib.md5(body.encode()).hexdigest()

def fresh_con(sf_dir):
    con = duckdb.connect()
    # bound each connection's arena: successive giant-CTE oracles in one
    # process otherwise accumulate allocator pressure until a later
    # (innocent) query OOMs
    con.execute("SET memory_limit='24GB'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con

def main(sf_dir, out_dir):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        # one FRESH connection per query: a single long-lived connection
        # across 100+ multi-hundred-CTE oracles was observed to both OOM
        # and (worse) return subtly WRONG aggregates under memory
        # pressure (q29 off by one session) -- isolation makes each
        # comparison trustworthy
        con = fresh_con(sf_dir)
        sql = oracle[name]
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = pq.read_table(files[0]).to_pandas()
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e}"); n_fail += 1; continue
        ok_rows = len(got) == len(exp)
        ok_cols = sorted(got.columns) == sorted(exp.columns)
        ok_hash = ok_rows and ok_cols and canon(got) == canon(exp)
        if ok_rows and ok_cols and ok_hash:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        else:
            print(f"FAIL {name}: rows {len(got)}vs{len(exp)} cols_ok={ok_cols} hash_ok={ok_hash}")
            if ok_cols and not ok_hash:
                m = got[sorted(got.columns)].reset_index(drop=True).compare(
                    exp[sorted(exp.columns)].reset_index(drop=True)) if len(got)==len(exp) else None
                if m is not None and len(m): print(m.head(5))
            else:
                print("  spark cols:", list(got.columns)); print("  duck  cols:", list(exp.columns))
            n_fail += 1
        con.close()
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
    sys.exit(main(sys.argv[1], sys.argv[2]))

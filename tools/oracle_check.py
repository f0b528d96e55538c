#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare (builder-side feedback
loop only; the driver runs its own). Usage:

    python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/verify_out

For each <name> subdir of verify_out (written by graft.Verify) with an entry
in oracle_sql.json: run the SQL in DuckDB over views of the sf tables, load
the Spark parquet, sort columns by name, compare row-by-row.
"""
import sys, os, json, glob
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"MISS  {name}: no spark parquet"); n_fail += 1; continue
        spark_df = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if name not in oracle:
            print(f"ROWS  {name}: no oracle, rows={len(spark_df)}")
            continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}"); n_fail += 1; continue
        s = spark_df[sorted(spark_df.columns)]
        d = duck_df[sorted(duck_df.columns)]
        if list(s.columns) != list(d.columns):
            print(f"FAIL  {name}: columns {list(s.columns)} vs {list(d.columns)}")
            n_fail += 1; continue
        if len(s) != len(d):
            print(f"FAIL  {name}: rows {len(s)} vs {len(d)}"); n_fail += 1; continue
        dt = [(c, s[c].dtype, d[c].dtype) for c in s.columns
              if s[c].dtype != d[c].dtype]
        if dt:
            print(f"WARN  {name}: dtype drift {dt}")
        bad = None
        for c in s.columns:
            a, b = s[c], d[c]
            try:
                import pandas as pd
                eq = (a.isna() & b.isna()) | (a == b)
                # exact match incl. dtype-compatible compare
                if not bool(eq.all()):
                    idx = (~eq).idxmax()
                    bad = (c, a[idx], b[idx], idx); break
            except Exception as e:
                bad = (c, "<cmp error>", str(e), -1); break
        if bad:
            c, av, bv, i = bad
            print(f"FAIL  {name}: col {c} row {i}: spark={av!r} duck={bv!r}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(s)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(names)} total")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

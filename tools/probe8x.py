#!/usr/bin/env python3
"""Build an N-fold copy of an sf dir with per-copy key offsets (builder-side
scale probe; PERF.md methodology). Fact/dim keys are offset so FK integrity
holds within each copy; nation/region stay single (broadcast dims don't
scale with data). documents/embeddings keep their text/vectors, so the
dedup operators see the pathological every-row-duplicated corpus — the
worst case for candidate growth, kept identical to the round-1 probe for
comparability.

Usage: python3 tools/probe8x.py /root/testdata/sf0.1 /tmp/graft_8x 8
"""
import sys
import duckdb

OFF = {
    "lineitem":  {"l_orderkey": 10**9, "l_partkey": 10**8, "l_suppkey": 10**7},
    "orders":    {"o_orderkey": 10**9, "o_custkey": 10**8},
    "customer":  {"c_custkey": 10**8},
    "supplier":  {"s_suppkey": 10**7},
    "part":      {"p_partkey": 10**8},
    "events":    {"event_id": 10**9, "user_id": 10**8},
    "documents": {"doc_id": 10**7},
    "embeddings": {"vec_id": 10**6},
}
SINGLE = ["nation", "region"]

def main(src, dst, n):
    import os
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in SINGLE:
        con.execute(f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
    for t, offs in OFF.items():
        cols = [c[0] for c in con.execute(
            f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()]
        # note: DuckDB re-materializes the NANOS event timestamps at µs;
        # Registry.events handles both encodings, so the copy is fine as-is
        selects = []
        for i in range(n):
            exprs = ", ".join(
                f"{c} + {i * offs[c]} AS {c}" if c in offs else c for c in cols)
            selects.append(f"SELECT {exprs} FROM '{src}/{t}.parquet'")
        union = " UNION ALL ".join(selects)
        con.execute(f"COPY ({union}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        print(t, con.execute(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0])

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))

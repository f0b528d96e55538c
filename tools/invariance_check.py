#!/usr/bin/env python3
"""Partition-invariance check (builder-side; PERF.md methodology): compare
two `graft.Verify` output dirs produced under DIFFERENT shuffle-partition
counts. Every query's parquet must be row-identical (the registered
queries fully ORDER BY their output, so even row order must agree).

    SPARK_GRAFT_CPUS=4 sbt "runMain graft.Verify <sf> /tmp/inv4"
    SPARK_GRAFT_CPUS=8 sbt "runMain graft.Verify <sf> /tmp/inv8"
    python3 tools/invariance_check.py /tmp/inv4 /tmp/inv8
"""
import sys, os, glob
import duckdb

def main(a_dir, b_dir):
    con = duckdb.connect()
    # union of BOTH dirs: a query present on only one side (e.g. one run
    # errored and skipped its write) must surface as MISS, not vanish
    names = sorted({d for src in (a_dir, b_dir) for d in os.listdir(src)
                    if os.path.isdir(os.path.join(src, d))})
    same = diff = 0
    for name in names:
        ga = glob.glob(os.path.join(a_dir, name, "*.parquet"))
        gb = glob.glob(os.path.join(b_dir, name, "*.parquet"))
        if not ga or not gb:
            print(f"MISS  {name}"); diff += 1; continue
        # file_row_number makes the compare ORDER-SENSITIVE: the registered
        # queries fully ORDER BY their output, so row N must match row N —
        # a multiset-only diff would miss a lost final sort
        q = ("SELECT * FROM read_parquet(?, file_row_number=true) EXCEPT ALL "
             "SELECT * FROM read_parquet(?, file_row_number=true)")
        n = con.execute(
            f"SELECT count(*) FROM (({q}) UNION ALL ({q}))",
            [ga, gb, gb, ga]).fetchone()[0]
        if n == 0:
            same += 1
        else:
            diff += 1
            print(f"DIFF  {name}: {n} asymmetric rows")
    print(f"{same} identical / {diff} different of {len(names)}")
    return 1 if diff else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

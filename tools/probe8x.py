#!/usr/bin/env python3
"""Build an N-fold copy of an sf dir with per-copy key offsets (builder-side
scale probe; PERF.md methodology). Fact/dim keys are offset so FK integrity
holds within each copy; nation/region stay single (broadcast dims don't
scale with data). documents/embeddings keep their text/vectors, so the
dedup operators see the pathological every-row-duplicated corpus — the
worst case for candidate growth, kept identical to the round-1 probe for
comparability.

`distinct` mode (judge directive r13 #4): copy i > 0 rewrites every
document token with a `_c{i}` suffix, so copies share NO shingles — the
corpus grows 8× in DISTINCT documents while the within-copy duplication
rate (the planted-dup rate, keyed on doc_id mod 20/25 with offsets that
are multiples of both) stays constant. This is the leg that separates
"the LSH screens grow quadratically because the probe corpus is
pathologically duplicated" from "the screens super-scale on any growth":
the dup leg's per-bucket pairs grow ×64 by construction, the distinct
leg's should grow ~linearly. Embeddings are NOT re-synthesized (a
perturbed copy of a vector is still its semantic near-dup — making
vectors genuinely distinct would change the geometry, not just the
multiplicity), so the distinct leg speaks for the LEXICAL screens;
semantic families keep the dup-leg reading.

Usage: python3 tools/probe8x.py /root/testdata/sf0.1 /tmp/graft_8x 8 [distinct]
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

def main(src, dst, n, distinct=False):
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
            def expr(c):
                if c in offs:
                    return f"{c} + {i * offs[c]} AS {c}"
                if distinct and t == "documents" and c == "text" and i > 0:
                    # per-copy token suffix: copy i shares no shingles
                    # with any other copy; WHITESPACE token count is
                    # unchanged, but bpeTokenCount splits 'w1_c3' into ~5
                    # sub-tokens vs 2, so BPE-token-sensitive queries
                    # (corpus_build packing, BM25 dl/avgdl) see ~2-3x
                    # longer docs on this leg — their distinct-leg ratios
                    # are NOT comparable against the dup leg's
                    return f"regexp_replace(text, '(\\S+)', '\\1_c{i}', 'g') AS text"
                return c
            exprs = ", ".join(expr(c) for c in cols)
            selects.append(f"SELECT {exprs} FROM '{src}/{t}.parquet'")
        union = " UNION ALL ".join(selects)
        con.execute(f"COPY ({union}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        print(t, con.execute(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0])

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]),
         distinct=(len(sys.argv) > 4 and sys.argv[4] == "distinct"))

#!/usr/bin/env python3
"""Machine-generated registry index (judge directive r11 #7): one table row
per registered query — name, defining file:line, oracle?, latest 8x probe
ratio — derived from the SOURCE TREE (the `"name" -> Q(` definition sites),
the latest Verify dump's oracle_sql.json, and PERF.md's 8x probe tables.
COVERAGE.md stays the narrative; this file is the mechanical audit surface.

Usage:
    python3 tools/registry_index.py [verify_out_dir] [sweep_8x.json] [sweep_8x_distinct.json] [bench.json] [prior_bench.json] > REGISTRY_INDEX.md

Default verify_out_dir: /tmp/verify_out (written by `sbt "runMain
graft.Verify /root/testdata/sf0.01 /tmp/verify_out"`).

sweep_8x.json (judge directive r12 #5) is a full-registry Bench artifact
run with SPARK_GRAFT_SF_DIR=<8x copy> and SPARK_GRAFT_SF_DIR2=sf0.1: its
per-query ratio queries[q]/queries_sf2[q] fills the 8x column for EVERY
swept query; PERF.md's curated min-of-2 probe tables override where
present (they are the better estimator for the queries they cover).

sweep_8x_distinct.json (judge directive r13 #4) is the same two-leg
artifact over the DISTINCT-docs 8x copy (tools/probe8x.py ... distinct):
its ratio fills the `8x distinct` column, separating duplication-driven
quadratic candidate growth from genuine super-scaling.

bench.json (judge directive r15 #4) is this round's full Bench artifact
(BENCH_FULL.json): its per-query min divided by host.calib_vs_file fills
the `norm s` column — host-calibration-normalized seconds, the per-query
twin of the artifact's total_calib_norm. prior_bench.json is the PRIOR
round's committed artifact: every query whose normalized seconds moved
>1.5x in either direction is listed in a movers section at the bottom,
ready for one-line adjudication in PERF.md's round close.
"""
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def definition_sites():
    """name -> file:line for every `"name" -> Q(` in the query sources."""
    sites = {}
    for path in sorted(glob.glob(os.path.join(REPO, "src/main/scala/graft/queries/*.scala"))):
        rel = os.path.relpath(path, REPO)
        for i, line in enumerate(open(path), 1):
            m = re.match(r'\s*"([a-z0-9_]+)"\s*->\s*Q\(', line)
            if m:
                name = m.group(1)
                if name in sites:
                    print(f"DUPLICATE definition of {name}: {sites[name]} and {rel}:{i}",
                          file=sys.stderr)
                sites[name] = f"{rel}:{i}"
    return sites


def latest_ratios():
    """query -> latest 8x ratio from PERF.md's probe tables (header rows
    that contain a `ratio` column; later tables override earlier ones)."""
    ratios = {}
    ratio_idx = None
    for line in open(os.path.join(REPO, "PERF.md")):
        if not line.startswith("|"):
            # any non-table line ends the table — a stale column index
            # must never leak into the NEXT table's rows
            ratio_idx = None
            continue
        cells = [c.strip() for c in line.strip().strip("|").split("|")]
        # header detection is EXACT-cell ("ratio"), not substring: a data
        # row with "ratio" in a notes cell must not re-anchor the column
        if "ratio" in (c.lower() for c in cells):
            ratio_idx = next(i for i, c in enumerate(cells) if c.lower() == "ratio")
            continue
        if ratio_idx is None or len(cells) <= ratio_idx or set(cells[0]) <= {"-", " "}:
            continue
        m = re.match(r"[×x]?\s*([0-9]+(?:\.[0-9]+)?)", cells[ratio_idx])
        if m and re.fullmatch(r"[a-z0-9_]+", cells[0]):
            ratios[cells[0]] = float(m.group(1))
    return ratios


def sweep_ratios(path):
    """query -> 8x/1x ratio from a two-leg Bench sweep artifact."""
    if not path or not os.path.exists(path):
        return {}
    art = json.load(open(path))
    big, small = art.get("queries", {}), art.get("queries_sf2", {})
    bad = set(art.get("errors", [])) | set(art.get("errors_sf2", []))
    return {q: big[q] / small[q] for q in big
            if q in small and q not in bad and small[q] > 0}


def bench_norms(path):
    """query -> host-calibration-normalized seconds (min ÷ calib_vs_file)
    from a full Bench artifact; {} when the calibration is unusable (the
    -1 sentinel must never fabricate normalized numbers)."""
    if not path or not os.path.exists(path):
        return {}
    art = json.load(open(path))
    calib = art.get("host", {}).get("calib_vs_file", -1.0)
    if calib <= 0:
        return {}
    bad = set(art.get("errors", []))
    return {q: t / calib for q, t in art.get("queries", {}).items() if q not in bad}


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
    sweep_path = sys.argv[2] if len(sys.argv) > 2 else None
    sweep_d_path = sys.argv[3] if len(sys.argv) > 3 else None
    bench_path = sys.argv[4] if len(sys.argv) > 4 else None
    prior_bench_path = sys.argv[5] if len(sys.argv) > 5 else None
    oracle_path = os.path.join(out_dir, "oracle_sql.json")
    oracles = set(json.load(open(oracle_path))) if os.path.exists(oracle_path) else set()
    sites = definition_sites()
    ratios = sweep_ratios(sweep_path)
    ratios.update(latest_ratios())
    ratios_d = sweep_ratios(sweep_d_path)
    norms = bench_norms(bench_path)
    prior_norms = bench_norms(prior_bench_path)
    gated = {"q2_min_cost_supplier", "q11_important_stock", "q20_potential_promotion"}
    print("# REGISTRY_INDEX — machine-generated per-query audit table")
    print()
    print("Regenerate with: `python3 tools/registry_index.py /tmp/verify_out <sweep_8x.json> <sweep_8x_distinct.json> <bench.json> <prior_bench.json> > REGISTRY_INDEX.md`")
    print("(after a fresh `sbt \"runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out\"`).")
    print("`oracle` = DuckDB hash-compare SQL registered; `8x` = 8x-data/1x-data seconds")
    print("from the full-registry sweep artifact, overridden by PERF.md's curated")
    print("min-of-2 probe tables where present (blank = not yet swept).")
    print("`8x distinct` = the same ratio on the DISTINCT-docs 8x copy (every copy's")
    print("tokens suffixed, duplication rate held constant) — near-linear here plus")
    print("super-linear on the dup leg = banding caps absorbing duplication, not a")
    print("screen regression. Caveat: the distinct leg's token suffixes preserve")
    print("WHITESPACE token counts but inflate BPE token counts ~2-3x (tools/")
    print("probe8x.py), so BPE-token-sensitive queries (corpus_build packing,")
    print("BM25 dl/avgdl consumers) are not leg-comparable on that column.")
    print()
    print(f"{len(sites)} definition sites, {len(oracles)} oracles in {oracle_path}.")
    print("`norm s` = this round's bench min ÷ host calib_vs_file (per-query")
    print("calibration-normalized seconds, judge directive r15 #4).")
    print()
    print("| query | defined at | oracle | latest 8x ratio | 8x distinct | norm s |")
    print("|---|---|---|---|---|---|")
    for name in sorted(sites):
        if name in gated and name not in oracles:
            oracle = "gated (partsupp)"
        else:
            oracle = "yes" if name in oracles else "rows-only"
        r = f"{ratios[name]:.2f}" if name in ratios else ""
        rd = f"{ratios_d[name]:.2f}" if name in ratios_d else ""
        nm = f"{norms[name]:.3f}" if name in norms else ""
        print(f"| {name} | {sites[name]} | {oracle} | {r} | {rd} | {nm} |")
    if norms and prior_norms:
        movers = []
        for q in sorted(set(norms) & set(prior_norms)):
            prev, cur = prior_norms[q], norms[q]
            if prev > 0 and (cur > 1.5 * prev or prev > 1.5 * cur):
                movers.append((q, prev, cur))
        print()
        print("## Normalized movers vs prior round (>1.5x either way)")
        print()
        if movers:
            print("Each needs one line of adjudication in PERF.md's round close.")
            print()
            print("| query | prior norm s | this norm s | ratio |")
            print("|---|---|---|---|")
            for q, prev, cur in sorted(movers, key=lambda m: -m[2] / m[1]):
                print(f"| {q} | {prev:.3f} | {cur:.3f} | ×{cur / prev:.2f} |")
        else:
            print("None — every shared query within ×1.5 normalized of last round.")
    missing = oracles - set(sites)
    if missing:
        print()
        print(f"WARNING: oracle entries without a grep-able `-> Q(` site: {sorted(missing)}")


if __name__ == "__main__":
    main()

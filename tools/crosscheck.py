#!/usr/bin/env python3
"""Cross-partitioning determinism check: compare two graft.Verify dumps
(e.g. SPARK_GRAFT_CPUS=4 vs 7) query by query — sorted columns, row-by-row
canonical values, same recipe as check.py. Covers EVERY declared query,
including the oracle-exempt ones the DuckDB gate can't see.

Usage: python3 tools/crosscheck.py <dumpA> <dumpB> [query ...]
"""
import sys, json, glob, math

import duckdb


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0.0:
            v = 0.0
        return f"{v!r}"
    return str(v)


def main():
    a, b = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])

    def dump_names(d):
        names = {g.split("/")[-1] for g in glob.glob(f"{d}/*")
                 if "." not in g.split("/")[-1]}
        try:
            names |= json.load(open(f"{d}/oracle_sql.json")).keys()
        except Exception:
            pass
        return names

    # union of BOTH dumps: a query present in only one must surface as a
    # SKIP (counted, and fatal below), never silently vanish
    names = sorted(dump_names(a) | dump_names(b))
    n_pass = n_fail = n_skip = n_warn = 0
    for name in names:
        if only and name not in only:
            continue
        fa = glob.glob(f"{a}/{name}/*.parquet")
        fb = glob.glob(f"{b}/{name}/*.parquet")
        if not fa and not fb:
            # declared (oracle_sql.json) but dumped by NEITHER side — a
            # partial run over a query subset, not an asymmetry between
            # the two partitionings. Warn, don't fail: both engines were
            # given the same work and produced the same (empty) coverage.
            print(f"WARN {name}: absent from both dumps (partial run?)",
                  flush=True)
            n_warn += 1
            continue
        if not fa or not fb:
            print(f"SKIP {name}: missing dump ({len(fa)}/{len(fb)})", flush=True)
            n_skip += 1
            continue
        ta = duckdb.read_parquet(fa).fetch_arrow_table()
        tb = duckdb.read_parquet(fb).fetch_arrow_table()
        ca, cb = sorted(ta.column_names), sorted(tb.column_names)
        if ca != cb:
            print(f"FAIL {name}: columns {ca} != {cb}", flush=True)
            n_fail += 1
            continue
        ra = sorted([tuple(canon(r[c]) for c in ca) for r in ta.to_pylist()])
        rb = sorted([tuple(canon(r[c]) for c in cb) for r in tb.to_pylist()])
        if ra != rb:
            bad = sum(1 for x, y in zip(ra, rb) if x != y) + abs(len(ra) - len(rb))
            print(f"FAIL {name}: {bad} row diffs ({len(ra)} vs {len(rb)} rows)", flush=True)
            n_fail += 1
        else:
            print(f"PASS {name} ({len(ra)} rows)", flush=True)
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} skip, {n_warn} warn ==")
    # zero comparisons (wrong paths, disjoint dumps) must read as FAILURE,
    # and so must any ASYMMETRIC skip: a query present in only one dump is
    # a query that crashed or was dropped under one partitioning — exactly
    # the determinism failure this gate exists to catch. A name absent
    # from BOTH dumps (n_warn) is a partial run, not a divergence.
    sys.exit(1 if (n_fail or n_skip or n_pass == 0) else 0)


if __name__ == "__main__":
    main()

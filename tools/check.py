#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB over views of
the parquet tables in <sfDir>, reads the Spark result parquet from
<verifyOutDir>/<name>/, sorts columns by name, and compares values row by row.
"""
import sys, json, glob, math, os, threading

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0.0:
            v = 0.0  # normalize -0.0
        return f"{v!r}"
    return str(v)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    # GRAFT_ORACLE_TIMEOUT=<seconds>: per-query DuckDB budget. At sf0.1 the
    # recursive-closure oracles (d6/d9/d17/p24 transitive reach over ~1.8M
    # near-dup edges) are intractable in DuckDB; those queries are verified
    # instead by tools/iteroracle.py's label-propagation oracle. Unset = no
    # budget (driver-compatible). Only the queries named in
    # GRAFT_ORACLE_TIMEOUT_OK (comma-separated) may time out without
    # failing the gate — an UNEXPECTED timeout is a FAIL, so an oracle
    # regression can never silently demote a query from verified to
    # unverified.
    budget = float(os.environ.get("GRAFT_ORACLE_TIMEOUT", "0") or "0")
    timeout_ok = {q for q in os.environ.get(
        "GRAFT_ORACLE_TIMEOUT_OK", "").split(",") if q}
    n_pass = n_fail = n_timeout = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        timer = None
        timed_out = [False]
        if budget > 0:
            def fire():
                timed_out[0] = True
                con.interrupt()
            timer = threading.Timer(budget, fire)
            timer.start()
        try:
            exp = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            if timer:
                timer.cancel()
                # drain UNCONDITIONALLY (mirror of the success path): a
                # genuine SQL error can race the timer firing — the
                # timed_out check may read False an instant before fire()
                # sets it, yet the interrupt still lands on `con` after
                # cancel() fails to stop the in-flight callback. A stale
                # pending interrupt would abort the NEXT oracle and
                # misreport it as a FAIL.
                try:
                    con.execute("SELECT 1").fetchall()
                except Exception:
                    pass
            # only a genuine interrupt counts as a timeout — a SQL error
            # that merely RACES the timer firing (timed_out set, but the
            # interrupt never landed because the query had already failed)
            # must still report as a FAIL with its real error
            interrupted = isinstance(e, duckdb.InterruptException) or \
                "INTERRUPT" in str(type(e)).upper() or "interrupt" in str(e).lower()
            if timed_out[0] and interrupted:
                if name in timeout_ok:
                    print(f"TIMEOUT {name}: oracle exceeded {budget:.0f}s "
                          f"(allowlisted)", flush=True)
                    n_timeout += 1
                else:
                    print(f"FAIL {name}: oracle exceeded {budget:.0f}s "
                          f"(not in GRAFT_ORACLE_TIMEOUT_OK)", flush=True)
                    n_fail += 1
            else:
                print(f"FAIL {name}: oracle SQL error: {e}", flush=True)
                n_fail += 1
            continue
        if timer:
            timer.cancel()
            # the timer may have fired in the gap between query completion
            # and cancel(); absorb a stale pending interrupt on `con` so it
            # can't abort the NEXT oracle (misreported as a FAIL)
            try:
                con.execute("SELECT 1").fetchall()
            except Exception:
                pass
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = duckdb.read_parquet(files).fetch_arrow_table()
        ecols, gcols = sorted(exp.column_names), sorted(got.column_names)
        if ecols != gcols:
            print(f"FAIL {name}: columns {gcols} != oracle {ecols}")
            n_fail += 1
            continue
        erows = [[canon(r[c]) for c in ecols] for r in exp.to_pylist()]
        grows = [[canon(r[c]) for c in gcols] for r in got.to_pylist()]
        if len(erows) != len(grows):
            print(f"FAIL {name}: rows {len(grows)} != oracle {len(erows)}")
            n_fail += 1
            continue
        bad = [(i, e, g) for i, (e, g) in enumerate(zip(erows, grows)) if e != g]
        if bad:
            i, e, g = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(erows)} rows differ; first at {i}:")
            print(f"  cols   {ecols}")
            print(f"  oracle {e}")
            print(f"  spark  {g}")
            n_fail += 1
        else:
            # schema note (types) for awareness, not a failure
            et = [str(exp.schema.field(c).type) for c in ecols]
            gt = [str(got.schema.field(c).type) for c in ecols]
            note = "" if et == gt else f"  [type note: oracle {et} vs spark {gt}]"
            print(f"PASS {name} ({len(erows)} rows){note}")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_timeout} oracle-timeout ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

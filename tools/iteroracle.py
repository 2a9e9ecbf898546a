#!/usr/bin/env python3
"""Iterative DuckDB oracle for the 4 recursive-closure queries
(d6_dedup_groups, d9_dedup_survivors, d17_table_delete_dedup,
p24_curation_funnel).

Their shipped oracles embed a recursive `reach` CTE (full transitive
closure of the near-dup edge set) that is intractable in DuckDB at sf0.1
(~1.8M edges, components to ~1.9k docs: closure is quadratic in component
size). This tool replaces ONLY the closure with bounded min-label
propagation — each round one plain DuckDB join, stop at fixpoint, rounds =
component diameter — which converges to exactly the same `comp` relation:
the fixpoint label of a node is the minimum doc_id reachable from it,
i.e. `LEAST(a, MIN(b) over reach)` per node. Every other CTE (tokens,
sizes, Jaccard pairs, quality rules, shingle hits) is copied verbatim from
the shipped oracle text, and the final SELECTs are identical.

Cross-validation: run this at sf0.01 too — there the recursive oracle is
tractable and check.py already hash-verifies the same Spark dumps, so a
PASS here proves the iterative closure equals the recursive one end-to-end.

Usage: python3 tools/iteroracle.py <sfDir> <verifyOutDir>
Compares against the Spark dumps in <verifyOutDir>/<query>/ exactly like
check.py (sorted columns, canonical values); exits nonzero on any FAIL.
"""
import sys, glob

import duckdb

from check import canon

TABLES = ["documents"]

# verbatim from the shipped oracle text (JsonDocs.scala / TextPipeline.scala)
PAIRS_CTES = """
toks AS (SELECT DISTINCT doc_id, lang, tok
         FROM (SELECT doc_id, lang, unnest(string_split(text,' ')) AS tok FROM documents) u
         WHERE tok <> ''),
sizes AS (SELECT doc_id, COUNT(*) AS c FROM toks GROUP BY doc_id),
inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
          FROM toks a JOIN toks b ON a.tok=b.tok AND a.lang=b.lang
                                  AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id),
pairs AS (SELECT d1, d2 FROM inter JOIN sizes s1 ON s1.doc_id=d1
          JOIN sizes s2 ON s2.doc_id=d2
          WHERE 5*i >= 3*(s1.c + s2.c - i))
"""

FINAL = {
    "d6_dedup_groups": """
        SELECT group_id, COUNT(*) AS n_docs FROM comp
        GROUP BY group_id ORDER BY group_id""",
    # d9 and d17 share one final SELECT in the shipped oracles
    "d9_dedup_survivors": """
        SELECT d.lang, COUNT(*) AS n_kept,
               CAST(SUM(s.c) AS BIGINT) AS kept_distinct_toks
        FROM documents d JOIN sizes s ON s.doc_id = d.doc_id
        WHERE d.doc_id NOT IN (SELECT doc_id FROM dropped)
        GROUP BY d.lang ORDER BY d.lang""",
    "p24_curation_funnel": """
        SELECT * FROM (
          SELECT '1_all' AS stage, COUNT(*) AS n_docs FROM f
          UNION ALL SELECT '2_lang', CAST(SUM(f1) AS BIGINT) FROM f
          UNION ALL SELECT '3_quality', CAST(SUM(f2) AS BIGINT) FROM f
          UNION ALL SELECT '4_dedup', CAST(SUM(f3) AS BIGINT) FROM f
          UNION ALL SELECT '5_decontam', CAST(SUM(f4) AS BIGINT) FROM f)
        ORDER BY stage""",
}
FINAL["d17_table_delete_dedup"] = FINAL["d9_dedup_survivors"]

# p24's non-closure CTEs, verbatim from the shipped oracle
P24_CTES = """
q AS (SELECT doc_id,
             len(list_filter(string_split(text,' '), x -> x <> '')) AS nt,
             len(list_distinct(list_filter(string_split(text,' '), x -> x <> ''))) AS nd,
             list_sum(list_transform(list_filter(string_split(text,' '), x -> x <> ''),
                                     w -> length(w))) AS chars
      FROM documents),
keepq AS (SELECT doc_id FROM q
          WHERE nt >= 30 AND 5*chars <= 24*nt AND 20*nd >= 7*nt),
stoks AS (SELECT doc_id, list_filter(string_split(text,' '), t -> t <> '') AS ts
          FROM documents),
sh AS (SELECT doc_id, unnest(list_transform(range(1, len(ts)-1),
               i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS shingle
       FROM stoks WHERE len(ts) >= 3),
bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0),
hits AS (SELECT s.doc_id, COUNT(DISTINCT s.shingle) AS n
         FROM sh s JOIN bench b ON s.shingle = b.shingle
         WHERE s.doc_id % 50 <> 0 GROUP BY s.doc_id),
f AS (SELECT d.doc_id,
        CASE WHEN d.lang <> 'zh' THEN 1 ELSE 0 END AS f1,
        CASE WHEN d.lang <> 'zh'
              AND d.doc_id IN (SELECT doc_id FROM keepq) THEN 1 ELSE 0 END AS f2,
        CASE WHEN d.lang <> 'zh'
              AND d.doc_id IN (SELECT doc_id FROM keepq)
              AND d.doc_id NOT IN (SELECT doc_id FROM dropped) THEN 1 ELSE 0 END AS f3,
        CASE WHEN d.lang <> 'zh'
              AND d.doc_id IN (SELECT doc_id FROM keepq)
              AND d.doc_id NOT IN (SELECT doc_id FROM dropped)
              AND d.doc_id % 50 <> 0
              AND COALESCE((SELECT n FROM hits h WHERE h.doc_id = d.doc_id), 0) < 3
             THEN 1 ELSE 0 END AS f4
      FROM documents d)
"""


def build_components(con):
    """pairs -> edges -> min-label propagation to fixpoint -> comp/dropped."""
    con.execute(f"CREATE OR REPLACE TABLE t_pairs AS WITH {PAIRS_CTES} "
                "SELECT d1, d2 FROM pairs")
    n_edges = con.execute("SELECT COUNT(*) FROM t_pairs").fetchone()[0]
    con.execute("""
        CREATE OR REPLACE TABLE t_edges AS
        SELECT d1 AS a, d2 AS b FROM t_pairs
        UNION SELECT d2, d1 FROM t_pairs""")
    # init: own id min'd with direct neighbors (round 0 of the propagation)
    con.execute("""
        CREATE OR REPLACE TABLE t_lab AS
        SELECT a AS doc_id, LEAST(a, MIN(b)) AS lbl
        FROM t_edges GROUP BY a""")
    rounds = 0
    while True:
        rounds += 1
        con.execute("""
            CREATE OR REPLACE TABLE t_lab2 AS
            SELECT n.doc_id, LEAST(n.lbl, COALESCE(MIN(l2.lbl), n.lbl)) AS lbl
            FROM t_lab n
            LEFT JOIN t_edges e ON e.a = n.doc_id
            LEFT JOIN t_lab l2 ON l2.doc_id = e.b
            GROUP BY n.doc_id, n.lbl""")
        changed = con.execute("""
            SELECT COUNT(*) FROM t_lab2 j JOIN t_lab l USING (doc_id)
            WHERE j.lbl <> l.lbl""").fetchone()[0]
        con.execute("DROP TABLE t_lab")
        con.execute("ALTER TABLE t_lab2 RENAME TO t_lab")
        if changed == 0:
            break
        if rounds > 10000:
            raise RuntimeError("label propagation failed to converge")
    con.execute("CREATE OR REPLACE TABLE comp AS "
                "SELECT doc_id, lbl AS group_id FROM t_lab")
    con.execute("CREATE OR REPLACE TABLE dropped AS "
                "SELECT doc_id FROM comp WHERE doc_id <> group_id")
    print(f"[iteroracle] {n_edges} near-dup edges, "
          f"fixpoint after {rounds} propagation rounds", flush=True)


def compare(con, name, sql, outdir):
    exp = con.execute(sql).fetch_arrow_table()
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        return False
    got = duckdb.read_parquet(files).fetch_arrow_table()
    ecols, gcols = sorted(exp.column_names), sorted(got.column_names)
    if ecols != gcols:
        print(f"FAIL {name}: columns {gcols} != oracle {ecols}")
        return False
    erows = [[canon(r[c]) for c in ecols] for r in exp.to_pylist()]
    grows = [[canon(r[c]) for c in gcols] for r in got.to_pylist()]
    if len(erows) != len(grows):
        # length first — zip() would truncate and report "0 row diffs" for
        # a matching common prefix, pointing the debugger the wrong way
        print(f"FAIL {name}: rows {len(grows)} != oracle {len(erows)}")
        return False
    if erows != grows:
        bad = [(i, e, g) for i, (e, g) in enumerate(zip(erows, grows)) if e != g]
        print(f"FAIL {name}: {len(bad)} row diffs of {len(erows)}")
        i, e, g = bad[0]
        print(f"  first at {i}: oracle {e} vs spark {g}")
        return False
    print(f"PASS {name} ({len(erows)} rows)", flush=True)
    return True


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sfdir}/{t}.parquet')")
    build_components(con)
    # sizes is needed by d9/d17's final SELECT
    con.execute(f"CREATE OR REPLACE TABLE sizes AS WITH {PAIRS_CTES} "
                "SELECT * FROM sizes")
    ok = True
    for name in ["d6_dedup_groups", "d9_dedup_survivors",
                 "d17_table_delete_dedup", "p24_curation_funnel"]:
        sql = FINAL[name]
        if name == "p24_curation_funnel":
            sql = f"WITH {P24_CTES} {sql}"
        ok = compare(con, name, sql, outdir) and ok
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

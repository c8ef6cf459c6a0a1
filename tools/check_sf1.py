#!/usr/bin/env python3
"""sf1-scale replica of the t2 gate for the keys whose ORACLE side outgrows
a naive DuckDB run at 6 M-row fact tables (dev tool only; the shipped
library is pure Scala). Two adaptations close the round-9 gap of 9
oracle-unverifiable keys — both change HOW the oracle is evaluated, never
WHAT it computes:

  1. Graph family: every graph oracle embeds the same 4-table
     edge-derivation CTE; a recursive walk over it makes DuckDB re-evaluate
     the 4-table join per reference (~20 s each at sf1, unbounded memory on
     the transitive closures). The shared `und`/`edges` relations are
     materialized ONCE as temp tables (same SQL text), and each oracle's
     embedded CTE definitions are stubbed out so the names resolve to the
     staged tables.

  2. Row-dump keys (fn_math, join_inner_shuffle — 1-6 M-row detail dumps):
     the pandas full-frame hash compare blows past the time budget; instead
     both sides are reduced IN DUCKDB to an order-independent multiset
     signature (count + sum/xor/min/max of the row hash) over identically
     CAST columns. Weaker than the row-ordered driver compare (multiset
     equality, not sequence equality) but exact on values — the keys keep
     their full row-compare verdicts at sf0.001/0.01/0.1.

Usage:
    sbt -batch "runMain graft.Verify /tmp/graft_sf1 /tmp/r11_sf1"   # keys...
    python3 tools/check_sf1.py /tmp/graft_sf1 /tmp/r11_sf1 [keys...]
"""
import sys, json, glob, time
import duckdb
import pyarrow.parquet as pq


def log(msg):
    print(msg, flush=True)

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# keys compared by multiset signature instead of full-frame hash
SIGNATURE_KEYS = {"fn_math", "join_inner_shuffle"}

# Why stage at the PAIRS level (the raw grouped 4-table join), not und/
# edges: DuckDB 1.0.0's optimizer hangs (>180 s, tens of GB RSS) whenever
# a DISTINCT or filter layer sits directly over the grouped 4-table join
# in one statement — bisected 2026-08-15: the aggregate alone runs 0.2 s
# (625 groups), CREATE TEMP of it 0.1 s, DISTINCT least/greatest from the
# materialized table 0.0 s (77 rows), but the FUSED statement was killed
# at 180 s (graph_reciprocity's filter+self-join spelling hangs the same
# way). Several graph oracles inline their own und/edges variants (`ed`/
# UNION ALL in modularity, weighted `wedges` in sssp, a de self-join in
# reciprocity), so stubbing the one shared `pairs` definition fixes every
# variant at once: everything downstream operates on 625 materialized
# rows, where even per-reference CTE re-evaluation is trivial.
EDGE_STAGE = [
    """CREATE TEMP TABLE pair_w AS
  SELECT CAST(c_nationkey AS BIGINT) AS a,
         CAST(s_nationkey AS BIGINT) AS b, count(*) AS w
  FROM customer
  JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  GROUP BY 1, 2""",
]


def stub_edge_cte(sql: str, key: str = "?") -> str:
    """Replace the embedded `pairs` CTE body (the grouped 4-table join —
    the expensive part AND the DuckDB-1.0.0 planner-hang trigger, see
    EDGE_STAGE) with a read of the staged `pair_w` temp table. Anchors on
    the CTE's opening text and its closing `GROUP BY 1, 2)`; oracles
    without an embedded `pairs` CTE (pagerank's directed edges,
    triangles' basket graph) run unmodified by design — cheap single
    evaluations. A `pairs` CTE whose rendering drifted past the anchors
    is reported loudly instead of running silently slow."""
    start = sql.find("pairs AS (")
    if start < 0:
        return sql  # no shared pair derivation embedded — nothing to stub
    end_marker = "GROUP BY 1, 2)"
    end = sql.find(end_marker, start)
    if end < 0:
        log(f"WARNING {key}: pairs-CTE stub anchors did not match "
            f"(oracle rendering drifted?) — oracle runs UNMODIFIED "
            f"and may hang DuckDB 1.0.0's planner")
        return sql
    return sql[:start] + "pairs AS (SELECT a, b, w FROM pair_w)" + \
        sql[end + len(end_marker):]


def signature(con, relation_sql: str, cols_types):
    """Order-independent multiset signature over identically-typed columns:
    (count, sum/xor/min/max of hash(cols...)). Both sides cast to the SAME
    types first — DuckDB's hash is type-sensitive (BIGINT vs HUGEINT of the
    same value hash differently)."""
    casted = ", ".join(f'CAST("{c}" AS {t}) AS "{c}"' for c, t in cols_types)
    hcols = ", ".join(f'"{c}"' for c, _ in cols_types)
    q = f"""SELECT count(*) AS n,
                   sum(hash({hcols})) AS hsum,
                   bit_xor(hash({hcols})) AS hxor,
                   min(hash({hcols})) AS hmin,
                   max(hash({hcols})) AS hmax
            FROM (SELECT {casted} FROM ({relation_sql}))"""
    r = con.sql(q).fetchone()
    return tuple(str(x) for x in r)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/r11_sf1"
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    staged = False
    ok, fail = [], []
    for k in sorted(oracle):
        if only and k not in only:
            continue
        t0 = time.time()
        log(f"... {k}")
        files = sorted(glob.glob(f"{out}/{k}/*.parquet"))
        if not files:
            fail.append((k, "no spark output")); continue
        sql = oracle[k]
        if k.startswith("graph_"):
            if not staged:
                log("... staging und/edges")
                for stmt in EDGE_STAGE:
                    con.execute(stmt)
                staged = True
                log(f"... staged ({time.time()-t0:.1f}s)")
            sql = stub_edge_cte(sql, k)
        try:
            if k in SIGNATURE_KEYS:
                spark_rel = f"SELECT * FROM read_parquet({files!r})"
                cols_types = [(r[0], r[1]) for r in
                              con.sql(f"DESCRIBE {spark_rel}").fetchall()]
                duck_cols = {r[0] for r in
                             con.sql(f"DESCRIBE ({sql})").fetchall()}
                if {c for c, _ in cols_types} != duck_cols:
                    fail.append((k, f"columns differ: "
                                 f"spark={sorted(c for c, _ in cols_types)} "
                                 f"duck={sorted(duck_cols)}"))
                    continue
                s_sig = signature(con, spark_rel, cols_types)
                d_sig = signature(con, sql, cols_types)
                if s_sig != d_sig:
                    fail.append((k, f"signature differs: spark={s_sig} "
                                 f"duck={d_sig}"))
                else:
                    ok.append((k, f"signature match n={s_sig[0]} "
                               f"({time.time()-t0:.1f}s)"))
                continue
            # full compare (same discipline as tools/check.py)
            sdf = pq.read_table(files[0]).to_pandas()
            ddf = con.sql(sql).df()
            if sorted(sdf.columns) != sorted(ddf.columns):
                fail.append((k, f"columns differ: spark={sorted(sdf.columns)}"
                             f" duck={sorted(ddf.columns)}")); continue
            if len(sdf) != len(ddf):
                fail.append((k, f"rows differ: spark={len(sdf)} "
                             f"duck={len(ddf)}")); continue
            sdf = sdf[sorted(sdf.columns)].reset_index(drop=True)
            ddf = ddf[sorted(ddf.columns)].reset_index(drop=True)
            bad = None
            for c in sdf.columns:
                sv, dv = sdf[c], ddf[c].astype(sdf[c].dtype)
                if not sv.equals(dv):
                    diff = (sv != dv) & ~(sv.isna() & dv.isna())
                    if diff.any():
                        i = diff.idxmax()
                        bad = f"col {c} row {i}: spark={sv[i]!r} duck={dv[i]!r}"
                        break
            if bad:
                fail.append((k, bad))
            else:
                ok.append((k, f"full match n={len(sdf)} "
                           f"({time.time()-t0:.1f}s)"))
        except Exception as e:
            fail.append((k, f"error: {e}"))
    for k, m in ok:
        log(f"PASS {k}: {m}")
    for k, m in fail:
        log(f"FAIL {k}: {m}")
    # machine-readable record next to the Spark outputs it verified,
    # citable from BASELINE.md without quoting the whole log
    with open(f"{out}/sf1_results.json", "w") as f:
        json.dump({"sf_dir": sf, "out_dir": out,
                   "pass": dict(ok), "fail": dict(fail)}, f, indent=1)
    print(f"\n{len(ok)} pass, {len(fail)} fail")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()

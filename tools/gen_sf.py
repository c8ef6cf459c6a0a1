#!/usr/bin/env python3
"""Scale-up generator for the driver testdata (dev tool only; the shipped
library is pure Scala). Replicates the FACT tables (orders, lineitem,
events) REP times with consistent key shifts — o_orderkey/l_orderkey move
together so the orders<->lineitem FK survives; event_id shifts alone —
while dims and the corpus tables copy as-is. This is exactly the recipe
that produced the round-9 /tmp/graft_sf1 (rep=10 over sf0.1: 6 M lineitem,
1.5 M orders, 1 M events); rep=100 yields the sf10-scale sample.

The shifted key is the FIRST column of each fact table, so `key + rep*max,
t.* EXCLUDE (key)` preserves the physical column order — Spark and DuckDB
both see the original schema.

With --rep-corpus N the corpus tables (documents, embeddings) replicate
too (doc_id/vec_id shifts; text/embedding payloads repeat verbatim) —
every replica is an EXACT near-duplicate of the original, so the dedup /
ANN bucket occupancy scales with N: exactly the MaxBandBucket / skew-cap
pressure the sf10 proof is after. Keep --rep-corpus 0 (default) for the
oracle-matched sf1 fixture, where the corpus must stay byte-identical.

With --perturb-corpus, replica r>0 of each document additionally gets a
one-token suffix ' zv<r>' — NEAR-identical, never byte-identical crowds
(full-shingle Jaccard (t-2)/(t-1) ~= 0.98 between crowd members), so the
md5 exact-dup path cannot collapse them: the r17 probe that exercises the
hot-star bounded-recall path past the df/band caps specifically.

Usage: python3 tools/gen_sf.py --out /tmp/graft_sf1 [--rep 10]
           [--rep-corpus 0] [--perturb-corpus] [--src /root/testdata/sf0.1]
"""
import argparse
import os
import shutil

import duckdb

DIMS = ["region", "nation", "customer", "supplier", "part"]
CORPUS = [("documents", "doc_id"), ("embeddings", "vec_id")]
FACTS = [("orders", "o_orderkey"), ("lineitem", "l_orderkey"),
         ("events", "event_id")]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--rep", type=int, default=10)
    ap.add_argument("--rep-corpus", type=int, default=0)
    ap.add_argument("--perturb-corpus", action="store_true")
    a = ap.parse_args()
    os.makedirs(a.out, exist_ok=True)
    con = duckdb.connect()
    for t in DIMS:
        shutil.copyfile(f"{a.src}/{t}.parquet", f"{a.out}/{t}.parquet")
    # one shift constant per KEY DOMAIN: orders and lineitem share the
    # orderkey domain, so both shift by max(o_orderkey)+1
    mok = con.sql(
        f"SELECT MAX(o_orderkey)+1 FROM '{a.src}/orders.parquet'").fetchone()[0]
    mev = con.sql(
        f"SELECT MAX(event_id)+1 FROM '{a.src}/events.parquet'").fetchone()[0]
    shift = {"orders": mok, "lineitem": mok, "events": mev}

    def replicate(t, key, rep, perturb=False):
        # perturbed documents: replica r>0 gains a ' zv<r>' suffix token so
        # crowds are near-identical, never byte-identical (r17 hot-star probe)
        # text is documents' second physical column, so keeping it second
        # preserves the original column order
        sel = (f"""SELECT {key} + rep*{shift[t]} AS {key},
                          CASE WHEN rep = 0 THEN text
                               ELSE text || ' zv' || rep END AS text,
                          t.* EXCLUDE ({key}, text)"""
               if perturb and t == "documents" else
               f"""SELECT {key} + rep*{shift[t]} AS {key},
                          t.* EXCLUDE ({key})""")
        con.sql(f"""
            COPY ({sel}
                  FROM '{a.src}/{t}.parquet' t
                  CROSS JOIN (SELECT unnest(range({rep})) AS rep)
                  ORDER BY {key})
            TO '{a.out}/{t}.parquet' (FORMAT PARQUET)""")
        n = con.sql(f"SELECT COUNT(*) FROM '{a.out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")

    for t, key in FACTS:
        replicate(t, key, a.rep)
    for t, key in CORPUS:
        if a.rep_corpus > 1:
            mx = con.sql(f"SELECT MAX({key})+1 "
                         f"FROM '{a.src}/{t}.parquet'").fetchone()[0]
            shift[t] = mx
            replicate(t, key, a.rep_corpus, perturb=a.perturb_corpus)
        else:
            shutil.copyfile(f"{a.src}/{t}.parquet", f"{a.out}/{t}.parquet")


if __name__ == "__main__":
    main()

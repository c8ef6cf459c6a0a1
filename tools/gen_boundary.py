#!/usr/bin/env python3
"""Boundary-crowd corpus for the minhash-star recall stress (VERDICT r17 #2).

Builds a documents.parquet of synthetic crowds with EXACTLY-controlled
pairwise Jaccard over the engine's own shingle model (3-word shingles on
whitespace-normalized lowercase text). Construction: each crowd member is
`c` shared prefix words + `u` member-unique tail words, all tokens distinct,
so every pair has intersection c-2, each side c+u-2 shingles, union
c-2+2u  =>  j = (c-2)/(c-2+2u) exactly, for every pair in the crowd.

Crowds straddle BOTH caps the similarity path prunes with:
  - MaxShingleDf = 64: a crowd of >64 docs hides its common shingles from
    the pair path (df > 64), leaving recall entirely to the star pass;
  - the star pass bucket cap: per band, a member lands in the crowd's mode
    bucket w.p. p^2 where p = 2j/(1+j) under this construction, so a
    70-doc j=0.9 crowd fills its mode bucket to only ~p^2*70 ~ 63 — the
    case that proves a 64 star cap splinters and StarBucketCap=8 holds.

Groups (gid, j, c, u, size) — j >= 0.8 must FULLY cluster, j < 0.8 must
emit ZERO edges (star candidates fire for the >64 crowds but exact
verification rejects them):
  g1  j=0.90   c=20 u=1  size=32    pair path (df 32 <= 64)
  g2  j=0.90   c=20 u=1  size=70    star only; mode bucket ~63 < 64
  g3  j=0.82   c=84 u=9  size=64    pair path boundary (df = 64)
  g4  j=0.82   c=84 u=9  size=65    star only, thinnest margin
  g5  j=0.82   c=84 u=9  size=200   star, crowd >> cap
  g6  j=0.78   c=80 u=11 size=64    pair candidates fire, verify rejects
  g7  j=0.78   c=80 u=11 size=128   star candidates fire, verify rejects
  g8  j=0.80   c=10 u=1  size=65    AT the threshold, 9-shingle short docs
  g9  j=0.8333 c=12 u=1  size=200   short docs above threshold
plus 500 singleton fillers with globally-unique tokens.

Usage: python3 tools/gen_boundary.py --out /tmp/graft_boundary
"""
import argparse
import json

import duckdb

GROUPS = [
    ("g1", 0.90, 20, 1, 32),
    ("g2", 0.90, 20, 1, 70),
    ("g3", 0.82, 84, 9, 64),
    ("g4", 0.82, 84, 9, 65),
    ("g5", 0.82, 84, 9, 200),
    ("g6", 0.78, 80, 11, 64),
    ("g7", 0.78, 128, 11, 128),
    ("g8", 0.80, 10, 1, 65),
    ("g9", 10.0 / 12.0, 12, 1, 200),
]
FILLERS = 500


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    a = ap.parse_args()

    # g6/g7 share (c, u) intent but must not share tokens; give g7 its own
    # c satisfying j = (c-2)/(c-2+2u): u=11 -> c-2 = 78 -> c = 80 for both,
    # tokens disambiguated by the gid prefix anyway.
    rows = []
    doc_id = 1
    manifest = []
    for gid, j, c, u, size in GROUPS:
        if gid == "g7":
            c = 80  # same j=0.78 shape as g6; the tuple above only differs
        common = [f"{gid}w{k}" for k in range(c)]
        first, last = doc_id, doc_id + size - 1
        for i in range(size):
            tail = [f"{gid}d{i}u{k}" for k in range(u)]
            text = " ".join(common + tail)
            rows.append((doc_id, text, "en", "boundary", len(text)))
            doc_id += 1
        exact_j = (c - 2) / (c - 2 + 2 * u)
        manifest.append({"gid": gid, "j": round(exact_j, 6), "c": c, "u": u,
                         "size": size, "first": first, "last": last,
                         "expect_cluster": exact_j >= 0.8})
    for i in range(FILLERS):
        words = [f"fillr{i}t{k}" for k in range(30)]
        rows.append((doc_id, " ".join(words), "en", "filler",
                     len(" ".join(words))))
        doc_id += 1

    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR,"
                " source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO d VALUES (?,?,?,?,?)", rows)
    import os
    os.makedirs(a.out, exist_ok=True)
    con.execute(f"COPY (SELECT * FROM d ORDER BY doc_id) TO "
                f"'{a.out}/documents.parquet' (FORMAT PARQUET)")
    with open(f"{a.out}/manifest.json", "w") as f:
        json.dump(manifest, f, indent=1)
    print(f"{len(rows)} docs -> {a.out} "
          f"({sum(g[4] for g in GROUPS)} crowd + {FILLERS} filler)")


if __name__ == "__main__":
    main()

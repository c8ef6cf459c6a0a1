#!/usr/bin/env bash
# r17 perturbed-crowd probe (VERDICT r16 #1 "done =" clause): corpus ×200
# where every replica r>0 carries a one-token suffix — NEAR-identical,
# never byte-identical crowds (1 M docs), so the md5 exact-star pass can't
# collapse them and every shingle/band bucket is saturated far past the
# 64 caps. The hot-star bounded-recall pass must still cluster every crowd:
#   - dedup_clusters emits ALL 1 M docs with cluster_size >= 200
#   - dedup_exact stays empty (no byte-identical pair exists)
#   - dedup_ngram_jaccard stays empty (cap engages cleanly — candidate
#     WORK stays bounded; recall is the clustering keys' job)
# Record: tools/scaleprobe_r17_perturbed.json
#
# Usage: tools/probe_perturbed.sh
#   env: GRAFT_PERTURB_DIR (default /tmp/graft_perturb200)
#        GRAFT_PERTURB_OUT (default /tmp/graft_perturb_out)
set -euo pipefail
cd "$(dirname "$0")/.."

DIR="${GRAFT_PERTURB_DIR:-/tmp/graft_perturb200}"
OUT="${GRAFT_PERTURB_OUT:-/tmp/graft_perturb_out}"

if [ ! -f "$DIR/documents.parquet" ]; then
  echo "[probe_perturbed] generating $DIR (corpus x200, perturbed)"
  python3 tools/gen_sf.py --out "$DIR" --rep 1 --rep-corpus 200 --perturb-corpus
fi

mkdir -p "$OUT"
T0=$(date +%s)
SPARK_GRAFT_VERIFY_KEYS="dedup_clusters,dedup_exact,dedup_ngram_jaccard" \
  sbt -batch "runMain graft.Verify $DIR $OUT" 2>&1 | tail -3
T1=$(date +%s)

python3 - "$OUT" "$((T1 - T0))" <<'EOF'
import glob, json, sys
import pyarrow.parquet as pq

out, secs = sys.argv[1], int(sys.argv[2])

def tbl(k):
    files = glob.glob(f"{out}/{k}/*.parquet")
    assert files, f"no output for {k}"
    return pq.read_table(files[0])

cl = tbl("dedup_clusters")
n = cl.num_rows
import pyarrow.compute as pc
mn = pc.min(cl.column("cluster_size")).as_py()
mx = pc.max(cl.column("cluster_size")).as_py()
ex = tbl("dedup_exact").num_rows
nj = tbl("dedup_ngram_jaccard").num_rows

checks = {
    "clusters_rows_all_docs": (n, "== 1000000", n == 1_000_000),
    "min_cluster_size_ge_200": (mn, ">= 200", mn is not None and mn >= 200),
    "max_cluster_size_ge_200": (mx, ">= 200", mx is not None and mx >= 200),
    "exact_pairs_zero": (ex, "== 0 (no byte-identical pair exists)", ex == 0),
    "capped_listing_zero": (nj, "== 0 (cap engages cleanly)", nj == 0),
}
ok = all(v[2] for v in checks.values())
rec = {
    "probe": "perturbed_corpus_x200", "docs": 1_000_000,
    "verify_wall_sec": secs,
    "checks": {k: {"value": v[0], "rule": v[1], "pass": v[2]}
               for k, v in checks.items()},
    "pass": ok,
}
with open("tools/scaleprobe_r17_perturbed.json", "w") as f:
    json.dump(rec, f)
    f.write("\n")
print(json.dumps(rec, indent=1))
sys.exit(0 if ok else 1)
EOF

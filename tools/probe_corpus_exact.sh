#!/usr/bin/env bash
# r17 re-run of the r16 corpus-×200 EXACT probe (byte-identical replicas,
# 1 M docs) against the reworked clustering path: the caps must still
# engage cleanly (listing keys exactly zero), the clusters must still
# reach cluster_size ≥ 200 (now through exact stars AND minhash stars),
# and the new recall pass must be NON-zero past the caps
# (cap_overrides: dedup_minhash_star ≥ 100k verified jaccard-1.0 edges).
# Record: tools/scaleprobe_r17_corpus.json (+ _ref).
set -euo pipefail
cd "$(dirname "$0")/.."

DIR="${GRAFT_CORPUS_DIR:-/tmp/graft_corpus200}"
KEYS="dedup_exact,dedup_near_exact,dedup_ngram_jaccard,dedup_containment,dedup_clusters,dedup_survivor,dedup_minhash,dedup_simhash,dedup_minhash_star,dedup_prefix,dedup_embedding,dedup_embedding_clusters,dedup_incremental,dedup_minhash_md5,dedup_simhash_md5,dedup_substring,dedup_cross_source_matrix,dedup_threshold_sweep,sim_cosine_topk,sim_topk_batch,sim_range_search,sim_ann_lsh,sim_ann_ivf,sim_ann_persisted,sim_mips_topk,emb_knn_graph,emb_hubness"

if [ ! -f "$DIR/documents.parquet" ]; then
  echo "[probe_corpus] generating $DIR (corpus x200 EXACT)"
  python3 tools/gen_sf.py --out "$DIR" --rep 1 --rep-corpus 200
fi

SPARK_DRIVER_MEM=16g sbt -batch \
  "Test/runMain graft.ScaleProbe /root/testdata/sf0.1 tools/scaleprobe_r17_corpus_ref.json $KEYS" \
  2>&1 | tail -1
SPARK_DRIVER_MEM=48g sbt -batch \
  "Test/runMain graft.ScaleProbe $DIR tools/scaleprobe_r17_corpus.json $KEYS" \
  2>&1 | tail -1
python3 tools/check_sf10.py tools/scaleprobe_r17_corpus_ref.json \
  tools/scaleprobe_r17_corpus.json --facts 1 --corpus 200

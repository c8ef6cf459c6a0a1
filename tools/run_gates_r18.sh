#!/usr/bin/env bash
# r18 standing-gate driver (run sequentially — parallel gates contend and
# corrupt timings): sf1 rotation window 28 + the new/changed keys, sf10
# invariant scaleprobe for them, sf10 EXACT oracle rotations 22+23
# (VERDICT r17 #3), and — standing since r18 (VERDICT r17 #5) — the two
# corpus probes every new dedup/similarity key must pass before close:
# the ×200 PERTURBED crowd probe and the j≈0.8 boundary-crowd probe.
# Logs/records land in tools/.
set -euo pipefail
cd "$(dirname "$0")/.."

NEW="emb_hubness_ann,agg_ansari_bradley,agg_cvm_test,agg_jonckheere,agg_page_trend,agg_dixon_q,window_vortex,window_coppock,window_trix,window_mass_index,text_gunning_fog,agg_gk_gamma,agg_somers_d,agg_stuart_tau_c,agg_blomqvist_beta,agg_theil_u,window_qstick,window_bop,window_elder_ray,agg_kendall_w,agg_lin_ccc,agg_bland_altman,agg_deming_regression,agg_ljung_box,agg_runs_up_down,window_chandelier_exit,resample_heikin_ashi"
CHANGED="dedup_clusters,dedup_survivor,dedup_minhash_star,dedup_embedding_clusters,emb_knn_graph,agg_bartlett_test,agg_welch_anova,agg_wilcoxon_signed_rank,emb_cosine_histogram"

if [ ! -f /tmp/graft_sf10/lineitem.parquet ]; then
  echo "[gates] generating /tmp/graft_sf10 (facts x100, corpus x20)"
  python3 tools/gen_sf.py --out /tmp/graft_sf10 --rep 100 --rep-corpus 20
fi

echo "[gates] === sf1 rotation window 28 + new/changed keys ==="
GRAFT_SF1_ROTATION=28 GRAFT_SF1_LOG=tools/gate_sf1_rot28.log \
  tools/gate_sf1.sh $(echo "$NEW,$CHANGED" | tr ',' ' ')

echo "[gates] === sf10 invariant scaleprobe (new + changed keys) ==="
SPARK_DRIVER_MEM=16g sbt -batch \
  "Test/runMain graft.ScaleProbe /root/testdata/sf0.1 tools/scaleprobe_r18_sf01.json $NEW,$CHANGED" \
  2>&1 | tail -2
SPARK_DRIVER_MEM=48g sbt -batch \
  "Test/runMain graft.ScaleProbe /tmp/graft_sf10 tools/scaleprobe_r18_sf10.json $NEW,$CHANGED" \
  2>&1 | tail -2
python3 tools/check_sf10.py tools/scaleprobe_r18_sf01.json \
  tools/scaleprobe_r18_sf10.json

echo "[gates] === sf10 EXACT rotation 22 ==="
GRAFT_SF10_ROTATION=22 GRAFT_SF10_LOG=tools/gate_sf10_exact_r18a.log \
  tools/gate_sf10_exact.sh
echo "[gates] === sf10 EXACT rotation 23 ==="
GRAFT_SF10_ROTATION=23 GRAFT_SF10_LOG=tools/gate_sf10_exact_r18b.log \
  tools/gate_sf10_exact.sh

echo "[gates] === corpus x200 PERTURBED probe (standing) ==="
GRAFT_PROBE_TAG=r18 tools/probe_perturbed.sh

echo "[gates] === j~0.8 boundary-crowd probe (standing) ==="
tools/probe_boundary.sh

echo "[gates] === corpus x200 EXACT probe (embedding-cap done-clauses) ==="
tools/probe_corpus_r18.sh

echo "[gates] === embedding-flood probe (quadratic-corner kill) ==="
tools/probe_emb_flood.sh

echo "[gates] ALL GATES GREEN"

#!/usr/bin/env bash
# r17 standing-gate driver (run sequentially — parallel gates contend and
# corrupt timings): sf1 rotation window 27 + the 14 new keys, sf10
# invariant scaleprobe for the new keys, and the two sf10 EXACT oracle
# rotations (17, 18) the verdict asked for. Logs/records land in tools/.
set -euo pipefail
cd "$(dirname "$0")/.."

NEW="agg_levene_test,agg_bartlett_test,agg_cronbach_alpha,agg_icc,agg_durbin_watson,agg_cochran_q,agg_moods_median,agg_gumbel_fit,window_williams_r,window_force_index,window_ulcer_index,dedup_minhash_star,dedup_near_exact,sim_range_search"
CHANGED="dedup_clusters,dedup_survivor,agg_gage_rr,sql_tpch_q2,sql_tpch_q9,sql_tpch_q11,sql_tpch_q16,sql_tpch_q20"

if [ ! -f /tmp/graft_sf10/lineitem.parquet ]; then
  echo "[gates] generating /tmp/graft_sf10 (facts x100, corpus x20)"
  python3 tools/gen_sf.py --out /tmp/graft_sf10 --rep 100 --rep-corpus 20
fi

echo "[gates] === sf1 rotation window 27 + new/changed keys ==="
GRAFT_SF1_ROTATION=27 GRAFT_SF1_LOG=tools/gate_sf1_rot27.log \
  tools/gate_sf1.sh $(echo "$NEW,$CHANGED" | tr ',' ' ')

echo "[gates] === sf10 invariant scaleprobe (new keys) ==="
SPARK_DRIVER_MEM=16g sbt -batch \
  "Test/runMain graft.ScaleProbe /root/testdata/sf0.1 tools/scaleprobe_r17_sf01.json $NEW" \
  2>&1 | tail -2
SPARK_DRIVER_MEM=48g sbt -batch \
  "Test/runMain graft.ScaleProbe /tmp/graft_sf10 tools/scaleprobe_r17_sf10.json $NEW" \
  2>&1 | tail -2
python3 tools/check_sf10.py tools/scaleprobe_r17_sf01.json \
  tools/scaleprobe_r17_sf10.json

echo "[gates] === sf10 EXACT rotation 17 ==="
GRAFT_SF10_ROTATION=17 GRAFT_SF10_LOG=tools/gate_sf10_exact_r17a.log \
  tools/gate_sf10_exact.sh
echo "[gates] === sf10 EXACT rotation 18 ==="
GRAFT_SF10_ROTATION=18 GRAFT_SF10_LOG=tools/gate_sf10_exact_r17b.log \
  tools/gate_sf10_exact.sh

echo "[gates] ALL GATES GREEN"

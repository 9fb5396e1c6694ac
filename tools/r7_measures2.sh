#!/bin/bash
# Round-7 measurement batch, part 2 (relaunch after the 8g-heap OOM at
# sf10). Each measurement in its own fresh process, cheap-first:
#   1. full headline suite at sf0.1 (BENCH_local_r07 — the comparable
#      datum for the ac_backlinks/skew regression question)
#   2. sf10 build stage metrics with 48g heap (sidecar fold confirmation)
#   3. graph_triangle_count sf10 uncontended x2 with 48g heap
set -u
cd /root/repo
R=/root/repo

echo "[$(date +%T)] 1/3 full headline suite sf0.1"
SPARK_GRAFT_BENCH_SPREAD=$R/BENCH_spread_r07.json \
python bench.py > $R/BENCH_local_r07.json 2>/tmp/n1.err

echo "[$(date +%T)] 2/3 sf10 stage metrics (48g)"
ORION_SPARK_DRIVER_MEM=48g \
python tools/build_stage_metrics.py $R/testdata_sf10 /tmp/metrics_build_sf10_r07b \
  > $R/BUILD_STAGE_METRICS_sf10_r07.json 2>/tmp/n2.err

echo "[$(date +%T)] 3/3 triangle sf10 run 1 (48g)"
ORION_SPARK_DRIVER_MEM=48g \
SPARK_GRAFT_SF_DIR=$R/testdata_sf10 \
SPARK_GRAFT_BENCH_QUERIES=graph_triangle_count \
SPARK_GRAFT_BENCH_RUNS=1 \
SPARK_GRAFT_BENCH_SPREAD=/tmp/tri1_spread.json \
python bench.py > $R/BENCH_tri_sf10_run1.json 2>/tmp/n3.err

echo "[$(date +%T)] 3/3 triangle sf10 run 2 (48g)"
ORION_SPARK_DRIVER_MEM=48g \
SPARK_GRAFT_SF_DIR=$R/testdata_sf10 \
SPARK_GRAFT_BENCH_QUERIES=graph_triangle_count \
SPARK_GRAFT_BENCH_RUNS=1 \
SPARK_GRAFT_BENCH_SPREAD=/tmp/tri2_spread.json \
python bench.py > $R/BENCH_tri_sf10_run2.json 2>/tmp/n4.err

echo "[$(date +%T)] all measures done"

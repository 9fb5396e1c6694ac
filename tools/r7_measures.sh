#!/bin/bash
# Round-7 serialized measurement batch. Waits for the sf0.1 correctness
# sweep (single heavy process) to exit, then runs each measurement in its
# own fresh process on an otherwise-quiet box, in cheap-first order:
#   1. ac_backlinks + skew_salted_merge_stress re-measure (r6 verdict #4)
#   2. DSIR weights/selection scale rows at sf1 and sf10 (r6 verdict #7)
#   3. sf10 build stage metrics confirming the sidecar fold (r6 verdict #2)
#   4. graph_triangle_count sf10 uncontended x2 (r6 verdict #5)
#   5. full headline suite at sf0.1 (BENCH_local_r07)
set -u
cd /root/repo
R=/root/repo

echo "[$(date +%T)] waiting for sweep pid $1 ..."
while kill -0 "$1" 2>/dev/null; do sleep 30; done
echo "[$(date +%T)] sweep done; starting measures"

echo "[$(date +%T)] 1/5 regression re-measure"
SPARK_GRAFT_BENCH_QUERIES=ac_backlinks,skew_salted_merge_stress \
SPARK_GRAFT_BENCH_RUNS=5 \
SPARK_GRAFT_BENCH_SPREAD=$R/BENCH_regress_r07_spread.json \
python bench.py > $R/BENCH_regress_r07.json 2>/tmp/m1.err

echo "[$(date +%T)] 2/5 DSIR sf1"
SPARK_GRAFT_SF_DIR=$R/testdata_sf1 \
SPARK_GRAFT_BENCH_QUERIES=documents_dsir_weights,documents_dsir_selection \
SPARK_GRAFT_BENCH_RUNS=3 \
SPARK_GRAFT_BENCH_SPREAD=$R/BENCH_dsir_sf1_spread.json \
python bench.py > $R/BENCH_dsir_sf1.json 2>/tmp/m2.err

echo "[$(date +%T)] 2/5 DSIR sf10"
SPARK_GRAFT_SF_DIR=$R/testdata_sf10 \
SPARK_GRAFT_BENCH_QUERIES=documents_dsir_weights,documents_dsir_selection \
SPARK_GRAFT_BENCH_RUNS=3 \
SPARK_GRAFT_BENCH_SPREAD=$R/BENCH_dsir_sf10_spread.json \
python bench.py > $R/BENCH_dsir_sf10.json 2>/tmp/m3.err

echo "[$(date +%T)] 3/5 sf10 stage metrics (sidecar fold confirmation)"
python tools/build_stage_metrics.py $R/testdata_sf10 /tmp/metrics_build_sf10_r07 \
  > $R/BUILD_STAGE_METRICS_sf10_r07.json 2>/tmp/m4.err

echo "[$(date +%T)] 4/5 triangle sf10 run 1"
SPARK_GRAFT_SF_DIR=$R/testdata_sf10 \
SPARK_GRAFT_BENCH_QUERIES=graph_triangle_count \
SPARK_GRAFT_BENCH_RUNS=1 \
SPARK_GRAFT_BENCH_SPREAD=/tmp/tri1_spread.json \
python bench.py > $R/BENCH_tri_sf10_run1.json 2>/tmp/m5.err

echo "[$(date +%T)] 4/5 triangle sf10 run 2"
SPARK_GRAFT_SF_DIR=$R/testdata_sf10 \
SPARK_GRAFT_BENCH_QUERIES=graph_triangle_count \
SPARK_GRAFT_BENCH_RUNS=1 \
SPARK_GRAFT_BENCH_SPREAD=/tmp/tri2_spread.json \
python bench.py > $R/BENCH_tri_sf10_run2.json 2>/tmp/m6.err

echo "[$(date +%T)] 5/5 full headline suite sf0.1"
SPARK_GRAFT_BENCH_SPREAD=$R/BENCH_spread.json \
python bench.py > $R/BENCH_local_r07.json 2>/tmp/m7.err

echo "[$(date +%T)] all measures done"

#!/bin/bash
# Follow-on serial chip pipeline: waits for the in-flight mp_w4 training
# (PID $1) to exit, then runs the remaining chip work with the FIXED
# fetch-synced benches (utils/sync.py): mp_unicycle training, roofline,
# bench_extra, and a bench.py capture for PERF reconciliation.
set -u
cd /root/repo
unset _AXON_REGISTERED AXON_COMPAT_VERSION AXON_POOL_SVC_OVERRIDE \
      TPU_ACCELERATOR_TYPE TPU_LIBRARY_PATH TPU_TOPOLOGY TPU_WORKER_HOSTNAMES
mkdir -p data

WAIT_PID=${1:-0}
if [ "$WAIT_PID" != "0" ]; then
  echo "=== [$(date +%T)] waiting for PID $WAIT_PID (mp_w4 train) ==="
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi
echo "=== [$(date +%T)] mp_w4 train done ==="

T="python -m relationalgraphlearning_tpu.cli.train --overwrite --evaluation_interval 500 --val_size 200 --randomseed 0"
mkdir -p data/mp_unicycle
echo "=== [$(date +%T)] mp_unicycle: train (chip) ==="
timeout 10800 $T --policy model_predictive_rl \
  --config configs/icra_benchmark/mp_unicycle.py \
  --output_dir data/mp_unicycle > data/mp_unicycle/reproduce.log 2>&1
echo "mp_unicycle train rc=$?"

echo "=== [$(date +%T)] roofline (fetch-synced) ==="
timeout 5400 python bench_roofline.py > data/roofline.log 2>&1
echo "roofline rc=$?"

echo "=== [$(date +%T)] bench_extra (fetch-synced) ==="
timeout 5400 python bench_extra.py > data/bench_extra.log 2>&1
echo "bench_extra rc=$?"

echo "=== [$(date +%T)] bench.py capture ==="
timeout 5400 python bench.py > data/bench_main.log 2>&1
echo "bench rc=$?"

echo "=== [$(date +%T)] CHIP PIPELINE 2 DONE ==="

#!/bin/bash
# Fourth serial chip phase: waits for pipeline3 (PID $1), then
#   1. retrains mp_unicycle with goal-frame canonicalization (612ade5),
#   2. evals it on CPU,
#   3. reruns bench_extra (block-path emask precomputed, fetch-synced),
#   4. reruns roofline (fixed VPU measurement + block rows).
set -u
cd /root/repo
unset _AXON_REGISTERED AXON_COMPAT_VERSION AXON_POOL_SVC_OVERRIDE \
      TPU_ACCELERATOR_TYPE TPU_LIBRARY_PATH TPU_TOPOLOGY TPU_WORKER_HOSTNAMES

WAIT_PID=${1:-0}
if [ "$WAIT_PID" != "0" ]; then
  echo "=== [$(date +%T)] waiting for pipeline3 (PID $WAIT_PID) ==="
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi

echo "=== [$(date +%T)] mp_unicycle retrain (canonicalized) ==="
mkdir -p data/mp_unicycle
timeout 7200 python -m relationalgraphlearning_tpu.cli.train --overwrite \
  --val_size 200 --evaluation_interval 500 --randomseed 0 \
  --policy model_predictive_rl \
  --config configs/icra_benchmark/mp_unicycle.py \
  --output_dir data/mp_unicycle > data/mp_unicycle/reproduce.log 2>&1
echo "mp_unicycle rc=$?"

echo "=== [$(date +%T)] mp_unicycle eval (cpu) ==="
timeout 5400 python -m relationalgraphlearning_tpu.cli.test --platform cpu \
  --phase test --policy model_predictive_rl --model_dir data/mp_unicycle \
  >> data/mp_unicycle/reproduce.log 2>&1
echo "mp_unicycle eval rc=$?"

echo "=== [$(date +%T)] bench_extra rerun ==="
timeout 7200 python bench_extra.py > data/bench_extra.log 2>&1
echo "bench_extra rc=$?"

echo "=== [$(date +%T)] roofline rerun ==="
timeout 7200 python bench_roofline.py > data/roofline.log 2>&1
echo "roofline rc=$?"

echo "=== [$(date +%T)] CHIP PIPELINE 4 DONE ==="

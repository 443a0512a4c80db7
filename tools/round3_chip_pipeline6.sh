#!/bin/bash
# Final chip phase: waits for pipeline4 (PID $1), retrains mp_unicycle on
# raw coordinates (canonicalize reverted — it collapsed training) with a
# 20k-episode schedule (the unicycle value function learns more slowly:
# heading is a real state dimension for it), then evals on CPU.
set -u
cd /root/repo
unset _AXON_REGISTERED AXON_COMPAT_VERSION AXON_POOL_SVC_OVERRIDE \
      TPU_ACCELERATOR_TYPE TPU_LIBRARY_PATH TPU_TOPOLOGY TPU_WORKER_HOSTNAMES

WAIT_PID=${1:-0}
if [ "$WAIT_PID" != "0" ]; then
  echo "=== [$(date +%T)] waiting for pipeline4 (PID $WAIT_PID) ==="
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi

echo "=== [$(date +%T)] mp_unicycle retrain (raw, 20k episodes) ==="
mkdir -p data/mp_unicycle
timeout 7200 python -m relationalgraphlearning_tpu.cli.train --overwrite \
  --val_size 200 --evaluation_interval 500 --randomseed 0 \
  --rl_train_episodes 20000 \
  --policy model_predictive_rl \
  --config configs/icra_benchmark/mp_unicycle.py \
  --output_dir data/mp_unicycle > data/mp_unicycle/reproduce.log 2>&1
echo "mp_unicycle rc=$?"

echo "=== [$(date +%T)] mp_unicycle eval (cpu) ==="
timeout 5400 python -m relationalgraphlearning_tpu.cli.test --platform cpu \
  --phase test --policy model_predictive_rl --model_dir data/mp_unicycle \
  >> data/mp_unicycle/reproduce.log 2>&1
echo "mp_unicycle eval rc=$?"
echo "=== [$(date +%T)] CHIP PIPELINE 6 DONE ==="

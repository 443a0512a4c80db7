#!/bin/bash
# Quality-band attempt: waits for pipeline6 (PID $1), trains mp_w4 with
# RL lr 5e-4 (r2: best nav 11.06 s) + eval cadence 250 (r3: best success
# selection, 0.980) — targeting success >= 0.98 AND nav <= 11.0 s — then
# evals on CPU.
set -u
cd /root/repo
unset _AXON_REGISTERED AXON_COMPAT_VERSION AXON_POOL_SVC_OVERRIDE \
      TPU_ACCELERATOR_TYPE TPU_LIBRARY_PATH TPU_TOPOLOGY TPU_WORKER_HOSTNAMES

WAIT_PID=${1:-0}
if [ "$WAIT_PID" != "0" ]; then
  echo "=== [$(date +%T)] waiting for pipeline6 (PID $WAIT_PID) ==="
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi

echo "=== [$(date +%T)] mprl_band train (chip) ==="
mkdir -p data/mprl_band
timeout 7200 python -m relationalgraphlearning_tpu.cli.train --overwrite \
  --val_size 200 --evaluation_interval 250 --randomseed 3 \
  --rl_learning_rate 5e-4 \
  --policy model_predictive_rl --config configs/icra_benchmark/mp_w4.py \
  --output_dir data/mprl_band > data/mprl_band/reproduce.log 2>&1
echo "mprl_band rc=$?"

echo "=== [$(date +%T)] mprl_band eval (cpu) ==="
timeout 5400 python -m relationalgraphlearning_tpu.cli.test --platform cpu \
  --phase test --policy model_predictive_rl --model_dir data/mprl_band \
  >> data/mprl_band/reproduce.log 2>&1
echo "mprl_band eval rc=$?"
echo "=== [$(date +%T)] CHIP PIPELINE 7 DONE ==="

#!/bin/bash
# Third serial chip phase: waits for pipeline2 (PID $1), then
#   1. retrains mp_unicycle with the holonomic->unicycle demonstrator
#      conversion (8e1c1ed),
#   2. trains two more quality-band candidates (seed-1 mp_w4; finer
#      eval cadence mp_separate),
# then evals everything on CPU (chip stays free for reruns).
set -u
cd /root/repo
unset _AXON_REGISTERED AXON_COMPAT_VERSION AXON_POOL_SVC_OVERRIDE \
      TPU_ACCELERATOR_TYPE TPU_LIBRARY_PATH TPU_TOPOLOGY TPU_WORKER_HOSTNAMES
mkdir -p data

WAIT_PID=${1:-0}
if [ "$WAIT_PID" != "0" ]; then
  echo "=== [$(date +%T)] waiting for pipeline2 (PID $WAIT_PID) ==="
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi

T="python -m relationalgraphlearning_tpu.cli.train --overwrite --val_size 200"
E="python -m relationalgraphlearning_tpu.cli.test --platform cpu --phase test --policy model_predictive_rl"

echo "=== [$(date +%T)] mp_unicycle retrain (chip, converted demos) ==="
mkdir -p data/mp_unicycle
timeout 7200 $T --policy model_predictive_rl \
  --config configs/icra_benchmark/mp_unicycle.py --evaluation_interval 500 \
  --randomseed 0 --output_dir data/mp_unicycle \
  > data/mp_unicycle/reproduce.log 2>&1
echo "mp_unicycle rc=$?"

echo "=== [$(date +%T)] mp_w4 seed 1 (chip) ==="
mkdir -p data/mp_w4_s1
timeout 7200 $T --policy model_predictive_rl \
  --config configs/icra_benchmark/mp_w4.py --evaluation_interval 500 \
  --randomseed 1 --output_dir data/mp_w4_s1 \
  > data/mp_w4_s1/reproduce.log 2>&1
echo "mp_w4_s1 rc=$?"

echo "=== [$(date +%T)] mprl fine eval cadence (chip) ==="
mkdir -p data/mprl_fine
timeout 7200 $T --policy model_predictive_rl \
  --config configs/icra_benchmark/mp_w4.py --evaluation_interval 250 \
  --randomseed 2 --output_dir data/mprl_fine \
  > data/mprl_fine/reproduce.log 2>&1
echo "mprl_fine rc=$?"

for d in mp_unicycle mp_w4_s1 mprl_fine; do
  echo "=== [$(date +%T)] $d eval (cpu) ==="
  timeout 5400 $E --model_dir "data/$d" >> "data/$d/reproduce.log" 2>&1
  echo "$d eval rc=$?"
done

echo "=== [$(date +%T)] CHIP PIPELINE 3 DONE ==="

#!/bin/bash
# CPU-side round-3 queue: the one-step-policy trainings and ALL 500-case
# evaluations run on XLA:CPU — quality metrics are device-independent (the
# ORCA row reproduces the chip result bit-for-bit) and today's remote-compile
# farm takes 10-30 min per big TPU program, vs seconds on CPU. The chip is
# reserved for the MPRL-family trainings (tools/round3_chip_queue.sh) and
# the end-of-round benches.
set -u
cd /root/repo
unset _AXON_REGISTERED AXON_COMPAT_VERSION AXON_POOL_SVC_OVERRIDE \
      TPU_ACCELERATOR_TYPE TPU_LIBRARY_PATH TPU_TOPOLOGY TPU_WORKER_HOSTNAMES
mkdir -p data
T="python -m relationalgraphlearning_tpu.cli.train --platform cpu --overwrite --evaluation_interval 500 --val_size 200 --randomseed 0"
E="python -m relationalgraphlearning_tpu.cli.test --platform cpu --phase test"

train_eval () {  # name policy config extra_eval_args...
  local name=$1 policy=$2 config=$3; shift 3
  mkdir -p "data/$name"
  if [ ! -f "data/$name/eval_test.json" ]; then
    echo "=== [$(date +%T)] $name: train (cpu) ==="
    $T --policy "$policy" --config "$config" --output_dir "data/$name" \
      > "data/$name/reproduce.log" 2>&1 || { echo "$name TRAIN FAILED"; return; }
    echo "=== [$(date +%T)] $name: eval (cpu) ==="
    $E --policy "$policy" --model_dir "data/$name" "$@" \
      >> "data/$name/reproduce.log" 2>&1 || echo "$name EVAL FAILED"
  else
    echo "$name eval exists - skip"
  fi
}

train_eval sarl     sarl    configs/icra_benchmark/sarl.py
train_eval lstm_rl  lstm_rl configs/icra_benchmark/lstm_rl.py
train_eval cadrl    cadrl   configs/icra_benchmark/cadrl.py --human_num 5
train_eval sarl_om  sarl    configs/icra_benchmark/sarl_om.py

# rgl trained on chip already; its eval hung in the chip compile farm — CPU
if [ ! -f data/rgl/eval_test.json ] && [ -d data/rgl/rl_model_best ]; then
  echo "=== [$(date +%T)] rgl: eval (cpu) ==="
  $E --policy rgl --model_dir data/rgl >> data/rgl/reproduce.log 2>&1
fi

echo "=== [$(date +%T)] CPU QUEUE PHASE 1 DONE ==="

#!/bin/bash
# Chip-side round-3 queue: MPRL-family trainings only (the planner makes CPU
# training impractically slow; the chip runs 10k episodes + 1M gradient
# steps in ~7 min once compiled). Their 500-case evals + planner ablations
# run on CPU at the end (device-independent metrics; the farm's 10-30 min
# per-program compiles are the bottleneck today).
set -u
cd /root/repo
unset _AXON_REGISTERED AXON_COMPAT_VERSION AXON_POOL_SVC_OVERRIDE \
      TPU_ACCELERATOR_TYPE TPU_LIBRARY_PATH TPU_TOPOLOGY TPU_WORKER_HOSTNAMES
mkdir -p data
T="python -m relationalgraphlearning_tpu.cli.train --overwrite --evaluation_interval 500 --val_size 200 --randomseed 0"
E="python -m relationalgraphlearning_tpu.cli.test --platform cpu --phase test"

for spec in "mp_unicycle configs/icra_benchmark/mp_unicycle.py" \
            "mp_w4 configs/icra_benchmark/mp_w4.py"; do
  set -- $spec; name=$1; config=$2
  mkdir -p "data/$name"
  if [ ! -d "data/$name/rl_model_best" ]; then
    echo "=== [$(date +%T)] $name: train (chip) ==="
    $T --policy model_predictive_rl --config "$config" \
      --output_dir "data/$name" > "data/$name/reproduce.log" 2>&1 \
      || { echo "$name TRAIN FAILED"; continue; }
  fi
  echo "=== [$(date +%T)] $name: eval (cpu) ==="
  $E --policy model_predictive_rl --model_dir "data/$name" \
    >> "data/$name/reproduce.log" 2>&1 || echo "$name EVAL FAILED"
done

echo "=== [$(date +%T)] planner ablations on the best MPRL checkpoint (cpu) ==="
S1=$(python -c "import json;print(json.load(open('data/mprl/eval_test.json'))['success_rate'])" 2>/dev/null || echo 0)
S2=$(python -c "import json;print(json.load(open('data/mp_w4/eval_test.json'))['success_rate'])" 2>/dev/null || echo 0)
BEST=$(python -c "print('data/mp_w4' if $S2 > $S1 else 'data/mprl')")
echo "ablation checkpoint: $BEST"
$E --policy model_predictive_rl --model_dir "$BEST" --planning_depth 1 \
  >> "$BEST/ablation.log" 2>&1
$E --policy model_predictive_rl --model_dir "$BEST" --planning_depth 2 \
  --planning_width 4 >> "$BEST/ablation.log" 2>&1
$E --policy model_predictive_rl --model_dir "$BEST" --planning_depth 3 \
  --planning_width 2 >> "$BEST/ablation.log" 2>&1

echo "=== [$(date +%T)] CHIP QUEUE DONE ==="

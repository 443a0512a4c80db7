#!/bin/bash
# MP-RGL stabilization sweep (round-2 quality work): vary target-update
# cadence and RL learning rate; larger val set de-noises best-on-val
# selection. Each run trains full IL+RL and evaluates 500 test cases.
set -u
cd /root/repo
run_one() {
  name=$1; shift
  out=data/$name
  echo "=== $name: $* ==="
  timeout 3000 python -m relationalgraphlearning_tpu.cli.train \
    --policy model_predictive_rl --config configs/icra_benchmark/mp_separate.py \
    --output_dir "$out" --overwrite --randomseed 0 \
    --evaluation_interval 500 --val_size 200 "$@" \
    > "$out.train.log" 2>&1 || { echo "$name TRAIN FAILED"; return 1; }
  timeout 1800 python -m relationalgraphlearning_tpu.cli.test \
    --policy model_predictive_rl --model_dir "$out" --phase test \
    > "$out.test.log" 2>&1 || { echo "$name EVAL FAILED"; return 1; }
  tail -1 "$out/eval_test.json" >/dev/null 2>&1
  python -c "import json;print('$name', json.load(open('$out/eval_test.json')))"
}
mkdir -p data
run_one mprl_t250 --target_update_interval 250
run_one mprl_t50 --target_update_interval 50
run_one mprl_lr5e4 --rl_learning_rate 0.0005
echo SWEEP DONE

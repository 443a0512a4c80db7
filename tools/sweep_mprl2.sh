#!/bin/bash
# Sweep round 2: fresh per-minibatch TD targets (reference optimize_batch
# semantics) x learning rate.
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
  python -c "import json;print('$name', json.load(open('$out/eval_test.json')))"
}
mkdir -p data
run_one mprl_td
run_one mprl_td_lr5e4 --rl_learning_rate 0.0005
echo SWEEP2 DONE

#!/bin/bash
set -u
cd /root/repo
echo "=== mprl_td_20k ==="
timeout 5000 python -m relationalgraphlearning_tpu.cli.train \
  --policy model_predictive_rl --config configs/icra_benchmark/mp_separate.py \
  --output_dir data/mprl_td_20k --overwrite --randomseed 0 \
  --evaluation_interval 500 --val_size 200 --rl_train_episodes 20000 \
  > data/mprl_td_20k.train.log 2>&1 && \
timeout 2400 python -m relationalgraphlearning_tpu.cli.test \
  --policy model_predictive_rl --model_dir data/mprl_td_20k --phase test \
  > data/mprl_td_20k.test.log 2>&1 && \
python -c "import json;print('mprl_td_20k', json.load(open('data/mprl_td_20k/eval_test.json')))"
bash tools/sweep_planner.sh data/mprl_td

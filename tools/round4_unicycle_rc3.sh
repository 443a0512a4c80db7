#!/bin/bash
# Retrain unicycle with native pi/3 rotation constraint (r4 diagnosis),
# 20k-episode schedule (r3's best for unicycle); then CPU evals at the
# trained constraint AND the r3 comparison points.
set -u
cd /root/repo
while kill -0 23145 2>/dev/null; do sleep 20; done
EVAL_WIDTHS="default" bash tools/train_eval.sh mp_unicycle_rc3 \
  configs/icra_benchmark/mp_unicycle_rc3.py \
  --rl_train_episodes 20000 --evaluation_interval 500 --randomseed 0
echo "=== [$(date +%T)] UNICYCLE RC3 DONE ==="

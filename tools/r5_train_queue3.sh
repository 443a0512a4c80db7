#!/bin/bash
# r5 queue 3: from-scratch two-stage unicycle anneal at seed 0 (queue 2's
# seed-1 stage A collapsed — unicycle RL is seed-fragile; the committed
# working base, results/mp_unicycle, is a seed-0 run).
set -u
cd /root/repo
mkdir -p /tmp/r5q3
while [ ! -f /tmp/r5q2/chip_free ]; do sleep 20; done

echo "=== [$(date +%T)] mp_unicycle_2stage_s0 stage A (14k @ pi/4 w=2) ==="
SKIP_EVAL=1 bash tools/train_eval.sh mp_unicycle_2stage_s0 \
  configs/icra_benchmark/mp_unicycle.py --rl_train_episodes 14000 \
  --evaluation_interval 250 --randomseed 0

echo "=== [$(date +%T)] mp_unicycle_2stage_s0 stage B (6k anneal) ==="
SKIP_EVAL=1 bash tools/train_eval.sh mp_unicycle_2stage_s0 \
  configs/icra_benchmark/mp_unicycle_anneal.py --resume --randomseed 0

touch /tmp/r5q3/chip_free
SKIP_TRAIN=1 bash tools/train_eval.sh mp_unicycle_2stage_s0 \
  configs/icra_benchmark/mp_unicycle_anneal.py
touch /tmp/r5q3/all_done
echo "=== [$(date +%T)] queue3 DONE ==="

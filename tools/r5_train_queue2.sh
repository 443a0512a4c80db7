#!/bin/bash
# r5 queue 2 — robustness evidence:
#  1. mp_default_s5: 7th sample of the shipped default recipe (seed 5).
#  2. mp_unicycle_2stage: the anneal recipe FROM SCRATCH (no reuse of the
#     committed checkpoint): stage A = 14k episodes at pi/4 w=2
#     (mp_unicycle.py), stage B = resume with the anneal config (pi/3 w=8,
#     6k episodes, eps pinned) -> 20k total, then eval at its own config.
set -u
cd /root/repo
mkdir -p /tmp/r5q2

echo "=== [$(date +%T)] mp_default_s5 train ==="
SKIP_EVAL=1 bash tools/train_eval.sh mp_default_s5 \
  configs/icra_benchmark/mp_separate.py --randomseed 5

echo "=== [$(date +%T)] mp_unicycle_2stage stage A (14k @ pi/4 w=2) ==="
SKIP_EVAL=1 bash tools/train_eval.sh mp_unicycle_2stage \
  configs/icra_benchmark/mp_unicycle.py --rl_train_episodes 14000 \
  --evaluation_interval 250 --randomseed 1

echo "=== [$(date +%T)] mp_unicycle_2stage stage B (6k anneal) ==="
SKIP_EVAL=1 bash tools/train_eval.sh mp_unicycle_2stage \
  configs/icra_benchmark/mp_unicycle_anneal.py --resume --randomseed 1

touch /tmp/r5q2/chip_free
echo "=== [$(date +%T)] chip free; CPU evals ==="
SKIP_TRAIN=1 EVAL_WIDTHS="default 4" bash tools/train_eval.sh mp_default_s5 \
  configs/icra_benchmark/mp_separate.py
SKIP_TRAIN=1 bash tools/train_eval.sh mp_unicycle_2stage \
  configs/icra_benchmark/mp_unicycle_anneal.py
touch /tmp/r5q2/all_done
echo "=== [$(date +%T)] queue2 DONE ==="

#!/bin/bash
# r5 training queue (serial: one chip). Two runs from VERDICT r4 items 5/6:
#  1. mp_default_r5  — the NEW default mp_separate recipe (cadence 250 +
#     lr 5e-4 + val 200 baked into the config), fresh seed 4: confirms the
#     default-config retrain lands in the 0.979±0.005 band (done-bar >=0.97).
#  2. mp_unicycle_anneal — stage-2 anneal fine-tune (pi/4 w=2 checkpoint ->
#     pi/3 w=8 action space, 6k episodes, eps pinned 0.1); evaluated at its
#     OWN config (no eval-time re-shaping).
# Chip frees after step 2; 500-case evals run on CPU afterwards.
set -u
cd /root/repo
mkdir -p /tmp/r5q

echo "=== [$(date +%T)] step 1: mp_default_r5 train ==="
SKIP_EVAL=1 bash tools/train_eval.sh mp_default_r5 \
  configs/icra_benchmark/mp_separate.py --randomseed 4

echo "=== [$(date +%T)] step 2: mp_unicycle_anneal train ==="
mkdir -p data/mp_unicycle_anneal
rm -rf data/mp_unicycle_anneal/rl_model
cp -r results/mp_unicycle/rl_model_best data/mp_unicycle_anneal/rl_model
SKIP_EVAL=1 bash tools/train_eval.sh mp_unicycle_anneal \
  configs/icra_benchmark/mp_unicycle_anneal.py --resume

touch /tmp/r5q/chip_free
echo "=== [$(date +%T)] chip free; CPU evals ==="

SKIP_TRAIN=1 EVAL_WIDTHS="default 4" bash tools/train_eval.sh mp_default_r5 \
  configs/icra_benchmark/mp_separate.py
SKIP_TRAIN=1 bash tools/train_eval.sh mp_unicycle_anneal \
  configs/icra_benchmark/mp_unicycle_anneal.py

touch /tmp/r5q/all_done
echo "=== [$(date +%T)] r5 queue DONE ==="

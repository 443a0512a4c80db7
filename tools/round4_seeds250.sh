#!/bin/bash
# Seed-robustness, part 2: the DENSE-SELECTION band recipe (mp_w4 + RL lr
# 5e-4 + eval cadence 250 — results/mprl_band's exact recipe, committed
# seed 3 = 0.984) on seeds 0/1/2. Hypothesis from part 1: cadence-500
# selection is what makes seeds swing (s1 0.918 / s2 0.960); the 250
# cadence's committed runs all sit >= 0.98. Waits for PID $1 (chip probe).
set -u
cd /root/repo
WAIT_PID=${1:-0}
if [ "$WAIT_PID" != "0" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 15; done
fi
ARGS="--rl_learning_rate 5e-4 --evaluation_interval 250"
for SEED in 0 1 2; do
  SKIP_EVAL=1 bash tools/train_eval.sh "mprl_b250_s$SEED" \
    configs/icra_benchmark/mp_w4.py $ARGS --randomseed "$SEED"
done
echo "=== [$(date +%T)] 250-CADENCE TRAININGS DONE — chip free ==="
touch /tmp/round4_seeds250_chip_free
for SEED in 0 1 2; do
  SKIP_TRAIN=1 EVAL_WIDTHS="default" bash tools/train_eval.sh \
    "mprl_b250_s$SEED" configs/icra_benchmark/mp_w4.py
done
echo "=== [$(date +%T)] ROUND4 SEEDS-250 QUEUE DONE ==="

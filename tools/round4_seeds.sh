#!/bin/bash
# Round-4 seed-robustness queue (VERDICT r3 next-round #4): the headline
# band config (mp_separate + RL lr 5e-4, eval w=4 — the 0.992/10.92 row's
# recipe, seed 0) re-run on seeds 1/2/3. Phase 1 runs the three trainings
# serially on the chip; phase 2 batches the six 500-case evals on CPU, so
# the chip frees up the moment training ends (kernel sweeps need it).
set -u
cd /root/repo
ARGS="--rl_learning_rate 5e-4 --evaluation_interval 500"
for SEED in 1 2 3; do
  SKIP_EVAL=1 bash tools/train_eval.sh "mprl_band_s$SEED" \
    configs/icra_benchmark/mp_separate.py $ARGS --randomseed "$SEED"
done
echo "=== [$(date +%T)] ALL TRAININGS DONE — chip free ==="
touch /tmp/round4_seeds_chip_free
for SEED in 1 2 3; do
  SKIP_TRAIN=1 EVAL_WIDTHS="default 4" bash tools/train_eval.sh \
    "mprl_band_s$SEED" configs/icra_benchmark/mp_separate.py
done
echo "=== [$(date +%T)] ROUND4 SEEDS QUEUE DONE ==="

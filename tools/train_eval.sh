#!/bin/bash
# Parameterized train(chip)+eval(cpu) pipeline step — replaces the r3
# one-shot round3_chip_pipeline*.sh family (VERDICT r3 weak #7).
#
# Usage: train_eval.sh NAME CONFIG [extra cli.train args...]
#   Trains into data/NAME on the chip, then runs the 500-case test eval on
#   CPU (metrics are device-independent; chip stays free). Extra args go to
#   cli.train verbatim (seed, lr, eval cadence — provenance lands in the
#   output dir's config.py + train log + eval record).
# Env: EVAL_WIDTHS="default 4" selects planner widths to evaluate
#      (default: "default"); WAIT_PID=<pid> serializes behind another step;
#      SKIP_EVAL=1 train only / SKIP_TRAIN=1 eval only — lets a queue run
#      all chip trainings first and batch the CPU evals after, so the chip
#      frees up as early as possible.
set -u
cd /root/repo
unset _AXON_REGISTERED AXON_COMPAT_VERSION AXON_POOL_SVC_OVERRIDE \
      TPU_ACCELERATOR_TYPE TPU_LIBRARY_PATH TPU_TOPOLOGY TPU_WORKER_HOSTNAMES

NAME=$1; CONFIG=$2; shift 2
WAIT_PID=${WAIT_PID:-0}
if [ "$WAIT_PID" != "0" ]; then
  echo "=== [$(date +%T)] $NAME waiting for PID $WAIT_PID ==="
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi

mkdir -p "data/$NAME"
if [ "${SKIP_TRAIN:-0}" != "1" ]; then
  echo "=== [$(date +%T)] $NAME train (chip): $CONFIG $* ==="
  timeout 7200 python -m relationalgraphlearning_tpu.cli.train --overwrite \
    --val_size 200 --policy model_predictive_rl --config "$CONFIG" \
    --output_dir "data/$NAME" "$@" > "data/$NAME/reproduce.log" 2>&1
  echo "$NAME train rc=$?"
fi
[ "${SKIP_EVAL:-0}" = "1" ] && { echo "=== $NAME train-only DONE ==="; exit 0; }

for W in ${EVAL_WIDTHS:-default}; do
  WARG=""
  [ "$W" != "default" ] && WARG="--planning_width $W"
  echo "=== [$(date +%T)] $NAME eval w=$W (cpu) ==="
  timeout 5400 python -m relationalgraphlearning_tpu.cli.test --platform cpu \
    --phase test --policy model_predictive_rl --model_dir "data/$NAME" \
    $WARG >> "data/$NAME/reproduce.log" 2>&1
  echo "$NAME eval w=$W rc=$?"
done
echo "=== [$(date +%T)] $NAME DONE ==="

#!/bin/bash
# Round-3 chip queue: full quality table (fresh trains, current code),
# ORCA baseline sweep, planner ablations. Everything serializes on the
# single chip. Logs to data/round3_queue.log.
set -u
cd /root/repo
mkdir -p data
# Scrub axon registration leftovers inherited from any parent that already
# imported jax — children must re-register or big remote compiles hang
# (see reproduce_quality._clean_env).
unset _AXON_REGISTERED AXON_COMPAT_VERSION AXON_POOL_SVC_OVERRIDE \
      TPU_ACCELERATOR_TYPE TPU_LIBRARY_PATH TPU_TOPOLOGY TPU_WORKER_HOSTNAMES

echo "=== [$(date +%T)] full quality table (9 runs) ==="
bash tools/final_quality.sh

# (ORCA baseline row + parameter sweep already produced on CPU —
#  data/orca/eval_test*.json; the row is device-independent)

echo "=== [$(date +%T)] planner ablation on the best mprl checkpoint ==="
BEST=data/mprl
if [ -f data/mp_w4/eval_test.json ]; then
  # pick the higher-success of mprl / mp_w4 for the ablation
  S1=$(python -c "import json;print(json.load(open('data/mprl/eval_test.json'))['success_rate'])" 2>/dev/null || echo 0)
  S2=$(python -c "import json;print(json.load(open('data/mp_w4/eval_test.json'))['success_rate'])" 2>/dev/null || echo 0)
  BEST=$(python -c "print('data/mp_w4' if $S2 > $S1 else 'data/mprl')")
fi
echo "ablation checkpoint: $BEST"
python -m relationalgraphlearning_tpu.cli.test --policy model_predictive_rl \
  --model_dir "$BEST" --phase test --planning_depth 1 \
  >> "$BEST/ablation.log" 2>&1
python -m relationalgraphlearning_tpu.cli.test --policy model_predictive_rl \
  --model_dir "$BEST" --phase test --planning_depth 2 --planning_width 4 \
  >> "$BEST/ablation.log" 2>&1
python -m relationalgraphlearning_tpu.cli.test --policy model_predictive_rl \
  --model_dir "$BEST" --phase test --planning_depth 3 --planning_width 2 \
  >> "$BEST/ablation.log" 2>&1

# persist the sweep + ablation records
for d in orca mprl mp_w4; do
  [ -d "data/$d" ] || continue
  mkdir -p "results/$d"
  cp -f data/$d/eval_test*.json "results/$d/" 2>/dev/null
done
cp -f data/quality_table.md data/quality_table.json results/ 2>/dev/null
echo "=== [$(date +%T)] ROUND3 QUEUE DONE ==="

#!/bin/bash
# Test-time planner re-shaping sweep on a trained MP-RGL checkpoint
# (value/dynamics nets are depth/width agnostic — parity with the
# reference's planning_depth/width test sweeps).
set -u
cd /root/repo
MODEL=${1:-data/mprl_td}
for args in "--planning_depth 1" "--planning_width 4" \
            "--planning_depth 3" "--planning_depth 3 --planning_width 4" \
            "--sparse_search --planning_width 4"; do
  echo "=== $MODEL $args ==="
  timeout 2400 python -m relationalgraphlearning_tpu.cli.test \
    --policy model_predictive_rl --model_dir "$MODEL" --phase test $args \
    2>&1 | tail -1
done
echo PLANNER SWEEP DONE

#!/bin/bash
# Unicycle lever evals (VERDICT r3 #5, after diagnosis): the committed
# mp_unicycle checkpoint re-evaluated under looser test-time rotation
# constraints — the planner scores next states, so the action space
# re-shapes at eval like depth/width. CPU; waits for the seed queue.
set -u
cd /root/repo
WAIT_PID=${1:-0}
if [ "$WAIT_PID" != "0" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi
E="python -m relationalgraphlearning_tpu.cli.test --platform cpu --phase test --policy model_predictive_rl --model_dir results/mp_unicycle"
for RC in 1.0472 1.5708; do
  echo "=== [$(date +%T)] unicycle eval rc=$RC ==="
  timeout 5400 $E --rotation_constraint "$RC" \
    >> results/mp_unicycle/rc_sweep.log 2>&1
  echo "rc=$RC done ($?)"
done
echo "=== [$(date +%T)] UNICYCLE EVALS DONE ==="

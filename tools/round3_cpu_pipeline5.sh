#!/bin/bash
# CPU follow-on: waits for the round-3 CPU training queue (PID $1), then
# re-emits the committed r2 headline eval records IN PLACE with the r3
# self-describing format (checkpoint actually loaded, git sha, planner
# overrides) — VERDICT r2 weak #6 / item 7.
set -u
cd /root/repo
unset _AXON_REGISTERED AXON_COMPAT_VERSION AXON_POOL_SVC_OVERRIDE \
      TPU_ACCELERATOR_TYPE TPU_LIBRARY_PATH TPU_TOPOLOGY TPU_WORKER_HOSTNAMES

WAIT_PID=${1:-0}
if [ "$WAIT_PID" != "0" ]; then
  echo "=== [$(date +%T)] waiting for cpu queue (PID $WAIT_PID) ==="
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

E="python -m relationalgraphlearning_tpu.cli.test --platform cpu --phase test"

echo "=== [$(date +%T)] re-emit results/mprl_td ==="
timeout 5400 $E --policy model_predictive_rl --model_dir results/mprl_td \
  > /tmp/reemit_mprl_td.log 2>&1
echo "rc=$?"
echo "=== [$(date +%T)] re-emit results/mprl_td d=1 ablation ==="
timeout 5400 $E --policy model_predictive_rl --model_dir results/mprl_td \
  --planning_depth 1 >> /tmp/reemit_mprl_td.log 2>&1
echo "rc=$?"
echo "=== [$(date +%T)] re-emit results/mprl_td d=2 w=4 ablation ==="
timeout 5400 $E --policy model_predictive_rl --model_dir results/mprl_td \
  --planning_depth 2 --planning_width 4 >> /tmp/reemit_mprl_td.log 2>&1
echo "rc=$?"
echo "=== [$(date +%T)] re-emit results/rgl ==="
timeout 5400 $E --policy rgl --model_dir results/rgl \
  > /tmp/reemit_rgl.log 2>&1
echo "rc=$?"
echo "=== [$(date +%T)] re-emit results/orca ==="
timeout 5400 $E --policy orca --model_dir results/orca \
  > /tmp/reemit_orca.log 2>&1
echo "rc=$?"
echo "=== [$(date +%T)] CPU PIPELINE 5 DONE ==="

#!/bin/bash
# Regenerate the FULL quality table (every RUNS row) and persist eval
# records + best checkpoints under results/ (data/ is gitignored).
# No --only: a partial invocation must never define the committed table.
set -u
cd /root/repo
python reproduce_quality.py --skip_existing "$@"
mkdir -p results
cp -f data/quality_table.md data/quality_table.json results/ 2>/dev/null
for d in data/*/; do
  n=$(basename "$d")
  [ -f "$d/eval_test.json" ] || continue
  mkdir -p "results/$n"
  cp -f "$d"/eval_test*.json "results/$n/" 2>/dev/null
  [ -d "$d/rl_model_best" ] && cp -rf "$d/rl_model_best" "results/$n/"
  [ -f "$d/output.log" ] && cp -f "$d/output.log" "results/$n/train_output.log"
  [ -f "$d/config.py" ] && cp -f "$d/config.py" "results/$n/"
done
echo FINAL QUALITY DONE

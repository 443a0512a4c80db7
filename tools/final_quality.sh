#!/bin/bash
set -u
cd /root/repo
# wait for any in-flight sweep to release the chip
while pgrep -f "cli\.t" >/dev/null 2>&1; do sleep 20; done
python reproduce_quality.py --skip_existing \
  --only mprl,rgl,sarl,lstm_rl,cadrl,orca,mp_unicycle,sarl_om
# persist results + best checkpoints into the repo (data/ is gitignored)
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

#!/bin/bash
# Serial round-3 chip pipeline. ONE process owns the chip at a time; order is
# by verdict priority: (1) roofline ceilings + honest edges/s (VERDICT r2
# item 1), (2) bench_extra reconciliation numbers, (3) the two MPRL trainings
# (mp_w4 quality-band attempt, mp_unicycle ActionRot row). Evals run on CPU
# elsewhere. Every stage is wrapped in `timeout` so a hung remote compile
# cannot eat the whole session.
set -u
cd /root/repo
unset _AXON_REGISTERED AXON_COMPAT_VERSION AXON_POOL_SVC_OVERRIDE \
      TPU_ACCELERATOR_TYPE TPU_LIBRARY_PATH TPU_TOPOLOGY TPU_WORKER_HOSTNAMES
mkdir -p data

echo "=== [$(date +%T)] roofline ==="
timeout 9000 python bench_roofline.py > data/roofline.log 2>&1
echo "roofline rc=$?"

echo "=== [$(date +%T)] bench_extra ==="
timeout 5400 python bench_extra.py > data/bench_extra.log 2>&1
echo "bench_extra rc=$?"

T="python -m relationalgraphlearning_tpu.cli.train --overwrite --evaluation_interval 500 --val_size 200 --randomseed 0"
for spec in "mp_w4 configs/icra_benchmark/mp_w4.py" \
            "mp_unicycle configs/icra_benchmark/mp_unicycle.py"; do
  set -- $spec; name=$1; config=$2
  mkdir -p "data/$name"
  echo "=== [$(date +%T)] $name: train (chip) ==="
  timeout 7200 $T --policy model_predictive_rl --config "$config" \
    --output_dir "data/$name" > "data/$name/reproduce.log" 2>&1
  echo "$name train rc=$?"
done

echo "=== [$(date +%T)] CHIP PIPELINE DONE ==="

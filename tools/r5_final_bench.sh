#!/bin/bash
# r5 final measurement pipeline (serial; chip then CPU).
set -u
cd /root/repo
unset _AXON_REGISTERED AXON_COMPAT_VERSION AXON_POOL_SVC_OVERRIDE \
      TPU_ACCELERATOR_TYPE TPU_LIBRARY_PATH TPU_TOPOLOGY TPU_WORKER_HOSTNAMES
mkdir -p docs/sweeps /tmp/r5fb

echo "=== [$(date +%T)] ab_kernel canonical ==="
timeout 900 python tools/ab_kernel.py --rounds 9 \
  > docs/sweeps/ab_kernel_r5_final.log 2>/dev/null
echo "ab rc=$?"

echo "=== [$(date +%T)] roofline ==="
timeout 1800 python bench_roofline.py > docs/sweeps/roofline_r5.log 2>/dev/null
echo "roofline rc=$?"

echo "=== [$(date +%T)] bench.py ==="
timeout 1800 python bench.py > docs/sweeps/bench_main_r5.log 2>/dev/null
echo "bench rc=$?"

echo "=== [$(date +%T)] bench_extra ==="
timeout 3600 python bench_extra.py > docs/sweeps/bench_extra_r5.log 2>/dev/null
echo "bench_extra rc=$?"

echo "=== [$(date +%T)] bench_scaling --mega (CPU mesh) ==="
timeout 1800 python bench_scaling.py --mega \
  > docs/sweeps/bench_scaling_mega_r5.log 2>/dev/null
echo "scaling rc=$?"

touch /tmp/r5fb/done
echo "=== [$(date +%T)] FINAL BENCH DONE ==="

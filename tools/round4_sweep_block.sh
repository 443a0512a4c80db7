#!/bin/bash
# Runs the block-path configuration sweep on the chip as soon as the seed
# trainings release it (round4_seeds.sh touches the marker file).
set -u
cd /root/repo
unset _AXON_REGISTERED AXON_COMPAT_VERSION AXON_POOL_SVC_OVERRIDE \
      TPU_ACCELERATOR_TYPE TPU_LIBRARY_PATH TPU_TOPOLOGY TPU_WORKER_HOSTNAMES
echo "=== [$(date +%T)] waiting for chip (marker) ==="
while [ ! -f /tmp/round4_seeds_chip_free ]; do sleep 15; done
echo "=== [$(date +%T)] chip free — sweep ==="
timeout 7200 python tools/sweep_block.py
echo "=== [$(date +%T)] SWEEP DONE rc=$? ==="

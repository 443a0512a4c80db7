#!/bin/bash
# Final r4 block sweep (epilogue + unshifted softmax + aligned variants)
# after the unicycle rc3 train releases the chip. NOTE: waits on the TRAIN
# process specifically — the rc3 pipeline's CPU eval phase doesn't hold
# the chip.
set -u
cd /root/repo
unset _AXON_REGISTERED AXON_COMPAT_VERSION AXON_POOL_SVC_OVERRIDE \
      TPU_ACCELERATOR_TYPE TPU_LIBRARY_PATH TPU_TOPOLOGY TPU_WORKER_HOSTNAMES
while pgrep -f "cli.train.*mp_unicycle_rc3" > /dev/null; do sleep 20; done
echo "=== [$(date +%T)] chip free — final sweep ==="
timeout 7200 python tools/sweep_block.py
echo "=== [$(date +%T)] FINAL SWEEP DONE rc=$? ==="

#!/bin/bash
# Gather microbench + quiet-host chain probe, after the 250-cadence queue
# frees the chip.
set -u
cd /root/repo
unset _AXON_REGISTERED AXON_COMPAT_VERSION AXON_POOL_SVC_OVERRIDE \
      TPU_ACCELERATOR_TYPE TPU_LIBRARY_PATH TPU_TOPOLOGY TPU_WORKER_HOSTNAMES
while [ ! -f /tmp/round4_seeds250_chip_free ]; do sleep 15; done
echo "=== [$(date +%T)] chip free — gather probe ==="
timeout 3000 python tools/probe_gather.py
echo "=== [$(date +%T)] PROBE GATHER DONE rc=$? ==="

#!/bin/bash
# Canonical test-suite invocation (VERDICT r3 #7: fresh full run < 400 s).
# Uses pytest-xdist over both vCPUs; the persistent XLA:CPU compile cache
# (tests/conftest.py, /tmp/rgl_tpu_test_xla_cache) makes repeat runs
# compile-free. Plain `python -m pytest tests/ -x -q` still works without
# xdist — -n lives here, not in addopts, on purpose.
set -u
cd /root/repo
exec python -m pytest tests/ -q -n "${PYTEST_WORKERS:-2}" "$@"

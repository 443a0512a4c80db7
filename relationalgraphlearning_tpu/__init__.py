"""relationalgraphlearning_tpu — a TPU-native relational graph learning framework.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the reference
repo ChanganVR/RelationalGraphLearning (IROS 2020, arXiv:1909.13165): relational
graph networks over agent graphs (relation-inference SDDMM + GCN SpMM), value
estimation, trajectory prediction, d-step model-predictive rollout, a crowd
navigation environment (CrowdSim) with ORCA / social-force humans, and an
imitation + RL training pipeline.

Unlike the reference (single-process CPU PyTorch, Python episode loop,
recursive planner), everything here is built TPU-first:

- the environment is a pure-functional, fixed-shape JAX program, vmapped over
  thousands of instances and stepped inside ``lax.scan``;
- the d-step planning tree is a batched level-wise tensor program (no
  recursion);
- relation inference / message passing are dense batched matmuls for small
  crowds and edge-partitioned Pallas SDDMM/SpMM kernels for pod-scale crowds;
- multi-chip scaling uses ``jax.sharding`` meshes + ``shard_map`` with XLA
  collectives over ICI.

Reference parity anchors cite the upstream repo layout documented in
``SURVEY.md`` (the reference mount was empty; SURVEY.md is the spec of record).
"""

from relationalgraphlearning_tpu import types, geometry

__version__ = "0.1.0"

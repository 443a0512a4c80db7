"""Headline benchmark: crowd-sim env throughput (env-steps/s).

Baseline protocol (BASELINE.md): the reference repo publishes no perf
numbers and its mount is empty, so the CPU baseline is measured here as a
faithful re-spec of the reference's execution architecture — ONE env,
per-step Python dispatch (SURVEY.md §3.2: Python while-loop around
env.step + centralized ORCA humans). The TPU number is the same simulation
semantics run the TPU-native way: auto-resetting vmapped env batch stepped
inside one jitted lax.scan rollout on a single chip.

Prints ONE JSON line:
  {"metric": "env-steps/s", "value": <tpu>, "unit": "steps/s",
   "vs_baseline": <tpu / cpu_python_loop>}
"""

import json
import time

import jax
import jax.numpy as jnp

from relationalgraphlearning_tpu.utils import compile_cache
from relationalgraphlearning_tpu.utils.sync import force

compile_cache.enable()


def cpu_baseline_steps_per_s(seconds: float = 3.0) -> float:
    """Single env, per-step host dispatch, CPU backend (reference-style)."""
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        from relationalgraphlearning_tpu.configs.base import EnvConfig
        from relationalgraphlearning_tpu.envs.crowd_sim import CrowdSim
        from relationalgraphlearning_tpu.envs.scenarios import case_key
        from relationalgraphlearning_tpu import types as T

        cfg = EnvConfig(human_policy="orca")
        env = CrowdSim(cfg)
        step = jax.jit(env.step)
        reset = jax.jit(env.reset)

        def act(state):
            to_goal = T.goal(state.robot) - T.position(state.robot)
            d = jnp.linalg.norm(to_goal)
            return jnp.where(d > 1e-6, to_goal / jnp.maximum(d, 1e-9), 0.0)

        state, _ = reset(case_key(0, 0, jnp.asarray(0)))
        out = step(state, act(state))  # compile
        jax.block_until_ready(out.reward)

        n, case = 0, 1
        t0 = time.perf_counter()
        while time.perf_counter() - t0 < seconds:
            out = step(state, act(state))
            state = out.state
            n += 1
            if bool(out.done):
                state, _ = reset(case_key(0, 0, jnp.asarray(case)))
                case += 1
        return n / (time.perf_counter() - t0)


def tpu_steps_per_s(batch: int = 1024, horizon: int = 128,
                    repeats: int = 10, trials: int = 5) -> float:
    """Auto-reset collector: every step is a live env step.

    Median of ``trials`` timed trials (each ``repeats`` back-to-back
    dispatches) so one noisy tunnel round-trip can't skew the headline;
    ``repeats`` amortizes the ~20 ms fetch RTT each trial pays once
    (r4: repeats=3 understated ~50 ms programs by ~13%).
    """
    import statistics

    from relationalgraphlearning_tpu.configs.base import EnvConfig, PolicyConfig
    from relationalgraphlearning_tpu.envs.crowd_sim import CrowdSim
    from relationalgraphlearning_tpu.policies import make_policy
    from relationalgraphlearning_tpu.training.explorer import Explorer

    cfg = EnvConfig(human_policy="orca")
    env = CrowdSim(cfg)
    policy = make_policy("linear", PolicyConfig(), cfg)
    ex = Explorer(env, policy, 0.9)

    collect = jax.jit(
        lambda c: ex.collect(None, c, horizon, jnp.asarray(0.0), 0))
    carry = ex.init_carry(batch, 0, jax.random.PRNGKey(0))
    carry, traj = collect(carry)  # compile + warm
    force(traj.reward)  # block_until_ready lies on the tunnel — fetch

    rates = []
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(repeats):
            carry, traj = collect(carry)  # carry chains: data-dependent
        force(traj.reward)
        rates.append(batch * horizon * repeats / (time.perf_counter() - t0))
    return statistics.median(rates)


def main():
    batch, horizon = 1024, 128
    cpu = cpu_baseline_steps_per_s()
    tpu = tpu_steps_per_s(batch, horizon)

    # secondary metrics (PERF.md's richer numbers, folded into the one JSON
    # line so the driver's single-line contract captures them too)
    import bench_extra

    decisions, latency = bench_extra.planning_throughput()
    edges = bench_extra.edges_throughput()
    edges_block, block_cov = bench_extra.edges_throughput_block()
    edges_block_xla, _ = bench_extra.edges_throughput_block(backend="xla")
    print(json.dumps({
        "metric": "env-steps/s",
        "value": round(tpu, 1),
        "unit": "steps/s",
        "vs_baseline": round(tpu / cpu, 2),
        "baseline_cpu_python_loop": round(cpu, 1),
        "batch": batch,
        "horizon": horizon,
        "trials": "median of 5",
        "device": str(jax.devices()[0]),
        "extra": {
            "planning_decisions_per_s_d2": round(decisions, 1),
            "planning_latency_ms": round(latency * 1e3, 3),
            "relation_gedges_per_s": round(edges / 1e9, 2),
            "relation_gedges_per_s_block": round(edges_block / 1e9, 2),
            "relation_gedges_per_s_block_xla": round(
                edges_block_xla / 1e9, 2),
            "block_coverage": block_cov,
        },
    }))


if __name__ == "__main__":
    main()

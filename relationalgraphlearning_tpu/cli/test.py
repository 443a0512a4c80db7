"""Evaluation CLI.

Reference parity: ``crowd_nav/test.py`` (SURVEY.md §2.4, §3.5) — loads
config + weights from ``--model_dir``; ``--phase test`` runs the seeded
test-case set through the Explorer and logs aggregate metrics
(success/collision/nav time/reward/danger); ``--visualize --test_case k``
renders one episode (``--traj`` static plot or ``--video_file``); ``--il``
evaluates the imitation snapshot; ``--human_num`` / ``--safety_space``
overrides.

Usage:
    python -m relationalgraphlearning_tpu.cli.test --model_dir data/output \
        [--phase test|val] [--visualize --test_case 0 --traj out.png]
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import os
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description="Evaluate a trained policy")
    p.add_argument("--policy", default="model_predictive_rl")
    p.add_argument("--model_dir", required=True)
    p.add_argument("--il", action="store_true", help="evaluate the IL snapshot")
    p.add_argument("--checkpoint", default=None,
                   choices=[None, "il", "best", "final"],
                   help="which snapshot to evaluate (default: best if "
                        "present, else final rl_model)")
    p.add_argument("--phase", default="test", choices=["val", "test"])
    p.add_argument("--test_size", type=int, default=None)
    p.add_argument("--human_num", type=int, default=None)
    p.add_argument("--safety_space", type=float, default=None,
                   help="ORCA robot-policy safety space override (parity: "
                        "test.py --safety_space; only for --policy orca)")
    p.add_argument("--orca_time_horizon", type=float, default=None,
                   help="ORCA ROBOT-policy time horizon override (baseline "
                        "sweep; humans keep the env's horizon)")
    # test-time planner overrides (the value/dynamics nets are depth/width
    # agnostic, so the planning tree can be re-shaped at evaluation — parity
    # with the reference's planning_depth/planning_width test sweeps)
    p.add_argument("--planning_depth", type=int, default=None)
    p.add_argument("--planning_width", type=int, default=None)
    p.add_argument("--sparse_search", action="store_true", default=None)
    p.add_argument("--rotation_constraint", type=float, default=None,
                   help="unicycle max |dθ| per step override — the planner "
                        "scores NEXT STATES, so the action space re-shapes "
                        "at test time like depth/width (diagnosis: 68%% of "
                        "unicycle collisions were turn-saturated)")
    p.add_argument("--rotation_samples", type=int, default=None)
    p.add_argument("--visualize", action="store_true")
    p.add_argument("--test_case", type=int, default=0)
    p.add_argument("--traj", default=None, help="save trajectory plot to PNG")
    p.add_argument("--video_file", default=None, help="save episode video")
    p.add_argument("--platform", default=None, choices=[None, "cpu", "axon"])
    args = p.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from relationalgraphlearning_tpu.utils import compile_cache

    compile_cache.enable()

    logging.basicConfig(level=logging.INFO, stream=sys.stdout,
                        format="%(asctime)s, %(levelname)s: %(message)s",
                        datefmt="%Y-%m-%d %H:%M:%S")
    for noisy in ("orbax", "absl", "jax", "etils"):
        logging.getLogger(noisy).setLevel(logging.WARNING)

    import jax
    import jax.numpy as jnp

    from relationalgraphlearning_tpu.configs.base import Config, load_config_module
    from relationalgraphlearning_tpu.training import checkpoint as ckpt
    from relationalgraphlearning_tpu.training.train_loop import build
    from relationalgraphlearning_tpu.training.trainer import TrainState

    cfg_path = os.path.join(args.model_dir, "config.py")
    config = load_config_module(cfg_path) if os.path.exists(cfg_path) else Config()
    if args.human_num is not None:
        config = dataclasses.replace(
            config, env=dataclasses.replace(
                config.env, sim=dataclasses.replace(
                    config.env.sim, human_num=args.human_num)))
    mprl_over = {k: v for k, v in (
        ("planning_depth", args.planning_depth),
        ("planning_width", args.planning_width),
        ("sparse_search", args.sparse_search)) if v is not None}
    if mprl_over:
        config = dataclasses.replace(
            config, policy=dataclasses.replace(
                config.policy, mprl=dataclasses.replace(
                    config.policy.mprl, **mprl_over)))
    aspace_over = {k: v for k, v in (
        ("rotation_constraint", args.rotation_constraint),
        ("rotation_samples", args.rotation_samples)) if v is not None}
    if aspace_over:
        config = dataclasses.replace(
            config, policy=dataclasses.replace(
                config.policy, action_space=dataclasses.replace(
                    config.policy.action_space, **aspace_over)))
        mprl_over.update(aspace_over)  # recorded with planner overrides

    policy_kwargs = {}
    if args.safety_space is not None:
        if args.policy != "orca":
            p.error("--safety_space only applies to --policy orca")
        policy_kwargs["safety_space"] = args.safety_space
    if args.orca_time_horizon is not None:
        if args.policy != "orca":
            p.error("--orca_time_horizon only applies to --policy orca")
        policy_kwargs["time_horizon"] = args.orca_time_horizon
    art = build(config, args.policy, policy_kwargs=policy_kwargs)
    params = art.policy.init_params(jax.random.PRNGKey(0))
    if args.il or args.checkpoint == "il":
        # il_model carries the IL optimizer's state (SGD momentum trace) —
        # the restore template must be built with the same optimizer
        art.trainer.set_learning_rate(config.train.il_learning_rate,
                                      config.train.il_optimizer)
    state = art.trainer.init(params)
    if args.il or args.checkpoint == "il":
        name = "il_model"
    elif args.checkpoint == "final":
        name = "rl_model"
    elif args.checkpoint == "best" or ckpt.exists(
            os.path.join(args.model_dir, "rl_model_best")):
        name = "rl_model_best"  # best-on-val snapshot when available
    else:
        name = "rl_model"
    path = os.path.join(args.model_dir, name)
    trainable = getattr(art.policy, "trainable", False)
    if ckpt.exists(path):
        state = ckpt.restore(path, state)
        checkpoint_loaded = name
        logging.info("loaded %s", path)
    elif not trainable:
        checkpoint_loaded = "none (untrained policy)"
    else:
        checkpoint_loaded = "none (RANDOM INIT — no checkpoint found)"
        logging.warning("no checkpoint at %s — evaluating random init", path)

    sim = config.env.sim
    offset = sim.test_seed_offset if args.phase == "test" else sim.val_seed_offset
    size = args.test_size or (
        sim.test_size if args.phase == "test" else sim.val_size)

    if args.visualize:
        from relationalgraphlearning_tpu.utils.render import rollout_trajectory, render_traj, render_video

        traj = rollout_trajectory(
            art.env, art.policy, state.params, offset, args.test_case)
        logging.info("case %d: outcome=%s nav_time=%.2fs return=%.4f",
                     args.test_case, traj.outcome_name, traj.nav_time,
                     traj.cumulative_reward)
        if args.traj:
            render_traj(traj, args.traj)
            logging.info("wrote %s", args.traj)
        if args.video_file:
            render_video(traj, args.video_file)
            logging.info("wrote %s", args.video_file)
        return

    ev = jax.jit(lambda p, k, idx: art.explorer.run_cases(p, offset, idx, k))(
        state.params, jax.random.PRNGKey(1), jnp.arange(size))
    logging.info(
        "%s phase (%d cases): success %.3f, collision %.3f, timeout %.3f, "
        "nav time %.2fs, total reward %.4f, danger freq %.4f, "
        "avg min separation in danger %.3f",
        args.phase, size, float(ev.success_rate), float(ev.collision_rate),
        float(ev.timeout_rate), float(ev.avg_nav_time), float(ev.avg_return),
        float(ev.danger_frequency), float(ev.avg_min_dist))
    # machine-readable record for reproduce_quality.py and audits
    import json

    def _git_sha():
        import subprocess

        try:
            return subprocess.check_output(
                ["git", "rev-parse", "--short", "HEAD"],
                cwd=os.path.dirname(os.path.abspath(__file__)),
                stderr=subprocess.DEVNULL).decode().strip()
        except Exception:
            return None

    record = {
        "policy": args.policy, "phase": args.phase, "cases": size,
        "checkpoint": checkpoint_loaded,
        "human_num": sim.human_num,
        "robot_kinematics": config.env.robot_kinematics,
        "git_sha": _git_sha(),
        "success_rate": float(ev.success_rate),
        "collision_rate": float(ev.collision_rate),
        "timeout_rate": float(ev.timeout_rate),
        "nav_time": float(ev.avg_nav_time),
        "return": float(ev.avg_return),
        "danger_frequency": float(ev.danger_frequency),
        "avg_min_dist": float(ev.avg_min_dist),
    }
    if mprl_over:
        record["planner_overrides"] = mprl_over
    if args.safety_space is not None:
        record["safety_space"] = args.safety_space
    if args.orca_time_horizon is not None:
        record["orca_time_horizon"] = args.orca_time_horizon
    suffix = ""
    if args.planning_depth is not None:
        suffix += f"_d{args.planning_depth}"
    if args.planning_width is not None:
        suffix += f"_w{args.planning_width}"
    if args.sparse_search:
        suffix += "_sparse"
    if args.rotation_constraint is not None:
        suffix += f"_rc{args.rotation_constraint:g}"
    if args.rotation_samples is not None:
        suffix += f"_rs{args.rotation_samples}"
    if args.checkpoint:
        suffix += f"_{args.checkpoint}"
    if args.safety_space is not None:
        suffix += f"_ss{args.safety_space:g}"
    if args.orca_time_horizon is not None:
        suffix += f"_th{args.orca_time_horizon:g}"
    out_json = os.path.join(
        args.model_dir, f"eval_{args.phase}{suffix}.json")
    with open(out_json, "w") as f:
        json.dump(record, f, indent=1)
    return ev


if __name__ == "__main__":
    main()

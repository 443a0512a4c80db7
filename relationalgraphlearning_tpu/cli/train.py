"""Training CLI.

Reference parity: ``crowd_nav/train.py`` (SURVEY.md §2.4) — argparse flags
``--policy --config --output_dir --resume --debug --overwrite --randomseed``;
loads a Python config module by path (``get_config() -> Config``); copies the
config into the output dir for provenance; file+stdout logging; then runs the
IL + RL pipeline. ``--gpu`` is replaced by ``--platform`` (axon TPU is the
default; ``cpu`` forces the host backend).

Usage:
    python -m relationalgraphlearning_tpu.cli.train \
        --policy model_predictive_rl --output_dir data/output [--debug]
"""

from __future__ import annotations

import argparse
import logging
import os
import shutil
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description="Train a crowd navigation policy")
    p.add_argument("--policy", default="model_predictive_rl")
    p.add_argument("--config", default=None,
                   help="python config file exposing get_config() -> Config")
    p.add_argument("--output_dir", default="data/output")
    p.add_argument("--overwrite", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--debug", action="store_true")
    p.add_argument("--randomseed", type=int, default=0)
    p.add_argument("--platform", default=None, choices=[None, "cpu", "axon"],
                   help="force a JAX platform (default: auto/TPU)")
    p.add_argument("--train_envs", type=int, default=16)
    p.add_argument("--collect_steps", type=int, default=64)
    p.add_argument("--rl_train_episodes", type=int, default=None,
                   help="override config.train.rl_train_episodes")
    p.add_argument("--evaluation_interval", type=int, default=None,
                   help="override config.train.evaluation_interval (finer "
                        "cadence tightens best-on-val selection)")
    p.add_argument("--target_update_interval", type=int, default=None)
    p.add_argument("--rl_learning_rate", type=float, default=None)
    p.add_argument("--val_size", type=int, default=None,
                   help="override config.env.sim.val_size (larger val set "
                        "de-noises best-on-val checkpoint selection)")
    p.add_argument("--profile_dir", default=None,
                   help="capture a jax.profiler trace of the run")
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed from JAX_COORDINATOR/"
                        "NPROC/PROC_ID before building the mesh")
    p.add_argument("--mesh_data", type=int, default=0,
                   help="data-parallel mesh axis size (0 = no mesh; env "
                        "batch + minibatches shard, gradients all-reduce)")
    p.add_argument("--mesh_model", type=int, default=1,
                   help="tensor-parallel mesh axis size")
    args = p.parse_args(argv)

    if args.multihost:
        from relationalgraphlearning_tpu.parallel import distributed

        distributed.initialize()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from relationalgraphlearning_tpu.utils import compile_cache

    compile_cache.enable()

    if os.path.exists(args.output_dir) and not (args.resume or args.overwrite):
        # parity: train.py refuses to clobber unless asked
        key = input(f"{args.output_dir} exists. Overwrite? (y/n)")
        if key.lower() != "y":
            sys.exit(0)
        shutil.rmtree(args.output_dir)
    os.makedirs(args.output_dir, exist_ok=True)

    # logging to file + stdout (parity: train.py logging setup)
    log_file = os.path.join(args.output_dir, "output.log")
    logging.basicConfig(
        level=logging.DEBUG if args.debug else logging.INFO,
        format="%(asctime)s, %(levelname)s: %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S",
        handlers=[logging.FileHandler(log_file, mode="a"),
                  logging.StreamHandler(sys.stdout)])
    for noisy in ("orbax", "absl", "jax", "etils"):
        logging.getLogger(noisy).setLevel(logging.WARNING)

    from relationalgraphlearning_tpu.configs.base import Config, load_config_module
    from relationalgraphlearning_tpu.training.train_loop import LoopOptions, train

    if args.config:
        config = load_config_module(args.config)
        shutil.copy(args.config, os.path.join(args.output_dir, "config.py"))
    else:
        config = Config()
    import dataclasses

    tc_over = {k: v for k, v in (
        ("rl_train_episodes", args.rl_train_episodes),
        ("evaluation_interval", args.evaluation_interval),
        ("target_update_interval", args.target_update_interval),
        ("rl_learning_rate", args.rl_learning_rate)) if v is not None}
    if tc_over:
        config = dataclasses.replace(
            config, train=dataclasses.replace(config.train, **tc_over))
    if args.val_size is not None:
        config = dataclasses.replace(
            config, env=dataclasses.replace(
                config.env, sim=dataclasses.replace(
                    config.env.sim, val_size=args.val_size)))
    logging.info("policy: %s | config: %s | seed: %d",
                 args.policy, args.config or "<default>", args.randomseed)

    mesh = None
    if args.mesh_data:
        from relationalgraphlearning_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(data=args.mesh_data, model=args.mesh_model)
        logging.info("mesh: %s", dict(mesh.shape))

    from relationalgraphlearning_tpu.utils import profiling

    with profiling.trace(args.profile_dir):
        result = train(
            config, args.policy, args.output_dir,
            debug=args.debug, resume=args.resume, seed=args.randomseed,
            opts=LoopOptions(train_envs=args.train_envs,
                             collect_steps=args.collect_steps,
                             mesh=mesh))
    logging.info("done: %s", result)
    return result


if __name__ == "__main__":
    main()

"""CLI, config-module loading, checkpoint/resume, render, and plot tests."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from relationalgraphlearning_tpu.configs.base import (
    Config,
    EnvConfig,
    MPRLConfig,
    PolicyConfig,
    TrainConfig,
    load_config_module,
)

ENV = EnvConfig(human_policy="linear")
PCFG = PolicyConfig(mprl=MPRLConfig(planning_depth=1, do_action_clip=False))


def test_load_config_module(tmp_path):
    p = tmp_path / "cfg.py"
    p.write_text(
        "from relationalgraphlearning_tpu.configs.base import Config, EnvConfig\n"
        "def get_config():\n"
        "    return Config(env=EnvConfig(time_limit=30.0))\n")
    cfg = load_config_module(str(p))
    assert cfg.env.time_limit == 30.0
    assert cfg.env.max_steps == 120


def test_example_configs_load():
    for name in ["mp_separate", "mp_shared", "mp_linear", "mp_deep",
                 "mp_unicycle", "rgl", "sarl", "sarl_om", "cadrl", "lstm_rl"]:
        cfg = load_config_module(f"configs/icra_benchmark/{name}.py")
        assert isinstance(cfg, Config)


def test_checkpoint_roundtrip(tmp_path):
    from relationalgraphlearning_tpu.policies import make_policy
    from relationalgraphlearning_tpu.training import checkpoint as ckpt
    from relationalgraphlearning_tpu.training.trainer import MPRLTrainer

    pol = make_policy("model_predictive_rl", PCFG, ENV)
    params = pol.init_params(jax.random.PRNGKey(0))
    trainer = MPRLTrainer(pol)
    state = trainer.init(params)
    path = str(tmp_path / "ck")
    ckpt.save(path, state)
    assert ckpt.exists(path)
    params2 = pol.init_params(jax.random.PRNGKey(42))
    restored = ckpt.restore(path, trainer.init(params2))
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                     restored.params, state.params)
    assert max(jax.tree.leaves(d)) == 0.0


def test_train_resume(tmp_path):
    """--resume restores the RL checkpoint and continues."""
    from relationalgraphlearning_tpu.training.train_loop import LoopOptions, train

    # beyond-debug-tiny schedule: resume mechanics only, not learning
    tc = TrainConfig(il_episodes=6, il_epochs=1, rl_train_episodes=8,
                     evaluation_interval=8, target_update_interval=8,
                     checkpoint_interval=8, capacity=4000, train_batches=5,
                     batch_size=32)
    import dataclasses

    env = dataclasses.replace(
        ENV, sim=dataclasses.replace(ENV.sim, val_size=8))
    cfg = Config(env=env, policy=PCFG, train=tc)
    out = str(tmp_path / "run")
    r1 = train(cfg, "model_predictive_rl", out, seed=0,
               opts=LoopOptions(train_envs=4, collect_steps=30, eval_envs=8))
    r2 = train(cfg, "model_predictive_rl", out, seed=0, resume=True,
               opts=LoopOptions(train_envs=4, collect_steps=30, eval_envs=8))
    assert np.isfinite(r2["success_rate"])


def test_render_traj_and_video(tmp_path):
    from relationalgraphlearning_tpu.envs import CrowdSim
    from relationalgraphlearning_tpu.policies import make_policy
    from relationalgraphlearning_tpu.utils.render import (
        render_traj, render_video, rollout_trajectory)

    env = CrowdSim(ENV)
    pol = make_policy("linear", PCFG, ENV)
    traj = rollout_trajectory(env, pol, None, 0, 3)
    assert traj.steps > 0
    png = str(tmp_path / "t.png")
    render_traj(traj, png)
    assert os.path.getsize(png) > 1000
    gif = str(tmp_path / "t.gif")
    render_video(traj, gif)
    assert os.path.getsize(gif) > 1000


def test_rollout_records_attention(tmp_path):
    from relationalgraphlearning_tpu.envs import CrowdSim
    from relationalgraphlearning_tpu.policies import make_policy
    from relationalgraphlearning_tpu.utils.render import rollout_trajectory

    env = CrowdSim(ENV)
    pol = make_policy("model_predictive_rl", PCFG, ENV)
    params = pol.init_params(jax.random.PRNGKey(0))
    traj = rollout_trajectory(env, pol, params, 0, 1)
    assert traj.attention is not None
    # robot-row attention over N+1 nodes, rows sum to 1 (softmax)
    assert traj.attention.shape[-1] == ENV.sim.human_num + 1
    np.testing.assert_allclose(traj.attention.sum(-1), 1.0, rtol=1e-4)


def test_plot_from_jsonl(tmp_path):
    from relationalgraphlearning_tpu.utils import plot

    run = tmp_path / "run"
    run.mkdir()
    with open(run / "metrics.jsonl", "w") as f:
        for i in range(5):
            f.write(json.dumps({"step": i, "val/success_rate": i / 5}) + "\n")
    out = str(tmp_path / "c.png")
    plot.main([str(run), out])
    assert os.path.getsize(out) > 1000


_FAST_CFG = """
from relationalgraphlearning_tpu.configs.base import (
    Config, EnvConfig, MPRLConfig, PolicyConfig)
def get_config():
    return Config(
        env=EnvConfig(human_policy="linear"),
        policy=PolicyConfig(mprl=MPRLConfig(planning_depth=1,
                                            do_action_clip=False)))
"""


def test_cli_train_and_test(tmp_path):
    from relationalgraphlearning_tpu.cli import test as cli_test
    from relationalgraphlearning_tpu.cli import train as cli_train

    cfg_py = tmp_path / "fast_cfg.py"
    cfg_py.write_text(_FAST_CFG)
    out = str(tmp_path / "cli_run")
    result = cli_train.main([
        "--policy", "model_predictive_rl", "--config", str(cfg_py),
        "--output_dir", out, "--debug", "--overwrite",
        "--train_envs", "4", "--collect_steps", "30"])
    assert np.isfinite(result["success_rate"])
    assert os.path.exists(os.path.join(out, "output.log"))
    assert os.path.exists(os.path.join(out, "config.py"))  # provenance copy
    ev = cli_test.main(["--model_dir", out, "--phase", "val",
                        "--test_size", "8"])
    assert float(ev.success_rate) >= 0.0

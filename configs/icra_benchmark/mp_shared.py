"""MP-RGL with a shared graph model (parity: mp_shared.py).

Selection recipe follows mp_separate.py (r5 default: cadence-250
best-on-val on 200 cases, lr 5e-4 — the tight band, PERF.md seed tables).
"""

from relationalgraphlearning_tpu.configs.base import (
    Config, EnvConfig, MPRLConfig, PolicyConfig, SimConfig, TrainConfig)


def get_config() -> Config:
    return Config(
        env=EnvConfig(sim=SimConfig(val_size=200)),
        policy=PolicyConfig(
            name="model_predictive_rl",
            mprl=MPRLConfig(planning_depth=2, planning_width=2,
                            do_action_clip=True, share_graph_model=True)),
        train=TrainConfig(rl_learning_rate=5e-4, evaluation_interval=250))

"""MP-RGL with separate graph models for value and dynamics — the default
configuration (parity: crowd_nav/configs/icra_benchmark/mp_separate.py)."""

from relationalgraphlearning_tpu.configs.base import (
    Config, MPRLConfig, PolicyConfig)


def get_config() -> Config:
    return Config(policy=PolicyConfig(
        name="model_predictive_rl",
        mprl=MPRLConfig(planning_depth=2, planning_width=2,
                        do_action_clip=True, share_graph_model=False)))

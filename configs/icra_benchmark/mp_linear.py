"""MP-RGL with linear (constant-velocity) dynamics (parity: mp_linear.py)."""

from relationalgraphlearning_tpu.configs.base import (
    Config, MPRLConfig, PolicyConfig)


def get_config() -> Config:
    return Config(policy=PolicyConfig(
        name="model_predictive_rl",
        mprl=MPRLConfig(planning_depth=2, planning_width=2,
                        do_action_clip=True, linear_state_predictor=True)))

"""MP-RGL with deeper planning (d=3) (parity: deeper-planning variants)."""

from relationalgraphlearning_tpu.configs.base import (
    Config, MPRLConfig, PolicyConfig)


def get_config() -> Config:
    return Config(policy=PolicyConfig(
        name="model_predictive_rl",
        mprl=MPRLConfig(planning_depth=3, planning_width=2,
                        do_action_clip=True)))

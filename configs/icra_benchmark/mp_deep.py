"""MP-RGL with deeper planning (d=3) (parity: deeper-planning variants)."""

from relationalgraphlearning_tpu.configs.base import (
    Config, EnvConfig, MPRLConfig, PolicyConfig, SimConfig, TrainConfig)


def get_config() -> Config:
    return Config(
        env=EnvConfig(sim=SimConfig(val_size=200)),
        policy=PolicyConfig(
            name="model_predictive_rl",
            mprl=MPRLConfig(planning_depth=3, planning_width=2,
                            do_action_clip=True)),
        # r5 selection recipe (see mp_separate.py): tight cadence-250 band
        train=TrainConfig(rl_learning_rate=5e-4, evaluation_interval=250))

"""CADRL single-human baseline (parity: configs .../cadrl.py)."""

import dataclasses

from relationalgraphlearning_tpu.configs.base import (
    Config, EnvConfig, PolicyConfig, SimConfig)


def get_config() -> Config:
    return Config(
        env=EnvConfig(sim=SimConfig(human_num=1)),
        policy=PolicyConfig(name="cadrl"))

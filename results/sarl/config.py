"""SARL attention baseline (parity: configs .../sarl.py)."""

from relationalgraphlearning_tpu.configs.base import Config, PolicyConfig


def get_config() -> Config:
    return Config(policy=PolicyConfig(name="sarl"))

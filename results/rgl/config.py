"""Model-free RGL one-step policy (parity: configs .../rgl.py)."""

from relationalgraphlearning_tpu.configs.base import Config, PolicyConfig


def get_config() -> Config:
    return Config(policy=PolicyConfig(name="rgl"))

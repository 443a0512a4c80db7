"""LSTM-RL baseline (parity: configs .../lstm_rl.py)."""

from relationalgraphlearning_tpu.configs.base import Config, PolicyConfig


def get_config() -> Config:
    return Config(policy=PolicyConfig(name="lstm_rl"))

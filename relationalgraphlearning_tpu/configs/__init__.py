from relationalgraphlearning_tpu.configs.base import (
    ActionSpaceConfig,
    EnvConfig,
    GCNConfig,
    MPRLConfig,
    PolicyConfig,
    RewardConfig,
    SimConfig,
    TrainConfig,
    load_config_module,
)

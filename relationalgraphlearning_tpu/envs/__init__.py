from relationalgraphlearning_tpu.envs.crowd_sim import (
    CrowdSim,
    EnvState,
    StepOutput,
)

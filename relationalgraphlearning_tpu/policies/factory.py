"""Policy registry.

Reference parity: ``crowd_nav/policy/policy_factory.py`` +
``crowd_sim/envs/policy/policy_factory.py`` name→class maps (SURVEY.md
§2.1–2.2): trainable 'cadrl'/'lstm_rl'/'sarl'/'gcn'/'rgl'/
'model_predictive_rl' and non-trainable 'orca'/'linear'/'socialforce'.
"""

from __future__ import annotations

from relationalgraphlearning_tpu.configs.base import EnvConfig, PolicyConfig
from relationalgraphlearning_tpu.policies.model_predictive_rl import (
    ModelPredictiveRLPolicy,
)
from relationalgraphlearning_tpu.policies.one_step import (
    CADRLPolicy,
    GCNPolicy,
    LstmRLPolicy,
    SARLPolicy,
)
from relationalgraphlearning_tpu.policies.robot_policies import (
    LinearPolicy,
    ORCARobotPolicy,
    SocialForceRobotPolicy,
)

policy_factory = {
    "model_predictive_rl": ModelPredictiveRLPolicy,
    "cadrl": CADRLPolicy,
    "sarl": SARLPolicy,
    "lstm_rl": LstmRLPolicy,
    "gcn": GCNPolicy,
    "rgl": GCNPolicy,  # README alias: model-free RGL one-step policy
    "orca": ORCARobotPolicy,
    "linear": LinearPolicy,
    "socialforce": SocialForceRobotPolicy,
}


def make_policy(name: str, policy_cfg: PolicyConfig, env_cfg: EnvConfig,
                **kwargs):
    try:
        cls = policy_factory[name]
    except KeyError:
        raise KeyError(
            f"unknown policy {name!r}; available: {sorted(policy_factory)}")
    return cls(policy_cfg, env_cfg, **kwargs)

"""MP-RGL unicycle with rotation_constraint π/3 (r4 diagnosis follow-up).

The r3 π/4 row collided in 13% of cases; tools/diag_unicycle.py showed 68%
of those were turn-saturated in the final 4 steps and 0 were from behind —
the constraint, not strafe-blindness, binds. Test-time relaxation of the
committed π/4 checkpoint to π/3 already cut collisions 0.130 → 0.076
(results/mp_unicycle/eval_test_rc1.0472.json); this config trains the
action space at π/3 natively.
"""

import math

from relationalgraphlearning_tpu.configs.base import (
    ActionSpaceConfig, Config, EnvConfig, MPRLConfig, PolicyConfig)


def get_config() -> Config:
    return Config(
        env=EnvConfig(robot_kinematics="unicycle"),
        policy=PolicyConfig(
            name="model_predictive_rl",
            action_space=ActionSpaceConfig(
                rotation_constraint=math.pi / 3),
            mprl=MPRLConfig(planning_depth=2, planning_width=2,
                            do_action_clip=True)))

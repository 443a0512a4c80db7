"""MP-RGL with unicycle kinematics (ActionRot) — exercises the reference's
``kinematics='unicycle'`` + ``rotation_constraint`` path end to end
(parity: Agent kinematics + CADRL.build_action_space rotation branch,
SURVEY.md §2.1/§2.2)."""

from relationalgraphlearning_tpu.configs.base import (
    Config, EnvConfig, MPRLConfig, PolicyConfig)


def get_config() -> Config:
    return Config(
        env=EnvConfig(robot_kinematics="unicycle"),
        policy=PolicyConfig(
            name="model_predictive_rl",
            # canonicalize: goal-frame input symmetry reduction — decisive
            # under unicycle, where the raw-coordinate nets must learn the
            # heading dimension (r3: 0.68 raw vs holonomic-parity goal)
            mprl=MPRLConfig(planning_depth=2, planning_width=2,
                            do_action_clip=True, canonicalize=True)))

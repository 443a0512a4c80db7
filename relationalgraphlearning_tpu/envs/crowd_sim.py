"""CrowdSim — the crowd navigation environment as a pure JAX program.

Reference parity: ``crowd_sim/envs/crowd_sim.py::CrowdSim(gym.Env)`` with
``configure/reset/step/onestep_lookahead`` and the seeded ``case_counter``
scenario mechanism (SURVEY.md §2.1, §3.2). Differences by design (TPU-first):

- no gym object protocol: ``reset``/``step`` are pure functions over a
  fixed-shape ``EnvState`` pytree, so ``vmap`` batches thousands of envs and
  ``lax.scan`` rolls whole episodes inside one jitted program;
- human crowd dynamics (centralized ORCA / social-force / linear) run inside
  the step — the reference's only Python→C++ boundary (rvo2.doStep per step,
  SURVEY.md §3.2★) disappears into the device program;
- episode termination is a ``done`` flag with no-op semantics: stepping a done
  env returns zero reward and leaves the state frozen, which is what masked
  fixed-length ``lax.scan`` rollouts need.

Rendering lives in ``relationalgraphlearning_tpu/utils/render.py`` (host-side
matplotlib over trajectory arrays), matching the reference's
``render('traj'/'video')`` capability.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from relationalgraphlearning_tpu import types as T
from relationalgraphlearning_tpu.configs.base import EnvConfig
from relationalgraphlearning_tpu.envs import scenarios
from relationalgraphlearning_tpu.envs.orca import ORCAParams, centralized_orca_step
from relationalgraphlearning_tpu.envs.reward import RewardOutput, compute_reward
from relationalgraphlearning_tpu.envs.social_force import SFMParams, centralized_sfm_step


class EnvState(NamedTuple):
    robot: Array  # [9] FullState
    humans: Array  # [N, 9] FullState
    step: Array  # int32 — steps taken
    done: Array  # bool
    outcome: Array  # int32 OUTCOME_*


class StepOutput(NamedTuple):
    state: EnvState
    obs: Array  # [N, 5] human observable states
    reward: Array
    done: Array
    outcome: Array
    dmin: Array  # min robot-human separation this step (Danger info)


class CrowdSim:
    """Stateless env: methods are pure functions of (EnvState, action).

    Batch usage: ``jax.vmap(env.step)(states, actions)``.
    """

    def __init__(self, cfg: EnvConfig):
        self.cfg = cfg
        self.orca_params = ORCAParams(
            neighbor_dist=cfg.orca_neighbor_dist,
            time_horizon=cfg.orca_time_horizon,
            time_step=cfg.time_step,
            safety_space=cfg.orca_safety_space,
        )
        self.sfm_params = SFMParams()

    # ------------------------------------------------------------------ reset
    def reset(self, case_key: Array) -> tuple[EnvState, Array]:
        """Seeded scenario generation → (EnvState, initial human obs).

        ``case_key`` comes from ``scenarios.case_key(seed, phase_offset,
        case_idx)`` — parity with CrowdSim.reset's per-phase seeded cases.
        """
        robot, humans = scenarios.generate_case(case_key, self.cfg)
        state = EnvState(
            robot=robot,
            humans=humans,
            step=jnp.asarray(0, jnp.int32),
            done=jnp.asarray(False),
            outcome=jnp.asarray(T.OUTCOME_NOTHING, jnp.int32),
        )
        return state, T.observable(humans)

    # ------------------------------------------------- human crowd dynamics
    def human_velocities(self, state: EnvState) -> Array:
        """Velocities all humans take this step (centralized planning —
        parity: ``CentralizedORCA``/``CentralizedSocialForce`` driving ALL
        humans per env step; robot included as an obstacle iff
        ``robot_visible``)."""
        cfg = self.cfg
        n = cfg.sim.human_num
        humans = state.humans

        # preferred velocity: unit vector to goal * v_pref; zero once reached
        to_goal = T.goal(humans) - T.position(humans)
        dist = jnp.linalg.norm(to_goal, axis=-1, keepdims=True)
        reached = dist[..., 0] < humans[..., T.RADIUS]
        pref = jnp.where(
            reached[..., None], 0.0,
            to_goal / jnp.maximum(dist, 1e-9) * humans[..., T.VPREF, None])

        if cfg.human_policy == "linear":
            return pref

        # agent set: N humans (+ robot appended if visible)
        if cfg.robot_visible:
            pos = jnp.concatenate(
                [T.position(humans), T.position(state.robot)[None]], 0)
            vel = jnp.concatenate(
                [T.velocity(humans), T.velocity(state.robot)[None]], 0)
            rad = jnp.concatenate(
                [humans[..., T.RADIUS], state.robot[T.RADIUS][None]], 0)
            vpref = jnp.concatenate(
                [humans[..., T.VPREF], state.robot[T.VPREF][None]], 0)
            prefv = jnp.concatenate([pref, T.velocity(state.robot)[None]], 0)
            active = jnp.ones((n + 1,), dtype=bool)
        else:
            pos, vel = T.position(humans), T.velocity(humans)
            rad, vpref, prefv = humans[..., T.RADIUS], humans[..., T.VPREF], pref
            active = jnp.ones((n,), dtype=bool)

        if cfg.human_policy == "orca":
            # RVO2 maxSpeed: humans move at v_pref
            new_v = centralized_orca_step(
                pos, vel, rad, prefv, vpref, active, self.orca_params)
        elif cfg.human_policy == "socialforce":
            new_v = centralized_sfm_step(
                pos, vel, rad, prefv, vpref, active, self.sfm_params,
                cfg.time_step)
        elif cfg.human_policy == "mixed":
            # first ceil(frac·N) humans follow ORCA, the rest social force;
            # each solver sees the full crowd (they avoid each other).
            import math

            n_orca = math.ceil(cfg.mixed_orca_fraction * n)
            v_orca = centralized_orca_step(
                pos, vel, rad, prefv, vpref, active, self.orca_params)
            v_sfm = centralized_sfm_step(
                pos, vel, rad, prefv, vpref, active, self.sfm_params,
                cfg.time_step)
            is_orca = (jnp.arange(pos.shape[0]) < n_orca)[:, None]
            new_v = jnp.where(is_orca, v_orca, v_sfm)
        else:
            raise ValueError(f"unknown human policy: {cfg.human_policy}")
        return new_v[:n]

    # ------------------------------------------------------------------- step
    def step(self, state: EnvState, action: Array,
             kinematics: str | None = None) -> StepOutput:
        """Advance one time step under the robot ``action``.

        Done envs freeze: zero reward, unchanged state (masked-scan no-op).

        ``kinematics`` (static) overrides the configured robot kinematics —
        the action convention follows the ACTING policy, mirroring the
        reference where the ActionXY/ActionRot *type* disambiguates (a
        holonomic ORCA demonstrator inside a unicycle-configured env steps
        holonomically, exactly as ``Agent.step(ActionXY)`` would).
        """
        cfg = self.cfg
        kinematics = kinematics or cfg.robot_kinematics
        dt = cfg.time_step
        human_v = self.human_velocities(state)

        t_next = (state.step.astype(jnp.float32) + 1.0) * dt
        r = compute_reward(
            state.robot, T.observable(state.humans), human_v, action,
            t_next, cfg, kinematics=kinematics)

        # integrate
        from relationalgraphlearning_tpu.geometry import propagate_full_state

        next_robot = propagate_full_state(state.robot, action, dt, kinematics)
        next_pos = T.position(state.humans) + human_v * dt
        next_humans = state.humans \
            .at[..., T.PX:T.PY + 1].set(next_pos) \
            .at[..., T.VX:T.VY + 1].set(human_v)

        was_done = state.done
        new_state = EnvState(
            robot=jnp.where(was_done, state.robot, next_robot),
            humans=jnp.where(was_done, state.humans, next_humans),
            step=jnp.where(was_done, state.step, state.step + 1),
            done=was_done | r.done,
            outcome=jnp.where(was_done, state.outcome, r.outcome),
        )
        reward = jnp.where(was_done, 0.0, r.reward)
        return StepOutput(
            state=new_state,
            obs=T.observable(new_state.humans),
            reward=reward,
            done=new_state.done,
            outcome=new_state.outcome,
            dmin=jnp.where(was_done, jnp.inf, r.dmin),
        )

    # -------------------------------------------------------------- lookahead
    def onestep_lookahead(self, state: EnvState, action: Array) -> StepOutput:
        """Parity: ``CrowdSim.onestep_lookahead`` — evaluate an action without
        mutating the env. Pure functions make this literally ``step`` with the
        result state discarded by the caller."""
        return self.step(state, action)

    def lookahead_actions(self, state: EnvState, actions: Array
                          ) -> tuple[Array, Array, Array]:
        """Privileged one-step lookahead over a whole action sweep.

        Parity: ``MultiHumanRL.predict`` with ``query_env=True`` calling
        ``env.onestep_lookahead(action)`` once per action — here the human
        crowd step (which does not depend on the robot's action) runs ONCE
        and only the cheap reward check sweeps over actions.

        Returns ``(rewards [A], next_robot [A, 9], next_humans_obs [N, 5])``.
        """
        cfg = self.cfg
        dt = cfg.time_step
        human_v = self.human_velocities(state)
        t_next = (state.step.astype(jnp.float32) + 1.0) * dt

        A = actions.shape[0]
        robot_b = jnp.broadcast_to(state.robot, (A, 9))
        obs = T.observable(state.humans)
        obs_b = jnp.broadcast_to(obs, (A,) + obs.shape)
        r = compute_reward(
            robot_b, obs_b, jnp.broadcast_to(human_v, (A,) + human_v.shape),
            actions, jnp.broadcast_to(t_next, (A,)), cfg)

        from relationalgraphlearning_tpu.geometry import propagate_full_state

        next_robot = propagate_full_state(
            robot_b, actions, dt, cfg.robot_kinematics)
        next_obs = obs.at[..., T.PX:T.PY + 1].add(human_v * dt) \
            .at[..., T.VX:T.VY + 1].set(human_v)
        return r.reward, next_robot, next_obs

    def joint_state(self, state: EnvState) -> T.JointState:
        """Robot full state + human observable states — the policy input
        (parity: ``Robot.act`` building ``JointState``)."""
        return T.JointState(robot=state.robot, humans=T.observable(state.humans))

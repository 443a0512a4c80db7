"""Explorer — batched episode rollout, experience collection, eval metrics.

Reference parity: ``crowd_nav/utils/explorer.py::Explorer`` (SURVEY.md §2.3,
§3.2): runs k episodes, aggregates success/collision/timeout rates, nav
time, discounted cumulative reward (γ^(t·Δt·v_pref)), danger frequency and
min separation; ``update_memory`` computes Monte-Carlo discounted returns
(imitation) or 1-step TD targets ``r + γ̄·V_target(s')`` (RL) and pushes
(state, value, reward, next_state) tuples.

TPU-first redesign: the reference steps ONE env in a Python while-loop. Here:

- **Evaluation** (``run_cases``): B seeded cases roll as one vmapped
  ``lax.scan`` program; done envs freeze; metrics reduce on device.
- **Training collection** (``collect``): auto-resetting rollout — when an env
  terminates it immediately resets to its next case (per-env case striding
  keeps scenario sets disjoint), so every scan step produces a valid
  transition and the TPU never idles on ragged episode lengths. Episode
  boundaries are carried as terminal flags; MC returns stop at terminals via
  a reverse scan, and the trailing incomplete episode is marked invalid for
  imitation targets (TD targets bootstrap, so all transitions are valid).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from relationalgraphlearning_tpu import types as T
from relationalgraphlearning_tpu.configs.base import EnvConfig
from relationalgraphlearning_tpu.envs.crowd_sim import CrowdSim, EnvState
from relationalgraphlearning_tpu.envs.scenarios import case_key
from relationalgraphlearning_tpu.training import replay_buffer as rb


class Trajectory(NamedTuple):
    """Per-step rollout record, leading axes [T, B]."""

    robot: Array
    humans: Array  # observable [T, B, N, 5]
    action: Array
    reward: Array
    terminal: Array  # episode ended at this step
    outcome: Array
    dmin: Array
    next_robot: Array
    next_humans: Array
    ep_step: Array  # step index within the episode (0-based, at state s_t)
    ep_return: Array  # discounted return accumulated through this step


class RolloutCarry(NamedTuple):
    env_states: EnvState  # batched [B]
    case_counter: Array  # [B] int32 next case per env
    ep_step: Array  # [B] int32
    ep_return: Array  # [B] float
    key: Array


class EvalStats(NamedTuple):
    success_rate: Array
    collision_rate: Array
    timeout_rate: Array
    avg_nav_time: Array  # over successful episodes
    avg_return: Array  # discounted cumulative reward, all episodes
    danger_frequency: Array  # fraction of in-episode steps with dmin < d_disc
    avg_min_dist: Array  # mean dmin over danger steps


class Explorer:
    def __init__(self, env: CrowdSim, policy, gamma: float,
                 base_seed: int = 0,
                 rotation_constraint: float = 3.14159265 / 4):
        self.env = env
        self.policy = policy
        self.gamma = gamma
        self.base_seed = base_seed
        self.cfg: EnvConfig = env.cfg
        self.kinematics: str = getattr(
            policy, "kinematics", None) or env.cfg.robot_kinematics
        # A holonomic demonstrator (ORCA) inside a unicycle-configured env
        # has its (vx, vy) CONVERTED to a feasible (v, dtheta) and the env
        # steps unicycle, so demonstration trajectories carry the heading
        # distribution the learned policy meets at evaluation (frozen-theta
        # holonomic demos left the value net out of distribution — r3).
        self.convert_to_unicycle = (
            self.kinematics == T.HOLONOMIC
            and env.cfg.robot_kinematics == T.UNICYCLE)
        self.rotation_constraint = rotation_constraint
        if self.convert_to_unicycle:
            self.kinematics = T.UNICYCLE

    def _step(self, states: EnvState, actions: Array):
        if self.convert_to_unicycle:
            from relationalgraphlearning_tpu.geometry import (
                holonomic_to_unicycle)

            actions = holonomic_to_unicycle(
                actions, states.robot[..., T.THETA],
                self.rotation_constraint)
        return jax.vmap(
            lambda s, a: self.env.step(s, a, kinematics=self.kinematics)
        )(states, actions)

    def _gamma_bar(self, robot: Array) -> Array:
        return self.gamma ** (self.cfg.time_step * robot[..., T.VPREF])

    # --------------------------------------------------------------- predict
    def _act(self, params, states: EnvState, key: Array, epsilon: Array):
        keys = jax.random.split(key, states.robot.shape[0])
        if getattr(self.policy, "query_env", False):
            # privileged lookahead (parity: MultiHumanRL query_env=True) —
            # the policy reads the env's own crowd dynamics for s'.
            return jax.vmap(
                lambda s, k: self.policy.predict_env(
                    params, self.env, s, k, epsilon))(states, keys)
        js = T.JointState(states.robot, T.observable(states.humans))
        return jax.vmap(
            lambda s, k: self.policy.predict(params, s, k, epsilon))(js, keys)

    # ------------------------------------------------------------------ eval
    def run_cases(self, params: Any, phase_offset: int, case_indices: Array,
                  key: Array, epsilon: float = 0.0) -> EvalStats:
        """Roll each seeded case to completion; reduce reference metrics.

        Parity: ``Explorer.run_k_episodes(k, phase)`` in eval mode.
        """
        env = self.env
        states, _ = jax.vmap(env.reset)(
            jax.vmap(lambda i: case_key(self.base_seed, phase_offset, i))(
                case_indices))
        eps = jnp.asarray(epsilon)

        def body(carry, _):
            states, key, ep_ret, danger_steps, danger_dmin, total_steps = carry
            key, sub = jax.random.split(key)
            actions = self._act(params, states, sub, eps)
            out = self._step(states, actions)
            live = ~states.done
            gamma_t = self.gamma ** (
                states.step.astype(jnp.float32) * self.cfg.time_step
                * states.robot[..., T.VPREF])
            ep_ret = ep_ret + jnp.where(live, gamma_t * out.reward, 0.0)
            danger = live & (out.dmin < self.cfg.reward.discomfort_dist) \
                & ~out.state.done
            danger_steps = danger_steps + danger
            danger_dmin = danger_dmin + jnp.where(danger, out.dmin, 0.0)
            total_steps = total_steps + live
            return (out.state, key, ep_ret, danger_steps, danger_dmin,
                    total_steps), None

        B = case_indices.shape[0]
        init = (states, key, jnp.zeros(B), jnp.zeros(B, jnp.int32),
                jnp.zeros(B), jnp.zeros(B, jnp.int32))
        (final, _, ep_ret, danger_steps, danger_dmin, total_steps), _ = \
            jax.lax.scan(body, init, None, self.cfg.max_steps)

        success = final.outcome == T.OUTCOME_REACH_GOAL
        collision = final.outcome == T.OUTCOME_COLLISION
        timeout = (final.outcome == T.OUTCOME_TIMEOUT) | ~final.done
        nav_time = final.step.astype(jnp.float32) * self.cfg.time_step
        n = jnp.asarray(B, jnp.float32)
        n_succ = jnp.maximum(jnp.sum(success), 1)
        return EvalStats(
            success_rate=jnp.sum(success) / n,
            collision_rate=jnp.sum(collision) / n,
            timeout_rate=jnp.sum(timeout) / n,
            avg_nav_time=jnp.sum(jnp.where(success, nav_time, 0.0)) / n_succ,
            avg_return=jnp.mean(ep_ret),
            danger_frequency=jnp.sum(danger_steps) /
            jnp.maximum(jnp.sum(total_steps), 1),
            avg_min_dist=jnp.sum(danger_dmin) /
            jnp.maximum(jnp.sum(danger_steps), 1),
        )

    # ------------------------------------------------------------ collection
    def init_carry(self, batch: int, phase_offset: int, key: Array
                   ) -> RolloutCarry:
        """Fresh auto-reset carry: env b starts case b, then strides by B."""
        case0 = jnp.arange(batch, dtype=jnp.int32)
        states, _ = jax.vmap(self.env.reset)(
            jax.vmap(lambda i: case_key(self.base_seed, phase_offset, i))(
                case0))
        return RolloutCarry(
            env_states=states,
            case_counter=case0 + batch,
            ep_step=jnp.zeros(batch, jnp.int32),
            ep_return=jnp.zeros(batch),
            key=key,
        )

    def collect(self, params: Any, carry: RolloutCarry, num_steps: int,
                epsilon: Array, phase_offset: int
                ) -> tuple[RolloutCarry, Trajectory]:
        """Auto-reset rollout of ``num_steps`` across the env batch."""
        env = self.env
        B = carry.ep_step.shape[0]
        eps = jnp.asarray(epsilon)

        def body(c: RolloutCarry, _):
            key, sub = jax.random.split(c.key)
            states = c.env_states
            actions = self._act(params, states, sub, eps)
            out = self._step(states, actions)

            gamma_t = self.gamma ** (
                c.ep_step.astype(jnp.float32) * self.cfg.time_step
                * states.robot[..., T.VPREF])
            ep_return = c.ep_return + gamma_t * out.reward

            rec = Trajectory(
                robot=states.robot,
                humans=T.observable(states.humans),
                action=actions,
                reward=out.reward,
                terminal=out.done,
                outcome=out.state.outcome,
                dmin=out.dmin,
                next_robot=out.state.robot,
                next_humans=T.observable(out.state.humans),
                ep_step=c.ep_step,
                ep_return=ep_return,
            )

            # auto-reset finished envs to their next case
            reset_states, _ = jax.vmap(env.reset)(
                jax.vmap(lambda i: case_key(self.base_seed, phase_offset, i))(
                    c.case_counter))
            done = out.done

            def pick(fresh, old):
                bshape = (B,) + (1,) * (old.ndim - 1)
                return jnp.where(done.reshape(bshape), fresh, old)

            new_states = jax.tree.map(pick, reset_states, out.state)
            return RolloutCarry(
                env_states=new_states,
                case_counter=jnp.where(done, c.case_counter + B, c.case_counter),
                ep_step=jnp.where(done, 0, c.ep_step + 1),
                ep_return=jnp.where(done, 0.0, ep_return),
                key=key,
            ), rec

        return jax.lax.scan(body, carry, None, num_steps)

    # --------------------------------------------------------- target making
    def update_memory(self, buffer: rb.ReplayBuffer, traj: Trajectory,
                      value_fn, target_params: Any,
                      imitation_learning: bool) -> rb.ReplayBuffer:
        """Compute value targets and push the trajectory into the buffer.

        Parity: ``Explorer.update_memory`` — IL: Monte-Carlo discounted
        return with per-step γ^(Δt·v_pref); RL: 1-step TD target
        ``r + γ̄·V_target(s')`` (terminal steps use the raw reward).
        """
        gamma_bar = self._gamma_bar(traj.robot)  # [T, B]
        term = traj.terminal.astype(jnp.float32)

        if imitation_learning:
            def back(g_next, xs):
                r, gb, tm = xs
                g = r + gb * (1.0 - tm) * g_next
                return g, g

            _, values = jax.lax.scan(
                back, jnp.zeros_like(traj.reward[-1]),
                (traj.reward, gamma_bar, term), reverse=True)
            # trailing incomplete episodes have no terminal after them →
            # their MC return is truncated; mark invalid.
            seen_term_after = jnp.flip(
                jnp.cumsum(jnp.flip(term, 0), 0), 0) > 0
            valid = seen_term_after.astype(jnp.float32)
        else:
            v_next = value_fn(target_params, traj.next_robot, traj.next_humans)
            values = traj.reward + gamma_bar * (1.0 - term) * \
                jax.lax.stop_gradient(v_next)
            valid = jnp.ones_like(traj.reward)

        flat = lambda a: a.reshape((-1,) + a.shape[2:])
        batch = rb.Transition(
            robot=flat(traj.robot),
            humans=flat(traj.humans),
            value=flat(values),
            reward=flat(traj.reward),
            next_robot=flat(traj.next_robot),
            next_humans=flat(traj.next_humans),
            valid=flat(valid),
            terminal=flat(term),
        )
        return rb.push(buffer, batch)

    def count_episodes(self, traj: Trajectory) -> dict:
        """Completed-episode stats from a collection trajectory (logging
        parity with run_k_episodes' train-phase summary)."""
        term = traj.terminal
        succ = term & (traj.outcome == T.OUTCOME_REACH_GOAL)
        coll = term & (traj.outcome == T.OUTCOME_COLLISION)
        tout = term & (traj.outcome == T.OUTCOME_TIMEOUT)
        n = jnp.maximum(jnp.sum(term), 1)
        return {
            "episodes": jnp.sum(term),
            "success_rate": jnp.sum(succ) / n,
            "collision_rate": jnp.sum(coll) / n,
            "timeout_rate": jnp.sum(tout) / n,
            "avg_nav_time": jnp.sum(
                jnp.where(succ, (traj.ep_step + 1) * self.cfg.time_step, 0.0))
            / jnp.maximum(jnp.sum(succ), 1),
            "avg_return": jnp.sum(jnp.where(term, traj.ep_return, 0.0)) / n,
        }

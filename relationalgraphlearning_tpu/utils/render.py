"""Episode rendering — host-side matplotlib over device trajectory arrays.

Reference parity: ``CrowdSim.render('traj'/'video')`` (SURVEY.md §2.1) —
static trajectory plot with time-stamped agent positions, and an animated
episode video (mp4/gif); attention visualization hooks. The env itself stays
render-free (pure device program); rendering consumes a recorded trajectory.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from relationalgraphlearning_tpu import types as T
from relationalgraphlearning_tpu.envs.crowd_sim import CrowdSim
from relationalgraphlearning_tpu.envs.scenarios import case_key

_OUTCOME_NAMES = {0: "nothing", 1: "reach_goal", 2: "collision", 3: "timeout"}


@dataclasses.dataclass
class EpisodeTrajectory:
    robot: np.ndarray  # [T+1, 9]
    humans: np.ndarray  # [T+1, N, 9]
    attention: Optional[np.ndarray]  # [T, N+1] robot-row attention or None
    outcome: int
    steps: int
    time_step: float
    cumulative_reward: float
    robot_radius: float

    @property
    def outcome_name(self):
        return _OUTCOME_NAMES[self.outcome]

    @property
    def nav_time(self):
        return self.steps * self.time_step


def rollout_trajectory(env: CrowdSim, policy, params, phase_offset: int,
                       case_idx: int, epsilon: float = 0.0,
                       base_seed: int = 0) -> EpisodeTrajectory:
    """Run one seeded case, recording every state (and attention weights when
    the policy exposes them)."""
    state, _ = env.reset(case_key(base_seed, phase_offset, jnp.asarray(case_idx)))
    robots, humans, attn = [np.asarray(state.robot)], [np.asarray(state.humans)], []
    reward_sum, gamma = 0.0, 0.9
    step_fn = jax.jit(env.step)
    act_fn = jax.jit(lambda p, js, k: policy.predict(p, js, k, jnp.asarray(epsilon)))
    attn_fn = None
    if hasattr(policy, "attention"):
        attn_fn = jax.jit(lambda p, r, h: policy.attention(p, r, h))
    key = jax.random.PRNGKey(case_idx)
    t = 0
    while not bool(state.done) and t < env.cfg.max_steps:
        key, sub = jax.random.split(key)
        js = T.JointState(state.robot, T.observable(state.humans))
        if attn_fn is not None:
            A = np.asarray(attn_fn(params, js.robot[None], js.humans[None]))[0]
            attn.append(A[0])  # robot-row attention over nodes
        action = act_fn(params, js, sub)
        out = step_fn(state, action)
        gamma_t = gamma ** (t * env.cfg.time_step * float(state.robot[T.VPREF]))
        reward_sum += gamma_t * float(out.reward)
        state = out.state
        robots.append(np.asarray(state.robot))
        humans.append(np.asarray(state.humans))
        t += 1
    return EpisodeTrajectory(
        robot=np.stack(robots), humans=np.stack(humans),
        attention=np.stack(attn) if attn else None,
        outcome=int(state.outcome), steps=int(state.step),
        time_step=env.cfg.time_step, cumulative_reward=reward_sum,
        robot_radius=env.cfg.robot_radius)


def _setup_ax(ax, lim=5.0):
    ax.set_xlim(-lim, lim)
    ax.set_ylim(-lim, lim)
    ax.set_xlabel("x (m)")
    ax.set_ylabel("y (m)")
    ax.set_aspect("equal")


def render_traj(traj: EpisodeTrajectory, path: str, stride: int = 16):
    """Static plot with positions every ``stride`` steps (parity:
    render('traj') showing positions every 4 s)."""
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 7))
    _setup_ax(ax)
    Tn, N = traj.humans.shape[0], traj.humans.shape[1]
    cmap = plt.colormaps["tab10"]
    ax.plot(traj.robot[:, 0], traj.robot[:, 1], "-", color="gold", lw=2,
            label="robot")
    for i in range(N):
        ax.plot(traj.humans[:, i, 0], traj.humans[:, i, 1], "--", lw=1,
                color=cmap(i))
    for t in range(0, Tn, stride):
        ax.add_artist(plt.Circle(traj.robot[t, :2], traj.robot_radius,
                                 fill=False, color="gold"))
        ax.text(traj.robot[t, 0] - 0.1, traj.robot[t, 1] - 0.25,
                f"{t * traj.time_step:.0f}", fontsize=8)
        for i in range(N):
            ax.add_artist(plt.Circle(traj.humans[t, i, :2],
                                     traj.humans[t, i, T.RADIUS],
                                     fill=False, color=cmap(i)))
            # attention-weight overlay (parity: reference stores self.A and
            # test.py can display per-human attention)
            if traj.attention is not None and t < len(traj.attention):
                ax.text(traj.humans[t, i, 0] + 0.15,
                        traj.humans[t, i, 1] + 0.15,
                        f"{traj.attention[t, i + 1]:.2f}", fontsize=6,
                        color=cmap(i))
    ax.plot(traj.robot[0, T.GX], traj.robot[0, T.GY], "r*", markersize=14,
            label="goal")
    ax.legend(loc="upper left")
    ax.set_title(f"{traj.outcome_name}, nav time {traj.nav_time:.1f}s")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)


def render_video(traj: EpisodeTrajectory, path: str):
    """Animated episode (parity: render('video')); .gif via pillow, .mp4 via
    ffmpeg when available."""
    import matplotlib.animation as animation
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 7))
    _setup_ax(ax)
    N = traj.humans.shape[1]
    cmap = plt.colormaps["tab10"]
    robot_c = plt.Circle(traj.robot[0, :2], traj.robot_radius, color="gold")
    ax.add_artist(robot_c)
    human_cs = []
    for i in range(N):
        c = plt.Circle(traj.humans[0, i, :2], traj.humans[0, i, T.RADIUS],
                       fill=False, color=cmap(i % 10))
        ax.add_artist(c)
        human_cs.append(c)
    ax.plot(traj.robot[0, T.GX], traj.robot[0, T.GY], "r*", markersize=14)
    title = ax.set_title("t = 0.0 s")

    def update(t):
        robot_c.center = traj.robot[t, :2]
        for i, c in enumerate(human_cs):
            c.center = traj.humans[t, i, :2]
        title.set_text(f"t = {t * traj.time_step:.1f} s ({traj.outcome_name})")
        return [robot_c, *human_cs, title]

    anim = animation.FuncAnimation(
        fig, update, frames=traj.humans.shape[0],
        interval=traj.time_step * 1000)
    if path.endswith(".gif"):
        anim.save(path, writer=animation.PillowWriter(fps=int(1 / traj.time_step)))
    else:
        anim.save(path, writer="ffmpeg", fps=int(1 / traj.time_step))
    plt.close(fig)

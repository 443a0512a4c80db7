"""Unicycle failure breakdown (VERDICT r3 next-round #5).

Re-runs the 500-case test protocol on a trained mp_unicycle checkpoint
capturing per-step robot/human state, then dissects every collision:

- approach bearing of the colliding human in the ROBOT-HEADING frame
  (front / side / behind — a unicycle cannot strafe, so side/behind hits
  mean the kinematic constraint, front hits mean bad planning);
- robot speed + commanded turn at impact, and whether the robot was
  turn-saturated (|dθ| at the rotation_constraint) in the 4 steps before;
- heading error vs goal direction at impact;
- time-to-impact distribution (early scramble vs late-episode squeeze);
- dmin trace: was the robot already inside the discomfort zone the step
  before (seen-it-coming) or did the closing speed exceed what one step
  can dodge (blindsided)?

Writes results/<name>/diagnosis.json + prints a JSON summary. CPU-safe.

    python tools/diag_unicycle.py --model_dir results/mp_unicycle
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_dir", default="results/mp_unicycle")
    p.add_argument("--cases", type=int, default=500)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from relationalgraphlearning_tpu import types as T
    from relationalgraphlearning_tpu.configs.base import load_config_module
    from relationalgraphlearning_tpu.envs.scenarios import case_key
    from relationalgraphlearning_tpu.training import checkpoint as ckpt
    from relationalgraphlearning_tpu.training.train_loop import build
    from relationalgraphlearning_tpu.utils import compile_cache

    compile_cache.enable()
    config = load_config_module(os.path.join(args.model_dir, "config.py"))
    art = build(config, "model_predictive_rl")
    state = art.trainer.init(art.policy.init_params(jax.random.PRNGKey(0)))
    state = ckpt.restore(os.path.join(args.model_dir, "rl_model_best"), state)
    params = state.params
    env, explorer, cfg = art.env, art.explorer, art.env.cfg

    offset = cfg.sim.test_seed_offset
    idx = jnp.arange(args.cases)
    states0, _ = jax.vmap(env.reset)(
        jax.vmap(lambda i: case_key(0, offset, i))(idx))

    def body(carry, _):
        states, key = carry
        key, sub = jax.random.split(key)
        actions = explorer._act(params, states, sub, jnp.asarray(0.0))
        out = explorer._step(states, actions)
        rec = (states.robot, states.humans, actions, out.dmin,
               out.state.done, out.state.outcome)
        return (out.state, key), rec

    (final, _), (robots, humans, acts, dmins, dones, outcomes) = jax.jit(
        lambda s: jax.lax.scan(body, (s, jax.random.PRNGKey(1)), None,
                               cfg.max_steps))(states0)
    # axes: [T, B, ...] → numpy
    robots = np.asarray(robots)          # [T, B, 9]
    humans = np.asarray(humans)          # [T, B, H, 5+]
    acts = np.asarray(acts)              # [T, B, 2] (v, dθ) for unicycle
    dmins = np.asarray(dmins)            # [T, B]
    outcome = np.asarray(final.outcome)  # [B]
    steps = np.asarray(final.step)       # [B]

    rc = config.policy.action_space.rotation_constraint
    dt = cfg.time_step
    coll = np.where(outcome == T.OUTCOME_COLLISION)[0]
    rows = []
    for b in coll.tolist():
        t = int(steps[b]) - 1  # step index at which the collision landed
        r = robots[t, b]
        hx = humans[t, b]
        pr, vr, th = r[0:2], r[2:4], r[8]
        # colliding human = closest at impact
        d = np.linalg.norm(hx[:, 0:2] - pr, axis=-1) - hx[:, 4] - r[4]
        j = int(np.argmin(d))
        rel = hx[j, 0:2] - pr
        bear = (np.arctan2(rel[1], rel[0]) - th + np.pi) % (2 * np.pi) - np.pi
        sector = ("front" if abs(bear) < np.pi / 4 else
                  "side" if abs(bear) < 3 * np.pi / 4 else "behind")
        goal_dir = np.arctan2(r[6] - pr[1], r[5] - pr[0])
        herr = (goal_dir - th + np.pi) % (2 * np.pi) - np.pi
        t0 = max(0, t - 4)
        sat = bool(np.any(np.abs(acts[t0:t + 1, b, 1]) > 0.95 * rc))
        closing = float(np.linalg.norm(vr - hx[j, 2:4]))
        rows.append({
            "case": int(b), "t_impact_s": round((t + 1) * dt, 2),
            "bearing_deg": round(float(np.degrees(bear)), 1),
            "sector": sector,
            "robot_speed": round(float(np.linalg.norm(vr)), 3),
            "turn_saturated_last4": sat,
            "heading_err_deg": round(float(np.degrees(herr)), 1),
            "closing_speed": round(closing, 3),
            "dmin_prev_step": round(float(dmins[max(0, t - 1), b]), 3),
            "seen_coming": bool(dmins[max(0, t - 1), b]
                                < cfg.reward.discomfort_dist),
        })

    sec = {s: sum(1 for r in rows if r["sector"] == s)
           for s in ("front", "side", "behind")}
    summary = {
        "cases": args.cases,
        "success": int((outcome == T.OUTCOME_REACH_GOAL).sum()),
        "collision": int(len(coll)),
        "timeout": int((outcome == T.OUTCOME_TIMEOUT).sum()),
        "sector_counts": sec,
        "turn_saturated_frac": round(
            float(np.mean([r["turn_saturated_last4"] for r in rows]))
            if rows else 0.0, 3),
        "seen_coming_frac": round(
            float(np.mean([r["seen_coming"] for r in rows]))
            if rows else 0.0, 3),
        "stopped_at_impact_frac": round(
            float(np.mean([r["robot_speed"] < 0.1 for r in rows]))
            if rows else 0.0, 3),
        "median_t_impact_s": round(
            float(np.median([r["t_impact_s"] for r in rows]))
            if rows else 0.0, 2),
        "median_closing_speed": round(
            float(np.median([r["closing_speed"] for r in rows]))
            if rows else 0.0, 3),
        "median_abs_heading_err_deg": round(
            float(np.median([abs(r["heading_err_deg"]) for r in rows]))
            if rows else 0.0, 1),
    }
    print(json.dumps(summary))
    out = args.out or os.path.join(args.model_dir, "diagnosis.json")
    with open(out, "w") as f:
        json.dump({"summary": summary, "collisions": rows}, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

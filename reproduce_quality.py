"""Regenerate the PERF.md navigation-quality table from scratch.

Trains every benchmark policy with fixed seeds (IL + RL per SURVEY.md §3.1
schedules), evaluates each on the 500 seeded test cases (the reference's
de-facto correctness protocol, SURVEY.md §4: ``test.py --phase test``), and
emits the aggregate table as markdown + JSON.

Usage:
    python reproduce_quality.py                 # all runs (~1-2 h on 1 chip)
    python reproduce_quality.py --only mprl,rgl # subset
    python reproduce_quality.py --skip_existing # reuse finished runs
    python reproduce_quality.py --table_only    # just re-emit the table

Each run shells out to the train/test CLIs so a crash in one run cannot take
down the queue, and every run keeps its own output dir + logs under data/.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))

# Run rows. Every row is EVALUATED on the same 5-human 500-case protocol
# (SURVEY.md §3.5 / paper Table I): CADRL trains single-human
# (multiagent_training=False parity) but tests with --human_num 5 like the
# reference's test.py does. ``train_args`` carry each committed run's full
# training provenance (seed / eval cadence / lr — ADVICE r3 #1: regeneration
# must reproduce the committed recipe, not a silently different default);
# they are appended after the defaults, and argparse takes the last
# occurrence. ``record`` names the eval JSON when planner/baseline overrides
# give it a suffix.
RUNS = [
    # untrained reciprocal-avoidance baseline, BOTH operating points
    # (paper Table I row reproduces at time_horizon=10 — PERF.md sweep)
    {"name": "orca", "policy": "orca"},
    {"name": "orca_th10", "policy": "orca",
     "test_args": ["--orca_time_horizon", "10"],
     "record": "eval_test_th10.json"},
    {"name": "mprl", "policy": "model_predictive_rl",
     "config": "configs/icra_benchmark/mp_separate.py"},
    {"name": "rgl", "policy": "rgl", "config": "configs/icra_benchmark/rgl.py"},
    {"name": "sarl", "policy": "sarl",
     "config": "configs/icra_benchmark/sarl.py"},
    {"name": "lstm_rl", "policy": "lstm_rl",
     "config": "configs/icra_benchmark/lstm_rl.py"},
    {"name": "cadrl", "policy": "cadrl",
     "config": "configs/icra_benchmark/cadrl.py",
     "test_args": ["--human_num", "5"]},
    {"name": "mp_unicycle", "policy": "model_predictive_rl",
     "config": "configs/icra_benchmark/mp_unicycle.py"},
    {"name": "sarl_om", "policy": "sarl",
     "config": "configs/icra_benchmark/sarl_om.py"},
    {"name": "mp_w4", "policy": "model_predictive_rl",
     "config": "configs/icra_benchmark/mp_w4.py"},
    # mp_w4 + eval cadence 250 (denser best-on-val selection), seed 2 —
    # the r3 quality-band run
    {"name": "mprl_fine", "policy": "model_predictive_rl",
     "config": "configs/icra_benchmark/mp_w4.py",
     "train_args": ["--evaluation_interval", "250", "--randomseed", "2"]},
    # mp_w4 + RL lr 5e-4 + eval cadence 250, seed 3 (best success/collision
    # pair of the r3 sweep)
    {"name": "mprl_band", "policy": "model_predictive_rl",
     "config": "configs/icra_benchmark/mp_w4.py",
     "train_args": ["--evaluation_interval", "250", "--randomseed", "3",
                    "--rl_learning_rate", "5e-4"]},
    # r5: the SHIPPED default recipe (cadence 250 / lr 5e-4 / val 200 now
    # live in the config itself), fresh seed 4 — the band-membership check.
    # train_args re-pin the config's own values over the historical
    # cadence-500 default this script passes for the older rows.
    {"name": "mp_default_r5", "policy": "model_predictive_rl",
     "config": "configs/icra_benchmark/mp_separate.py",
     "train_args": ["--evaluation_interval", "250", "--randomseed", "4",
                    "--rl_learning_rate", "5e-4"]},
    # r5 unicycle anneal stage 2: resumes the committed mp_unicycle
    # checkpoint — see configs/icra_benchmark/mp_unicycle_anneal.py for
    # the two-command recipe (this script lists it for the table; the
    # resume prep is manual because it starts from another run's
    # checkpoint).
]

# Rows whose canonical record is a COMMITTED run under results/ (headline
# checkpoints). When data/<name>/<record> is absent, the table uses
# results/<dir>/<record> instead of retraining from scratch, so a partial
# regeneration can never silently replace the headline with a weaker rerun
# (the r2 quality_table failure mode).
COMMITTED_FALLBACK = {
    "mprl": "results/mprl_td",
    "rgl": "results/rgl",
    "orca": "results/orca",
    "orca_th10": "results/orca_th10",
    "mprl_fine": "results/mprl_fine",
    "mprl_band": "results/mprl_band",
    "mp_default_r5": "results/mp_default_r5",
}


def _clean_env() -> dict:
    """Child env without the axon plugin's registration leftovers.

    Importing jax in THIS process exports registration state
    (_AXON_REGISTERED, AXON_POOL_SVC_OVERRIDE, TPU_*) into os.environ;
    a child CLI inheriting it reuses the parent's relay session and its
    big remote compiles hang (observed: 22+ min on programs that compile
    in ~35 s from a fresh environment). Children must re-register.
    """
    drop = ("_AXON_REGISTERED", "AXON_COMPAT_VERSION",
            "AXON_POOL_SVC_OVERRIDE", "TPU_ACCELERATOR_TYPE",
            "TPU_LIBRARY_PATH", "TPU_TOPOLOGY", "TPU_WORKER_HOSTNAMES")
    return {k: v for k, v in os.environ.items() if k not in drop}


def run(cmd: list[str], log_path: str) -> int:
    print(f"$ {' '.join(cmd)}  (log: {log_path})", flush=True)
    with open(log_path, "a") as f:
        return subprocess.call(cmd, stdout=f, stderr=subprocess.STDOUT,
                               cwd=HERE, env=_clean_env())


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--only", default=None,
                   help="comma-separated run names to include")
    p.add_argument("--skip_existing", action="store_true",
                   help="skip runs whose eval_test.json already exists")
    p.add_argument("--table_only", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data_dir", default="data")
    args = p.parse_args()

    only = set(args.only.split(",")) if args.only else None
    runs = [r for r in RUNS if only is None or r["name"] in only]
    os.makedirs(os.path.join(HERE, args.data_dir), exist_ok=True)

    if not args.table_only:
        for r in runs:
            name, policy = r["name"], r["policy"]
            config = r.get("config")
            record = r.get("record", "eval_test.json")
            outdir = os.path.join(HERE, args.data_dir, name)
            done = os.path.join(outdir, record)
            if args.skip_existing and os.path.exists(done):
                print(f"[{name}] {record} exists — skipping", flush=True)
                continue
            fb = COMMITTED_FALLBACK.get(name)
            if (args.skip_existing and fb is not None
                    and os.path.exists(os.path.join(HERE, fb, record))):
                print(f"[{name}] using committed {fb} — skipping retrain",
                      flush=True)
                continue
            os.makedirs(outdir, exist_ok=True)
            log = os.path.join(outdir, "reproduce.log")
            t0 = time.time()
            if config is not None:  # no config → untrained baseline policy
                rc = run([sys.executable, "-m",
                          "relationalgraphlearning_tpu.cli.train",
                          "--policy", policy, "--config", config,
                          "--output_dir", outdir, "--overwrite",
                          "--evaluation_interval", "500",
                          "--val_size", "200",
                          "--randomseed", str(args.seed)]
                         + r.get("train_args", []), log)
                if rc != 0:
                    print(f"[{name}] TRAIN FAILED rc={rc} — see {log}",
                          flush=True)
                    continue
            rc = run([sys.executable, "-m",
                      "relationalgraphlearning_tpu.cli.test",
                      "--policy", policy, "--model_dir", outdir,
                      "--phase", "test"] + r.get("test_args", []), log)
            status = "ok" if rc == 0 else f"EVAL FAILED rc={rc}"
            print(f"[{name}] {status} ({time.time() - t0:.0f}s)", flush=True)

    # ------------------------------------------------------------- the table
    rows = []
    for r in runs:
        name = r["name"]
        record = r.get("record", "eval_test.json")
        path = os.path.join(HERE, args.data_dir, name, record)
        if not os.path.exists(path) and name in COMMITTED_FALLBACK:
            path = os.path.join(HERE, COMMITTED_FALLBACK[name], record)
        if not os.path.exists(path):
            rows.append((name, None))
            continue
        with open(path) as f:
            rows.append((name, json.load(f)))

    header = ("| Policy | Success | Collision | Timeout | Nav time | Return |\n"
              "|---|---|---|---|---|---|")
    lines = [header]
    for name, r in rows:
        if r is None:
            lines.append(f"| {name} | — (missing) | | | | |")
        else:
            lines.append(
                f"| {name} | {r['success_rate']:.3f} | "
                f"{r['collision_rate']:.3f} | {r['timeout_rate']:.3f} | "
                f"{r['nav_time']:.2f} s | {r['return']:.3f} |")
    if any(name == "orca" for name, _ in rows):
        lines.append(
            "\norca = untrained reciprocal-avoidance baseline at the "
            "faithful RVO2 defaults (safety_space=0, time_horizon=5); "
            "orca_th10 = the SAME policy at time_horizon=10, which "
            "reproduces the paper's ~0.43/0.57 Table I row — the invisible-"
            "robot protocol makes the row hypersensitive to how early the "
            "one-sided avoidance constraint bites (full sweep: PERF.md).")
    lines.append(
        "\nSeed robustness (r4): the headline recipe over seeds 0–3 gives "
        "success 0.963 ± 0.028 (per-seed records + summary: "
        "results/mprl_band_seeds/); the dense-selection variant (eval "
        "cadence 250) is tighter — records under results/mprl_b250_seeds/. "
        "Single-seed rows in this table are labeled as such.")
    lines.append(
        "\nThe paper's core claim — d-step planning beats one-step — holds "
        "on the SAME checkpoints: mprl d=2 0.990 vs its d=1 ablation 0.968 "
        "(results/mprl_td/eval_test_d1.json); mprl_fine d=2 0.980 vs d=1 "
        "0.942 (results/mprl_fine/eval_test_d1.json). Best overall row: "
        "the lr 5e-4 checkpoint under the w=4 planner — 0.992 success / "
        "10.92 s, inside the paper band on every axis "
        "(results/mprl_td_lr5e4/eval_test_w4.json). mp_unicycle is the "
        "ActionRot (rotation-constrained) variant — a harder control "
        "problem the reference never benchmarks for MPRL; its table row is "
        "the trained π/4 planner, and eval-time action-space re-shaping "
        "(rotation_constraint π/3 + width 8 on the SAME checkpoint) lifts "
        "it to 0.938/0.036 "
        "(results/mp_unicycle/eval_test_w8_rc1.0472.json, diagnosis in "
        "PERF.md).")
    table = "\n".join(lines)
    print(table, flush=True)
    out = os.path.join(HERE, args.data_dir, "quality_table.md")
    with open(out, "w") as f:
        f.write(table + "\n")
    with open(os.path.join(HERE, args.data_dir, "quality_table.json"), "w") as f:
        json.dump({name: r for name, r in rows}, f, indent=1)
    print(f"wrote {out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""PPO quad baseline tuning sweep (round-4 verdict #6).

The head-to-head table's "PPO (2M)" row shipped from a single training
run, leaving the "APG beats model-free RL" claim open to a
tuning objection. This driver runs the small grid the reference's own
baseline setup spans (reward shaping ∈ {mario, mpc} —
``rl_envs.py:227-308`` — × Adam lr ∈ {1e-4, 3e-4, 1e-3}) at the full 2M
budget and speed 0.4, evaluates every cell on the EXACT published
head-to-head protocol, and publishes best-of.

The two shipped 3e-4 checkpoints (assets/quad_ppo_2m mario,
assets/quad_ppo_mpc_2m mpc) are reused as their grid cells. If a swept
cell beats the incumbent on stable ratio (tiebreak: divergence), its
checkpoint replaces ``assets/quad_ppo_2m`` (config records the winning
recipe) so the regenerated quad table row is the sweep's best.

Writes ``docs/ppo_sweep.json``.

Usage: python scripts/ppo_sweep.py [--eval 100] [--timesteps 2000000]
"""

import argparse
import json
import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SHIPPED = {
    ("mario", 3e-4): "assets/quad_ppo_2m",
    ("mpc", 3e-4): "assets/quad_ppo_mpc_2m",
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--eval", type=int, default=100)
    parser.add_argument("--timesteps", type=int, default=2_000_000)
    parser.add_argument("--speed", type=float, default=0.4)
    parser.add_argument("--lrs", type=float, nargs="*",
                        default=[1e-4, 3e-4, 1e-3])
    parser.add_argument("--rewards", nargs="*", default=["mario", "mpc"])
    parser.add_argument("--promote", action="store_true",
                        help="copy the winning checkpoint over "
                             "assets/quad_ppo_2m")
    parser.add_argument("--out", default="docs/ppo_sweep.json")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    if args.cpu:
        from apg_trajectory_tracking_tpu.utils.backend import (
            force_cpu_backend,
        )

        force_cpu_backend()

    import numpy as np
    import jax.numpy as jnp

    import compare_baselines as cb

    cells = {}
    for reward in args.rewards:
        for lr in args.lrs:
            key = (reward, lr)
            if key in SHIPPED and os.path.exists(
                os.path.join(SHIPPED[key], "model_ppo.npz")
            ):
                cells[key] = SHIPPED[key]
                continue
            name = f"ppo_sweep_{reward}_{lr:g}"
            run_dir = os.path.join("trained_models", "quad", name)
            if not os.path.exists(os.path.join(run_dir, "model_ppo.npz")):
                cmd = [
                    sys.executable,
                    os.path.join(REPO, "scripts", "ppo_baseline.py"),
                    "-r", "quad", "--reward", reward, "--lr", str(lr),
                    "--speed", str(args.speed),
                    "--timesteps", str(args.timesteps), "-s", name,
                ]
                if args.cpu:
                    cmd.append("--cpu")
                print("training", name, flush=True)
                subprocess.run(cmd, check=True)
            cells[key] = run_dir

    references, n = cb.quad_references(
        "data/traj_data_full", args.eval, 0.1, args.speed
    )
    refs = jnp.asarray(np.asarray(references))

    results = {}
    for (reward, lr), run_dir in cells.items():
        m = cb.eval_ppo(run_dir, refs, 0.1, 10, 1.0, args.speed)
        results[f"{reward} lr={lr:g}"] = {
            "dir": run_dir,
            "reward": reward,
            "lr": lr,
            **{k: m[k] for k in (
                "mean_divergence", "mean_divergence_ci", "ratio_stable",
                "ratio_stable_ci", "n",
            )},
        }
        print(f"{reward} lr={lr:g}:", json.dumps(
            {"stable": m["ratio_stable"], "err": round(m["mean_divergence"], 4)}
        ), flush=True)

    best_key = min(
        results,
        key=lambda k: (-results[k]["ratio_stable"],
                       results[k]["mean_divergence"]),
    )
    out = {
        "protocol": (
            f"{n} distinct full-bank test trajectories (draw seed 42), "
            f"speed {args.speed}, thresh_div 1.0, test-time break — the "
            "published head-to-head protocol; all cells trained 2M steps "
            "at the eval speed"
        ),
        "n": n,
        "grid": results,
        "best": best_key,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print("best:", best_key, "wrote", args.out)

    if args.promote:
        win = results[best_key]
        target = "assets/quad_ppo_2m"
        if win["dir"] != target:
            shutil.copy(
                os.path.join(win["dir"], "model_ppo.npz"),
                os.path.join(target, "model_ppo.npz"),
            )
            with open(os.path.join(target, "config.json"), "w") as f:
                json.dump({
                    "robot": "quad", "timesteps": args.timesteps,
                    "speed_factor": args.speed, "reward": win["reward"],
                    "lr": win["lr"],
                    "selected_by": "docs/ppo_sweep.json",
                }, f)
            print(f"promoted {win['dir']} -> {target}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Per-trajectory feasibility accounting at the speed-0.5 wall.

DESIGN.md §6 argues the wall is the ±0.5 rad/s body-rate box, in
aggregate (3.7% of steps over the cap). The round-4 verdict asks the
sharper question: is the *residual* specialist-vs-teacher stability gap
(66% vs 77% on `docs/wall_protocol.json`) also action-space-shaped, or
is it amortization the student could still close?

This driver answers per trajectory, on the exact wall-protocol draw:
  1. compute each trajectory's infeasibility (steps whose required
     attitude slew exceeds the cap — `speed_feasibility.required_tilt_rate`);
  2. roll out the specialists and the h=20 MPC teacher with per-episode
     stable outcomes (identical semantics to the published wall rows);
  3. bucket episodes by infeasible-step count and cross-tabulate: where
     does each controller fail, and how do student-only failures
     distribute over feasibility?

Writes ``docs/wall_feasibility_accounting.json``; quoted in DESIGN.md §6.

Usage: python scripts/wall_feasibility_accounting.py [--eval 100] [--cpu]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

RATE_CAP = 0.5


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--eval", type=int, default=100)
    parser.add_argument("--speed", type=float, default=0.5)
    parser.add_argument("--mpc_iters", type=int, default=100)
    parser.add_argument("--models", nargs="*", default=[
        "assets/quad_mpc_distilled_s05",
        "assets/quad_mpc_distilled_s05_h14",
        "assets/quad_mpc_distilled_s05_ff",
    ])
    parser.add_argument("--out", default="docs/wall_feasibility_accounting.json")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    if args.cpu:
        from apg_trajectory_tracking_tpu.utils.backend import (
            force_cpu_backend,
        )

        force_cpu_backend()

    import numpy as np
    import jax.numpy as jnp

    from make_tables import wide_references
    from speed_feasibility import required_tilt_rate
    from evaluate_quad import load_quad_controller, eval_kwargs_for
    from apg_trajectory_tracking_tpu.controllers.mpc import MPC
    from apg_trajectory_tracking_tpu.dynamics.quad import (
        quad_params,
        quad_step,
    )
    from apg_trajectory_tracking_tpu.evaluation.quad_eval import (
        follow_trajectories,
    )
    from apg_trajectory_tracking_tpu.evaluation.compare import (
        mpc_follow_trajectories,
    )
    from apg_trajectory_tracking_tpu.evaluation.stats import wilson_ci

    refs, n = wide_references(args.eval, speed=args.speed)
    dt = 0.1
    ref_len = refs.shape[1] - 10  # the shared protocol span
    dyn = quad_params()

    # 1. per-trajectory infeasibility over the FLOWN portion only —
    # rollouts execute steps 0..ref_len, so over-cap slews in the final
    # (never-flown) reference rows must not bucket a trajectory
    over_cap = np.array([
        int((required_tilt_rate(r[: ref_len + 1, :3], dt)
             > RATE_CAP).sum())
        for r in refs
    ])

    def per_episode_stable(roll):
        divs = np.asarray(roll["divergences"])
        valid = np.asarray(roll["valid"])
        counts = ((divs < 1.0) & valid).sum(axis=1)
        return counts == min(divs.shape[1], ref_len + 1)

    # 2. rollouts with per-episode outcomes (wall-protocol semantics)
    outcomes = {}
    for model_dir in args.models:
        net, cfg = load_quad_controller(model_dir)
        kw = eval_kwargs_for(cfg, n)
        kw.setdefault("window_len", cfg.get("ref_length", cfg["horizon"]))
        kw.setdefault("net_window", cfg.get("net_window", cfg["horizon"]))
        roll = follow_trajectories(
            net, dyn, jnp.asarray(refs), ref_len, thresh_div=1.0,
            thresh_stable=1.0, horizon=cfg["horizon"], dt=dt,
            test_time=True, **kw,
        )
        outcomes[os.path.basename(model_dir)] = per_episode_stable(roll)

    mpc = MPC(horizon=20, dt=dt, dynamics="flightmare", solver="adam",
              n_iters=args.mpc_iters)
    roll = mpc_follow_trajectories(
        mpc._solve, dyn, jnp.asarray(refs), ref_len, thresh_div=1.0,
        thresh_stable=1.0, dyn_step=quad_step, horizon=20, dt=dt,
    )
    outcomes["MPC (adam, h=20)"] = per_episode_stable(roll)

    # 3. buckets + cross-tabulation
    buckets = {
        "feasible (0 steps over cap)": over_cap == 0,
        "marginal (1-2 steps)": (over_cap >= 1) & (over_cap <= 2),
        "infeasible (3+ steps)": over_cap >= 3,
    }
    teacher = outcomes["MPC (adam, h=20)"]
    result = {
        "protocol": (
            f"{n} wall-protocol trajectories (draw seed 42, speed "
            f"{args.speed}), thresh_div 1.0, test-time break; "
            f"infeasibility = steps whose required attitude slew exceeds "
            f"{RATE_CAP} rad/s (speed_feasibility.required_tilt_rate)"
        ),
        "n": n,
        "over_cap_distribution": {
            k: int(m.sum()) for k, m in buckets.items()
        },
        "stable_by_bucket": {},
        "cross_tab": {},
    }
    for name, stable in outcomes.items():
        by_bucket = {}
        for bname, mask in buckets.items():
            cnt = int(mask.sum())
            if cnt == 0:
                continue
            s = int(stable[mask].sum())
            by_bucket[bname] = {
                "stable": s, "n": cnt, "ratio": s / cnt,
                "ratio_ci": list(wilson_ci(s, cnt)),
            }
        result["stable_by_bucket"][name] = by_bucket
        if name != "MPC (adam, h=20)":
            s_fail = ~stable
            t_fail = ~teacher
            both = s_fail & t_fail
            student_only = s_fail & teacher
            result["cross_tab"][name] = {
                "teacher_failures": int(t_fail.sum()),
                "student_failures": int(s_fail.sum()),
                "shared_failures": int(both.sum()),
                "student_only_failures": int(student_only.sum()),
                "student_only_mean_over_cap": (
                    float(over_cap[student_only].mean())
                    if student_only.any() else None
                ),
                "all_traj_mean_over_cap": float(over_cap.mean()),
                "student_only_over_cap_counts": (
                    over_cap[student_only].tolist()
                ),
            }

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result["stable_by_bucket"], indent=1))
    print(json.dumps(result["cross_tab"], indent=1))
    print("wrote", args.out)


if __name__ == "__main__":
    main()

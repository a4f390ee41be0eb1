#!/usr/bin/env python
"""Speed-0.5 feasibility analysis (VERDICT r1 #8).

Derives, from the trajectory bank itself, the attitude slew rate a quad
must sustain to track each replay speed, and compares it against the
Flightmare action space's body-rate box (|rate| <= 0.5 rad/s,
quad_dynamics_flightmare.py:139-140 / dynamics/quad.py action map
``a - 0.5``).

Tracking a position trajectory with acceleration a(t) requires the thrust
axis to align with a(t) + g*z_hat; the angular speed of that axis is the
minimum attitude slew rate, and roll/pitch slew is capped by the rate box
(the inner rate loop with kinv=16.6 converges in ~0.06 s << dt, so the cap
is the binding constraint). Where the required rate exceeds 0.5 rad/s the
tracking error must grow regardless of the learner — the bound is the
action space.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from apg_trajectory_tracking_tpu.trajectory.generate import (  # noqa: E402
    ensure_trajectory_bank,
    load_trajectory_bank,
    prepare_trajectory,
)

G = 9.81


def required_tilt_rate(pos, dt):
    """Angular speed (rad/s) of the required thrust axis along a position
    trajectory sampled at dt."""
    vel = np.gradient(pos, dt, axis=0)
    acc = np.gradient(vel, dt, axis=0)
    thrust = acc + np.array([0.0, 0.0, G])
    thrust /= np.linalg.norm(thrust, axis=1, keepdims=True)
    dots = np.clip(np.sum(thrust[:-1] * thrust[1:], axis=1), -1.0, 1.0)
    return np.arccos(dots) / dt


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", default="data/traj_data_full")
    parser.add_argument("--dt", type=float, default=0.1)
    parser.add_argument("--rate_cap", type=float, default=0.5)
    parser.add_argument("--speeds", type=float, nargs="*",
                        default=[0.2, 0.3, 0.4, 0.5, 0.6])
    args = parser.parse_args()

    bank = load_trajectory_bank(
        ensure_trajectory_bank(args.data_dir), test=True
    )
    print(f"{len(bank)} test trajectories, rate cap {args.rate_cap} rad/s")
    print("speed | median | p90 | p99 | max  | frac steps > cap")
    for sf in args.speeds:
        rates = []
        for traj in bank:
            ref = prepare_trajectory(traj, args.dt, sf)
            rates.append(required_tilt_rate(ref[:, :3], args.dt))
        rates = np.concatenate(rates)
        print(
            f"{sf:.1f}  | {np.median(rates):.3f}  | "
            f"{np.percentile(rates, 90):.3f} | "
            f"{np.percentile(rates, 99):.3f} | {rates.max():.3f} | "
            f"{float((rates > args.rate_cap).mean()):.4f}"
        )


if __name__ == "__main__":
    main()

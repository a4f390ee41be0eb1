#!/usr/bin/env python
"""Generate the random-trajectory dataset (counterpart of the reference's
scripts/generate_trajectories.py)."""

import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from apg_trajectory_tracking_tpu.trajectory.generate import (
    generate_trajectory_bank,
)

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="data/traj_data")
    parser.add_argument("--n_train", type=int, default=200)
    parser.add_argument("--n_test", type=int, default=20)
    parser.add_argument("--duration", type=float, default=10.0)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    generate_trajectory_bank(
        args.out, n_train=args.n_train, n_test=args.n_test,
        duration=args.duration, seed=args.seed,
    )
    print(f"wrote {args.n_train}+{args.n_test} trajectories to {args.out}")

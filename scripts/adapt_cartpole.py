#!/usr/bin/env python
"""Cartpole dynamics-adaptation experiment (counterpart of the reference's
scripts/train_cartpole.py -t adapt with a wind mismatch)."""

import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-s", "--save_name", default="adapt")
    parser.add_argument("--wind", type=float, default=0.5)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--train-params", action="store_true",
                        help="also train physical parameters (not just the residual)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    if args.cpu:
        from apg_trajectory_tracking_tpu.utils.backend import (
            force_cpu_backend,
        )

        force_cpu_backend()

    from apg_trajectory_tracking_tpu.training.adapt import TrainCartpoleAdapt
    from apg_trajectory_tracking_tpu.training.common import load_config

    config = load_config("cartpole", {"thresh_div_start": 0.2})
    trainer = TrainCartpoleAdapt(
        config,
        modified_params={"wind": args.wind},
        train_base_params=args.train_params,
        seed=args.seed,
        save_name=args.save_name,
    )
    gap_adapted, gap_analytic = trainer.dynamics_gap()
    print(f"one-step gap before: adapted {gap_adapted:.5f} "
          f"analytic {gap_analytic:.5f}")
    trainer.run_dynamics(args.epochs)
    gap_adapted, gap_analytic = trainer.dynamics_gap()
    print(f"one-step gap after:  adapted {gap_adapted:.5f} "
          f"analytic {gap_analytic:.5f}")


if __name__ == "__main__":
    main()

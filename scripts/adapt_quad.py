#!/usr/bin/env python
"""Quad dynamics-adaptation experiment CLI (train_drone.py:260-279):
fit a residual dynamics model to a mismatched quad env, then continue
training the controller against the adapted model."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-s", "--save_name", default="adapt_quad")
    parser.add_argument("--base_model", default=None,
                        help="pretrained controller dir to adapt")
    parser.add_argument("--epochs", type=int, default=20)
    parser.add_argument("--dyn_epochs", type=int, default=5,
                        help="dynamics fitting through this epoch inclusive "
                             "(reference train_base.py:343 semantics); "
                             "controller training afterwards")
    parser.add_argument("--modified_params", default=None,
                        help='JSON dict of the mismatch, e.g. '
                             '\'{"translational_drag": [0.3,0.3,0.3]}\'')
    parser.add_argument("--train_base_params", action="store_true",
                        help="also fit physical params, not just the residual")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    if args.cpu:
        from apg_trajectory_tracking_tpu.utils.backend import (
            force_cpu_backend,
        )

        force_cpu_backend()

    from apg_trajectory_tracking_tpu.training.adapt import TrainQuadAdapt

    mp = json.loads(args.modified_params) if args.modified_params else None
    trainer = TrainQuadAdapt(
        modified_params=mp, base_model=args.base_model,
        train_base_params=args.train_base_params, seed=args.seed,
        save_name=args.save_name,
    )
    adapted0, analytic0 = trainer.dynamics_gap()
    trainer.run_dynamics(
        nr_epochs=args.epochs, train_dyn_for_epochs=args.dyn_epochs
    )
    adapted, analytic = trainer.dynamics_gap()
    print(
        f"dynamics gap vs mismatched env: analytic {analytic:.5f}, "
        f"adapted {adapted:.5f} (before fit: {adapted0:.5f})"
    )
    true_env = trainer.evaluate_mismatched()
    print(
        "mismatched-env tracking: div %.3f, success %.1f"
        % (true_env["mean_divergence"], true_env["mean_success"])
    )


if __name__ == "__main__":
    main()

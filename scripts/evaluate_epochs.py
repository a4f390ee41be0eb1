#!/usr/bin/env python
"""Evaluate all epoch-suffixed checkpoints of a quad model -> CSV
(counterpart of the reference's scripts/evaluate_epochs.py)."""

import argparse
import csv
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from apg_trajectory_tracking_tpu.utils.checkpoints import resolve_model_dir  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-m", "--model", default="test")
    parser.add_argument("-a", "--eval", type=int, default=10)
    parser.add_argument("--data_dir", default="data/traj_data")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    if args.cpu:
        from apg_trajectory_tracking_tpu.utils.backend import (
            force_cpu_backend,
        )

        force_cpu_backend()

    import numpy as np
    import jax.numpy as jnp
    from evaluate_quad import load_quad_controller
    from apg_trajectory_tracking_tpu.dynamics.quad import quad_params
    from apg_trajectory_tracking_tpu.evaluation.quad_eval import run_eval
    from apg_trajectory_tracking_tpu.trajectory.generate import (
        ensure_trajectory_bank,
        load_trajectory_bank,
        prepare_trajectory,
    )

    model_path = resolve_model_dir(args.model, "quad")
    # epoch snapshots exist in either checkpoint backend: model_quadN.npz
    # files or model_quadN.orbax directories
    epochs = sorted({
        int(m.group(1))
        for f in os.listdir(model_path)
        if (m := re.match(r"model_quad(\d+)\.(npz|orbax)", f))
    })
    if not epochs:
        print("no epoch checkpoints found")
        return

    bank = load_trajectory_bank(
        ensure_trajectory_bank(args.data_dir), test=True
    )
    dyn = quad_params()
    rows = []
    for ep in epochs:
        net, cfg = load_quad_controller(model_path, str(ep))
        speed = cfg.get("speed_factor", 0.4)
        dt, horizon = cfg.get("dt", cfg["delta_t"]), cfg["horizon"]
        rng = np.random.RandomState(42)
        idx = rng.randint(len(bank), size=args.eval)
        refs = np.stack(
            [prepare_trajectory(bank[i], dt, speed) for i in idx]
        )
        refs[:, :, 2] += 3.0
        metrics, _ = run_eval(
            net, dyn, jnp.asarray(refs), refs.shape[1] - horizon,
            thresh_div=1.0, horizon=horizon, dt=dt, test_time=True,
        )
        rows.append(
            [ep, metrics["mean_divergence"], metrics["std_divergence"],
             metrics["ratio_stable"]]
        )
        print(rows[-1])

    out = os.path.join(model_path, "epoch_sweep.csv")
    with open(out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["epoch", "mean_divergence", "std_divergence",
                    "ratio_stable"])
        w.writerows(rows)
    print("wrote", out)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Rate-cap ablation for the speed-0.5 analysis (VERDICT r1 #8).

Trains a quad controller at fixed speed 0.5 with the body-rate box widened
by ``--scale`` (action map becomes ``(a - 0.5) * scale`` rad/s; scale 1 is
the reference Flightmare action space) and evaluates on distinct test
trajectories at the same speed with the same widened dynamics. If the
widened controller tracks where the scale-1 controller cannot, the
speed-0.5 bound is the action space, not the learner — the claim derived
analytically in scripts/speed_feasibility.py.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--scale", type=float, default=2.0)
    parser.add_argument("--speed", type=float, default=0.5)
    parser.add_argument("--epochs", type=int, default=300)
    parser.add_argument("--eval", type=int, default=50)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("-s", "--save_name", default=None)
    parser.add_argument("--data_dir", default="data/traj_data_full")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    if args.cpu:
        from apg_trajectory_tracking_tpu.utils.backend import (
            force_cpu_backend,
        )

        force_cpu_backend()

    import numpy as np
    import jax.numpy as jnp

    from apg_trajectory_tracking_tpu.dynamics.quad import quad_step
    from apg_trajectory_tracking_tpu.training.common import load_config
    from apg_trajectory_tracking_tpu.training.train_quad import TrainQuad

    scale = float(args.scale)

    def widened_step(params, state, action, dt):
        # body-rate channels stretched: desired rate = (a - 0.5) * scale
        a = jnp.concatenate(
            [
                action[..., :1],
                (action[..., 1:4] - 0.5) * scale + 0.5,
            ],
            axis=-1,
        )
        return quad_step(params, state, a, dt)

    dyn_step = quad_step if scale == 1.0 else widened_step
    save_name = args.save_name or f"ratecap_s{scale}_v{args.speed}"
    cfg = load_config(
        "quad", {"speed_factor": args.speed, "nr_epochs": args.epochs}
    )
    trainer = TrainQuad(
        config=cfg, seed=args.seed, save_name=save_name,
        curriculum=False, dyn_step=dyn_step, data_dir=args.data_dir,
    )
    trainer.fit(args.epochs, verbose=True)

    # eval on distinct test trajectories at the training speed
    from apg_trajectory_tracking_tpu.evaluation.quad_eval import run_eval
    from apg_trajectory_tracking_tpu.trajectory.generate import (
        load_trajectory_bank,
        prepare_trajectory,
    )

    bank = load_trajectory_bank(args.data_dir, test=True)
    rng = np.random.RandomState(42)
    idx = rng.choice(len(bank), size=min(args.eval, len(bank)),
                     replace=False)
    refs = np.stack(
        [prepare_trajectory(bank[i], trainer.dt, args.speed) for i in idx]
    )
    refs[:, :, 2] += 3.0
    metrics, _ = run_eval(
        trainer.net, trainer.eval_dyn, jnp.asarray(refs),
        refs.shape[1] - trainer.horizon, thresh_div=1.0, thresh_stable=1.0,
        horizon=trainer.horizon, dt=trainer.dt, test_time=True,
        dyn_step=dyn_step,
    )
    print(json.dumps({"scale": scale, "speed": args.speed, **metrics}))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Evaluate a trained cartpole controller (counterpart of the reference's
scripts/evaluate_cartpole.py): balance and swing-up metrics + robustness."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_cartpole_controller(model_path, epoch=""):
    import jax
    from apg_trajectory_tracking_tpu.models import init_cartpole_net
    from apg_trajectory_tracking_tpu.utils.checkpoints import (
        load_checkpoint,
        load_config,
    )

    cfg = load_config(model_path)
    template = init_cartpole_net(
        jax.random.PRNGKey(0), cfg["state_size"],
        cfg["horizon"] * cfg["action_dim"],
    )
    net = load_checkpoint(model_path, "model_cartpole" + epoch, template)
    return net, cfg


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-m", "--model", default="test")
    parser.add_argument("-e", "--epoch", default="")
    parser.add_argument("-a", "--eval", type=int, default=10)
    parser.add_argument("--swingup", action="store_true")
    parser.add_argument("--sweep", action="store_true")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
        try:
            from jax.extend.backend import clear_backends

            clear_backends()
        except Exception:
            pass

    import jax
    from apg_trajectory_tracking_tpu.dynamics.cartpole import (
        cartpole_params,
        DEFAULT_CARTPOLE_CFG,
    )
    from apg_trajectory_tracking_tpu.evaluation.cartpole_eval import (
        evaluate_balance,
        evaluate_swingup,
    )
    from apg_trajectory_tracking_tpu.evaluation.robustness import param_sweep

    model_path = os.path.join("trained_models", "cartpole", args.model)
    net, cfg = load_cartpole_controller(model_path, args.epoch)
    dt, horizon = cfg["delta_t"], cfg["horizon"]

    def eval_with(modified_params):
        dyn = cartpole_params(modified_params)
        if args.swingup:
            res = evaluate_swingup(
                net, dyn, jax.random.PRNGKey(42), nr_iters=args.eval,
                dt=dt, horizon=horizon,
            )
        else:
            res = evaluate_balance(
                net, dyn, nr_iters=args.eval, dt=dt, horizon=horizon
            )
        return {k: float(v) for k, v in res.items()}

    if args.sweep:
        keys = {
            k: v for k, v in DEFAULT_CARTPOLE_CFG.items()
            if k in ("masscart", "masspole", "length", "max_force_mag",
                     "friction")
        }
        print(json.dumps(param_sweep(eval_with, keys), indent=1,
                         default=float))
        return
    print(json.dumps(eval_with({}), default=float))


if __name__ == "__main__":
    main()

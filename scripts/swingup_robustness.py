#!/usr/bin/env python
"""Swing-up under dynamics mismatch: amortized APG vs replanning iLQR.

The swing-up head-to-head (make_tables.py::swingup_section) is evaluated
on nominal dynamics. This sweep perturbs one physical parameter of the
*plant* at a time (the reference's robustness protocol,
``evaluate_base.py:53-114``: scale 1.0..1.9) while both controllers keep
their nominal internal models:

  * APG ``cartpole_swingup_trained`` — the pump-up is baked into the
    weights at training time (amortized offline);
  * the two-start warm iLQR (``make_cartpole_swingup_ilqr``) — replans
    every step through its nominal model against the perturbed plant;
  * the two-start CEM (``make_cartpole_swingup_cem``) — the sampling
    solver family under the same mismatch.

Writes ``docs/swingup_robustness.json``; quoted in DESIGN.md §4.

Usage: python scripts/swingup_robustness.py [--eval 20] [--cpu]
       [--factors 1.3,1.6,1.9] [--out docs/swingup_robustness.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PARAMS = ("masspole", "masscart", "length", "friction", "max_force_mag")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--eval", type=int, default=20)
    parser.add_argument("--factors", default="1.3,1.6,1.9")
    parser.add_argument("--out", default="docs/swingup_robustness.json")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    if args.cpu:
        from apg_trajectory_tracking_tpu.utils.backend import (
            force_cpu_backend,
        )

        force_cpu_backend()

    import jax

    from apg_trajectory_tracking_tpu.controllers.cem import (
        make_cartpole_swingup_cem,
    )
    from apg_trajectory_tracking_tpu.controllers.ilqr import (
        make_cartpole_swingup_ilqr,
    )
    from apg_trajectory_tracking_tpu.dynamics.cartpole import (
        DEFAULT_CARTPOLE_CFG,
        cartpole_params,
    )
    from apg_trajectory_tracking_tpu.evaluation.cartpole_eval import (
        swingup_metrics,
    )
    from apg_trajectory_tracking_tpu.evaluation.robustness import (
        increase_param,
    )
    from apg_trajectory_tracking_tpu.models import init_cartpole_net
    from apg_trajectory_tracking_tpu.utils.checkpoints import load_checkpoint

    factors = [float(f) for f in args.factors.split(",")]
    key = jax.random.PRNGKey(42)
    nominal = cartpole_params()

    net = load_checkpoint(
        "assets/cartpole_swingup_trained", "model_cartpole",
        init_cartpole_net(jax.random.PRNGKey(0), 4, 10),
    )
    # controllers keep their nominal internal model throughout the sweep
    ilqr_apply, ilqr_init = make_cartpole_swingup_ilqr(nominal)
    cem_apply, cem_init = make_cartpole_swingup_cem(nominal)

    def eval_both(plant):
        apg = swingup_metrics(net, plant, key, nr_iters=args.eval)
        ilqr = swingup_metrics(
            None, plant, key, nr_iters=args.eval,
            net_apply=ilqr_apply, horizon=60, init_carry=ilqr_init,
        )
        cem = swingup_metrics(
            None, plant, key, nr_iters=args.eval,
            net_apply=cem_apply, horizon=60, init_carry=cem_init,
        )
        keep = ("success_rate", "success_rate_ci", "mean_vel",
                "mean_final_angle", "n")
        return {
            "apg_swingup_trained": {k: apg[k] for k in keep},
            "ilqr_two_start": {k: ilqr[k] for k in keep},
            "cem_two_start": {k: cem[k] for k in keep},
        }

    results = {"nominal": eval_both(nominal)}
    print("nominal", json.dumps(results["nominal"]), flush=True)
    for name in PARAMS:
        results[name] = {}
        for f in factors:
            plant = cartpole_params(
                {name: increase_param(DEFAULT_CARTPOLE_CFG[name], f)}
            )
            results[name][str(f)] = eval_both(plant)
            r = results[name][str(f)]
            print(
                f"{name} x{f}: apg "
                f"{r['apg_swingup_trained']['success_rate']:.2f} / ilqr "
                f"{r['ilqr_two_start']['success_rate']:.2f} / cem "
                f"{r['cem_two_start']['success_rate']:.2f}", flush=True,
            )

    out = {
        "protocol": (
            f"swing-up protocol (250 steps, burn-in 100, |theta|<=1), "
            f"n={args.eval} hanging starts (seed 42) per cell; plant "
            "parameter scaled by the factor, controllers keep nominal "
            "internal models"
        ),
        "factors": factors,
        "results": results,
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Repair the published quad robustness failure modes with the adaptation
loop (the reference's train_dynamics experiment, train_drone.py:260-299,
evaluated with the evaluate_base.py:68-114 sweep semantics).

The README robustness table shows three killer cells for the pure-APG
champion `quad_trained_9k`: 1.3x kinv_ang_vel_tau, 1.9x rotational drag
and 1.9x translational drag all reach 0% stable on the published
protocol. This driver runs the quad run_dynamics/residual-sysid
alternation (``TrainQuadAdapt``) against each mismatched plant, starting
from the published checkpoint, and re-scores the adapted controller on
the EXACT published robustness protocol (same bank, same seed-42
trajectory draw, same thresholds, same rollout semantics as
``make_tables.py robustness``).

Writes ``docs/robustness_adapt.json`` with per-cell
before / adapted-after rows (n + 95% CIs) plus the one-step dynamics
gaps; rendered into the README by ``make_tables.py``'s
``robustness_adapt_block``.

Usage: python scripts/adapt_quad.py [--eval 20] [--epochs 25]
       [--dyn_epochs 8] [--cells kinv,rot,trans] [--cpu]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CELLS = {
    "kinv": ("kinv_ang_vel_tau", 1.3),
    "rot": ("rotational_drag", 1.9),
    "trans": ("translational_drag", 1.9),
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--base_model", default="assets/quad_trained_9k")
    parser.add_argument("--eval", type=int, default=20)
    parser.add_argument("--epochs", type=int, default=25)
    parser.add_argument("--dyn_epochs", type=int, default=8)
    parser.add_argument("--cells", default="kinv,rot,trans")
    parser.add_argument("--epoch_size", type=int, default=512)
    parser.add_argument("--self_play", type=float, default=0.5)
    parser.add_argument("--sysid", default="rate",
                        choices=["none", "rate", "all"],
                        help="which physical params the fit may train: "
                             "'rate' = the identifiable rate/drag triple "
                             "(mass/arm/inertia provably cancel), 'all' = "
                             "every base leaf (the reference's "
                             "ParameterDict), 'none' = residual only")
    parser.add_argument("--base_lr", type=float, default=0.02,
                        help="Adam lr for the physical params (O(1..20) "
                             "scale vs the residual's 1e-3)")
    parser.add_argument("--out", default="docs/robustness_adapt.json")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    if args.cpu:
        from apg_trajectory_tracking_tpu.utils.backend import (
            force_cpu_backend,
        )

        force_cpu_backend()

    import jax.numpy as jnp

    from apg_trajectory_tracking_tpu.dynamics.quad import (
        DEFAULT_QUAD_CFG,
        quad_params,
    )
    from apg_trajectory_tracking_tpu.evaluation.quad_eval import run_eval
    from apg_trajectory_tracking_tpu.evaluation.robustness import (
        increase_param,
    )
    from apg_trajectory_tracking_tpu.training.common import load_config
    from apg_trajectory_tracking_tpu.training.adapt import TrainQuadAdapt

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import compare_baselines as cb
    from evaluate_quad import load_quad_controller, eval_kwargs_for

    # the EXACT published robustness protocol (make_tables.py
    # robustness_section): full bank, seed-42 draw, speed 0.4,
    # thresh_div 1.0, test-time break, same rollouts for err + stable
    references, n = cb.quad_references(
        "data/traj_data_full", args.eval, 0.1, 0.4
    )
    refs = jnp.asarray(references)
    net0, cfg0 = load_quad_controller(args.base_model)
    kwargs = eval_kwargs_for(cfg0, n)

    def protocol_eval(net, mp):
        m, _ = run_eval(
            net, quad_params(mp), refs, refs.shape[1] - cfg0["horizon"],
            thresh_div=1.0, thresh_stable=1.0, horizon=cfg0["horizon"],
            dt=cfg0["delta_t"], test_time=True, **kwargs,
        )
        return {"err": m["mean_divergence"], "stable": m["ratio_stable"],
                "stable_ci": m["ratio_stable_ci"], "n": m["n"]}

    nominal = protocol_eval(net0, {})
    print("nominal:", json.dumps(nominal))

    out = {
        "base_model": os.path.basename(args.base_model),
        "protocol": (
            f"{n} distinct full-bank test trajectories (draw seed 42), "
            "speed 0.4, thresh_div 1.0, test-time break — identical to "
            "the published robustness table"
        ),
        "nominal": nominal,
        "cells": {},
    }

    for cell_name in args.cells.split(","):
        param, factor = CELLS[cell_name]
        mp = {param: increase_param(DEFAULT_QUAD_CFG[param], factor)}
        before = protocol_eval(net0, mp)
        print(f"[{param} x{factor}] before:", json.dumps(before))

        # train + select at the protocol speed (0.4); targeted sysid over
        # the identifiable rate/drag params (scripts/swingup_adapt.py's
        # masked-identification pattern, extended from 1 to 9 params)
        train_base = {
            "none": False,
            "rate": ("kinv_ang_vel_tau", "translational_drag",
                     "rotational_drag"),
            "all": True,
        }[args.sysid]
        cfg = load_config("quad", {
            "epoch_size": args.epoch_size,
            "self_play": args.self_play,
            "speed_factor": 0.4,
            "learning_rate_base": args.base_lr,
        })
        trainer = TrainQuadAdapt(
            cfg, modified_params=mp, base_model=args.base_model,
            train_base_params=train_base,
            seed=0, save_name=f"adapt_quad_{cell_name}",
        )
        gap0_ad, gap0_an = trainer.dynamics_gap()
        trainer.run_dynamics(
            nr_epochs=args.epochs, train_dyn_for_epochs=args.dyn_epochs,
            verbose=True,
        )
        gap1_ad, _ = trainer.dynamics_gap()
        after = protocol_eval(trainer.best_net, mp)
        after_final = protocol_eval(trainer.inner.net, mp)
        print(f"[{param} x{factor}] after :", json.dumps(after))
        import numpy as np

        b = trainer.ld.base
        identified = {
            k: np.asarray(getattr(b, k)).tolist()
            for k in ("kinv_ang_vel_tau", "translational_drag",
                      "rotational_drag")
        }
        # rate-loop authority analysis: the Flightmare rate command is
        # bounded to +-0.5 rad/s (action[...,1:4]-0.5, dynamics/quad.py),
        # so a constant drag torque is compensable only while
        # (rot_drag/J)/kinv <= 0.5; beyond that every controller must
        # sustain |body rate| >= the residual, and the attitude stability
        # predicate (|roll|,|pitch| < 1 rad) becomes unsatisfiable
        true_p = quad_params(mp)
        resid = np.asarray(
            np.abs(true_p.rotational_drag / true_p.inertia)
            / true_p.kinv_ang_vel_tau
        ) - 0.5
        feas = {
            "rate_authority_margin": (-resid).tolist(),
            "min_sustained_body_rate": np.maximum(resid, 0.0).tolist(),
            "feasible": bool((resid <= 0).all()),
        }
        print(f"[{param} x{factor}] identified:", json.dumps(identified))
        out["cells"][f"{param} x{factor}"] = {
            "modified_params": mp,
            "budget": {
                "nr_epochs": args.epochs,
                "train_dyn_for_epochs": args.dyn_epochs,
                "epoch_size": args.epoch_size,
                "self_play": args.self_play,
                "sysid": args.sysid,
            },
            "before": before,
            "after": after,
            "after_final_epoch": after_final,
            "identified_params": identified,
            "rate_authority": feas,
            "dynamics_gap": {
                "analytic": gap0_an,
                "adapted_before": gap0_ad,
                "adapted_after": gap1_ad,
            },
        }

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()

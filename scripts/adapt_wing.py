#!/usr/bin/env python
"""Wing residual-dynamics adaptation end-to-end: the reference's
``train_dynamics`` experiment for the fixed wing
(train_fixed_wing.py:216-237, LearntFixedWingDynamics at
fixed_wing_dynamics.py:270-326), closing the last parity cell.

Protocol:
  1. perturb aero coefficients in the plant (default: lift slope
     CL_alpha 4.5321 -> 3.0 and parasitic drag CD0 0.0765 -> 0.15) and
     measure the pretrained controller's waypoint error on the nominal
     and mismatched plants — the "before" rows;
  2. run the run_dynamics alternation (train_base.py:334-375): fit the
     learnt wing (zero-init residual MLP; ``--train_base`` also frees
     the physical coefficients, as the reference's ParameterDict does)
     on one-step transitions driven by the current controller, then
     keep training the controller against the adapted model;
  3. re-measure on the mismatched plant — the "after" row;
  4. run the sampling fine-tune leg (train_fixed_wing.py:240-262) at the
     same controller budget as a comparison: analytic train model,
     eval + self-play from the mismatched plant.

Writes ``docs/wing_adapt.json`` with before/identified/after numbers
(one-step dynamics gaps + waypoint errors with n and 95% CIs).

Usage: python scripts/adapt_wing.py [--eval 50] [--epochs 30]
       [--dyn_epochs 10] [--cpu] [--out docs/wing_adapt.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--base_model", default="assets/wing_trained")
    parser.add_argument("--mismatch", default='{"CL_alpha": 3.0, "CD0": 0.15}',
                        help="JSON dict of wing config overrides for the "
                             "plant")
    parser.add_argument("--eval", type=int, default=50)
    parser.add_argument("--epochs", type=int, default=30)
    parser.add_argument("--dyn_epochs", type=int, default=10)
    parser.add_argument("--self_play", type=int, default=512)
    parser.add_argument("--epoch_size", type=int, default=512)
    parser.add_argument("--train_base", default="none",
                        choices=["none", "coeffs", "all"],
                        help="physical parameters the fit may train: "
                             "'coeffs' = the 30 aero coefficients (the "
                             "reference's trainable ParameterDict, "
                             "fixed_wing_dynamics.py:290-303, as a "
                             "targeted sysid mask), 'all' = every base "
                             "leaf, 'none' = residual only")
    parser.add_argument("--base_lr", type=float, default=0.01,
                        help="Adam lr for the physical coefficients")
    parser.add_argument("--skip_finetune", action="store_true")
    parser.add_argument("--out", default="docs/wing_adapt.json")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    if args.cpu:
        from apg_trajectory_tracking_tpu.utils.backend import (
            force_cpu_backend,
        )

        force_cpu_backend()

    import jax
    import numpy as np

    from apg_trajectory_tracking_tpu.dynamics.fixed_wing import wing_params
    from apg_trajectory_tracking_tpu.evaluation.wing_eval import run_eval
    from apg_trajectory_tracking_tpu.training.common import load_config
    from apg_trajectory_tracking_tpu.training.adapt import TrainWingAdapt
    from apg_trajectory_tracking_tpu.training.train_wing import TrainWing

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from evaluate_wing import load_wing_controller

    mismatch = json.loads(args.mismatch)
    net0, cfg0 = load_wing_controller(args.base_model)
    import jax.numpy as jnp

    mean = jnp.asarray(cfg0["mean"])
    std = jnp.asarray(cfg0["std"])
    dt, horizon = cfg0["delta_t"], cfg0["horizon"]

    # the evaluate_wing.py published protocol: test-time break semantics,
    # the model's own thresh_div, generous attitude bound
    def protocol_eval(net, dyn_params, seed=42):
        metrics, _, _ = run_eval(
            net, dyn_params, jax.random.PRNGKey(seed), mean, std,
            nr_test=args.eval, thresh_div=cfg0.get("thresh_div", 10.0),
            thresh_stable=3.0, horizon=horizon, dt=dt, test_time=True,
        )
        return {
            "mean_err": metrics["mean_success"],
            "std_err": metrics["std_success"],
            "ci": metrics["mean_success_ci"],
            "n": metrics["n"],
        }

    nominal = protocol_eval(net0, wing_params())
    before = protocol_eval(net0, wing_params(mismatch))
    print("nominal plant :", json.dumps(nominal))
    print("mismatched    :", json.dumps(before))

    train_base = {
        "none": False,
        "coeffs": ("coeffs",),
        "all": True,
    }[args.train_base]
    cfg = load_config("wing", {
        "self_play": args.self_play,
        "epoch_size": args.epoch_size,
        "batch_size": 8,
        "learning_rate_base": args.base_lr,
    })
    trainer = TrainWingAdapt(
        cfg, modified_params=mismatch, base_model=args.base_model,
        train_base_params=train_base, seed=0,
        save_name="adapt_wing",
    )
    gap_key = jax.random.PRNGKey(7)
    adapted_g0, analytic_g = trainer.dynamics_gap(key=gap_key)
    trainer.run_dynamics(
        nr_epochs=args.epochs, train_dyn_for_epochs=args.dyn_epochs,
        verbose=True,
    )
    adapted_g1, _ = trainer.dynamics_gap(key=gap_key)
    print(f"one-step gap: analytic {analytic_g:.5f}, "
          f"adapted {adapted_g0:.5f} -> {adapted_g1:.5f}")

    identified = None
    if train_base:
        from apg_trajectory_tracking_tpu.dynamics.fixed_wing import (
            DEFAULT_WING_CFG,
            _COEF_KEYS,
        )
        import numpy as np

        coeffs = np.asarray(trainer.ld.base.coeffs)
        identified = {
            k: {
                "nominal": DEFAULT_WING_CFG[k],
                "plant": mismatch.get(k, DEFAULT_WING_CFG[k]),
                "identified": float(coeffs[_COEF_KEYS.index(k)]),
            }
            for k in sorted(set(mismatch) & set(_COEF_KEYS))
        }
        print("identified coefficients:", json.dumps(identified))

    # the best-by-learnt-env-criterion net (the reference's save_model
    # selection); the final-epoch net goes in the artifact for reference
    after = protocol_eval(trainer.best_net, wing_params(mismatch))
    after_final = protocol_eval(trainer.inner.net, wing_params(mismatch))
    print("after adapt   :", json.dumps(after))
    print("after (final) :", json.dumps(after_final))

    result = {
        "mismatch": mismatch,
        "protocol": {
            "nr_test": args.eval,
            "thresh_div": cfg0.get("thresh_div", 10.0),
            "thresh_stable": 3.0,
            "test_time": True,
        },
        "budget": {
            "nr_epochs": args.epochs,
            "train_dyn_for_epochs": args.dyn_epochs,
            "self_play": args.self_play,
            "epoch_size": args.epoch_size,
            "train_base": args.train_base,
        },
        "identified_coefficients": identified,
        "dynamics_gap": {
            "analytic": analytic_g,
            "adapted_before": adapted_g0,
            "adapted_after": adapted_g1,
        },
        "nominal": nominal,
        "mismatched_before": before,
        "adapted_after": after,
        "adapted_after_final_epoch": after_final,
        "best_learnt_env_err": trainer.best_err,
    }

    if not args.skip_finetune:
        ft = TrainWing(
            load_config("wing", {
                "self_play": args.self_play,
                "epoch_size": args.epoch_size,
                "batch_size": 8,
            }),
            seed=0, save_name="finetune_wing",
            eval_modified_params=mismatch, base_model=args.base_model,
        )
        n_ctrl = max(args.epochs - args.dyn_epochs, 1)
        ft.fit(nr_epochs=n_ctrl, nr_test=10, verbose=True)
        # symmetric selection: the adaptation leg reports its
        # best-by-criterion net, so this leg must too — TrainWing saved
        # its best-by-test-err checkpoint during fit
        from apg_trajectory_tracking_tpu.utils.checkpoints import (
            checkpoint_exists,
            load_checkpoint,
        )

        ft_net = ft.net
        if checkpoint_exists(ft.save_path, "model_wing"):
            ft_net = load_checkpoint(ft.save_path, "model_wing", ft.net)
        finetuned = protocol_eval(ft_net, wing_params(mismatch))
        finetuned_final = protocol_eval(ft.net, wing_params(mismatch))
        print("sampling ft   :", json.dumps(finetuned))
        result["sampling_finetune"] = finetuned
        result["sampling_finetune_final_epoch"] = finetuned_final

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()

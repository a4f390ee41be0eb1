#!/usr/bin/env python
"""Evaluate a trained fixed-wing controller (counterpart of the reference's
scripts/evaluate_fixed_wing.py): waypoint passing error + robustness."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from apg_trajectory_tracking_tpu.utils.checkpoints import resolve_model_dir  # noqa: E402


def load_wing_controller(model_path, epoch=""):
    import jax
    from apg_trajectory_tracking_tpu.models import init_control_net
    from apg_trajectory_tracking_tpu.utils.checkpoints import (
        load_checkpoint,
        load_config,
    )

    cfg = load_config(model_path)
    template = init_control_net(
        jax.random.PRNGKey(0), cfg["state_size"] - 3, 1, cfg["ref_dim"],
        cfg["action_dim"] * cfg["horizon"], conv=False,
    )
    net = load_checkpoint(model_path, "model_wing" + epoch, template)
    return net, cfg


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-m", "--model", default="test")
    parser.add_argument("-e", "--epoch", default="")
    parser.add_argument("-a", "--eval", type=int, default=10)
    parser.add_argument("--sweep", action="store_true")
    parser.add_argument("--mpc_horizon", type=int, default=10,
                        help="planning horizon for -m mpc (10 = the "
                             "reference's; 20 intercepts within ~0.0003 m)")
    parser.add_argument("--live", nargs="?", type=int, const=-1,
                        default=None, metavar="N",
                        help="replay the first episode in the live 2D "
                             "viewer (interactive with a GUI backend, "
                             "offscreen under Agg); optional N caps the "
                             "frames")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    if args.cpu:
        from apg_trajectory_tracking_tpu.utils.backend import (
            force_cpu_backend,
        )

        force_cpu_backend()

    import jax
    import jax.numpy as jnp
    from apg_trajectory_tracking_tpu.dynamics.fixed_wing import (
        wing_params,
        DEFAULT_WING_CFG,
    )
    from apg_trajectory_tracking_tpu.evaluation.wing_eval import run_eval
    from apg_trajectory_tracking_tpu.evaluation.robustness import param_sweep
    from apg_trajectory_tracking_tpu.data.dataset import WING_MEAN, WING_STD

    if args.model == "mpc":
        # MPC baseline: fly_to_point with the 6-DoF wing
        # (evaluate_fixed_wing.py:216-245, mpc dynamics fixed_wing_3D)
        import numpy as np
        from apg_trajectory_tracking_tpu.dynamics.fixed_wing import wing_step
        from apg_trajectory_tracking_tpu.controllers.mpc import MPC

        dt, horizon = 0.05, args.mpc_horizon
        ctrl = MPC(horizon=horizon, dt=dt, dynamics="fixed_wing_3D",
                   n_iters=None if horizon <= 10 else 100)
        dyn = wing_params({})
        rng = np.random.RandomState(42)
        errors = []
        for _ in range(args.eval):
            ctrl.reset()
            target = np.array(
                [50.0, (rng.rand() - 0.5) * 10, (rng.rand() - 0.5) * 10],
                dtype=np.float32,
            )
            state = np.zeros(12, dtype=np.float32)
            state[3] = 11.5  # level flight (wing_env.py:26-28)
            for _ in range(1000):
                u = ctrl.predict_actions(state, target)
                prev = state[:3].copy()
                state = np.asarray(
                    wing_step(dyn, jnp.asarray(state[None]),
                              jnp.asarray(u[:1]), dt)
                )[0]
                if state[0] > target[0]:
                    # distance of the target to the passed trajectory
                    seg = state[:3] - prev
                    t = np.clip(
                        np.dot(target - prev, seg) / (seg @ seg + 1e-9), 0, 1
                    )
                    errors.append(
                        float(np.linalg.norm(prev + t * seg - target))
                    )
                    break
        if not errors:
            print("no episode passed the target within 1000 steps")
            print(json.dumps({"mean_success": None, "std_success": None,
                              "n_completed": 0, "n_attempted": args.eval}))
            return
        print("Average error (target): %.2f (%.2f), %d/%d completed"
              % (np.mean(errors), np.std(errors), len(errors), args.eval))
        print(json.dumps({
            "mean_success": float(np.mean(errors)),
            "std_success": float(np.std(errors)),
            "n_completed": len(errors),
            "n_attempted": args.eval,
        }))
        return

    model_path = resolve_model_dir(args.model, "wing")
    net, cfg = load_wing_controller(model_path, args.epoch)
    dt, horizon = cfg["delta_t"], cfg["horizon"]
    mean = jnp.asarray(cfg.get("mean", WING_MEAN))
    std = jnp.asarray(cfg.get("std", WING_STD))

    def eval_with(modified_params):
        dyn = wing_params(modified_params)
        metrics, roll, targets = run_eval(
            net, dyn, jax.random.PRNGKey(42), mean, std,
            nr_test=args.eval, thresh_div=cfg.get("thresh_div", 10.0),
            thresh_stable=3.0, horizon=horizon, dt=dt, test_time=True,
        )
        if args.live is not None and not args.sweep:
            # sweep calls eval_with once per parameter value — replay
            # only on the single-eval path
            import numpy as np
            from apg_trajectory_tracking_tpu.utils.live_view import (
                replay_wing,
            )

            states = np.asarray(roll["states"])
            valid = np.asarray(roll["valid"])
            n, _ = replay_wing(
                states[0][valid[0]], np.asarray(targets[0]), dt=dt,
                max_frames=None if args.live < 0 else args.live,
            )
            print(f"live replay: {n} frames")
        return metrics

    if args.sweep:
        keys = {
            k: v for k, v in DEFAULT_WING_CFG.items()
            if k in ("mass", "rho", "S", "c", "b", "I_xx", "I_yy", "I_zz",
                     "CL0", "CD0", "Cm0")
        }
        print(json.dumps(param_sweep(eval_with, keys), indent=1,
                         default=float))
        return
    m = eval_with({})
    print("Average error (target): %.2f (%.2f)"
          % (m["mean_success"], m["std_success"]))
    print(json.dumps(m, default=float))


if __name__ == "__main__":
    main()

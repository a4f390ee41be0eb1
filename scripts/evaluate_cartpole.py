#!/usr/bin/env python
"""Evaluate a trained cartpole controller (counterpart of the reference's
scripts/evaluate_cartpole.py): balance and swing-up metrics + robustness."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from apg_trajectory_tracking_tpu.utils.checkpoints import resolve_model_dir  # noqa: E402


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
    parser.add_argument("--live", nargs="?", type=int, const=-1,
                        default=None, metavar="N",
                        help="replay one episode in the live 2D viewer "
                             "(interactive with a GUI backend, offscreen "
                             "under Agg); optional N caps the frames")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    if args.cpu:
        from apg_trajectory_tracking_tpu.utils.backend import (
            force_cpu_backend,
        )

        force_cpu_backend()

    import jax
    from apg_trajectory_tracking_tpu.dynamics.cartpole import (
        cartpole_params,
        DEFAULT_CARTPOLE_CFG,
    )
    from apg_trajectory_tracking_tpu.evaluation.cartpole_eval import (
        evaluate_balance,
    )
    from apg_trajectory_tracking_tpu.evaluation.robustness import param_sweep

    if args.model == "mpc":
        # MPC baseline on the balance task (the reference's evaluators are
        # controller-agnostic behind predict_actions, mpc.py:439-449)
        import numpy as np
        import jax.numpy as jnp
        from apg_trajectory_tracking_tpu.controllers.mpc import MPC
        from apg_trajectory_tracking_tpu.dynamics.cartpole import cartpole_step

        dt, horizon = 0.05, 10
        ctrl = MPC(horizon=horizon, dt=dt, dynamics="cartpole")
        dyn = cartpole_params({})
        rng = np.random.RandomState(42)
        steps_stable, vels = [], []
        for _ in range(args.eval):
            ctrl.reset()
            state = (rng.rand(4).astype(np.float32) - 0.5) * 0.2
            ep_vels = []
            for i in range(250):
                u = ctrl.predict_actions(state)
                state = np.asarray(
                    cartpole_step(dyn, jnp.asarray(state[None]),
                                  jnp.asarray(u[:1]), dt)
                )[0]
                ep_vels.append(abs(float(state[1])))
                if abs(state[2]) > 0.21 or abs(state[0]) > 2.4:
                    break
            steps_stable.append(i + 1)
            vels.append(np.mean(ep_vels))
        print(json.dumps({
            "mean_stable": float(np.mean(steps_stable)),
            "std_stable": float(np.std(steps_stable)),
            "mean_vel": float(np.mean(vels)),
            "std_vel": float(np.std(vels)),
        }))
        return

    if args.model in ("ilqr", "cem"):
        # the two solver families that close swing-up (DESIGN.md §4):
        # two-start warm iLQR and the derivative-free CEM counterpart
        from apg_trajectory_tracking_tpu.evaluation.cartpole_eval import (
            swingup_metrics,
        )

        if not args.swingup:
            parser.error(f"-m {args.model} evaluates the swing-up "
                         "protocol: add --swingup (balance MPC is -m mpc)")
        dyn = cartpole_params({})
        if args.model == "ilqr":
            from apg_trajectory_tracking_tpu.controllers.ilqr import (
                make_cartpole_swingup_ilqr,
            )

            apply_fn, init_carry = make_cartpole_swingup_ilqr(dyn)
        else:
            from apg_trajectory_tracking_tpu.controllers.cem import (
                make_cartpole_swingup_cem,
            )

            apply_fn, init_carry = make_cartpole_swingup_cem(dyn)

        def eval_ilqr(modified_params):
            plant = cartpole_params(modified_params)
            return swingup_metrics(
                None, plant, jax.random.PRNGKey(42), nr_iters=args.eval,
                net_apply=apply_fn, horizon=60, init_carry=init_carry,
            )

        if args.sweep:
            keys = {
                k: v for k, v in DEFAULT_CARTPOLE_CFG.items()
                if k in ("masscart", "masspole", "length", "max_force_mag",
                         "friction")
            }
            print(json.dumps(param_sweep(eval_ilqr, keys), indent=1,
                             default=float))
            return
        print(json.dumps(eval_ilqr({}), default=float))
        return

    model_path = resolve_model_dir(args.model, "cartpole")
    net, cfg = load_cartpole_controller(model_path, args.epoch)
    dt, horizon = cfg["delta_t"], cfg["horizon"]

    if args.live is not None:
        # one closed-loop episode, states collected on device in a single
        # scan dispatch, then replayed at sim-time pacing on the host
        import jax.numpy as jnp
        from apg_trajectory_tracking_tpu.dynamics.cartpole import (
            cartpole_params as _params,
        )
        from apg_trajectory_tracking_tpu.envs.cartpole_env import (
            env_step,
            reset_swingup,
        )
        from apg_trajectory_tracking_tpu.models import cartpole_net_apply
        from apg_trajectory_tracking_tpu.utils.live_view import (
            replay_cartpole,
        )

        dyn = _params({})
        if args.swingup:
            s0 = reset_swingup(jax.random.PRNGKey(0), 1)
        else:
            s0 = jnp.zeros((1, 4), dtype=jnp.float32)
            s0 = s0.at[0, 2].set(0.05)  # slight tilt so there is motion

        def body(state, _):
            a = cartpole_net_apply(net, state).reshape(-1, horizon, 1)[:, 0]
            new_state = env_step(dyn, state, a, dt)
            return new_state, new_state[0]

        _, states = jax.lax.scan(body, s0, None, length=250)
        n, _ = replay_cartpole(
            states, dt=dt, max_frames=None if args.live < 0 else args.live
        )
        print(f"live replay: {n} frames")

    def eval_with(modified_params):
        from apg_trajectory_tracking_tpu.evaluation.cartpole_eval import (
            balance_metrics,
            swingup_metrics,
        )

        dyn = cartpole_params(modified_params)
        if args.swingup:
            return swingup_metrics(
                net, dyn, jax.random.PRNGKey(42), nr_iters=args.eval,
                dt=dt, horizon=horizon,
            )
        return balance_metrics(evaluate_balance(
            net, dyn, nr_iters=args.eval, dt=dt, horizon=horizon
        ))

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

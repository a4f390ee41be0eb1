#!/usr/bin/env python
"""Evaluate a trained quad controller (counterpart of the reference's
scripts/evaluate_drone.py): random-trajectory tracking, analytic references
(hover/straight/circle), and robustness sweeps."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from apg_trajectory_tracking_tpu.utils.checkpoints import resolve_model_dir  # noqa: E402


def load_quad_controller(model_path, epoch=""):
    """Load any quad controller checkpoint; the saved config's train_mode
    decides the template (concurrent MLP / autoregressive MLP / LSTM)."""
    import jax
    from apg_trajectory_tracking_tpu.models import (
        init_control_net,
        init_lstm_net,
    )
    from apg_trajectory_tracking_tpu.utils.checkpoints import (
        load_checkpoint,
        load_config,
    )

    cfg = load_config(model_path)
    mode = cfg.get("train_mode", "concurrent")
    out_dim = (
        cfg["action_dim"] * cfg["horizon"]
        if mode == "concurrent"
        else cfg["action_dim"]
    )
    if mode == "LSTM":
        # wide-window recurrent students size the conv-ref branch by
        # net_window, same as the MLP branch below
        template = init_lstm_net(
            jax.random.PRNGKey(0), 15,
            cfg.get("net_window", cfg["horizon"]), cfg["ref_dim"],
            out_dim, conv=True, hidden=cfg.get("hidden", 8),
        )
    else:
        # wide-window students (long-horizon MPC distillation) size the
        # conv-ref branch by the rows they consume, not the action horizon
        template = init_control_net(
            jax.random.PRNGKey(0), 15,
            cfg.get("net_window", cfg["horizon"]), cfg["ref_dim"],
            out_dim, conv=True, hidden=cfg.get("hidden", 64),
        )
    net = load_checkpoint(model_path, "model_quad" + epoch, template)
    return net, cfg


def eval_kwargs_for(cfg, nr_test):
    """run_eval kwargs for the recurrent modes (window_len = 2*horizon,
    LSTM carry; matches TrainQuad.evaluate)."""
    from apg_trajectory_tracking_tpu.models import (
        lstm_net_apply,
        init_lstm_state,
    )

    mode = cfg.get("train_mode", "concurrent")
    kwargs = {}
    if mode == "LSTM":
        kwargs["net_apply"] = lstm_net_apply
        # cfg["hidden"] is the LSTM cell width for recurrent checkpoints
        # (default 8 = the reference LSTM_NEW width)
        kwargs["net_carry"] = init_lstm_state(
            nr_test, hidden=cfg.get("hidden", 8)
        )
    ref_length = cfg.get("ref_length", cfg["horizon"])
    if ref_length != cfg["horizon"]:
        kwargs["window_len"] = ref_length
    net_window = cfg.get("net_window", cfg["horizon"])
    if net_window != cfg["horizon"]:
        kwargs["net_window"] = net_window
    return kwargs


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-m", "--model", default="test",
                        help="model dir name under trained_models/quad/")
    parser.add_argument("-e", "--epoch", default="")
    parser.add_argument("-r", "--ref", default="rand",
                        choices=["rand", "poly", "hover", "straight",
                                 "circle"])
    parser.add_argument("-p", "--points", default=None,
                        help="predefined waypoint set "
                             "(eight/curve/flat_eight/sinus)")
    parser.add_argument("-a", "--eval", type=int, default=10,
                        help="number of eval runs")
    parser.add_argument("--speed", type=float, default=None)
    parser.add_argument("--sweep", action="store_true",
                        help="robustness sweep over dynamics params")
    parser.add_argument("--data_dir", default="data/traj_data")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--mpc_dynamics", default="flightmare",
                        choices=["flightmare", "simple_quad", "high_mpc"],
                        help="internal model for -m mpc (mpc.py:23)")
    parser.add_argument("--solver", default="adam",
                        choices=["adam", "ilqr"],
                        help="OCP solver for -m mpc")
    parser.add_argument("--mpc_horizon", type=int, default=10,
                        help="planning horizon for -m mpc (the reference "
                             "uses 10; 20 is far stronger — DESIGN.md 7)")
    parser.add_argument("--animate", default=None, metavar="FILE.gif",
                        help="save a 3D flight animation of the first "
                             "rollouts (rand/poly/waypoint refs)")
    parser.add_argument("--external_sim", default=None,
                        choices=["native", "mock"],
                        help="fly the closed loop through an EXTERNAL "
                             "simulator instead of the jitted evaluator "
                             "(the reference's Flightmare role, "
                             "evaluate_drone.py:409-418): 'native' = the "
                             "in-repo C++ sim (native/quad_sim.cc), "
                             "'mock' = the pure-Python backend; rand/poly/"
                             "waypoint refs only")
    parser.add_argument("--live", nargs="?", type=int, const=-1,
                        default=None, metavar="N",
                        help="replay the first rollout in the live 2D "
                             "viewer (interactive with a GUI backend, "
                             "offscreen under Agg; rendering.py:57-135); "
                             "optional N caps the frames")
    args = parser.parse_args()

    if args.cpu:
        from apg_trajectory_tracking_tpu.utils.backend import (
            force_cpu_backend,
        )

        force_cpu_backend()

    if args.external_sim is not None and (
        args.model == "mpc"
        or (args.points is None and args.ref not in ("rand", "poly"))
    ):
        raise SystemExit(
            "--external_sim supports neural controllers on rand/poly/"
            "waypoint references (the reference's Flightmare-eval "
            "protocol); analytic refs and -m mpc run on the jitted path"
        )

    import numpy as np
    import jax
    import jax.numpy as jnp
    from functools import partial

    from apg_trajectory_tracking_tpu.dynamics.quad import quad_params
    from apg_trajectory_tracking_tpu.evaluation.quad_eval import (
        run_eval,
        follow_analytic,
    )
    from apg_trajectory_tracking_tpu.evaluation.robustness import param_sweep
    from apg_trajectory_tracking_tpu.dynamics.quad import DEFAULT_QUAD_CFG
    from apg_trajectory_tracking_tpu.trajectory.generate import (
        ensure_trajectory_bank,
        load_trajectory_bank,
        prepare_trajectory,
    )
    from apg_trajectory_tracking_tpu.trajectory import refs as R

    if args.model == "mpc":
        # MPC baseline on random trajectories (evaluate_drone.py:384-387)
        from apg_trajectory_tracking_tpu.controllers.mpc import MPC
        from apg_trajectory_tracking_tpu.dynamics.quad import quad_step

        dt, horizon = 0.1, args.mpc_horizon
        speed = args.speed or 0.4
        mpc_kwargs = {}
        if args.mpc_dynamics == "high_mpc":
            # the reference's high_mpc spec tracks only y/z (its pendulum
            # task); weight all of pos+vel for bank-trajectory tracking
            mpc_kwargs["q_pen"] = (
                [100, 100, 100, 0, 0, 0, 0, 10, 10, 10]
            )
        mpc = MPC(horizon=horizon, dt=dt, dynamics=args.mpc_dynamics,
                  solver=args.solver, **mpc_kwargs)
        bank = load_trajectory_bank(
            ensure_trajectory_bank(args.data_dir), test=True
        )
        rng = np.random.RandomState(42)
        dyn = quad_params()
        divs_all, stable_all = [], []
        for t in range(args.eval):
            ref = prepare_trajectory(
                bank[rng.randint(len(bank))], dt, speed
            )
            ref[:, 2] += 3.0
            mpc.reset()
            state = np.zeros(12, dtype=np.float32)
            state[:3] = ref[0, :3]
            divs = []
            for i in range(min(251, len(ref) - horizon)):
                window = ref[i + 1:i + 1 + horizon]
                # MPC consumes [pos, att, vel] rows directly
                actions = mpc.predict_actions(state, window)
                if args.mpc_dynamics == "high_mpc":
                    # physical (thrust m/s^2, body rates rad/s) -> the
                    # flightmare env's normalized action; the env rescale
                    # (quad.py:79-86) is linear and unclipped, so the
                    # planned command executes exactly even outside [0,1]
                    actions = np.concatenate(
                        [
                            (actions[:, :1] - 9.81 + 7.5) / 15.0,
                            actions[:, 1:4] + 0.5,
                        ],
                        axis=1,
                    )
                state = np.asarray(
                    quad_step(dyn, jnp.asarray(state[None]),
                              jnp.asarray(actions[:1]), dt)
                )[0]
                div = np.linalg.norm(ref[i + 1, :3] - state[:3])
                divs.append(div)
                if div > 1.0:
                    break
            divs_all.append(np.mean(divs))
            stable_all.append(len(divs))
        print(
            "MPC tracking error: %.3f (%.3f), mean steps %.1f"
            % (np.mean(divs_all), np.std(divs_all), np.mean(stable_all))
        )
        return

    model_path = resolve_model_dir(args.model, "quad")
    net, cfg = load_quad_controller(model_path, args.epoch)
    speed = args.speed or cfg.get("speed_factor", 0.4)
    dt, horizon = cfg["dt"] if "dt" in cfg else cfg["delta_t"], cfg["horizon"]

    if args.ref in ("rand", "poly") or args.points is not None:
        rng = np.random.RandomState(42)

        def _stack_pad(ref_list):
            T = min(len(r) for r in ref_list)
            return np.stack([r[:T] for r in ref_list])
        if args.points is not None:
            from apg_trajectory_tracking_tpu.trajectory.predefined import (
                collected_trajectories,
            )
            from apg_trajectory_tracking_tpu.trajectory.refs import (
                waypoint_reference,
            )

            pts = collected_trajectories[args.points]
            make_refs = lambda: _stack_pad(
                [
                    waypoint_reference(rng, pts, [0, 0, 3.0], dt=dt)
                    for _ in range(args.eval)
                ]
            )
        elif args.ref == "poly":
            from apg_trajectory_tracking_tpu.trajectory.refs import (
                polynomial_reference,
            )

            make_refs = lambda: _stack_pad(
                [
                    polynomial_reference(rng, [0, 0, 3.0], dt=dt)
                    for _ in range(args.eval)
                ]
            )
        else:
            bank = load_trajectory_bank(
                ensure_trajectory_bank(args.data_dir), test=True
            )

            def make_refs():
                # distinct trajectories when the bank is big enough
                # (with-replacement draws overstated "50-trajectory" claims
                # on the 20-file CI bank — VERDICT r1 weak #4)
                if args.eval <= len(bank):
                    idx = rng.choice(len(bank), size=args.eval,
                                     replace=False)
                else:
                    idx = rng.randint(len(bank), size=args.eval)
                out = np.stack(
                    [prepare_trajectory(bank[i], dt, speed) for i in idx]
                )
                out[:, :, 2] += 3.0
                return out

        if args.external_sim is not None:
            # sim-to-sim: the closed loop runs in the external simulator
            # (reference: evaluate_drone.py:409-418 with FlightmareWrapper)
            if args.sweep or args.animate or args.live is not None:
                raise SystemExit(
                    "--external_sim is a plain-eval path "
                    "(no --sweep/--animate/--live)"
                )
            from apg_trajectory_tracking_tpu.data.dataset import (
                quad_prepare_data,
            )
            from apg_trajectory_tracking_tpu.envs.external_sim import (
                MockFlightgymBackend,
                NativeQuadSimBackend,
                evaluate_external,
            )

            backend = (
                NativeQuadSimBackend
                if args.external_sim == "native"
                else MockFlightgymBackend
            )
            win_rows = cfg.get("ref_length", horizon)
            net_window = cfg.get("net_window", horizon)
            if cfg.get("train_mode") == "LSTM":
                from apg_trajectory_tracking_tpu.models import (
                    init_lstm_state,
                    lstm_net_apply,
                )

                carry = {"c": init_lstm_state(1, hidden=cfg.get("hidden", 8))}

                @jax.jit
                def _fwd(c, state, window):
                    in_s, _, in_r, _ = quad_prepare_data(
                        state[None], window[None]
                    )
                    c, logits = lstm_net_apply(
                        net, c, in_s, in_r[:, :net_window]
                    )
                    return c, jax.nn.sigmoid(logits)

                def predict(state, window):
                    carry["c"], a = _fwd(
                        carry["c"], jnp.asarray(state), jnp.asarray(window)
                    )
                    return np.asarray(a)[0].reshape(-1, 4)[0]

                def reset_fn():
                    carry["c"] = init_lstm_state(
                        1, hidden=cfg.get("hidden", 8)
                    )
            else:
                from apg_trajectory_tracking_tpu.models import (
                    control_net_apply,
                )

                @jax.jit
                def _fwd(state, window):
                    in_s, _, in_r, _ = quad_prepare_data(
                        state[None], window[None]
                    )
                    logits = control_net_apply(
                        net, in_s, in_r[:, :net_window]
                    )
                    return jax.nn.sigmoid(logits)

                def predict(state, window):
                    a = _fwd(jnp.asarray(state), jnp.asarray(window))
                    return np.asarray(a)[0].reshape(-1, 4)[0]

                reset_fn = None

            references = make_refs()
            metrics = evaluate_external(
                predict, backend, references,
                references.shape[1] - horizon, thresh_div=1.0,
                thresh_stable=1.0, horizon=horizon, dt=dt,
                window_len=win_rows, reset_fn=reset_fn,
            )
            print(f"[external sim: {args.external_sim}]")
            print(
                "Average tracking error: %.2f (%.2f)"
                % (metrics["mean_divergence"], metrics["std_divergence"])
            )
            print("Ratio of stable runs: %.2f" % metrics["ratio_stable"])
            print(json.dumps(metrics))
            return

        def eval_with(modified_params):
            dyn = quad_params(modified_params)
            references = make_refs()
            metrics, roll = run_eval(
                net, dyn, jnp.asarray(references),
                references.shape[1] - horizon,
                thresh_div=1.0, thresh_stable=1.0, horizon=horizon, dt=dt,
                test_time=True, **eval_kwargs_for(cfg, references.shape[0]),
            )
            if args.animate:
                from apg_trajectory_tracking_tpu.utils.plotting import (
                    animate_quad,
                )

                # each rollout tracked its OWN reference — render each
                # against the right curve (one file per rollout)
                k = min(3, references.shape[0])
                states = np.asarray(roll["states"])
                valid = np.asarray(roll["valid"])
                base, ext = os.path.splitext(args.animate)
                for i in range(k):
                    out = args.animate if k == 1 else f"{base}_{i}{ext}"
                    animate_quad(
                        references[i], [states[i][valid[i]]], savefile=out,
                    )
                    print(f"animation saved to {out}")
            if args.live is not None and not args.sweep:
                # sweep calls eval_with once per parameter value — replay
                # only on the single-eval path
                from apg_trajectory_tracking_tpu.utils.live_view import (
                    replay_quad,
                )

                states = np.asarray(roll["states"])
                valid = np.asarray(roll["valid"])
                n, _ = replay_quad(
                    states[0][valid[0]], reference=np.asarray(references[0]),
                    dt=dt,
                    max_frames=None if args.live < 0 else args.live,
                )
                print(f"live replay: {n} frames")
            return metrics

        if args.sweep:
            # ONE eval per parameter value: err and stable must come from
            # the same rollouts (a per-metric eval_with call would draw
            # different test trajectories from the shared RNG and cost 2x)
            def sweep_metrics(mp):
                m = eval_with(mp)
                return {
                    "err": m["mean_divergence"],
                    "stable": m["ratio_stable"],
                }

            results = param_sweep(sweep_metrics, DEFAULT_QUAD_CFG)
            print(json.dumps(results, indent=1, default=float))
            return
        metrics = eval_with({})
        print(
            "Average tracking error: %.2f (%.2f)"
            % (metrics["mean_divergence"], metrics["std_divergence"])
        )
        print("Ratio of stable runs: %.2f" % metrics["ratio_stable"])
        print(json.dumps(metrics, default=float))
        return

    # analytic references
    dyn = quad_params()
    n = args.eval
    init_state = jnp.zeros((n, 12), dtype=jnp.float32).at[:, 2].set(3.0)
    max_dist = cfg.get("max_drone_dist", 0.25)
    # wide-window students consume net_window reference rows per step
    win_rows = cfg.get("net_window", horizon)

    if args.ref == "hover":
        target = jnp.array([0.0, 0.0, 3.0])
        window_fn = lambda s: R.hover_ref_window(target, s, dt, win_rows)
        project_fn = lambda p: target
    elif args.ref == "straight":
        s0 = R.straight_init(
            jnp.array([0.0, 0.0, 3.0]), jnp.array([1.0, 0.3, 0.1])
        )
        window_fn = lambda s: R.straight_ref_window(
            s0, s, dt, win_rows, max_dist
        )
        project_fn = lambda p: R.straight_project(s0, p)
    else:  # circle
        c = R.circle_init(
            jnp.array([0.0, 0.0, 3.0]), jnp.array([0.0, 1.0, 0.0]),
            radius=2.0, direction=1.0, plane=(0, 1),
        )
        window_fn = lambda s: R.circle_ref_window(
            c, s, dt, win_rows, max_dist, (0, 1)
        )
        project_fn = lambda p: R.circle_project(c, p, (0, 1))

    an_kwargs = {}
    if cfg.get("train_mode") == "LSTM":
        from apg_trajectory_tracking_tpu.models import (
            lstm_net_apply,
            init_lstm_state,
        )

        an_kwargs["net_apply"] = lstm_net_apply
        an_kwargs["net_carry"] = init_lstm_state(
            n, hidden=cfg.get("hidden", 8)
        )
    roll = follow_analytic(
        net, dyn, window_fn, project_fn, init_state,
        thresh_div=1.0, thresh_stable=1.0, horizon=horizon, dt=dt,
        **an_kwargs,
    )
    divs = np.asarray(roll["divergences"])
    valid = np.asarray(roll["valid"])
    err = (divs * valid).sum() / max(valid.sum(), 1)
    print(f"{args.ref}: avg divergence {err:.3f}, "
          f"mean steps before divergence "
          f"{valid.sum(axis=1).mean():.1f}")
    if args.live is not None:
        from apg_trajectory_tracking_tpu.utils.live_view import replay_quad

        states = np.asarray(roll["states"])
        n_frames, _ = replay_quad(
            states[0][valid[0]], dt=dt,
            max_frames=None if args.live < 0 else args.live,
        )
        print(f"live replay: {n_frames} frames")


if __name__ == "__main__":
    main()

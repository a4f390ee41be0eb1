#!/usr/bin/env python
"""Per-step control latency: the deployment metric.

The reference deploys its controllers in a 10 Hz closed loop
(`evaluate_drone.py` steps at dt=0.1), so the budget is 100 ms per
decision; its CasADi/IPOPT MPC solves ~30 OCPs/s (~33 ms each) on a CPU
core, and that cost is the paper's motivation for learning a network in
the first place. This benchmark measures the same quantity for every
controller family in this framework, on whatever backend JAX selects
(TPU by default, --cpu to force the host):

  - neural MLP (the distilled flagship): featurize + forward + sigmoid
  - neural LSTM (recurrent student): + hidden-state carry
  - MPC Adam shooting h=10 / h=20 (warm-started, the production solver)
  - MPC iLQR h=10 (Gauss-Newton)

Two regimes per controller:

  single  — one state in, one action out, blocking each step (a real
            onboard control loop);
  batched — 1024 parallel loops, amortized per-env latency (the fleet /
            simulation regime the framework is built around).

Prints a markdown table and one JSON line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _median_ms(fn, n, warmup=5):
    for _ in range(warmup):
        fn()
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        times.append((time.perf_counter() - t0) * 1e3)
    times.sort()
    return times[len(times) // 2]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=100,
                        help="timed calls per row (median reported)")
    parser.add_argument("--batch", type=int, default=1024)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--out", default=None, help="write JSON here too")
    args = parser.parse_args()

    if args.cpu:
        from apg_trajectory_tracking_tpu.utils.backend import (
            force_cpu_backend,
        )

        force_cpu_backend()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from apg_trajectory_tracking_tpu.controllers.mpc import MPC
    from apg_trajectory_tracking_tpu.data.dataset import quad_prepare_data
    from apg_trajectory_tracking_tpu.dynamics.quad import quad_params
    from apg_trajectory_tracking_tpu.models import (
        control_net_apply,
        init_lstm_state,
        lstm_net_apply,
    )

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from evaluate_quad import load_quad_controller

    device = jax.devices()[0].device_kind
    dyn = quad_params()
    rng = np.random.RandomState(0)

    def window(b, h):
        w = np.zeros((b, h, 9), dtype=np.float32)
        w[:, :, :3] = rng.randn(b, h, 3).astype(np.float32) * 0.1
        return jnp.asarray(w)

    def state(b):
        s = np.zeros((b, 12), dtype=np.float32)
        s[:, :3] = rng.randn(b, 3).astype(np.float32) * 0.1
        return jnp.asarray(s)

    rows = []

    # ---- neural controllers ------------------------------------------------
    mlp, mlp_cfg = load_quad_controller("assets/quad_mpc_distilled")

    @jax.jit
    def mlp_step(params, s, w):
        in_state, _, in_ref, _ = quad_prepare_data(s, w)
        return jax.nn.sigmoid(control_net_apply(params, in_state, in_ref))

    lstm, lstm_cfg = load_quad_controller("assets/quad_mpc_distilled_lstm")
    lstm_hidden = lstm_cfg.get("hidden", 8)
    lstm_window = lstm_cfg.get("net_window", lstm_cfg["horizon"])

    @jax.jit
    def lstm_step(params, carry, s, w):
        in_state, _, in_ref, _ = quad_prepare_data(s, w)
        carry, logits = lstm_net_apply(params, carry, in_state, in_ref)
        return carry, jax.nn.sigmoid(logits)

    for b in (1, args.batch):
        s, w = state(b), window(b, mlp_cfg["horizon"])
        ms = _median_ms(
            lambda: mlp_step(mlp, s, w).block_until_ready(), args.n
        )
        rows.append(("neural MLP (distilled)", b, ms))

        s, w2 = state(b), window(b, lstm_window)
        carry = init_lstm_state(b, hidden=lstm_hidden)
        ms = _median_ms(
            lambda: lstm_step(lstm, carry, s, w2)[1].block_until_ready(),
            args.n,
        )
        rows.append(("neural LSTM (distilled)", b, ms))

    # ---- MPC solvers (single: the real MPC.predict_actions loop; ----------
    # ---- batched: the vmapped jitted solve the evaluators/teachers use) ----
    from apg_trajectory_tracking_tpu.controllers.mpc import (
        _SPECS,
        _make_solver,
    )
    from apg_trajectory_tracking_tpu.dynamics.quad import quad_step

    for label, solver, horizon, iters in (
        ("MPC adam h=10", "adam", 10, 50),
        ("MPC adam h=20", "adam", 20, 50),
        ("MPC iLQR h=10", "ilqr", 10, 10),
    ):
        mpc = MPC(horizon=horizon, dt=0.1, dynamics="flightmare",
                  solver=solver, n_iters=iters)
        s1 = np.asarray(state(1))[0]
        w1 = np.zeros((horizon, 9), dtype=np.float32)
        ms = _median_ms(lambda: mpc.predict_actions(s1, w1), args.n)
        rows.append((label, 1, ms))

        # batched path: the vmapped jitted solve the evaluators/teachers
        # use (both solvers expose the same solve(dyn, x0, ref, z) shape)
        if solver == "adam":
            solve = _make_solver(
                quad_step, _SPECS["flightmare"], horizon, 0.1, iters, 0.1
            )
        else:
            from apg_trajectory_tracking_tpu.controllers.ilqr import (
                make_ilqr_solver,
            )

            solve = make_ilqr_solver(
                quad_step, _SPECS["flightmare"], horizon, 0.1,
                n_iters=iters,
            )
        v_solve = jax.jit(jax.vmap(solve, in_axes=(None, 0, 0, 0)))
        sb = state(args.batch)
        wb = jnp.concatenate(
            [window(args.batch, horizon),
             jnp.zeros((args.batch, horizon, 3), jnp.float32)], axis=2
        )
        zb = jnp.zeros((args.batch, horizon, 4), jnp.float32)
        ms = _median_ms(
            lambda: v_solve(dyn, sb, wb, zb)[0].block_until_ready(),
            max(args.n // 10, 10),
        )
        rows.append((label, args.batch, ms))

    # ---- cartpole swing-up two-start iLQR (DESIGN.md §4): per-decision ----
    # ---- cost of the doubled h=60 solve in the 20 Hz cartpole loop --------
    from apg_trajectory_tracking_tpu.controllers.ilqr import (
        make_cartpole_swingup_ilqr,
    )
    from apg_trajectory_tracking_tpu.dynamics.cartpole import cartpole_params
    from apg_trajectory_tracking_tpu.envs.cartpole_env import reset_swingup

    cp_dyn = cartpole_params()
    su_apply, su_init = make_cartpole_swingup_ilqr(cp_dyn)
    jit_su = jax.jit(su_apply)
    s1 = reset_swingup(jax.random.PRNGKey(0), 1)
    z1 = su_init(s1)
    ms = _median_ms(
        lambda: jit_su(None, s1, z1)[0].block_until_ready(),
        max(args.n // 2, 10),
    )
    rows.append(("MPC iLQR swing-up two-start h=60 (cartpole)", 1, ms))

    # ---- report ------------------------------------------------------------
    print(f"\nPer-step control latency ({device}, median of {args.n}):\n")
    print("| controller | batch | latency/step | per-env | steps/s/env |")
    print("|---|---|---|---|---|")
    result = {}
    for label, b, ms in rows:
        per_env = ms / b
        print(f"| {label} | {b} | {ms:.3f} ms | {per_env*1e3:.1f} us "
              f"| {1e3/per_env:,.0f} |")
        result[f"{label} @ {b}"] = {
            "ms_per_step": round(ms, 4),
            "us_per_env_step": round(per_env * 1e3, 2),
        }
    payload = {"device": device, "n": args.n, "batch": args.batch,
               "latency": result}
    print()
    print(json.dumps(payload))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=1)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Close the swing-up iLQR's one mismatch failure by system identification.

`docs/swingup_robustness.json` shows the two-start iLQR
(`make_cartpole_swingup_ilqr`) dropping to 0.65 success when the plant's
pole length is 1.9x its internal model's: the energy-pump seed and the
LQR terminal are calibrated to the nominal pendulum frequency, so the
mismatch corrupts the objective itself. Because the controller is an
ordinary function of a `CartpoleParams` pytree, the fix is the
framework's standard adaptation loop (the reference's run_dynamics
experiment, `train_base.py:334-375`, reduced to its essence):

  1. collect transitions from the perturbed plant (random-action
     rollout states, the `construct_states` distribution);
  2. identify the physical parameter by gradient descent through the
     differentiable step — the library dynamics-fit step with a mask
     that trains ONLY `length` (residual and other params frozen);
  3. rebuild the controller from the identified params — one function
     call; the DARE terminal, LQR hold gains, and pump seed all
     recompute (vs regenerating a CasADi symbolic twin in the
     reference's architecture).

Writes ``docs/swingup_adapt.json``: mismatched / identified / oracle
success rates plus the identified length. Quoted in DESIGN.md §4.

Usage: python scripts/swingup_adapt.py [--factor 1.9] [--eval 20]
       [--fit_steps 300] [--n_data 2048] [--cpu]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--factor", type=float, default=1.9)
    parser.add_argument("--eval", type=int, default=20)
    parser.add_argument("--fit_steps", type=int, default=300)
    parser.add_argument("--n_data", type=int, default=2048)
    parser.add_argument("--lr", type=float, default=3e-2)
    parser.add_argument("--out", default="docs/swingup_adapt.json")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    if args.cpu:
        from apg_trajectory_tracking_tpu.utils.backend import (
            force_cpu_backend,
        )

        force_cpu_backend()

    import jax
    import jax.numpy as jnp
    import optax

    from apg_trajectory_tracking_tpu.controllers.ilqr import (
        make_cartpole_swingup_ilqr,
    )
    from apg_trajectory_tracking_tpu.dynamics.cartpole import (
        DEFAULT_CARTPOLE_CFG,
        cartpole_params,
        cartpole_step,
    )
    from apg_trajectory_tracking_tpu.dynamics.learnt import (
        LearntDynamics,
        make_learnt_cartpole,
    )
    from apg_trajectory_tracking_tpu.envs.cartpole_env import (
        construct_states,
    )
    from apg_trajectory_tracking_tpu.evaluation.cartpole_eval import (
        swingup_metrics,
    )
    from apg_trajectory_tracking_tpu.training.dynamics_fit import (
        build_dynamics_fit_step,
    )

    dt = 0.05
    true_len = DEFAULT_CARTPOLE_CFG["length"] * args.factor
    plant = cartpole_params({"length": true_len})
    key = jax.random.PRNGKey(42)

    def eval_with(controller_params, label):
        apply_fn, init_carry = make_cartpole_swingup_ilqr(controller_params)
        m = swingup_metrics(
            None, plant, key, nr_iters=args.eval,
            net_apply=apply_fn, horizon=60, init_carry=init_carry,
        )
        print(label, json.dumps(m), flush=True)
        return m

    # --- 1. mismatched baseline: nominal internal model vs the plant ---
    mismatched = eval_with(cartpole_params(), "mismatched(nominal)")

    # --- 2. identify length from plant transitions ----------------------
    k_states, k_acts = jax.random.split(jax.random.PRNGKey(7))
    states = construct_states(k_states, args.n_data, dt, params=plant)
    actions = jax.random.uniform(
        k_acts, (args.n_data, 1), minval=-1.0, maxval=1.0
    )

    ld, learnt_step_fn = make_learnt_cartpole(jax.random.PRNGKey(0), std=0.0)
    # mask: ONLY the length scalar trains — pure physical-parameter SI
    # (residual stays exactly zero, std=0.0 above, and frozen here)
    labels = LearntDynamics(
        base=ld.base._replace(
            **{f: "freeze" for f in ld.base._fields}
        )._replace(length="train"),
        residual=jax.tree_util.tree_map(lambda _: "freeze", ld.residual),
        action_transform=None,
    )
    optimizer = optax.multi_transform(
        {"train": optax.adam(args.lr), "freeze": optax.set_to_zero()},
        labels,
    )
    opt_state = optimizer.init(ld)
    fit_step = build_dynamics_fit_step(
        learnt_step_fn, cartpole_step, optimizer, dt
    )
    fit_step = jax.jit(fit_step)
    for i in range(args.fit_steps):
        ld, opt_state, loss = fit_step(ld, opt_state, plant, states, actions)
        if i % 50 == 0 or i == args.fit_steps - 1:
            print(f"fit step {i}: loss {float(loss):.5f} "
                  f"length {float(ld.base.length):.4f}", flush=True)
    fitted_len = float(ld.base.length)

    # --- 3. rebuild the controller from the identified params -----------
    identified = eval_with(
        cartpole_params({"length": fitted_len}), "identified"
    )
    oracle = eval_with(plant, "oracle(true params)")

    out = {
        "protocol": (
            f"plant length = nominal x{args.factor} ({true_len:.3f}); "
            f"identify from {args.n_data} construct_states transitions "
            f"({args.fit_steps} Adam steps on the length scalar only); "
            f"swing-up protocol n={args.eval} (seed 42) per row"
        ),
        "true_length": true_len,
        "identified_length": fitted_len,
        "results": {
            "mismatched_nominal_model": mismatched,
            "identified_model": identified,
            "oracle_true_params": oracle,
        },
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()

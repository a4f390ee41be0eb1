#!/usr/bin/env python
"""MPC distillation for the fixed wing: DAgger the long-horizon shooting
MPC (which intercepts waypoints within ~0.0003 m at h=20,
evaluate_wing --mpc_horizon 20) into the wing controller net.

Same recipe as scripts/distill_mpc.py (see there for the method notes):
sample (state, target) pairs from exploration flights, label with the
batched teacher solve toward the linear-ramp reference (MPC._ref_wing
semantics, in-graph and vmapped), regress, then DAgger on the student's
own closed-loop states.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n_pairs", type=int, default=6000)
    parser.add_argument("--steps", type=int, default=4000)
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--dagger_iters", type=int, default=4)
    parser.add_argument("--dagger_rollouts", type=int, default=20)
    parser.add_argument("--teacher_horizon", type=int, default=20)
    parser.add_argument("--mpc_iters", type=int, default=100)
    parser.add_argument("--eval", type=int, default=20)
    parser.add_argument("-s", "--save_name", default="wing_mpc_distilled")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    if args.cpu:
        from apg_trajectory_tracking_tpu.utils.backend import (
            force_cpu_backend,
        )

        force_cpu_backend()

    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    from apg_trajectory_tracking_tpu.controllers.mpc import (
        _SPECS,
        _make_solver,
    )
    from apg_trajectory_tracking_tpu.data.dataset import (
        WING_MEAN,
        WING_STD,
        wing_prepare_data,
    )
    from apg_trajectory_tracking_tpu.dynamics.fixed_wing import (
        wing_params,
        wing_step,
    )
    from apg_trajectory_tracking_tpu.envs.wing_env import sample_training_data
    from apg_trajectory_tracking_tpu.evaluation.wing_eval import run_eval
    from apg_trajectory_tracking_tpu.models import (
        control_net_apply,
        init_control_net,
    )
    from apg_trajectory_tracking_tpu.utils.checkpoints import save_checkpoint

    horizon, dt = 10, 0.05
    th = args.teacher_horizon
    rng = np.random.RandomState(args.seed)
    dyn = wing_params({})
    mean = jnp.asarray(WING_MEAN)
    std = jnp.asarray(WING_STD)

    def evalN(net, key=123):
        m, _, _ = run_eval(
            net, dyn, jax.random.PRNGKey(key), mean, std,
            nr_test=args.eval, horizon=horizon, dt=dt, test_time=True,
        )
        return m

    # teacher: shooting solve over the wing ramp reference (pos-only rows,
    # MPC._ref_wing semantics), vmapped
    solve = _make_solver(
        wing_step, _SPECS["fixed_wing_3D"], th, dt, args.mpc_iters, 0.1
    )

    def teacher_ref(state, target):
        pos, vel = state[:3], state[3:6]
        vec = target - pos
        speed = jnp.linalg.norm(vel)
        step_vec = vec * (speed * dt / jnp.maximum(
            jnp.linalg.norm(vec), 1e-6
        ))
        steps = jnp.arange(1, th + 1, dtype=jnp.float32)[:, None]
        ref = jnp.zeros((th, 12), jnp.float32)
        return ref.at[:, :3].set(pos + steps * step_vec)

    @jax.jit
    def label(states_b, targets_b):
        refs = jax.vmap(teacher_ref)(states_b, targets_b)
        z = jnp.zeros((states_b.shape[0], th, 4), jnp.float32)
        u, _, _ = jax.vmap(solve, in_axes=(None, 0, 0, 0))(
            dyn, states_b, refs, z
        )
        u = jnp.clip(u[:, :horizon], 1e-4, 1 - 1e-4)
        return jnp.log(u / (1 - u)).reshape(u.shape[0], -1)

    states, targets = sample_training_data(
        rng, args.n_pairs, dt=dt, params=dyn
    )
    states = jnp.asarray(np.asarray(states, np.float32))
    targets = jnp.asarray(np.asarray(targets, np.float32))
    target_logits = label(states, targets)
    print(f"labeled {states.shape[0]} pairs (teacher horizon {th})")

    key = jax.random.PRNGKey(args.seed)
    net = init_control_net(key, 9, 1, 3, horizon * 4, conv=False)
    opt = optax.adam(args.lr)
    opt_state = opt.init(net)

    @jax.jit
    def sup_step(net, opt_state, s, tg, t):
        def loss_fn(p):
            normed, _, rel_ref, _ = wing_prepare_data(
                s, tg, mean, std, dt=dt, horizon=horizon
            )
            logits = control_net_apply(p, normed, rel_ref)
            return jnp.mean(
                (jax.nn.sigmoid(logits) - jax.nn.sigmoid(t)) ** 2
            )

        loss, g = jax.value_and_grad(loss_fn)(net)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(net, updates), opt_state, loss

    def fit_steps(net, opt_state, s, tg, t, steps):
        n = s.shape[0]
        for i in range(steps):
            idx = rng.randint(n, size=args.batch)
            net, opt_state, loss = sup_step(
                net, opt_state, s[idx], tg[idx], t[idx]
            )
            if i % 1000 == 0:
                print(f"  step {i}: imitation loss {float(loss):.5f}",
                      flush=True)
        return net, opt_state

    net, opt_state = fit_steps(
        net, opt_state, states, targets, target_logits, args.steps
    )
    m = evalN(net)
    print("cloned:", json.dumps(
        {"err": round(m["mean_success"], 5)}), flush=True)
    best_net, best_err = net, m["mean_success"]

    all_s, all_t, all_l = [states], [targets], [target_logits]
    for it in range(args.dagger_iters):
        key, k = jax.random.split(key)
        _, roll, ep_targets = run_eval(
            net, dyn, k, mean, std, nr_test=args.dagger_rollouts,
            horizon=horizon, dt=dt, test_time=False,
        )
        vs = np.asarray(roll["states"]).reshape(-1, 12)
        valid = np.asarray(roll["valid"]).reshape(-1)
        T = np.asarray(roll["valid"]).shape[1]
        vt = np.repeat(np.asarray(ep_targets)[:, None, :], T, axis=1
                       ).reshape(-1, 3)
        take = np.where(valid)[0][::3][: args.n_pairs]
        vs = jnp.asarray(vs[take])
        vt = jnp.asarray(vt[take])
        vl = label(vs, vt)
        all_s.append(vs)
        all_t.append(vt)
        all_l.append(vl)
        s_cat, t_cat, l_cat = map(jnp.concatenate, (all_s, all_t, all_l))
        net, opt_state = fit_steps(
            net, opt_state, s_cat, t_cat, l_cat, args.steps // 2
        )
        m = evalN(net)
        print(f"dagger {it} ({s_cat.shape[0]} pairs):", json.dumps(
            {"err": round(m["mean_success"], 5)}), flush=True)
        if m["mean_success"] < best_err:
            best_net, best_err = net, m["mean_success"]
    net = best_net
    print(f"best err {best_err:.5f}")

    save_path = os.path.join("trained_models", "wing", args.save_name)
    save_checkpoint(
        save_path, "model_wing", net,
        {"state_size": 12, "horizon": horizon, "ref_dim": 3,
         "action_dim": 4, "delta_t": dt, "distilled_from": "mpc_adam",
         "teacher_horizon": th, "mpc_iters": args.mpc_iters,
         "mean": np.asarray(mean).tolist(),
         "std": np.asarray(std).tolist()},
    )
    print("saved to", save_path)


if __name__ == "__main__":
    main()

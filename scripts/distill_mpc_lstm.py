#!/usr/bin/env python
"""Recurrent MPC distillation: can a *recurrent* student close the gap to
the long-horizon receding-horizon teacher that feed-forward students
cannot (DESIGN.md §7)?

A warm-started h=20 MPC replans every step, carrying its previous plan
forward; feed-forward students saturate at ~2-4x its closed-loop error.
An LSTM student carries hidden state across steps — in principle it can
amortize the plan-carrying. This script tests that:

  1. roll the warm-started teacher closed-loop on training trajectories,
     recording per-step (state, 20-row window, executed action) SEQUENCES;
  2. train the LSTM by teacher forcing (scan over the sequence, hidden
     state threaded, MSE on executed actions);
  3. DAgger: roll the student closed-loop, label its visited sequences
     with fresh teacher solves, train on the union;
  4. evaluate through the standard closed-loop evaluator (the LSTM eval
     path, 20-row windows).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--teacher_horizon", type=int, default=20)
    parser.add_argument("--mpc_iters", type=int, default=100)
    parser.add_argument("--rollouts", type=int, default=30,
                        help="teacher rollouts for the initial dataset")
    parser.add_argument("--dagger_iters", type=int, default=4)
    parser.add_argument("--dagger_rollouts", type=int, default=20)
    parser.add_argument("--steps", type=int, default=1500,
                        help="minibatch gradient steps per fit stage")
    parser.add_argument("--seq_batch", type=int, default=32,
                        help="sequences per minibatch")
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--hidden", type=int, default=64)
    parser.add_argument("--speed", type=float, default=0.4)
    parser.add_argument("--eval", type=int, default=50)
    parser.add_argument("-s", "--save_name", default="mpc_distilled_lstm")
    parser.add_argument("--data_dir", default="data/traj_data_full")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--base_model", default=None,
                        help="resume the DAgger loop from a previously "
                             "saved student (dir under trained_models/quad)")
    parser.add_argument("--failure_focus", action="store_true",
                        help="each DAgger round also rolls the student "
                             "under test-time break semantics and "
                             "oversamples (x2) the sequences of episodes "
                             "that break — the recipe that lifted the "
                             "feed-forward champion (distill_mpc.py)")
    parser.add_argument("--select", default="err",
                        choices=["err", "stable"],
                        help="round selection: best divergence, or best "
                             "(stable ratio, then divergence)")
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
    from apg_trajectory_tracking_tpu.data.dataset import quad_prepare_data
    from apg_trajectory_tracking_tpu.dynamics.quad import (
        quad_params,
        quad_step,
    )
    from apg_trajectory_tracking_tpu.evaluation.quad_eval import (
        follow_trajectories,
        run_eval,
    )
    from apg_trajectory_tracking_tpu.models import (
        init_lstm_net,
        init_lstm_state,
        lstm_net_apply,
    )
    from apg_trajectory_tracking_tpu.trajectory.generate import (
        ensure_trajectory_bank,
        load_trajectory_bank,
        prepare_trajectory,
    )
    from apg_trajectory_tracking_tpu.trajectory.refs import array_ref_window

    th, dt, horizon = args.teacher_horizon, 0.1, 10
    # a resumed leg must consume a DIFFERENT rng stream than its base run
    # (see distill_mpc.py — otherwise legs redraw identical rollouts)
    seed = args.seed
    if args.base_model is not None:
        seed = args.seed + (
            int.from_bytes(args.base_model.encode(), "little") % 100003
        )
    rng = np.random.RandomState(seed)
    dyn = quad_params()
    bank = load_trajectory_bank(ensure_trajectory_bank(args.data_dir))
    bank_test = load_trajectory_bank(args.data_dir, test=True)

    solve = _make_solver(
        quad_step, _SPECS["flightmare"], th, dt, args.mpc_iters, 0.1
    )
    v_solve = jax.jit(jax.vmap(solve, in_axes=(None, 0, 0, 0)))

    def refs_from(bank_arr, n):
        idx = rng.choice(len(bank_arr), size=n, replace=False)
        refs = np.stack(
            [prepare_trajectory(bank_arr[i], dt, args.speed) for i in idx]
        )
        refs[:, :, 2] += 3.0
        return jnp.asarray(refs)

    @jax.jit
    def teacher_rollout(references):
        """Warm-started receding-horizon teacher, recording sequences."""
        n = references.shape[0]
        state = jnp.zeros((n, 12), jnp.float32).at[:, :3].set(
            references[:, 0, :3]
        )
        z = jnp.zeros((n, th, 4), jnp.float32)
        ref_len = references.shape[1] - th

        def body(carry, i):
            state, z = carry
            window = jax.vmap(
                lambda r: array_ref_window(r, i, th)
            )(references)
            win12 = jnp.concatenate(
                [window, jnp.zeros((n, th, 3), jnp.float32)], axis=2
            )
            u, z_new, _ = v_solve(dyn, state, win12, z)
            new_state = quad_step(dyn, state, u[:, 0], dt)
            z = jnp.concatenate([z_new[:, 1:], z_new[:, -1:]], axis=1)
            # stay on-trajectory (train-time reset) so sequences cover it
            proj = references[
                :, jnp.minimum(i + 1, references.shape[1] - 1)
            ]
            div = jnp.linalg.norm(proj[:, :3] - new_state[:, :3], axis=1)
            reset = jnp.concatenate(
                [proj, jnp.zeros((n, 3))], axis=1
            ).astype(jnp.float32)
            new_state = jnp.where((div > 1.0)[:, None], reset, new_state)
            valid = i <= ref_len
            return (new_state, z), (state, window, u[:, 0],
                                    jnp.full((n,), valid))

        _, (states, windows, actions, valid) = jax.lax.scan(
            body, (state, z), jnp.arange(251)
        )
        # (T, n, ...) -> (n, T, ...)
        sw = lambda x: jnp.swapaxes(x, 0, 1)
        return sw(states), sw(windows), sw(actions), sw(valid)

    def label_sequences(states, windows):
        """Cold teacher labels for student-visited sequences
        ((n, T, ...) arrays), batched over n*T."""
        n, T = states.shape[:2]
        s_flat = states.reshape(-1, 12)
        w_flat = windows.reshape(-1, th, 9)
        w12 = jnp.concatenate(
            [w_flat, jnp.zeros((n * T, th, 3), jnp.float32)], axis=2
        )
        z = jnp.zeros((n * T, th, 4), jnp.float32)
        u, _, _ = v_solve(dyn, s_flat, w12, z)
        return u[:, 0].reshape(n, T, 4)

    # ---- training machinery -------------------------------------------------
    key = jax.random.PRNGKey(args.seed)
    key, k_net = jax.random.split(key)
    net = init_lstm_net(k_net, 15, th, 9, 4, conv=True, hidden=args.hidden)
    opt = optax.adam(args.lr)
    opt_state = opt.init(net)

    @jax.jit
    def fit_epoch(net, opt_state, states, windows, actions, valid):
        """One teacher-forced pass over all sequences (scan over time,
        batch over sequences)."""

        def loss_fn(p):
            n = states.shape[0]
            carry0 = init_lstm_state(n, hidden=args.hidden)

            def step(carry, inp):
                s_t, w_t = inp
                in_state, _, in_ref, _ = quad_prepare_data(s_t, w_t)
                carry, logits = lstm_net_apply(p, carry, in_state, in_ref)
                return carry, jax.nn.sigmoid(logits)

            _, pred = jax.lax.scan(
                step, carry0,
                (jnp.swapaxes(states, 0, 1), jnp.swapaxes(windows, 0, 1)),
            )
            pred = jnp.swapaxes(pred, 0, 1)  # (n, T, 4)
            err = jnp.sum((pred - actions) ** 2, axis=-1)
            mask = valid.astype(jnp.float32)
            return jnp.sum(err * mask) / jnp.maximum(jnp.sum(mask), 1.0)

        loss, g = jax.value_and_grad(loss_fn)(net)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(net, updates), opt_state, loss

    def evalN(net):
        refs = refs_from(bank_test, min(args.eval, len(bank_test)))
        m, _ = run_eval(
            net, dyn, refs, refs.shape[1] - th, thresh_div=1.0,
            thresh_stable=1.0, horizon=horizon, dt=dt, test_time=True,
            net_apply=lstm_net_apply,
            net_carry=init_lstm_state(refs.shape[0], hidden=args.hidden),
            window_len=th, net_window=th,
        )
        return m

    def fit_stage(net, opt_state, data, n_steps):
        n = int(data[0].shape[0])
        for i in range(n_steps):
            idx = jnp.asarray(
                rng.randint(n, size=min(args.seq_batch, n))
            )
            net, opt_state, loss = fit_epoch(
                net, opt_state, *(d[idx] for d in data)
            )
            if i % 300 == 0:
                print(f"  step {i}: loss {float(loss):.5f}", flush=True)
        return net, opt_state

    # ---- phase 1: teacher sequences + teacher forcing ----------------------
    t_states, t_windows, t_actions, t_valid = teacher_rollout(
        refs_from(bank, args.rollouts)
    )
    print(f"teacher sequences: {t_states.shape}", flush=True)
    data = [t_states, t_windows, t_actions, t_valid]
    if args.base_model is not None:
        # resume: load the student and skip straight to DAgger (the
        # teacher sequences still seed the aggregate so early relabels
        # don't dominate the mix)
        from apg_trajectory_tracking_tpu.utils.checkpoints import (
            load_checkpoint,
            resolve_model_dir,
        )

        base_dir = resolve_model_dir(args.base_model, "quad")
        with open(os.path.join(base_dir, "config.json")) as f:
            base_cfg = json.load(f)
        if base_cfg.get("hidden", 8) != args.hidden:
            raise SystemExit(
                f"--base_model was trained with hidden="
                f"{base_cfg.get('hidden', 8)}; pass --hidden to match"
            )
        if base_cfg.get("net_window", base_cfg["horizon"]) != th:
            raise SystemExit(
                f"--base_model was trained with net_window="
                f"{base_cfg.get('net_window', base_cfg['horizon'])}; "
                f"pass --teacher_horizon to match"
            )
        net = load_checkpoint(base_dir, "model_quad", net)
        opt_state = opt.init(net)
    else:
        net, opt_state = fit_stage(net, opt_state, data, args.steps)
    m = evalN(net)
    print("teacher-forced:", json.dumps(
        {"err": round(m["mean_divergence"], 4),
         "stable": m["ratio_stable"]}), flush=True)
    def score_of(m):
        if args.select == "stable":
            return (-m["ratio_stable"], m["mean_divergence"])
        return (m["mean_divergence"],)

    best_net, best_score = net, score_of(m)

    # ---- phase 2: DAgger on student sequences -------------------------------
    saved = False
    for it in range(args.dagger_iters):
        refs = refs_from(bank, args.dagger_rollouts)
        roll = follow_trajectories(
            net, dyn, refs, refs.shape[1] - th, thresh_div=1.0,
            thresh_stable=1.0, horizon=horizon, dt=dt, test_time=False,
            net_apply=lstm_net_apply,
            net_carry=init_lstm_state(refs.shape[0], hidden=args.hidden),
            window_len=th, net_window=th,
        )
        s_seq = roll["states"]
        w_seq = roll["windows"]
        v_seq = roll["valid"]
        a_seq = label_sequences(s_seq, w_seq)
        data = [
            jnp.concatenate([data[0], s_seq]),
            jnp.concatenate([data[1], w_seq]),
            jnp.concatenate([data[2], a_seq]),
            jnp.concatenate([data[3], v_seq]),
        ]
        if args.failure_focus:
            frefs = refs_from(bank, args.dagger_rollouts)
            froll = follow_trajectories(
                net, dyn, frefs, frefs.shape[1] - th, thresh_div=1.0,
                thresh_stable=1.0, horizon=horizon, dt=dt, test_time=True,
                net_apply=lstm_net_apply,
                net_carry=init_lstm_state(frefs.shape[0],
                                          hidden=args.hidden),
                window_len=th, net_window=th,
            )
            fvalid = np.asarray(froll["valid"])
            # full episode = ref_len + 1 valid steps (same accounting as
            # distill_mpc.py's failure harvest — keep the two in lockstep)
            failed = fvalid.sum(axis=1) < (frefs.shape[1] - th) + 1
            n_fail = int(failed.sum())
            if n_fail:
                fmask = jnp.asarray(failed)
                fs, fw = froll["states"][fmask], froll["windows"][fmask]
                fv = froll["valid"][fmask]
                fa = label_sequences(fs, fw)
                for _ in range(2):  # oversample the failure sequences
                    data = [
                        jnp.concatenate([data[0], fs]),
                        jnp.concatenate([data[1], fw]),
                        jnp.concatenate([data[2], fa]),
                        jnp.concatenate([data[3], fv]),
                    ]
            print(f"  failure focus: {n_fail}/{args.dagger_rollouts} "
                  f"episodes broke", flush=True)
        net, opt_state = fit_stage(net, opt_state, data, args.steps // 2)
        m = evalN(net)
        print(f"dagger {it} ({data[0].shape[0]} seqs):", json.dumps(
            {"err": round(m["mean_divergence"], 4),
             "stable": m["ratio_stable"]}), flush=True)
        if score_of(m) < best_score:
            best_net, best_score = net, score_of(m)
            # checkpoint every improvement — DAgger rounds are minutes
            # each, so a long run never loses its best student
            _save(best_net, args, horizon, dt, th)
            saved = True
    print(f"best round score {tuple(round(x, 4) for x in best_score)}")
    if not saved:  # no round improved: persist the (resumed) best once
        _save(best_net, args, horizon, dt, th)


def _save(net, args, horizon, dt, th):
    from apg_trajectory_tracking_tpu.utils.checkpoints import (
        save_checkpoint,
    )

    save_path = os.path.join("trained_models", "quad", args.save_name)
    save_checkpoint(
        save_path, "model_quad", net,
        {"train_mode": "LSTM", "horizon": horizon, "ref_dim": 9,
         "action_dim": 4, "delta_t": dt, "speed_factor": args.speed,
         "hidden": args.hidden, "net_window": th, "ref_length": th,
         "distilled_from": "mpc_adam_warmstart",
         "teacher_horizon": th},
    )
    print("saved to", save_path)


if __name__ == "__main__":
    main()

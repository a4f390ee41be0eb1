#!/usr/bin/env python
"""MPC distillation: supervise the quad controller on batched in-graph MPC
solutions, then (optionally) fine-tune with the standard APG objective.

The reference cannot do this — its IPOPT solves ~30 OCPs/s on a CPU core,
so labeling a dataset is impractical. Here the vmapped Adam-shooting solve
labels thousands of (state, reference-window) pairs per second on one
chip, turning the MPC baseline into a teacher:

    1. sample (state, window) pairs from the trajectory bank (the same
       sampler the APG trainer uses) at the target speed;
    2. label each with the full horizon action sequence from the MPC solve
       (cold start, the solver's own cost);
    3. regress the controller net onto the labels (sigmoid-space MSE,
       Adam);
    4. DAgger rounds (--dagger_iters): roll the student out closed-loop on
       training trajectories, relabel every visited (state, window) pair
       with the MPC teacher in one vmapped solve, grow the dataset, and
       keep training — fixing the compounding-error distribution shift
       that plain behavior cloning suffers;
    5. optionally continue with standard APG training from the distilled
       weights (--apg_epochs).

Evaluates on distinct test trajectories after each stage.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n_pairs", type=int, default=8000)
    parser.add_argument("--speed", type=float, default=0.4)
    parser.add_argument("--steps", type=int, default=4000,
                        help="supervised Adam steps")
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--dagger_iters", type=int, default=3)
    parser.add_argument("--dagger_rollouts", type=int, default=20,
                        help="student rollouts per DAgger round")
    parser.add_argument("--apg_epochs", type=int, default=0,
                        help="APG fine-tune epochs after distillation")
    parser.add_argument("--eval", type=int, default=50)
    parser.add_argument("-s", "--save_name", default="mpc_distilled")
    parser.add_argument("--data_dir", default="data/traj_data_full")
    parser.add_argument("--mpc_iters", type=int, default=50)
    parser.add_argument("--teacher_horizon", type=int, default=10,
                        help="teacher's planning horizon (longer plans "
                             "give far better labels: h20 MPC tracks at "
                             "~0.014 vs h10's ~0.056; the student still "
                             "emits 10 actions)")
    parser.add_argument("--hidden", type=int, default=64,
                        help="student width (64 = reference architecture)")
    parser.add_argument("--student_horizon", type=int, default=10,
                        help="actions the student emits per query (10 = "
                             "reference contract; only the first executes "
                             "closed-loop)")
    parser.add_argument("--student_window", type=int, default=None,
                        help="reference rows the student SEES (default = "
                             "10; set = teacher_horizon so a long-horizon "
                             "teacher is realizable for the student)")
    parser.add_argument("--base_model", default=None,
                        help="resume the DAgger loop from a previously "
                             "saved student (dir under trained_models/quad)")
    parser.add_argument("--failure_focus", action="store_true",
                        help="each DAgger round additionally rolls the "
                             "student out under test-time break semantics, "
                             "harvests the states leading up to each "
                             "break, and oversamples them (x2) in the "
                             "aggregate — targets the stability tail that "
                             "plain coverage DAgger plateaus on")
    parser.add_argument("--select", default="err",
                        choices=["err", "stable"],
                        help="round selection criterion: best mean "
                             "divergence, or best (stable ratio, then "
                             "divergence)")
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

    from apg_trajectory_tracking_tpu.data.dataset import quad_prepare_data
    from apg_trajectory_tracking_tpu.dynamics.quad import (
        quad_params,
        quad_step,
    )
    from apg_trajectory_tracking_tpu.envs.quad_env import (
        full_state_training_data,
    )
    from apg_trajectory_tracking_tpu.evaluation.quad_eval import run_eval
    from apg_trajectory_tracking_tpu.models import (
        control_net_apply,
        init_control_net,
    )
    from apg_trajectory_tracking_tpu.trajectory.generate import (
        ensure_trajectory_bank,
        load_trajectory_bank,
        prepare_trajectory,
    )

    horizon, dt = args.student_horizon, 0.1
    # a resumed leg must consume a DIFFERENT rng stream than its base run
    # (and than sibling legs), or every leg redraws the same teacher pairs
    # and DAgger trajectories; fold the base name into the seed
    seed = args.seed
    if args.base_model is not None:
        seed = args.seed + (
            int.from_bytes(args.base_model.encode(), "little") % 100003
        )
    rng = np.random.RandomState(seed)
    bank = load_trajectory_bank(ensure_trajectory_bank(args.data_dir))
    bank_test = load_trajectory_bank(args.data_dir, test=True)

    sw = args.student_window or horizon

    def eval50(net):
        r = np.random.RandomState(42)
        idx = r.choice(len(bank_test), size=min(args.eval, len(bank_test)),
                       replace=False)
        refs = np.stack(
            [prepare_trajectory(bank_test[i], dt, args.speed) for i in idx]
        )
        refs[:, :, 2] += 3.0
        kw = {}
        if sw != horizon:
            kw = {"window_len": sw, "net_window": sw}
        m, _ = run_eval(
            net, quad_params(), jnp.asarray(refs), refs.shape[1] - sw,
            thresh_div=1.0, thresh_stable=1.0, horizon=horizon, dt=dt,
            test_time=True, **kw,
        )
        return m

    # 1. sample (state, window) pairs at the target speed; windows carry
    #    the TEACHER's horizon — the student consumes the first 10 rows
    th = args.teacher_horizon
    # the sampled window carries max(th, sw) rows, so any (th, sw) pair is
    # consistent by construction: the teacher solves over the first th
    # rows, the student consumes the first sw
    win_rows = max(th, sw)
    states, windows = full_state_training_data(
        rng, bank, args.n_pairs, ref_length=win_rows, dt=dt,
        speed_factor=args.speed,
    )
    states = jnp.asarray(states)
    windows = jnp.asarray(windows)

    # 2. label with the batched MPC solve over the teacher horizon (cold
    #    start; window rows padded to the 12 state dims like
    #    MPC._ref_quad); the student imitates the first 10 planned actions
    from apg_trajectory_tracking_tpu.controllers.mpc import (
        _SPECS,
        _make_solver,
    )

    solve = _make_solver(
        quad_step, _SPECS["flightmare"], th, dt, args.mpc_iters, 0.1
    )
    dyn = quad_params()
    v_solve = jax.jit(jax.vmap(solve, in_axes=(None, 0, 0, 0)))

    def label(states_b, windows_b):
        wb = windows_b[:, :th]
        win12 = jnp.concatenate(
            [wb, jnp.zeros(wb.shape[:2] + (3,), jnp.float32)], axis=2
        )
        z = jnp.zeros((states_b.shape[0], th, 4), jnp.float32)
        lab, _, _ = v_solve(dyn, states_b, win12, z)
        lab = jnp.clip(lab[:, :horizon], 1e-4, 1 - 1e-4)
        return jnp.log(lab / (1 - lab)).reshape(lab.shape[0], -1)

    target_logits = label(states, windows)
    print(f"labeled {states.shape[0]} pairs (teacher horizon {th})")

    # 3. supervised regression toward the teacher actions
    key = jax.random.PRNGKey(args.seed)
    # the net's conv-ref branch is sized by the rows it consumes (sw)
    net = init_control_net(key, 15, sw, 9, horizon * 4, conv=True,
                           hidden=args.hidden)
    opt = optax.adam(args.lr)
    opt_state = opt.init(net)

    @jax.jit
    def sup_step(net, opt_state, s, w, t):
        def loss_fn(p):
            in_state, _, in_ref, _ = quad_prepare_data(s, w[:, :sw])
            logits = control_net_apply(p, in_state, in_ref)
            # match executed actions, not raw logits: sigmoid-space MSE
            return jnp.mean(
                (jax.nn.sigmoid(logits) - jax.nn.sigmoid(t)) ** 2
            )

        loss, g = jax.value_and_grad(loss_fn)(net)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(net, updates), opt_state, loss

    def fit_steps(net, opt_state, states, windows, target_logits, steps):
        n = states.shape[0]
        loss = None
        for step_i in range(steps):
            idx = rng.randint(n, size=args.batch)
            net, opt_state, loss = sup_step(
                net, opt_state, states[idx], windows[idx],
                target_logits[idx],
            )
            if step_i % 1000 == 0:
                print(f"  step {step_i}: imitation loss {float(loss):.5f}",
                      flush=True)
        return net, opt_state

    if args.base_model is not None:
        # resume: load the student and skip the behavior-cloning stage
        # (the fresh teacher pairs still seed the aggregate)
        from apg_trajectory_tracking_tpu.utils.checkpoints import (
            load_checkpoint,
            resolve_model_dir,
        )

        base_dir = resolve_model_dir(args.base_model, "quad")
        with open(os.path.join(base_dir, "config.json")) as f:
            base_cfg = json.load(f)
        # architecture must come from the base checkpoint — a width or
        # window mismatch would load anyway (npz leaves replace template
        # leaves) and crash far away at eval time
        if base_cfg.get("hidden", 64) != args.hidden:
            raise SystemExit(
                f"--base_model was trained with hidden="
                f"{base_cfg.get('hidden', 64)}; pass --hidden to match"
            )
        if base_cfg.get("net_window", base_cfg["horizon"]) != sw:
            raise SystemExit(
                f"--base_model was trained with net_window="
                f"{base_cfg.get('net_window', base_cfg['horizon'])}; "
                f"pass --student_window to match"
            )
        net = load_checkpoint(base_dir, "model_quad", net)
        opt_state = opt.init(net)
    else:
        net, opt_state = fit_steps(
            net, opt_state, states, windows, target_logits, args.steps
        )
    # save-on-improvement so an interrupted run keeps its best round
    from apg_trajectory_tracking_tpu.utils.checkpoints import save_checkpoint

    save_path = os.path.join("trained_models", "quad", args.save_name)
    student_cfg = {
        "train_mode": "concurrent", "horizon": horizon, "ref_dim": 9,
        "action_dim": 4, "delta_t": dt, "speed_factor": args.speed,
        "hidden": args.hidden, "net_window": sw, "ref_length": sw,
        "distilled_from": "mpc_adam", "mpc_iters": args.mpc_iters,
        "teacher_horizon": th,
    }

    def save_best(net):
        save_checkpoint(save_path, "model_quad", net, student_cfg)

    def score_of(m):
        # 'stable' ranks by stability first (divergence as tiebreak);
        # 'err' is the historical best-by-error selection
        if args.select == "stable":
            return (-m["ratio_stable"], m["mean_divergence"])
        return (m["mean_divergence"],)

    m = eval50(net)
    print("cloned:", json.dumps(
        {"err": round(m["mean_divergence"], 4),
         "stable": m["ratio_stable"]}), flush=True)
    best_net, best_score = net, score_of(m)
    save_best(best_net)

    # DAgger rounds: aggregate states the STUDENT visits, labeled by the
    # teacher, and keep training on the union
    from apg_trajectory_tracking_tpu.evaluation.quad_eval import (
        follow_trajectories,
    )

    all_s, all_w, all_t = [states], [windows], [target_logits]
    for it in range(args.dagger_iters):
        idx = rng.choice(len(bank), size=args.dagger_rollouts,
                         replace=False)
        refs = np.stack(
            [prepare_trajectory(bank[i], dt, args.speed) for i in idx]
        )
        refs[:, :, 2] += 3.0
        roll = follow_trajectories(
            net, dyn, jnp.asarray(refs), refs.shape[1] - win_rows,
            thresh_div=1.0, thresh_stable=1.0, horizon=horizon, dt=dt,
            test_time=False,  # reset-to-ref keeps coverage on-trajectory
            window_len=win_rows, net_window=sw,
        )
        vs = roll["states"].reshape(-1, 12)
        vw = roll["windows"].reshape(-1, win_rows, 9)
        valid = np.asarray(roll["valid"]).reshape(-1)
        take = np.where(valid)[0][::2][: args.n_pairs]
        vs, vw = vs[jnp.asarray(take)], vw[jnp.asarray(take)]
        vt = label(vs, vw)
        all_s.append(vs)
        all_w.append(vw)
        all_t.append(vt)
        if args.failure_focus:
            # roll the student under BREAK semantics on a fresh draw; every
            # episode that ends early contributes the states on its path to
            # failure, teacher-labeled and oversampled x2 — plain coverage
            # DAgger dilutes exactly these states away
            fidx = rng.choice(len(bank), size=args.dagger_rollouts,
                              replace=False)
            frefs = np.stack(
                [prepare_trajectory(bank[i], dt, args.speed) for i in fidx]
            )
            frefs[:, :, 2] += 3.0
            froll = follow_trajectories(
                net, dyn, jnp.asarray(frefs), frefs.shape[1] - win_rows,
                thresh_div=1.0, thresh_stable=1.0, horizon=horizon, dt=dt,
                test_time=True, window_len=win_rows, net_window=sw,
            )
            fvalid = np.asarray(froll["valid"])
            alive = fvalid.sum(axis=1)
            # a full episode executes steps i = 0..ref_len inclusive
            # (ref_len + 1 valid entries, follow_trajectories docstring);
            # anything shorter broke somewhere — including the near-miss
            # tail that breaks on the very last steps
            full_alive = (frefs.shape[1] - win_rows) + 1
            failed = alive < full_alive
            n_fail = int(failed.sum())
            if n_fail:
                fs = np.asarray(froll["states"])[failed].reshape(-1, 12)
                fw = np.asarray(froll["windows"])[failed].reshape(
                    -1, win_rows, 9
                )
                fmask = fvalid[failed].reshape(-1)
                ftake = np.where(fmask)[0][: args.n_pairs]
                fs = jnp.asarray(fs[ftake])
                fw = jnp.asarray(fw[ftake])
                ft = label(fs, fw)
                for _ in range(2):  # oversample the failure tail
                    all_s.append(fs)
                    all_w.append(fw)
                    all_t.append(ft)
            print(f"  failure focus: {n_fail}/{args.dagger_rollouts} "
                  f"episodes broke", flush=True)
        s_cat = jnp.concatenate(all_s)
        w_cat = jnp.concatenate(all_w)
        t_cat = jnp.concatenate(all_t)
        net, opt_state = fit_steps(
            net, opt_state, s_cat, w_cat, t_cat, args.steps // 2
        )
        m = eval50(net)
        print(f"dagger {it} ({s_cat.shape[0]} pairs):", json.dumps(
            {"err": round(m["mean_divergence"], 4),
             "stable": m["ratio_stable"]}), flush=True)
        if score_of(m) < best_score:
            best_net, best_score = net, score_of(m)
            save_best(best_net)
    # the shipped checkpoint is the best round under --select (error, or
    # stability-first); model only — the distillation optimizer (Adam)
    # is not the APG trainer's (SGD-momentum), so its state is not
    # resumable anyway
    net = best_net
    print(f"best round score {tuple(round(s, 4) for s in best_score)}")
    print("saved to", save_path)

    # 4. optional APG fine-tune from the distilled weights
    if args.apg_epochs > 0:
        from apg_trajectory_tracking_tpu.training.common import load_config
        from apg_trajectory_tracking_tpu.training.train_quad import TrainQuad

        cfg = load_config(
            "quad", dict(nr_epochs=args.apg_epochs,
                         speed_factor=args.speed),
        )
        tr = TrainQuad(
            config=cfg, seed=args.seed, save_name=args.save_name + "_apg",
            data_dir=args.data_dir, curriculum=False, base_model=save_path,
        )
        tr.thresh_div = 1.0
        tr.speed_factor = args.speed
        tr.fit(verbose=False)
        from apg_trajectory_tracking_tpu.utils.checkpoints import (
            restore_train_state,
        )

        best, _, _ = restore_train_state(
            tr.save_path, "model_quad", tr.net, None
        )
        m2 = eval50(best)
        print("distilled+APG:", json.dumps(
            {"err": round(m2["mean_divergence"], 4),
             "stable": m2["ratio_stable"]}))


if __name__ == "__main__":
    main()

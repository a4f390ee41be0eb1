#!/usr/bin/env python
"""Head-to-head baseline comparison on the tracking metric (VERDICT r1 #2).

Evaluates every quad controller family through the SAME evaluator, metric,
and test trajectories (the reference does this for its PPO policy via
``baselines/ppo_baseline.py:322-340`` -> ``evaluate_drone.run_eval``):

  APG (analytic policy gradient nets) | MPC (Adam shooting) | MPC (iLQR)
  | PPO (pure-JAX, trained on the same env)

Protocol: ``--eval`` distinct test trajectories (default 50, drawn without
replacement from the full 100-trajectory test bank in data/traj_data_full),
speed factor 0.4, thresh_div 1.0, test-time semantics (break on
divergence), max 251 steps. Emits a markdown table + JSON.

Optionally ``--cartpole`` adds the cartpole table: APG vs MPC vs PPO vs
PETS on the balance protocol (steps balanced <= 250, mean |velocity|).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUAD_COLUMNS = (
    "mean_divergence", "std_divergence", "ratio_stable", "mean_success",
)


def quad_references(data_dir, n_eval, dt, speed, seed=42,
                    bank_train=1000, bank_test=100):
    import numpy as np

    from apg_trajectory_tracking_tpu.trajectory.generate import (
        ensure_trajectory_bank,
        load_trajectory_bank,
        prepare_trajectory,
    )

    # generation is deterministic in (seed, n_train, n_test), so a fresh
    # clone rebuilds the EXACT protocol bank (data/ is not in git); without
    # explicit sizes ensure_trajectory_bank would default to the 200/20 CI
    # bank and silently shrink "50 distinct" to 20
    bank = load_trajectory_bank(
        ensure_trajectory_bank(data_dir, n_train=bank_train,
                               n_test=bank_test),
        test=True,
    )
    if len(bank) < n_eval:
        print(f"WARNING: test bank at {data_dir} has only {len(bank)} "
              f"trajectories (< {n_eval}); the protocol will use all of "
              "them — delete the bank to regenerate at full scale")
    rng = np.random.RandomState(seed)
    n = min(n_eval, len(bank))
    idx = rng.choice(len(bank), size=n, replace=False)  # DISTINCT trajs
    refs = np.stack([prepare_trajectory(bank[i], dt, speed) for i in idx])
    refs[:, :, 2] += 3.0
    return refs, n


def eval_apg(model_dir, references, horizon_steps, thresh_div):
    import jax.numpy as jnp

    from apg_trajectory_tracking_tpu.dynamics.quad import quad_params
    from apg_trajectory_tracking_tpu.evaluation.quad_eval import run_eval

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from evaluate_quad import load_quad_controller, eval_kwargs_for

    net, cfg = load_quad_controller(model_dir)
    metrics, _ = run_eval(
        net, quad_params(), jnp.asarray(references),
        references.shape[1] - cfg["horizon"],
        thresh_div=thresh_div, thresh_stable=1.0,
        horizon=cfg["horizon"], dt=cfg["delta_t"], test_time=True,
        **eval_kwargs_for(cfg, references.shape[0]),
    )
    return metrics


def eval_mpc(solver, references, dt, horizon, thresh_div, n_iters=None):
    import jax.numpy as jnp

    from apg_trajectory_tracking_tpu.controllers.mpc import MPC
    from apg_trajectory_tracking_tpu.dynamics.quad import (
        quad_params,
        quad_step,
    )
    from apg_trajectory_tracking_tpu.evaluation.compare import (
        mpc_follow_trajectories,
        tracking_metrics,
    )

    mpc = MPC(horizon=horizon, dt=dt, dynamics="flightmare",
              solver=solver, n_iters=n_iters)
    # SAME protocol span for every table row regardless of solver horizon
    # (reference windows pad past the trajectory end, array_ref_window);
    # ref_len = T - horizon would give long-horizon MPC a shorter, easier
    # protocol than the neural rows
    ref_len = references.shape[1] - 10
    roll = mpc_follow_trajectories(
        mpc._solve, quad_params(), jnp.asarray(references), ref_len,
        thresh_div=thresh_div, thresh_stable=1.0, dyn_step=quad_step,
        horizon=horizon, dt=dt,
    )
    return tracking_metrics(roll, thresh_div, ref_len)


def eval_ppo(
    ppo_dir, references, dt, horizon, thresh_div, speed,
    train_if_missing=False, timesteps=2_000_000, data_dir="data/traj_data",
):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from apg_trajectory_tracking_tpu.baselines import rl_envs
    from apg_trajectory_tracking_tpu.baselines.ppo import (
        PPOConfig,
        init_actor_critic,
        train_ppo,
    )
    from apg_trajectory_tracking_tpu.dynamics.quad import quad_params
    from apg_trajectory_tracking_tpu.evaluation.compare import (
        ppo_net_apply,
        ppo_action_transform,
    )
    from apg_trajectory_tracking_tpu.evaluation.quad_eval import run_eval
    from apg_trajectory_tracking_tpu.trajectory.generate import (
        ensure_trajectory_bank,
        load_trajectory_bank,
        prepare_trajectory,
    )
    from apg_trajectory_tracking_tpu.utils.checkpoints import (
        load_checkpoint,
        save_checkpoint,
    )

    obs_dim = 15 + horizon * 9
    ckpt = os.path.join(ppo_dir, "model_ppo.npz")
    if os.path.exists(ckpt):
        params = load_checkpoint(
            ppo_dir, "model_ppo",
            init_actor_critic(jax.random.PRNGKey(0), obs_dim, 4),
        )
    elif train_if_missing:
        # train on the SAME speed as the eval protocol so the comparison
        # is apples-to-apples (the reference trains its quad PPO at its
        # env's speed and evaluates at that speed, ppo_baseline.py:422-427)
        bank = load_trajectory_bank(ensure_trajectory_bank(data_dir))
        prepared = np.stack(
            [prepare_trajectory(t, dt, speed) for t in bank[:64]]
        )
        reset_fn, step_fn, obs_dim, act_dim = rl_envs.make_quad_rl(
            quad_params(), jnp.asarray(prepared)
        )
        params, _ = train_ppo(
            reset_fn, step_fn, obs_dim, act_dim,
            total_timesteps=timesteps, cfg=PPOConfig(n_envs=32),
        )
        save_checkpoint(ppo_dir, "model_ppo", params,
                        {"robot": "quad", "timesteps": timesteps,
                         "speed_factor": speed})
    else:
        return None

    metrics, _ = run_eval(
        params, quad_params(), jnp.asarray(references),
        references.shape[1] - horizon,
        thresh_div=thresh_div, thresh_stable=1.0, horizon=horizon, dt=dt,
        test_time=True, net_apply=ppo_net_apply,
        action_transform=ppo_action_transform,
    )
    return metrics


def wing_table(args):
    """Fixed-wing waypoint head-to-head: APG vs MPC (h=10 / h=20) vs PPO on
    identical targets through the SAME fly-to-point protocol (the third
    system of the reference's baseline comparison; its wing PPO is
    ``baselines/ppo_baseline.py:281-314``)."""
    import jax
    import jax.numpy as jnp

    from apg_trajectory_tracking_tpu.baselines import rl_envs
    from apg_trajectory_tracking_tpu.baselines.ppo import (
        PPOConfig,
        init_actor_critic,
        train_ppo,
    )
    from apg_trajectory_tracking_tpu.controllers.mpc import MPC
    from apg_trajectory_tracking_tpu.data.dataset import WING_MEAN, WING_STD
    from apg_trajectory_tracking_tpu.dynamics.fixed_wing import wing_params
    from apg_trajectory_tracking_tpu.evaluation.compare import (
        mpc_fly_to_point,
        ppo_wing_action_transform,
        ppo_wing_net_apply,
        wing_point_metrics,
    )
    from apg_trajectory_tracking_tpu.evaluation.wing_eval import fly_to_point
    from apg_trajectory_tracking_tpu.utils.checkpoints import (
        load_checkpoint,
        save_checkpoint,
    )

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from evaluate_wing import load_wing_controller

    n = args.wing_eval
    # shared targets, the wing evaluator's distribution: x = 50 m,
    # y/z ~ U(-5, 5) (wing_eval.run_eval / evaluate_fixed_wing.py:137)
    yz = (jax.random.uniform(jax.random.PRNGKey(42), (n, 2)) - 0.5) * 10.0
    targets = jnp.concatenate(
        [jnp.full((n, 1), 50.0), yz], axis=1
    ).astype(jnp.float32)
    thresh_div, thresh_stable, max_steps, dt = 10.0, 3.0, 1000, 0.05
    dyn = wing_params({})
    rows = {}

    net, cfg = load_wing_controller("assets/wing_trained")
    roll = fly_to_point(
        net, dyn, targets,
        jnp.asarray(cfg.get("mean", WING_MEAN)),
        jnp.asarray(cfg.get("std", WING_STD)),
        thresh_div=thresh_div, thresh_stable=thresh_stable,
        horizon=cfg["horizon"], max_steps=max_steps, dt=cfg["delta_t"],
        test_time=True,
    )
    rows["APG wing_trained"] = wing_point_metrics(roll, n)
    print("APG wing_trained", json.dumps(rows["APG wing_trained"]))

    if not args.skip_mpc:
        for label, h, iters in (
            # the reference's own MPC horizon is 10; h=20 shows the
            # solver's ceiling (horizon myopia, README wing table)
            ("MPC (adam)", 10, None),
            ("MPC (adam, h=20)", 20, 100),
        ):
            mpc = MPC(horizon=h, dt=dt, dynamics="fixed_wing_3D",
                      n_iters=iters)
            roll = mpc_fly_to_point(
                mpc._solve, dyn, targets,
                thresh_div=thresh_div, thresh_stable=thresh_stable,
                horizon=h, max_steps=max_steps, dt=dt,
            )
            rows[label] = wing_point_metrics(roll, n)
            print(label, json.dumps(rows[label]))

    # prefer a locally trained policy, then the shipped asset behind
    # docs/WING_COMPARISON.md; train only with --train_ppo
    ppo_dir = next(
        (d for d in ("trained_models/wing/ppo_compare",
                     "assets/wing_ppo_500k")
         if os.path.exists(os.path.join(d, "model_ppo.npz"))),
        "trained_models/wing/ppo_compare",
    )
    obs_dim, act_dim = 12, 4
    ppo_params = None
    if os.path.exists(os.path.join(ppo_dir, "model_ppo.npz")):
        ppo_params = load_checkpoint(
            ppo_dir, "model_ppo",
            init_actor_critic(jax.random.PRNGKey(0), obs_dim, act_dim),
        )
        # label with the checkpoint's ACTUAL training budget
        ts = None
        cfg_path = os.path.join(ppo_dir, "config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                ts = json.load(f).get("timesteps")
        tag = f"PPO ({ts // 1000}k)" if ts else "PPO"
    elif args.train_ppo:
        reset_fn, step_fn, od, ad = rl_envs.make_wing_rl(dyn)
        ppo_params, _ = train_ppo(
            reset_fn, step_fn, od, ad,
            total_timesteps=args.wing_timesteps,
            cfg=PPOConfig(n_envs=16, act_low=0.0, act_high=1.0),
        )
        save_checkpoint(ppo_dir, "model_ppo", ppo_params,
                        {"robot": "wing",
                         "timesteps": args.wing_timesteps})
        tag = f"PPO ({args.wing_timesteps // 1000}k)"
    if ppo_params is not None:
        # the RL env's fixed normalization stats (make_wing_rl)
        roll = fly_to_point(
            ppo_params, dyn, targets,
            jnp.asarray(WING_MEAN), jnp.asarray(WING_STD),
            thresh_div=thresh_div, thresh_stable=thresh_stable,
            horizon=10, max_steps=max_steps, dt=dt, test_time=True,
            net_apply=ppo_wing_net_apply,
            action_transform=ppo_wing_action_transform,
        )
        rows[tag] = wing_point_metrics(roll, n)
        print(tag, json.dumps(rows[tag]))
    else:
        print("wing PPO: no checkpoint at", ppo_dir,
              "(pass --train_ppo to train one)")

    # PETS row: prefer a locally trained ensemble, then the shipped asset
    # (train one with scripts/pets_baseline.py -r wing)
    pets_dir = find_pets_dir("wing")
    if pets_dir is not None:
        from apg_trajectory_tracking_tpu.baselines.pets import (
            PETS,
            eval_pets_wing_waypoints,
            make_wing_pets_reward,
        )

        agent = PETS(
            state_dim=12, act_dim=4, reward_fn=make_wing_pets_reward(),
            act_low=0.0, act_high=1.0, horizon=10,
            population=150, n_elites=15, n_particles=5, n_iters=5,
        )
        agent.model = load_checkpoint(pets_dir, "model_pets", agent.model)
        roll = eval_pets_wing_waypoints(
            agent, dyn, targets, thresh_div=thresh_div,
            thresh_stable=thresh_stable, max_steps=max_steps, dt=dt,
        )
        tag = pets_tag(pets_dir)
        rows[tag] = wing_point_metrics(roll, n)
        print(tag, json.dumps(rows[tag]))
    else:
        print("wing PETS: no saved ensemble "
              "(train one with pets_baseline.py -r wing)")
    return rows, n


WING_COLUMNS = (
    "mean_target_error", "std_target_error", "pass_rate",
    "mean_steps_alive",
)


def eval_pets_quad(pets_dir, references, horizon, thresh_div, dt=0.1):
    """PETS row for the quad table: reload a trained ensemble and track the
    protocol trajectories through the batched CEM evaluator (the reference
    runs PETS on quad as a first-class baseline,
    baselines/pets_baseline.py:34-44,256)."""
    import jax.numpy as jnp

    from apg_trajectory_tracking_tpu.baselines.pets import (
        PETS,
        eval_pets_quad_tracking,
        make_quad_tracking_reward,
    )
    from apg_trajectory_tracking_tpu.dynamics.quad import quad_params
    from apg_trajectory_tracking_tpu.evaluation.quad_eval import (
        metrics_from_rollout,
    )
    from apg_trajectory_tracking_tpu.utils.checkpoints import load_checkpoint

    agent = PETS(
        state_dim=12, act_dim=4,
        reward_fn=make_quad_tracking_reward(),
        act_low=0.0, act_high=1.0, horizon=10, seed=0,
        population=150, n_elites=15, n_particles=5, n_iters=5,
    )
    agent.model = load_checkpoint(pets_dir, "model_pets", agent.model)
    ref_len = references.shape[1] - horizon
    roll = eval_pets_quad_tracking(
        agent, quad_params(), jnp.asarray(references), ref_len,
        thresh_div=thresh_div, thresh_stable=1.0, dt=dt,
    )
    return metrics_from_rollout(
        roll["divergences"], roll["valid"], thresh_div, 251, ref_len,
    )


def find_pets_dir(robot):
    """Locate a trained PETS ensemble for a system: prefer a locally
    trained run (largest trial budget first), then the shipped asset."""
    candidates = {
        "quad": ("trained_models/quad/pets_200", "trained_models/quad/pets_50",
                 "trained_models/quad/pets", "assets/quad_pets"),
        "wing": ("trained_models/wing/pets_200", "trained_models/wing/pets_50",
                 "trained_models/wing/pets", "assets/wing_pets"),
        "cartpole": ("trained_models/cartpole/pets", "assets/cartpole_pets"),
    }[robot]
    return next(
        (d for d in candidates
         if os.path.exists(os.path.join(d, "model_pets.npz"))), None,
    )


def pets_tag(pets_dir):
    """Row label carrying the ensemble's ACTUAL training budget."""
    cfg_path = os.path.join(pets_dir, "config.json")
    trials = None
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            trials = json.load(f).get("trials")
    return f"PETS ({trials} trials)" if trials else "PETS"


def quad_table(args):
    """The quadrotor head-to-head: every controller family through the
    same evaluator, metric, and test trajectories."""
    dt, horizon, thresh_div = 0.1, 10, 1.0
    references, n = quad_references(
        args.data_dir, args.eval, dt, args.speed
    )
    print(f"protocol: {n} distinct test trajectories, speed {args.speed}, "
          f"thresh_div {thresh_div}, test-time break")

    rows = {}
    for model_dir in args.apg:
        name = "APG " + os.path.basename(model_dir.rstrip("/"))
        rows[name] = eval_apg(model_dir, references, horizon, thresh_div)
        print(name, json.dumps(rows[name]))
    if not args.skip_mpc:
        for name, solver, h, iters in (
            ("MPC (adam)", "adam", 10, None),
            ("MPC (ilqr)", "ilqr", 10, None),
            # h=14 is the distillation teacher's horizon (DESIGN.md 7);
            # h=20 shows the solver's true ceiling — the reference's own
            # MPC runs h=10
            ("MPC (adam, h=14)", "adam", 14, 100),
            ("MPC (adam, h=20)", "adam", 20, 100),
        ):
            rows[name] = eval_mpc(
                solver, references, dt, h, thresh_div, n_iters=iters
            )
            print(name, json.dumps(rows[name]))
    if args.ppo_dir is None:
        args.ppo_dir = next(
            (d for d in ("trained_models/quad/ppo_compare",
                         "assets/quad_ppo_2m")
             if os.path.exists(os.path.join(d, "model_ppo.npz"))),
            "trained_models/quad/ppo_compare",
        )
    ppo_metrics = eval_ppo(
        args.ppo_dir, references, dt, horizon, thresh_div, args.speed,
        train_if_missing=args.train_ppo, timesteps=args.timesteps,
    )
    if ppo_metrics is not None:
        rows["PPO (2M)"] = ppo_metrics
        print("PPO", json.dumps(ppo_metrics))
    else:
        print("PPO: no checkpoint at", args.ppo_dir,
              "(pass --train_ppo to train one)")

    pets_dir = find_pets_dir("quad")
    if pets_dir is not None:
        tag = pets_tag(pets_dir)
        rows[tag] = eval_pets_quad(pets_dir, references, horizon, thresh_div)
        print(tag, json.dumps(rows[tag]))
    else:
        print("quad PETS: no saved ensemble "
              "(train one with pets_baseline.py -r quad)")
    return rows, n


def cartpole_table(args):
    """APG vs MPC vs PPO vs PETS on the balance protocol: identical
    near-upright start states, steps-upright (<=250) + mean |velocity|."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from apg_trajectory_tracking_tpu.baselines.pets import (
        PETS,
        cartpole_reward,
        eval_pets_balance,
        run_pets_cartpole,
    )
    from apg_trajectory_tracking_tpu.baselines.ppo import (
        PPOConfig,
        init_actor_critic,
        train_ppo,
    )
    from apg_trajectory_tracking_tpu.baselines import rl_envs
    from apg_trajectory_tracking_tpu.controllers.mpc import MPC
    from apg_trajectory_tracking_tpu.dynamics.cartpole import cartpole_params
    from apg_trajectory_tracking_tpu.envs.cartpole_env import reset_upright
    from apg_trajectory_tracking_tpu.evaluation.cartpole_eval import (
        balance_metrics,
        evaluate_balance,
    )
    from apg_trajectory_tracking_tpu.evaluation.compare import (
        eval_cartpole_ppo_balance,
        make_cartpole_mpc_apply,
    )
    from apg_trajectory_tracking_tpu.models import init_cartpole_net
    from apg_trajectory_tracking_tpu.utils.checkpoints import (
        load_checkpoint,
        save_checkpoint,
    )

    dyn = cartpole_params()
    n = args.cartpole_eval
    starts = reset_upright(jax.random.PRNGKey(7), n)
    rows = {}

    for model_dir in ("assets/cartpole_trained",
                      "assets/cartpole_balance_trained",
                      "assets/cartpole_swingup_trained"):
        if not os.path.exists(os.path.join(model_dir, "config.json")):
            continue
        net = load_checkpoint(
            model_dir, "model_cartpole",
            init_cartpole_net(jax.random.PRNGKey(0), 4, 10),
        )
        name = "APG " + os.path.basename(model_dir)
        rows[name] = balance_metrics(
            evaluate_balance(net, dyn, states=starts)
        )
        print(name, json.dumps(rows[name]))

    mpc = MPC(horizon=10, dt=0.05, dynamics="cartpole")
    rows["MPC (adam)"] = balance_metrics(evaluate_balance(
        None, dyn, states=starts,
        net_apply=make_cartpole_mpc_apply(mpc),
    ))
    print("MPC", json.dumps(rows["MPC (adam)"]))

    # prefer a locally trained policy, then the shipped asset
    ppo_dir = next(
        (d for d in ("trained_models/cartpole/ppo_compare",
                     "assets/cartpole_ppo_500k")
         if os.path.exists(os.path.join(d, "model_ppo.npz"))),
        "trained_models/cartpole/ppo_compare",
    )
    obs_dim = 15
    if os.path.exists(os.path.join(ppo_dir, "model_ppo.npz")):
        ppo_params = load_checkpoint(
            ppo_dir, "model_ppo",
            init_actor_critic(jax.random.PRNGKey(0), obs_dim, 1),
        )
    else:
        reset_fn, step_fn, od, ad = rl_envs.make_cartpole_rl(dyn)
        ppo_params, _ = train_ppo(
            reset_fn, step_fn, od, ad, total_timesteps=500_000,
            cfg=PPOConfig(n_envs=16),
        )
        save_checkpoint(ppo_dir, "model_ppo", ppo_params,
                        {"robot": "cartpole", "timesteps": 500_000})
    rows["PPO (500k)"] = eval_cartpole_ppo_balance(ppo_params, dyn, starts)
    print("PPO", json.dumps(rows["PPO (500k)"]))

    # prefer a locally trained ensemble, then the shipped one (the asset
    # behind docs/CARTPOLE_COMPARISON.md); retrain only as a last resort,
    # and save that run so the next invocation reloads it
    pets_dir = find_pets_dir("cartpole")
    if pets_dir is not None:
        agent = PETS(
            state_dim=4, act_dim=1, reward_fn=cartpole_reward,
            act_low=-1.0, act_high=1.0, horizon=10,
            population=150, n_elites=15, n_particles=5, n_iters=5,
        )
        agent.model = load_checkpoint(pets_dir, "model_pets", agent.model)
        tag = pets_tag(pets_dir)
    else:
        agent, _ = run_pets_cartpole(
            trials=args.pets_trials, verbose=False
        )
        save_checkpoint("trained_models/cartpole/pets", "model_pets",
                        agent.model, {"trials": args.pets_trials})
        tag = f"PETS ({args.pets_trials} trials)"
    rows[tag] = eval_pets_balance(agent, dyn, starts)
    print("PETS", json.dumps(rows[tag]))
    return rows, n


CARTPOLE_COLUMNS = ("mean_stable", "std_stable", "mean_vel")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-a", "--eval", type=int, default=100,
                        help="number of distinct test trajectories "
                             "(default: the FULL 100-file test bank)")
    parser.add_argument("--speed", type=float, default=0.4)
    parser.add_argument("--data_dir", default="data/traj_data_full",
                        help="bank with a >=--eval-file test split")
    parser.add_argument("--apg", nargs="*",
                        default=["assets/quad_trained",
                                 "assets/quad_trained_9k",
                                 "assets/quad_ar_trained_9k",
                                 "assets/quad_minjerk_trained",
                                 "assets/quad_mpc_distilled",
                                 "assets/quad_mpc_distilled_h14",
                                 "assets/quad_mpc_distilled_stable",
                                 "assets/quad_mpc_distilled_lstm",
                                 "assets/quad_mpc_distilled_lstm_h14",
                                 "assets/reference_pretrained"],
                        help="neural checkpoints to include (the shipped "
                             "set behind docs/BASELINE_COMPARISON.md)")
    parser.add_argument(
        "--ppo_dir", default=None,
        help="quad PPO checkpoint dir (default: trained_models/quad/"
             "ppo_compare if present, else the shipped assets/quad_ppo_2m "
             "that backs docs/BASELINE_COMPARISON.md)")
    parser.add_argument("--train_ppo", action="store_true",
                        help="train quad PPO if no checkpoint exists")
    parser.add_argument("--timesteps", type=int, default=2_000_000,
                        help="PPO training budget (reference: 2M)")
    parser.add_argument("--skip_mpc", action="store_true")
    parser.add_argument("--skip_quad", action="store_true")
    parser.add_argument("--cartpole", action="store_true",
                        help="also build the cartpole balance table "
                             "(APG vs MPC vs PPO vs PETS)")
    parser.add_argument("--cartpole_eval", type=int, default=50)
    parser.add_argument("--wing", action="store_true",
                        help="also build the fixed-wing waypoint table "
                             "(APG vs MPC h=10/h=20 vs PPO)")
    parser.add_argument("--wing_eval", type=int, default=40,
                        help="number of shared waypoint targets")
    parser.add_argument("--wing_timesteps", type=int, default=500_000,
                        help="wing PPO training budget if no checkpoint")
    parser.add_argument("--pets_trials", type=int, default=200,
                        help="PETS training budget if no saved ensemble "
                             "(reference: 200)")
    parser.add_argument("--out", default=None,
                        help="also write the table + json here")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    if args.cpu:
        from apg_trajectory_tracking_tpu.utils.backend import (
            force_cpu_backend,
        )

        force_cpu_backend()

    from apg_trajectory_tracking_tpu.evaluation.compare import format_table

    if args.skip_quad:
        # system tables only — whichever of --cartpole/--wing is set
        # (--skip_quad alone means cartpole, the original behavior)
        parts = []
        if args.cartpole or not args.wing:
            rows_cp, n_cp = cartpole_table(args)
            parts.append(format_table(
                rows_cp, CARTPOLE_COLUMNS,
                title=f"Cartpole balance, {n_cp} shared near-upright "
                      "starts (max 250 steps)",
            ) + "\n\n```json\n" + json.dumps(rows_cp, indent=1) + "\n```")
        if args.wing:
            rows_w, n_w = wing_table(args)
            parts.append(format_table(
                rows_w, WING_COLUMNS,
                title=f"Fixed-wing waypoint, {n_w} shared targets "
                      "(x = 50 m, max 1000 steps)",
            ) + "\n\n```json\n" + json.dumps(rows_w, indent=1) + "\n```")
        body = "\n\n".join(parts)
        print()
        print(body)
        if args.out:
            with open(args.out, "w") as f:
                f.write(body + "\n")
        return

    rows, n = quad_table(args)

    table = format_table(
        rows, QUAD_COLUMNS,
        title=f"Quadrotor tracking, {n} distinct test trajectories "
              f"(speed {args.speed})",
    )
    print()
    print(table)

    extra = ""
    if args.cartpole:
        rows_cp, n_cp = cartpole_table(args)
        cp_table = format_table(
            rows_cp, CARTPOLE_COLUMNS,
            title=f"Cartpole balance, {n_cp} shared near-upright starts "
                  "(max 250 steps)",
        )
        print()
        print(cp_table)
        extra = "\n\n" + cp_table + "\n\n```json\n" + json.dumps(
            rows_cp, indent=1
        ) + "\n```"
    if args.wing:
        rows_w, n_w = wing_table(args)
        w_table = format_table(
            rows_w, WING_COLUMNS,
            title=f"Fixed-wing waypoint, {n_w} shared targets "
                  "(x = 50 m, max 1000 steps)",
        )
        print()
        print(w_table)
        extra += "\n\n" + w_table + "\n\n```json\n" + json.dumps(
            rows_w, indent=1
        ) + "\n```"

    if args.out:
        with open(args.out, "w") as f:
            f.write(table + "\n\n```json\n"
                    + json.dumps(rows, indent=1) + "\n```" + extra + "\n")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Pure-JAX PPO baseline (counterpart of the reference's
baselines/ppo_baseline.py, replacing stable-baselines3)."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-r", "--robot", default="cartpole",
                        choices=["cartpole", "quad", "wing"])
    parser.add_argument("--timesteps", type=int, default=None)
    parser.add_argument("--n_envs", type=int, default=16)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("-s", "--save_name", default="ppo")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--reward", default="mario",
                        choices=["mario", "mpc"],
                        help="quad reward shaping: mario "
                             "(rl_envs.py:257-308, the reference default) "
                             "or mpc (rl_envs.py:227-255)")
    parser.add_argument("--mario_env", action="store_true",
                        help="QuadEnvMario variant: horizon-1 reference "
                             "observation (rl_envs.py:446-459)")
    parser.add_argument("--speed", type=float, default=0.2,
                        help="trajectory replay speed factor for the quad "
                             "env")
    parser.add_argument("--lr", type=float, default=None,
                        help="PPO Adam lr (default PPOConfig's 3e-4)")
    args = parser.parse_args()

    if args.cpu:
        from apg_trajectory_tracking_tpu.utils.backend import (
            force_cpu_backend,
        )

        force_cpu_backend()

    import jax.numpy as jnp
    import numpy as np
    from apg_trajectory_tracking_tpu.baselines.ppo import (
        train_ppo,
        PPOConfig,
    )
    from apg_trajectory_tracking_tpu.baselines import rl_envs
    from apg_trajectory_tracking_tpu.utils.checkpoints import save_checkpoint

    if args.robot == "cartpole":
        from apg_trajectory_tracking_tpu.dynamics.cartpole import (
            cartpole_params,
        )

        reset_fn, step_fn, obs_dim, act_dim = rl_envs.make_cartpole_rl(
            cartpole_params()
        )
        default_steps = 500_000
        act_low, act_high = -1.0, 1.0
    elif args.robot == "quad":
        from apg_trajectory_tracking_tpu.dynamics.quad import quad_params
        from apg_trajectory_tracking_tpu.trajectory.generate import (
            ensure_trajectory_bank,
            load_trajectory_bank,
            prepare_trajectory,
        )

        bank = load_trajectory_bank(ensure_trajectory_bank("data/traj_data"))
        prepared = np.stack(
            [prepare_trajectory(t, 0.1, args.speed) for t in bank[:64]]
        )
        make_env = (
            rl_envs.make_quad_rl_mario if args.mario_env
            else rl_envs.make_quad_rl
        )
        reset_fn, step_fn, obs_dim, act_dim = make_env(
            quad_params(), jnp.asarray(prepared), reward=args.reward
        )
        default_steps = 2_000_000
        act_low, act_high = -1.0, 1.0
    else:
        from apg_trajectory_tracking_tpu.dynamics.fixed_wing import (
            wing_params,
        )

        reset_fn, step_fn, obs_dim, act_dim = rl_envs.make_wing_rl(
            wing_params()
        )
        default_steps = 500_000
        act_low, act_high = 0.0, 1.0

    cfg = PPOConfig(n_envs=args.n_envs, act_low=act_low, act_high=act_high)
    if args.lr is not None:
        cfg = cfg._replace(lr=args.lr)
    params, history = train_ppo(
        reset_fn, step_fn, obs_dim, act_dim,
        total_timesteps=args.timesteps or default_steps,
        cfg=cfg, seed=args.seed,
    )

    save_path = os.path.join("trained_models", args.robot, args.save_name)
    save_checkpoint(save_path, "model_ppo", params, {"robot": args.robot})
    with open(os.path.join(save_path, "ppo_history.json"), "w") as f:
        json.dump(history, f)
    print("saved to", save_path)

    # deterministic closed-loop eval (EvalCallback analog,
    # ppo_baseline.py:62-84)
    import jax
    from apg_trajectory_tracking_tpu.baselines.ppo import evaluate_policy

    metrics = evaluate_policy(
        params, reset_fn, step_fn, jax.random.PRNGKey(123),
        n_episodes=20, act_low=act_low, act_high=act_high,
    )
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()

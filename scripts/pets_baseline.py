#!/usr/bin/env python
"""Pure-JAX PETS baseline on the cartpole (counterpart of the reference's
baselines/pets_baseline.py with mbrl-lib)."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--trials", type=int, default=20)
    parser.add_argument("--trial_length", type=int, default=200)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("-s", "--save_name", default="pets")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
        try:
            from jax.extend.backend import clear_backends

            clear_backends()
        except Exception:
            pass

    import numpy as np
    import jax
    import jax.numpy as jnp
    from apg_trajectory_tracking_tpu.baselines.pets import (
        PETS,
        cartpole_reward,
    )
    from apg_trajectory_tracking_tpu.dynamics.cartpole import cartpole_params
    from apg_trajectory_tracking_tpu.envs.cartpole_env import (
        env_step,
        reset_upright,
        is_upright,
    )

    dyn = cartpole_params()
    agent = PETS(
        state_dim=4, act_dim=1, reward_fn=cartpole_reward,
        act_low=-1.0, act_high=1.0, seed=args.seed, horizon=10,
        population=150, n_elites=15, n_particles=5, n_iters=5,
    )
    key = jax.random.PRNGKey(args.seed)
    rewards_per_trial = []

    # initial exploration trial with random actions (pets_baseline.py:156-162)
    key, k = jax.random.split(key)
    state = np.asarray(reset_upright(k, 1)[0])
    rng = np.random.RandomState(args.seed)
    for i in range(args.trial_length):
        a = rng.rand(1).astype(np.float32) * 2 - 1
        s2 = np.asarray(env_step(dyn, jnp.asarray(state), jnp.asarray(a), 0.05))
        agent.record(state, a, s2)
        state = s2
        if abs(state[2]) > 1.0:
            key, k = jax.random.split(key)
            state = np.asarray(reset_upright(k, 1)[0])

    for trial in range(args.trials):
        loss = agent.train_model(n_batches=200)
        key, k = jax.random.split(key)
        state = np.asarray(reset_upright(k, 1)[0])
        agent.reset_plan()
        total = 0.0
        for step_i in range(args.trial_length):
            a = agent.act(state)
            s2 = np.asarray(
                env_step(dyn, jnp.asarray(state), jnp.asarray(a), 0.05)
            )
            agent.record(state, a, s2)
            upright = bool(np.abs(s2[2]) < 0.21)
            total += (1.0 - abs(float(s2[1]))) if upright else 0.0
            state = s2
            if not upright:
                break
        rewards_per_trial.append(total)
        print(f"trial {trial}: reward {total:.1f} steps {step_i + 1} "
              f"model loss {loss:.2f}")

    save_path = os.path.join("trained_models", "cartpole", args.save_name)
    os.makedirs(save_path, exist_ok=True)
    with open(os.path.join(save_path, "pets_rewards.json"), "w") as f:
        json.dump(rewards_per_trial, f)
    print("saved to", save_path)


if __name__ == "__main__":
    main()

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
        from apg_trajectory_tracking_tpu.utils.backend import (
            force_cpu_backend,
        )

        force_cpu_backend()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from apg_trajectory_tracking_tpu.baselines.pets import (
        run_pets_cartpole,
    )
    from apg_trajectory_tracking_tpu.utils.checkpoints import save_checkpoint

    save_path = os.path.join("trained_models", "cartpole", args.save_name)
    os.makedirs(save_path, exist_ok=True)

    def persist(trial, agent, rewards, force=False):
        if not force and (trial + 1) % 10 != 0:
            return
        with open(os.path.join(save_path, "pets_rewards.json"), "w") as f:
            json.dump(rewards, f)
        # ensemble checkpoint so eval tooling (compare_baselines
        # --cartpole) can reload the trained model
        save_checkpoint(save_path, "model_pets", agent.model,
                        {"trials": trial + 1,
                         "trial_length": args.trial_length})

    agent, rewards_per_trial = run_pets_cartpole(
        trials=args.trials, trial_length=args.trial_length, seed=args.seed,
        on_trial=persist,
    )
    # final write regardless of count, stamped with the REAL trial count
    persist(len(rewards_per_trial) - 1, agent, rewards_per_trial, force=True)
    print("saved to", save_path)


if __name__ == "__main__":
    main()

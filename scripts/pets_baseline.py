#!/usr/bin/env python
"""Pure-JAX PETS baseline (counterpart of the reference's
baselines/pets_baseline.py with mbrl-lib, which switches between
cartpole / quad / fixed_wing via its SYSTEM constant at line 22 —
fixed_wing is its default)."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-r", "--robot", default="cartpole",
                        choices=["cartpole", "wing", "quad"])
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

    from apg_trajectory_tracking_tpu.baselines.pets import (
        run_pets_cartpole,
        run_pets_quad,
        run_pets_wing,
    )
    from apg_trajectory_tracking_tpu.utils.checkpoints import save_checkpoint

    save_path = os.path.join("trained_models", args.robot, args.save_name)
    os.makedirs(save_path, exist_ok=True)

    def persist(trial, agent, history, force=False):
        if not force and (trial + 1) % 10 != 0:
            return
        # run_pets_cartpole's on_trial hook passes a bare rewards list;
        # normalize so interrupted and completed runs share one schema
        if isinstance(history, list):
            history = {"rewards": history}
        with open(os.path.join(save_path, "pets_history.json"), "w") as f:
            json.dump(history, f)
        # ensemble checkpoint so eval tooling (compare_baselines) can
        # reload the trained model
        save_checkpoint(save_path, "model_pets", agent.model,
                        {"robot": args.robot, "trials": trial + 1,
                         "trial_length": args.trial_length})

    kwargs = dict(trials=args.trials, trial_length=args.trial_length,
                  seed=args.seed, on_trial=persist)
    if args.robot == "cartpole":
        agent, rewards = run_pets_cartpole(**kwargs)
        history = {"rewards": rewards}
    elif args.robot == "wing":
        agent, history = run_pets_wing(**kwargs)
    else:
        agent, history = run_pets_quad(**kwargs)
    n_trials = len(history["rewards"])
    persist(n_trials - 1, agent, history, force=True)
    print("saved to", save_path)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Train a fixed-wing APG controller (counterpart of the reference's
scripts/train_fixed_wing.py)."""

import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-s", "--save_name", default="test")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--smoke", action="store_true")
    parser.add_argument("--base_model", default=None,
                        help="checkpoint dir to resume/fine-tune from")
    parser.add_argument("--ckpt_backend", default=None,
                        choices=["npz", "orbax"],
                        help="checkpoint array backend (default npz; orbax "
                             "writes per-host shards on multi-host meshes)")
    parser.add_argument("--tensorboard", action="store_true")
    parser.add_argument("--distributed", action="store_true",
                        help="multi-host: jax.distributed.initialize() "
                             "before building the mesh")
    parser.add_argument("--devices", type=int, default=None,
                        help="cap the mesh at this many devices")
    args = parser.parse_args()

    if args.distributed:
        from apg_trajectory_tracking_tpu.parallel.mesh import init_distributed

        init_distributed()

    if args.cpu:
        from apg_trajectory_tracking_tpu.utils.backend import (
            force_cpu_backend,
        )

        force_cpu_backend()

    from apg_trajectory_tracking_tpu.training.train_wing import TrainWing
    from apg_trajectory_tracking_tpu.training.common import load_config

    overrides = {}
    if args.smoke:
        overrides = {"self_play": 200, "nr_epochs": 2, "epoch_size": 64}
    config = load_config("wing", overrides)
    if args.ckpt_backend:
        config["checkpoint_backend"] = args.ckpt_backend
    mesh = None
    if args.devices is not None:
        from apg_trajectory_tracking_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.devices)
    trainer = TrainWing(config, seed=args.seed, save_name=args.save_name,
                        base_model=args.base_model,
                        tensorboard=args.tensorboard, mesh=mesh)
    print(f"mesh: {dict(trainer.mesh.shape)}")
    trainer.fit(args.epochs)


if __name__ == "__main__":
    main()

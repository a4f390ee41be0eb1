#!/usr/bin/env python
"""Train a quadrotor APG controller (counterpart of the reference's
scripts/train_drone.py)."""

import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-s", "--save_name", default="test")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument(
        "-m", "--mode", default="concurrent",
        choices=["concurrent", "autoregressive", "LSTM"],
    )
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--smoke", action="store_true",
                        help="tiny run: 2 epochs, small dataset")
    parser.add_argument("--no-curriculum", action="store_true")
    parser.add_argument("--base_model", default=None,
                        help="checkpoint dir to resume/fine-tune from")
    parser.add_argument("--ckpt_backend", default=None,
                        choices=["npz", "orbax"],
                        help="checkpoint array backend (default npz; orbax "
                             "writes per-host shards on multi-host meshes)")
    parser.add_argument("--tensorboard", action="store_true",
                        help="also log scalars to TensorBoard")
    parser.add_argument("--minjerk_mix", type=float, default=0.0,
                        help="fraction of replay windows replaced by "
                             "min-jerk windows (analytic-ref robustness)")
    parser.add_argument("--distributed", action="store_true",
                        help="multi-host: jax.distributed.initialize() "
                             "before building the mesh (TPU pods "
                             "auto-detect coordinator/process info)")
    parser.add_argument("--devices", type=int, default=None,
                        help="cap the mesh at this many devices "
                             "(default: all)")
    parser.add_argument("--data_dir", default="data/traj_data",
                        help="trajectory bank directory (generate a "
                             "reference-scale 9k/1k one with "
                             "scripts/generate_trajectories.py)")
    parser.add_argument("-o", "--override", action="append", default=[],
                        metavar="KEY=VALUE",
                        help="override a config key (JSON-parsed value; "
                             "repeatable), e.g. -o speed_factor=0.4 "
                             "-o suc_up_down=-1 — the reference's shipped "
                             "net used speed_factor 0.4 fixed, "
                             "thresh_div_start 1, suc_up_down -1 "
                             "(trained_models/quad/current_model/"
                             "config.json) rather than the curriculum "
                             "defaults in configs/quad_config.json")
    args = parser.parse_args()

    if args.distributed:
        from apg_trajectory_tracking_tpu.parallel.mesh import init_distributed

        init_distributed()

    if args.cpu:
        from apg_trajectory_tracking_tpu.utils.backend import (
            force_cpu_backend,
        )

        force_cpu_backend()

    from apg_trajectory_tracking_tpu.training.train_quad import TrainQuad
    from apg_trajectory_tracking_tpu.training.common import load_config

    overrides = {}
    if args.smoke:
        overrides = {"epoch_size": 64, "nr_epochs": 2, "self_play": 1}
    import json

    for item in args.override:
        key, _, raw = item.partition("=")
        if not _:
            parser.error(f"--override expects KEY=VALUE, got {item!r}")
        try:
            overrides[key] = json.loads(raw)
        except json.JSONDecodeError:
            overrides[key] = raw
    config = load_config("quad", overrides)
    if args.ckpt_backend:
        config["checkpoint_backend"] = args.ckpt_backend
    mesh = None
    if args.devices is not None:
        from apg_trajectory_tracking_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.devices)
    trainer = TrainQuad(
        config, train_mode=args.mode, seed=args.seed,
        save_name=args.save_name, curriculum=not args.no_curriculum,
        base_model=args.base_model, tensorboard=args.tensorboard,
        minjerk_mix=args.minjerk_mix, mesh=mesh, data_dir=args.data_dir,
    )
    print(f"mesh: {dict(trainer.mesh.shape)} over "
          f"{trainer.mesh.size} device(s)")
    trainer.fit(args.epochs)


if __name__ == "__main__":
    main()

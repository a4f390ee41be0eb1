#!/usr/bin/env python
"""Scaling-efficiency benchmark: per-chip APG train throughput at 1..N
devices (BASELINE.json north star: >=80% efficiency 1 -> N hosts).

Drives the REAL trainer (TrainQuad on its mesh — sharded buffers, the
production whole-epoch scan from parallel.mesh.make_sharded_epoch), not a
re-implementation: per device count D the trainer is built on a D-device
mesh with per-chip batch held constant (global batch = per_chip_batch * D),
so perfect scaling keeps epoch time constant; efficiency(D) = t(1) / t(D).

On real multi-chip hardware this measures ICI-collective scaling of the
data-parallel train step. With --cpu it runs the same program on the
virtual 8-device CPU mesh — numbers are then about mechanics, not
performance.
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--per_chip_batch", type=int, default=4096)
    parser.add_argument("--iters", type=int, default=20,
                        help="optimizer steps per timed epoch")
    parser.add_argument("--cpu", action="store_true",
                        help="force the virtual 8-device CPU mesh")
    args = parser.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()
        from apg_trajectory_tracking_tpu.utils.backend import (
            force_cpu_backend,
        )

        force_cpu_backend()

    import numpy as np
    import jax

    from apg_trajectory_tracking_tpu.data.dataset import make_quad_buffers
    from apg_trajectory_tracking_tpu.parallel.mesh import make_mesh
    from apg_trajectory_tracking_tpu.training.common import load_config
    from apg_trajectory_tracking_tpu.training.train_quad import TrainQuad

    n_total = len(jax.devices())
    device_counts = sorted(
        {d for d in (1, 2, 4, 8, 16, 32, 64, 128) if d <= n_total}
        | {n_total}
    )
    horizon = 10
    iters = args.iters

    results = {}
    t1 = None
    cwd = os.getcwd()
    with tempfile.TemporaryDirectory() as tmp:
        os.chdir(tmp)
        try:
            for d in device_counts:
                batch = args.per_chip_batch * d
                mesh = make_mesh(d)
                cfg = load_config(
                    "quad",
                    dict(batch_size=batch, epoch_size=batch, self_play=0),
                    config_dir=os.path.join(REPO, "configs"),
                )
                trainer = TrainQuad(
                    config=cfg, seed=0, save_name=f"bench_d{d}", mesh=mesh,
                    data_dir=os.path.join(REPO, "data", "traj_data"),
                )
                # widen the (real, sampled) buffers to iters*batch rows so
                # one epoch = `iters` optimizer steps inside the trainer's
                # single jitted scan — per-step host dispatch would measure
                # the tunnel round-trip, not the chips/ICI
                states = np.tile(np.asarray(trainer.buffers.states),
                                 (iters, 1))
                refs = np.tile(np.asarray(trainer.buffers.refs),
                               (iters, 1, 1))
                trainer.buffers = make_quad_buffers(
                    states, refs, len(states)
                )
                trainer._shard_buffers()

                trainer.run_epoch()  # compile
                best = np.inf
                for _ in range(3):
                    t0 = time.perf_counter()
                    trainer.run_epoch()
                    best = min(best, (time.perf_counter() - t0) / iters)
                if t1 is None:
                    t1 = best
                results[d] = {
                    "time_per_step_ms": round(best * 1e3, 3),
                    "env_steps_per_s": round(batch * horizon / best, 1),
                    "efficiency_vs_1dev": round(t1 / best, 3),
                }
                print(
                    f"D={d}: {best * 1e3:.2f} ms/step, "
                    f"{batch * horizon / best / 1e6:.1f}M env-steps/s, "
                    f"efficiency {t1 / best:.2f}"
                )
        finally:
            os.chdir(cwd)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

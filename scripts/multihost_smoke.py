#!/usr/bin/env python
"""Real multi-process ("multi-host") smoke run of the production sharded
epoch — closes the gap between CI's single-process virtual mesh and an
actual `jax.distributed` deployment.

Each worker process owns ``--local_devices`` virtual CPU devices and only
its own shard of the training data (fed through
``jax.make_array_from_process_local_data``, the multi-host data path); the
global mesh spans all processes; gradients sync through real gloo
cross-process collectives. Success criterion: every process reports the
SAME epoch loss and the SAME parameter checksum — the psum actually
crossed process boundaries.

Launcher mode (default) spawns ``--nproc`` workers on localhost and
verifies their outputs agree:

    python scripts/multihost_smoke.py --nproc 2

Worker mode (used internally, or manually across real hosts with a
reachable coordinator):

    python scripts/multihost_smoke.py --worker --process_id 0 --nproc 2 \
        --coordinator 10.0.0.1:29517
"""

import argparse
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def set_device_count(n):
    flags = os.environ.get("XLA_FLAGS", "")
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n}"
    ).strip()


def run_worker(args):
    set_device_count(args.local_devices)
    import jax

    sys.path.insert(0, REPO)
    from apg_trajectory_tracking_tpu.utils.backend import force_cpu_backend

    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    force_cpu_backend()
    from apg_trajectory_tracking_tpu.parallel.mesh import init_distributed

    init_distributed(
        coordinator_address=args.coordinator,
        num_processes=args.nproc,
        process_id=args.process_id,
    )
    pid = args.process_id
    print(
        f"[p{pid}] local={jax.local_device_count()} "
        f"global={jax.device_count()}",
        flush=True,
    )

    import numpy as np
    import jax.numpy as jnp  # noqa: F401
    from jax.sharding import NamedSharding, PartitionSpec as P

    from apg_trajectory_tracking_tpu.dynamics.quad import (
        quad_params,
        quad_step,
    )
    from apg_trajectory_tracking_tpu.models import init_control_net
    from apg_trajectory_tracking_tpu.parallel.mesh import (
        make_mesh,
        make_sharded_epoch,
        replicate,
    )
    from apg_trajectory_tracking_tpu.training.common import (
        sgd_momentum,
        shuffled_batches,
    )
    from apg_trajectory_tracking_tpu.training.train_quad import (
        build_concurrent_step,
    )

    mesh = make_mesh()
    key = jax.random.PRNGKey(0)
    net = init_control_net(key, 15, 10, 9, 40, conv=True)
    opt = sgd_momentum(1e-4)
    opt_state = opt.init(net)
    dyn = quad_params()
    step = build_concurrent_step(quad_step, opt, 0.1, 10, 4)
    epoch = make_sharded_epoch(mesh, step)

    net = replicate(mesh, net)
    opt_state = replicate(mesh, opt_state)
    dyn_r = replicate(mesh, dyn)

    # every process derives the same GLOBAL dataset deterministically but
    # materializes only its own rows — the multi-host data-sharding path
    rng = np.random.RandomState(7)
    n = args.n_rows
    g_states = rng.randn(n, 12).astype(np.float32)
    g_refs = rng.randn(n, 10, 9).astype(np.float32)
    sh = NamedSharding(mesh, P("env"))
    lo = pid * (n // args.nproc)
    hi = (pid + 1) * (n // args.nproc)
    states = jax.make_array_from_process_local_data(
        sh, g_states[lo:hi], (n, 12)
    )
    refs = jax.make_array_from_process_local_data(
        sh, g_refs[lo:hi], (n, 10, 9)
    )
    idx = shuffled_batches(jax.random.PRNGKey(1), n, args.batch_size)
    net, opt_state, loss = epoch(net, opt_state, dyn_r, states, refs, idx)
    print(f"[p{pid}] epoch_loss {float(loss):.6f}", flush=True)
    leaf = np.asarray(
        jax.tree_util.tree_leaves(net)[0].addressable_data(0)
    )
    print(f"[p{pid}] param_checksum {float(np.abs(leaf).sum()):.6f}",
          flush=True)


def run_launcher(args):
    procs = []
    logs = []
    for pid in range(args.nproc):
        cmd = [
            sys.executable, "-u", os.path.abspath(__file__), "--worker",
            "--process_id", str(pid), "--nproc", str(args.nproc),
            "--coordinator", args.coordinator,
            "--local_devices", str(args.local_devices),
            "--n_rows", str(args.n_rows),
            "--batch_size", str(args.batch_size),
        ]
        logs.append(open(f"/tmp/multihost_p{pid}.log", "w+"))
        procs.append(subprocess.Popen(
            cmd, stdout=logs[-1], stderr=subprocess.STDOUT
        ))
    rcs = [p.wait(timeout=600) for p in procs]
    outs = []
    for f in logs:
        f.seek(0)
        outs.append(f.read())
        f.close()
    if any(rcs):
        print("\n".join(outs))
        raise SystemExit(f"worker exit codes {rcs}")
    losses, checksums = [], []
    for out in outs:
        losses += re.findall(r"epoch_loss ([\d.]+)", out)
        checksums += re.findall(r"param_checksum ([\d.]+)", out)
    print("\n".join(line for out in outs for line in out.splitlines()
                    if line.startswith("[p")))
    assert len(losses) == args.nproc and len(set(losses)) == 1, losses
    assert len(set(checksums)) == 1, checksums
    print(f"multihost OK: {args.nproc} processes agree "
          f"(loss {losses[0]}, checksum {checksums[0]})")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--worker", action="store_true")
    parser.add_argument("--nproc", type=int, default=2)
    parser.add_argument("--process_id", type=int, default=0)
    parser.add_argument("--local_devices", type=int, default=4)
    parser.add_argument("--coordinator", default="127.0.0.1:29517")
    parser.add_argument("--n_rows", type=int, default=64,
                        help="global env batch (BASELINE config #5 uses "
                             "16384 over 2 hosts)")
    parser.add_argument("--batch_size", type=int, default=8)
    args = parser.parse_args()
    if args.worker:
        run_worker(args)
    else:
        run_launcher(args)

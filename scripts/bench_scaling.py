#!/usr/bin/env python
"""Scaling-efficiency benchmark: per-chip APG train throughput at 1..N
devices (BASELINE.json north star: >=80% efficiency 1 -> N hosts).

On real multi-chip hardware this measures ICI-collective scaling of the
data-parallel train step (params replicated, env batch sharded, psum
gradient reduction). With --cpu it runs the same program on the virtual
8-device CPU mesh — numbers are then about mechanics, not performance.

Per device count D: global batch = per_chip_batch * D, so perfect scaling
keeps time/step constant; efficiency(D) = t(1) / t(D).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--per_chip_batch", type=int, default=4096)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--cpu", action="store_true",
                        help="force the virtual 8-device CPU mesh")
    args = parser.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
        from jax.extend.backend import clear_backends

        clear_backends()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from apg_trajectory_tracking_tpu.dynamics.quad import (
        quad_params,
        quad_step,
    )
    from apg_trajectory_tracking_tpu.models import init_control_net
    from apg_trajectory_tracking_tpu.parallel.mesh import (
        make_mesh,
        make_sharded_train_step,
        replicate,
        shard_batch,
    )
    from apg_trajectory_tracking_tpu.training.common import sgd_momentum
    from apg_trajectory_tracking_tpu.training.train_quad import (
        build_concurrent_step,
    )

    n_total = len(jax.devices())
    device_counts = sorted(
        {d for d in (1, 2, 4, 8, 16, 32, 64, 128) if d <= n_total}
        | {n_total}
    )
    horizon = 10

    key = jax.random.PRNGKey(0)
    net = init_control_net(key, 15, horizon, 9, 40, conv=True)
    optimizer = sgd_momentum(1e-5)
    opt_state = optimizer.init(net)
    dyn = quad_params()
    step = build_concurrent_step(quad_step, optimizer, 0.1, horizon, 4)

    results = {}
    t1 = None
    from jax.sharding import NamedSharding, PartitionSpec as P

    iters = args.iters

    # all timed iterations run inside ONE jitted lax.scan dispatch (same
    # methodology as bench.py): per-step host dispatch would measure the
    # tunnel round-trip, not the chips/ICI
    def run_iters(p, o, dynp, s, r):
        def body(c, _):
            p_, o_ = c
            p_, o_, l = step(p_, o_, dynp, s, r)
            return (p_, o_), l

        (p, o), ls = jax.lax.scan(body, (p, o), None, length=iters)
        return p, o, ls[-1]

    for d in device_counts:
        mesh = make_mesh(d)
        rep = NamedSharding(mesh, P())
        shard = NamedSharding(mesh, P("env"))
        sharded = jax.jit(
            run_iters,
            in_shardings=(rep, rep, rep, shard, shard),
            out_shardings=(rep, rep, rep),
        )
        batch = args.per_chip_batch * d
        rng = np.random.RandomState(0)
        states, refs = shard_batch(
            mesh,
            (
                jnp.asarray(rng.randn(batch, 12).astype(np.float32) * 0.3),
                jnp.asarray(
                    rng.randn(batch, horizon, 9).astype(np.float32) * 0.3
                ),
            ),
        )
        net_r = replicate(mesh, net)
        opt_r = replicate(mesh, opt_state)
        dyn_r = replicate(mesh, dyn)

        n2, o2, loss = sharded(net_r, opt_r, dyn_r, states, refs)
        jax.block_until_ready(loss)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            n2, o2, loss = sharded(net_r, opt_r, dyn_r, states, refs)
            jax.block_until_ready(loss)
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
    print(json.dumps(results))


if __name__ == "__main__":
    main()

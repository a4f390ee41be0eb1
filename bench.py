#!/usr/bin/env python
"""Headline benchmark: quad APG training throughput on one chip.

Measures the full concurrent training step (featurize -> controller MLP ->
10-step differentiable-dynamics unroll -> MPC loss -> BPTT -> SGD update) at
4096 environments, the primary metric of BASELINE.json. Prints ONE JSON line.

vs_baseline compares against the reference PyTorch implementation's
training throughput measured on this container's CPU at the SAME batch size
(BASELINE_MEASURED.json; the reference's own default config is batch 8,
which is ~200x slower than its batch-4096 number used here).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from apg_trajectory_tracking_tpu.dynamics.quad import quad_params, quad_step
from apg_trajectory_tracking_tpu.models import init_control_net
from apg_trajectory_tracking_tpu.training.common import sgd_momentum
from apg_trajectory_tracking_tpu.training.train_quad import (
    build_concurrent_step,
)

BATCH = 4096
HORIZON = 10


def main():
    key = jax.random.PRNGKey(0)
    net = init_control_net(key, 15, HORIZON, 9, HORIZON * 4, conv=True)
    optimizer = sgd_momentum(1e-5)
    opt_state = optimizer.init(net)
    dyn = quad_params()

    step = build_concurrent_step(quad_step, optimizer, 0.1, HORIZON, 4)

    rng = np.random.RandomState(0)
    states = jnp.asarray(rng.randn(BATCH, 12).astype(np.float32) * 0.3)
    refs = jnp.asarray(rng.randn(BATCH, HORIZON, 9).astype(np.float32) * 0.3)

    iters = 50

    # The production epoch loop runs all minibatch steps inside ONE jitted
    # lax.scan dispatch (training/common.py epoch_scan), so the benchmark
    # iterates on device too — a per-step host dispatch would measure the
    # axon tunnel's round-trip latency, not the chip.
    @jax.jit
    def run_iters(net, opt_state, states, refs):
        def body(carry, _):
            n, o = carry
            n, o, loss = step(n, o, dyn, states, refs)
            return (n, o), loss
        (net, opt_state), losses = jax.lax.scan(
            body, (net, opt_state), None, length=iters
        )
        return net, opt_state, losses[-1]

    # warmup / compile
    net, opt_state, loss = run_iters(net, opt_state, states, refs)
    jax.block_until_ready(loss)

    dt = np.inf
    for _ in range(8):
        t0 = time.perf_counter()
        net, opt_state, loss = run_iters(net, opt_state, states, refs)
        jax.block_until_ready(loss)
        dt = min(dt, (time.perf_counter() - t0) / iters)

    env_steps_per_s = BATCH * HORIZON / dt

    baseline = 199651.0
    meas_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json"
    )
    if os.path.exists(meas_path):
        with open(meas_path) as f:
            baseline = float(json.load(f)["baseline_for_vs_ratio"])

    print(
        json.dumps(
            {
                "metric": "quad_apg_train_env_steps_per_s_per_chip",
                "value": round(env_steps_per_s, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(env_steps_per_s / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

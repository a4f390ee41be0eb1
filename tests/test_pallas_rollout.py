"""Pallas fused-rollout kernel: correctness vs the XLA scan path.

Runs in interpreter mode on the CPU test backend; on-TPU timing lives in
ops/pallas_rollout.py::benchmark_rollout (measured: XLA scan wins — see the
module docstring)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from apg_trajectory_tracking_tpu.dynamics.quad import quad_params


def test_pallas_rollout_matches_scan():
    from jax.experimental.pallas import tpu as pltpu

    from apg_trajectory_tracking_tpu.ops import pallas_rollout as pr

    params = quad_params()
    rng = np.random.RandomState(0)
    states = jnp.asarray(rng.randn(pr.BLOCK_B, 12).astype(np.float32) * 0.3)
    actions = jnp.asarray(
        rng.rand(pr.BLOCK_B, 10, 4).astype(np.float32)
    )
    expected = np.asarray(
        pr.quad_rollout_scan(params, states, actions, 10, 0.1)
    )
    with pltpu.force_tpu_interpret_mode():
        fn = pr.make_quad_rollout_pallas(params, 10, 0.1)
        got = np.asarray(fn(states, actions))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)

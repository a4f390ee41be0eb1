"""End-to-end determinism (SURVEY.md §4 test pyramid, item 3): identical
seeds produce bit-identical training outcomes; the long-horizon remat knob
produces the same gradients as plain BPTT."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp


def _leaves(t):
    return jax.tree_util.tree_leaves(t)


@pytest.mark.slow
def test_cartpole_training_deterministic(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from apg_trajectory_tracking_tpu.training.train_cartpole import (
        TrainCartpole,
    )
    from apg_trajectory_tracking_tpu.training.common import load_config

    cfg = load_config("cartpole", {"sample_data": 64, "nr_epochs": 2})
    t1 = TrainCartpole(cfg, seed=7, save_name="d1").fit(2, verbose=False)
    t2 = TrainCartpole(cfg, seed=7, save_name="d2").fit(2, verbose=False)
    for a, b in zip(_leaves(t1.net), _leaves(t2.net)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    t3 = TrainCartpole(cfg, seed=8, save_name="d3").fit(2, verbose=False)
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(_leaves(t1.net), _leaves(t3.net))
    )


def test_remat_matches_plain_bptt():
    """jax.checkpoint over the dynamics scan must not change gradients."""
    import optax
    from apg_trajectory_tracking_tpu.dynamics.quad import (
        quad_params,
        quad_step,
    )
    from apg_trajectory_tracking_tpu.models import init_control_net
    from apg_trajectory_tracking_tpu.training.train_quad import (
        build_concurrent_step,
    )
    from apg_trajectory_tracking_tpu.training.common import sgd_momentum

    net = init_control_net(jax.random.PRNGKey(0), 15, 10, 9, 40, conv=True)
    opt = sgd_momentum(1e-4)
    o = opt.init(net)
    dyn = quad_params()
    rng = np.random.RandomState(0)
    states = jnp.asarray(rng.randn(8, 12).astype(np.float32) * 0.3)
    refs = jnp.asarray(rng.randn(8, 10, 9).astype(np.float32) * 0.3)

    plain = build_concurrent_step(quad_step, opt, 0.1, 10, 4, remat=False)
    rematted = build_concurrent_step(quad_step, opt, 0.1, 10, 4, remat=True)
    n1, _, l1 = jax.jit(plain)(net, o, dyn, states, refs)
    n2, _, l2 = jax.jit(rematted)(net, o, dyn, states, refs)
    assert float(l1) == float(l2)
    for a, b in zip(_leaves(n1), _leaves(n2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_long_horizon_remat_compiles():
    """k=200 BPTT under remat: the scan stays sequential, memory O(1)."""
    import optax
    from apg_trajectory_tracking_tpu.dynamics.quad import (
        quad_params,
        quad_step,
    )
    from apg_trajectory_tracking_tpu.models import init_control_net
    from apg_trajectory_tracking_tpu.training.train_quad import (
        build_concurrent_step,
    )
    from apg_trajectory_tracking_tpu.training.common import sgd_momentum

    k = 200
    net = init_control_net(jax.random.PRNGKey(0), 15, k, 9, k * 4, conv=True)
    opt = sgd_momentum(1e-6)
    o = opt.init(net)
    dyn = quad_params()
    rng = np.random.RandomState(0)
    states = jnp.asarray(rng.randn(4, 12).astype(np.float32) * 0.1)
    refs = jnp.asarray(rng.randn(4, k, 9).astype(np.float32) * 0.1)
    step = build_concurrent_step(quad_step, opt, 0.1, k, 4, remat=True)
    n, _, loss = jax.jit(step)(net, o, dyn, states, refs)
    assert np.isfinite(float(loss))

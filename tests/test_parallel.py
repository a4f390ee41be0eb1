"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from apg_trajectory_tracking_tpu.dynamics.quad import quad_params, quad_step
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


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    net = init_control_net(key, 15, 10, 9, 40, conv=True)
    optimizer = sgd_momentum(1e-4)
    opt_state = optimizer.init(net)
    dyn = quad_params()
    step = build_concurrent_step(quad_step, optimizer, 0.1, 10, 4)
    rng = np.random.RandomState(0)
    states = jnp.asarray(rng.randn(16, 12).astype(np.float32))
    refs = jnp.asarray(rng.randn(16, 10, 9).astype(np.float32))
    return net, opt_state, dyn, step, states, refs


def test_requires_8_devices():
    assert len(jax.devices()) >= 8


def test_sharded_step_matches_single_device(setup):
    """DP-sharded gradient step == single-device step (same math, psum)."""
    net, opt_state, dyn, step, states, refs = setup

    single_net, single_opt, single_loss = jax.jit(step)(
        net, opt_state, dyn, states, refs
    )

    mesh = make_mesh(8)
    sharded = make_sharded_train_step(mesh, step)
    s_net, s_opt, s_loss = sharded(
        replicate(mesh, net),
        replicate(mesh, opt_state),
        replicate(mesh, dyn),
        *shard_batch(mesh, (states, refs)),
    )
    assert float(s_loss) == pytest.approx(float(single_loss), rel=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(single_net), jax.tree_util.tree_leaves(s_net)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_dryrun_multichip():
    import sys, os

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from __graft_entry__ import dryrun_multichip, entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 12)
    dryrun_multichip(8)


def test_mesh_model_axis():
    mesh = make_mesh(8, model_parallel=2)
    assert mesh.shape["env"] == 4 and mesh.shape["model"] == 2

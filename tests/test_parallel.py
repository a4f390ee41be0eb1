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


@pytest.mark.slow
def test_trainer_epoch_single_vs_8dev(tmp_path, monkeypatch):
    """The REAL TrainQuad.fit on a 1-device mesh vs the 8-device mesh
    produces the same loss curve (the mesh is the production execution
    path, not a demo; tolerance = float32 psum reduction-order noise)."""
    from apg_trajectory_tracking_tpu.training.common import load_config
    from apg_trajectory_tracking_tpu.training.train_quad import TrainQuad

    monkeypatch.chdir(tmp_path)
    import os

    os.symlink(
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "data"),
        "data",
    )
    cfg = load_config(
        "quad",
        dict(epoch_size=64, self_play=0.5, nr_epochs=3, resample_every=2),
    )
    losses = {}
    for nd in (1, 8):
        t = TrainQuad(
            config=cfg, seed=0, save_name=f"meshtest{nd}",
            mesh=make_mesh(nd),
        )
        assert t.mesh.shape["env"] == nd
        assert t.buffers.states.sharding.spec == jax.sharding.PartitionSpec(
            "env"
        )
        t.fit(nr_epochs=3, nr_test=10, verbose=False)
        losses[nd] = np.asarray(t.logger.results["loss"], dtype=float)
    np.testing.assert_allclose(losses[1], losses[8], rtol=2e-5, atol=1e-4)


@pytest.mark.slow
def test_cartpole_trainer_epoch_single_vs_8dev(tmp_path, monkeypatch):
    """TrainCartpole (balance) on a 1-device vs 8-device mesh: same loss
    curve up to psum reduction-order float noise."""
    from apg_trajectory_tracking_tpu.training.common import load_config
    from apg_trajectory_tracking_tpu.training.train_cartpole import (
        TrainCartpole,
    )

    monkeypatch.chdir(tmp_path)
    cfg = load_config("cartpole", dict(sample_data=64, nr_epochs=2))
    losses = {}
    for nd in (1, 8):
        t = TrainCartpole(
            config=dict(cfg), swingup=False, seed=0,
            save_name=f"meshtest{nd}", mesh=make_mesh(nd),
        )
        assert t.mesh.shape["env"] == nd
        t.fit(2)
        losses[nd] = np.asarray(t.logger.results["loss"], dtype=float)
    np.testing.assert_allclose(losses[1], losses[8], rtol=2e-4, atol=1e-3)


@pytest.mark.slow
def test_wing_trainer_epoch_single_vs_8dev(tmp_path, monkeypatch):
    """TrainWing on a 1-device vs 8-device mesh: same loss curve."""
    from apg_trajectory_tracking_tpu.training.common import load_config
    from apg_trajectory_tracking_tpu.training.train_wing import TrainWing

    monkeypatch.chdir(tmp_path)
    cfg = load_config(
        "wing", dict(self_play=32, epoch_size=32, batch_size=8,
                     nr_epochs=2)
    )
    losses = {}
    for nd in (1, 8):
        t = TrainWing(
            config=dict(cfg), seed=0, save_name=f"meshtest{nd}",
            mesh=make_mesh(nd),
        )
        assert t.mesh.shape["env"] == nd
        t.fit(nr_epochs=2, nr_test=8, verbose=False)
        losses[nd] = np.asarray(t.logger.results["loss"], dtype=float)
    np.testing.assert_allclose(losses[1], losses[8], rtol=2e-4, atol=1e-3)


@pytest.mark.slow
def test_lstm_trainer_epoch_single_vs_8dev(tmp_path, monkeypatch):
    """The recurrent/LSTM TrainQuad on a 1-device vs 8-device mesh: the
    same sharded-epoch path must cover the recurrent step too."""
    import os

    from apg_trajectory_tracking_tpu.training.common import load_config
    from apg_trajectory_tracking_tpu.training.train_quad import TrainQuad

    monkeypatch.chdir(tmp_path)
    os.symlink(
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "data"),
        "data",
    )
    cfg = load_config(
        "quad",
        dict(epoch_size=64, self_play=0.5, nr_epochs=2, resample_every=3,
             train_mode="LSTM"),
    )
    losses = {}
    for nd in (1, 8):
        t = TrainQuad(
            config=dict(cfg), seed=0, save_name=f"meshtest_lstm{nd}",
            mesh=make_mesh(nd),
        )
        assert t.mesh.shape["env"] == nd
        t.fit(nr_epochs=2, nr_test=10, verbose=False)
        losses[nd] = np.asarray(t.logger.results["loss"], dtype=float)
    np.testing.assert_allclose(losses[1], losses[8], rtol=2e-4, atol=1e-3)


@pytest.mark.slow
def test_wing_adapt_fit_single_vs_8dev(tmp_path, monkeypatch):
    """The dynamics-fit/adapt alternation on a 1-device vs 8-device mesh:
    both the fit epochs and the controller-against-learnt-model epoch."""
    from apg_trajectory_tracking_tpu.training.common import load_config
    from apg_trajectory_tracking_tpu.training.adapt import TrainWingAdapt

    monkeypatch.chdir(tmp_path)
    cfg = load_config(
        "wing", dict(self_play=32, epoch_size=32, batch_size=8)
    )
    fit_losses, ctrl_losses = {}, {}
    for nd in (1, 8):
        t = TrainWingAdapt(
            dict(cfg), modified_params={"CL_alpha": 3.0}, seed=0,
            save_name=f"meshtest_adapt{nd}", mesh=make_mesh(nd),
        )
        assert t.inner.mesh.shape["env"] == nd
        fit_losses[nd] = [t.run_dynamics_epoch() for _ in range(2)]
        ctrl_losses[nd] = t.run_controller_epoch_learnt()
    np.testing.assert_allclose(
        fit_losses[1], fit_losses[8], rtol=2e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        ctrl_losses[1], ctrl_losses[8], rtol=2e-4, atol=1e-3
    )


def test_auto_mesh_divisibility():
    from apg_trajectory_tracking_tpu.parallel.mesh import auto_mesh

    assert auto_mesh(8, 2000).shape["env"] == 8
    assert auto_mesh(7, 2000).shape["env"] == 1  # nothing divides 7
    assert auto_mesh(4, 100).shape["env"] == 4


def test_pad_to_multiple():
    from apg_trajectory_tracking_tpu.parallel.mesh import pad_to_multiple

    x = jnp.arange(10)
    padded, n = pad_to_multiple(x, 8)
    assert n == 10 and padded.shape[0] == 16
    np.testing.assert_array_equal(np.asarray(padded[:10]), np.arange(10))
    # pad > n case
    y = jnp.arange(3)
    padded, n = pad_to_multiple(y, 8)
    assert n == 3 and padded.shape[0] == 8


def test_sharded_eval_padding_matches_unsharded():
    """quad run_eval with a mesh (nr_test=10 padded to 16 over 8 devices)
    returns the same metrics as without."""
    from apg_trajectory_tracking_tpu.evaluation.quad_eval import run_eval

    key = jax.random.PRNGKey(1)
    net = init_control_net(key, 15, 10, 9, 40, conv=True)
    dyn = quad_params()
    rng = np.random.RandomState(3)
    refs = jnp.asarray(rng.randn(10, 40, 9).astype(np.float32) * 0.1)
    m_plain, _ = run_eval(net, dyn, refs, 30, horizon=10, dt=0.1)
    m_mesh, roll = run_eval(
        net, dyn, refs, 30, horizon=10, dt=0.1, mesh=make_mesh(8)
    )
    assert roll["divergences"].shape[0] == 10
    for k in m_plain:
        assert m_plain[k] == pytest.approx(m_mesh[k], rel=1e-5, abs=1e-6), k

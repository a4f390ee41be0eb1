"""Checkpoint/resume round trip: params, optimizer momentum, and curriculum
scalars survive save -> restore, and a resumed trainer continues from the
saved state (the reference's ``base_model`` path, train_drone.py:53-68)."""

import numpy as np
import jax
import jax.numpy as jnp


def _tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(la, lb))


def test_train_state_roundtrip(tmp_path):
    from apg_trajectory_tracking_tpu.models import init_cartpole_net
    from apg_trajectory_tracking_tpu.training.common import sgd_momentum
    from apg_trajectory_tracking_tpu.utils.checkpoints import (
        save_train_state,
        restore_train_state,
    )

    net = init_cartpole_net(jax.random.PRNGKey(0), 4, 10)
    opt = sgd_momentum(1e-3)
    opt_state = opt.init(net)
    # take one update so momentum is non-trivial
    g = jax.tree_util.tree_map(jnp.ones_like, net)
    updates, opt_state = opt.update(g, opt_state)

    save_train_state(
        str(tmp_path), "model_cartpole", net, opt_state,
        {"thresh_div": 0.37, "horizon": 10},
    )
    net2, opt2, cfg = restore_train_state(
        str(tmp_path), "model_cartpole",
        init_cartpole_net(jax.random.PRNGKey(1), 4, 10), opt.init(net),
    )
    assert _tree_equal(net, net2)
    assert _tree_equal(opt_state, opt2)
    assert cfg["thresh_div"] == 0.37


def test_restore_without_opt_state(tmp_path):
    """Plain model checkpoints (e.g. reference-converted) work as
    base_model: optimizer state falls back to the fresh template."""
    from apg_trajectory_tracking_tpu.models import init_cartpole_net
    from apg_trajectory_tracking_tpu.training.common import sgd_momentum
    from apg_trajectory_tracking_tpu.utils.checkpoints import (
        save_checkpoint,
        restore_train_state,
    )

    net = init_cartpole_net(jax.random.PRNGKey(0), 4, 10)
    save_checkpoint(str(tmp_path), "model_cartpole", net, {"thresh_div": 0.2})
    opt = sgd_momentum(1e-3)
    net2, opt2, cfg = restore_train_state(
        str(tmp_path), "model_cartpole",
        init_cartpole_net(jax.random.PRNGKey(1), 4, 10), opt.init(net),
    )
    assert _tree_equal(net, net2)
    assert cfg["thresh_div"] == 0.2


def test_cartpole_trainer_resume(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from apg_trajectory_tracking_tpu.training.train_cartpole import (
        TrainCartpole,
    )
    from apg_trajectory_tracking_tpu.training.common import load_config

    cfg = load_config("cartpole", {"sample_data": 100, "nr_epochs": 2})
    t1 = TrainCartpole(cfg, seed=0, save_name="a")
    t1.fit(2, verbose=False)

    t2 = TrainCartpole(
        cfg, seed=1, save_name="b",
        base_model=str(tmp_path / "trained_models" / "cartpole" / "a"),
    )
    assert _tree_equal(t1.net, t2.net)
    assert _tree_equal(t1.opt_state, t2.opt_state)
    assert t2.thresh_div == t1.thresh_div
    # resumed trainer trains onward
    loss = t2.run_epoch()
    assert np.isfinite(loss)
    assert not _tree_equal(t1.net, t2.net)

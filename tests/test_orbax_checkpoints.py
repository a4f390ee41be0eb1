"""Orbax checkpoint backend (SURVEY.md §5.4): sharded-array save/restore
behind the same API as the npz backend, auto-detected on load.

The multi-host property under test (on the virtual 8-device mesh): an
orbax save records each array's sharding and the restore places arrays
back onto the TEMPLATE's shardings — replicated params come back
replicated, env-sharded buffers come back sharded — without ever gathering
to one host."""

import numpy as np
import jax
import jax.numpy as jnp

from apg_trajectory_tracking_tpu.utils.checkpoints import (
    checkpoint_exists,
    load_checkpoint,
    restore_train_state,
    save_checkpoint,
    save_train_state,
)


def _tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(la, lb))


def test_orbax_roundtrip_autodetect(tmp_path):
    from apg_trajectory_tracking_tpu.models import init_cartpole_net

    net = init_cartpole_net(jax.random.PRNGKey(0), 4, 10)
    save_checkpoint(str(tmp_path), "model", net, {"horizon": 10},
                    backend="orbax")
    assert checkpoint_exists(str(tmp_path), "model")
    # load_checkpoint finds the orbax directory with no backend hint
    net2 = load_checkpoint(
        str(tmp_path), "model", init_cartpole_net(jax.random.PRNGKey(1), 4, 10)
    )
    assert _tree_equal(net, net2)


def test_orbax_train_state_roundtrip(tmp_path):
    from apg_trajectory_tracking_tpu.models import init_cartpole_net
    from apg_trajectory_tracking_tpu.training.common import sgd_momentum

    net = init_cartpole_net(jax.random.PRNGKey(0), 4, 10)
    opt = sgd_momentum(1e-3)
    opt_state = opt.init(net)
    g = jax.tree_util.tree_map(jnp.ones_like, net)
    _, opt_state = opt.update(g, opt_state)

    save_train_state(str(tmp_path), "model_cartpole", net, opt_state,
                     {"thresh_div": 0.37}, backend="orbax")
    net2, opt2, cfg = restore_train_state(
        str(tmp_path), "model_cartpole",
        init_cartpole_net(jax.random.PRNGKey(1), 4, 10), opt.init(net),
    )
    assert _tree_equal(net, net2)
    assert _tree_equal(opt_state, opt2)
    assert cfg["thresh_div"] == 0.37


def test_orbax_preserves_mesh_shardings(tmp_path):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from apg_trajectory_tracking_tpu.parallel.mesh import make_mesh, replicate

    mesh = make_mesh(8)
    params = replicate(mesh, {"w": jnp.arange(6.0), "b": jnp.zeros(3)})
    data = jax.device_put(
        jnp.arange(32.0).reshape(16, 2), NamedSharding(mesh, P("env"))
    )
    tree = {"params": params, "buf": data}
    save_checkpoint(str(tmp_path), "sharded", tree, backend="orbax")

    out = load_checkpoint(str(tmp_path), "sharded", tree)
    assert _tree_equal(tree, out)
    # restored onto the template's shardings
    assert out["buf"].sharding == data.sharding
    assert out["params"]["w"].sharding == params["w"].sharding
    assert not out["buf"].is_fully_replicated
    assert out["params"]["w"].is_fully_replicated


def test_trainer_orbax_backend(tmp_path, monkeypatch):
    """A trainer configured with checkpoint_backend='orbax' writes orbax
    checkpoints that the standard load path (eval CLIs, --base_model)
    picks up transparently."""
    import os

    from apg_trajectory_tracking_tpu.models import init_cartpole_net
    from apg_trajectory_tracking_tpu.training.common import load_config
    from apg_trajectory_tracking_tpu.training.train_cartpole import (
        TrainCartpole,
    )

    monkeypatch.chdir(tmp_path)
    cfg = load_config(
        "cartpole",
        dict(nr_epochs=2, epoch_size=64, batch_size=32,
             checkpoint_backend="orbax"),
    )
    t = TrainCartpole(config=cfg, seed=0, save_name="orbax_smoke").fit(
        2, verbose=False
    )
    save_dir = os.path.join("trained_models", "cartpole", "orbax_smoke")
    assert checkpoint_exists(save_dir, "model_cartpole")
    assert not os.path.exists(
        os.path.join(save_dir, "model_cartpole.npz")
    )
    template = init_cartpole_net(
        jax.random.PRNGKey(1), cfg["state_size"],
        cfg["horizon"] * cfg["action_dim"],
    )
    # model_cartpole is the best-by-criterion snapshot (any epoch);
    # model_cartpole_final is the final-epoch state == t.net, so the
    # roundtrip must be EXACT there — this catches wrong-but-finite loads
    net = load_checkpoint(save_dir, "model_cartpole", template)
    assert all(
        np.all(np.isfinite(np.asarray(x)))
        for x in jax.tree_util.tree_leaves(net)
    )
    final = load_checkpoint(save_dir, "model_cartpole_final", template)
    assert _tree_equal(final, t.net)


def test_mixed_backend_loads_newer(tmp_path):
    """A run dir holding BOTH backends (re-trained with a different
    --ckpt_backend) must load the newer checkpoint, not silently prefer
    the stale npz."""
    import time

    d = str(tmp_path)
    template = {"w": jnp.ones(3)}
    save_checkpoint(d, "m", template, backend="npz")
    time.sleep(0.05)
    save_checkpoint(d, "m", {"w": jnp.full(3, 2.0)}, backend="orbax")
    out = load_checkpoint(d, "m", template)
    assert float(np.asarray(out["w"])[0]) == 2.0
    time.sleep(0.05)
    save_checkpoint(d, "m", {"w": jnp.full(3, 3.0)}, backend="npz")
    out = load_checkpoint(d, "m", template)
    assert float(np.asarray(out["w"])[0]) == 3.0

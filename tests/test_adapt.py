"""Dynamics-adaptation tests: the residual learns a wind mismatch."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from apg_trajectory_tracking_tpu.training.common import load_config


def test_cartpole_adaptation_closes_gap(tmp_path, monkeypatch):
    """Fitting the residual on the wind-mismatched env must shrink the
    one-step dynamics gap well below the analytic model's."""
    monkeypatch.chdir(tmp_path)
    from apg_trajectory_tracking_tpu.training.adapt import TrainCartpoleAdapt

    cfg = load_config(
        "cartpole", {"sample_data": 256, "l2_lambda": 0}
    )
    trainer = TrainCartpoleAdapt(cfg, modified_params={"wind": 0.5}, seed=0)

    gap_before, analytic_gap = trainer.dynamics_gap()
    for _ in range(80):
        trainer.run_dynamics_epoch()
    gap_after, _ = trainer.dynamics_gap()

    assert gap_after < gap_before * 0.5, (
        f"adaptation did not reduce gap: {gap_before} -> {gap_after}"
    )
    assert gap_after < analytic_gap * 0.5


def test_base_params_frozen_by_default(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from apg_trajectory_tracking_tpu.training.adapt import TrainCartpoleAdapt

    cfg = load_config("cartpole", {"sample_data": 64})
    trainer = TrainCartpoleAdapt(cfg, seed=0)
    base_before = jax.tree_util.tree_leaves(trainer.ld.base)
    trainer.run_dynamics_epoch()
    base_after = jax.tree_util.tree_leaves(trainer.ld.base)
    for a, b in zip(base_before, base_after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # residual must have moved
    res_delta = sum(
        float(jnp.abs(a - b).sum())
        for a, b in zip(
            jax.tree_util.tree_leaves(trainer.ld.residual),
            jax.tree_util.tree_leaves(
                trainer.__class__(cfg, seed=0).ld.residual
            ),
        )
    )
    assert res_delta > 0


def test_run_dynamics_alternation(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from apg_trajectory_tracking_tpu.training.adapt import TrainCartpoleAdapt

    cfg = load_config("cartpole", {"sample_data": 64, "nr_epochs": 3})
    trainer = TrainCartpoleAdapt(cfg, seed=0)
    trainer.run_dynamics(nr_epochs=3, train_dyn_for_epochs=1, verbose=False)
    assert len(trainer.logger.results["loss_dyn"]) == 2  # epochs 0, 1
    assert len(trainer.logger.results["loss"]) >= 1  # controller epochs


@pytest.mark.slow
def test_quad_adapt_closes_dynamics_gap(tmp_path, monkeypatch, tiny_bank):
    """Residual fitting shrinks the one-step gap to the mismatched quad env
    and the alternation trains the controller against the adapted model
    (train_drone.py:260-279)."""
    monkeypatch.chdir(tmp_path)
    import numpy as np
    from apg_trajectory_tracking_tpu.training.adapt import TrainQuadAdapt
    from apg_trajectory_tracking_tpu.training.common import load_config

    cfg = load_config("quad", {"epoch_size": 32, "self_play": 0.5,
                               "nr_epochs": 4})
    trainer = TrainQuadAdapt(
        cfg, modified_params={"translational_drag": [0.5, 0.5, 0.5]},
        seed=0, data_dir=tiny_bank,
    )
    _, analytic_before = trainer.dynamics_gap()
    trainer.run_dynamics(nr_epochs=4, train_dyn_for_epochs=2, verbose=False)
    adapted_after, analytic_after = trainer.dynamics_gap()
    # the residual must explain a real fraction of the mismatch, not an
    # epsilon (guards against the near-zero-init gradient saddle)
    assert adapted_after < 0.95 * analytic_after
    m = trainer.evaluate_mismatched(nr_test=2)
    assert np.isfinite(m["mean_divergence"])

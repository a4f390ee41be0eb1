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
def test_wing_adapt_closes_gap(tmp_path, monkeypatch):
    """Wing residual fitting shrinks the one-step gap to a plant with
    perturbed aero coefficients, and the alternation trains the controller
    against the adapted model (train_fixed_wing.py:216-237)."""
    monkeypatch.chdir(tmp_path)
    from apg_trajectory_tracking_tpu.training.adapt import TrainWingAdapt

    cfg = load_config(
        "wing", {"self_play": 64, "epoch_size": 64, "batch_size": 8}
    )
    trainer = TrainWingAdapt(
        cfg, modified_params={"CL_alpha": 3.0, "CD0": 0.15}, seed=0
    )
    # thresholds raised for the adapt experiment
    # (train_fixed_wing.py:226-227)
    assert trainer.inner.thresh_div >= 20
    assert trainer.inner.thresh_stable >= 1.5

    k = jax.random.PRNGKey(123)
    _, analytic_before = trainer.dynamics_gap(key=k)
    for _ in range(12):
        trainer.run_dynamics_epoch()
    adapted_after, analytic_after = trainer.dynamics_gap(key=k)
    assert analytic_after == analytic_before
    assert adapted_after < 0.6 * analytic_after, (
        f"wing adaptation left gap {adapted_after} vs analytic "
        f"{analytic_after}"
    )
    # one controller leg of the alternation + a true-plant eval
    trainer.run_dynamics(nr_epochs=2, train_dyn_for_epochs=0, verbose=False)
    m = trainer.evaluate_mismatched(nr_test=2)
    assert np.isfinite(m["mean_success"])


def test_wing_sampling_finetune_split(tmp_path, monkeypatch):
    """TrainWing(eval_modified_params=...) is the sampling fine-tune leg
    (train_fixed_wing.py:240-262): controller trains on the analytic
    model while eval/self-play run in the mismatched plant."""
    monkeypatch.chdir(tmp_path)
    from apg_trajectory_tracking_tpu.training.train_wing import TrainWing

    cfg = load_config(
        "wing", {"self_play": 16, "epoch_size": 16, "batch_size": 8}
    )
    trainer = TrainWing(
        cfg, seed=0, eval_modified_params={"CL_alpha": 3.0}
    )
    train_cl = float(trainer.train_dyn.coef("CL_alpha"))
    eval_cl = float(trainer.eval_dyn.coef("CL_alpha"))
    assert train_cl == pytest.approx(4.5321, abs=1e-4)
    assert eval_cl == pytest.approx(3.0, abs=1e-6)
    loss = trainer.run_epoch()
    assert np.isfinite(loss)


def test_targeted_sysid_mask_trains_only_named_fields():
    """The field-name form of train_base (scripts/swingup_adapt.py's
    masked-identification pattern, generalized) must step ONLY the named
    base fields plus the residual, freeze the rest, and reject unknown
    names."""
    import optax

    from apg_trajectory_tracking_tpu.dynamics.learnt import make_learnt_quad
    from apg_trajectory_tracking_tpu.dynamics.quad import quad_step
    from apg_trajectory_tracking_tpu.training.dynamics_fit import (
        build_dynamics_fit_step,
        masked_dynamics_optimizer,
    )
    from apg_trajectory_tracking_tpu.dynamics.quad import quad_params

    key = jax.random.PRNGKey(0)
    ld, ld_step = make_learnt_quad(key, std=1e-4)
    opt = masked_dynamics_optimizer(
        1e-3, ld, train_base=("kinv_ang_vel_tau",), base_lr=0.02
    )
    fit = build_dynamics_fit_step(
        lambda p, s, a, dt: ld_step(p, s, a, dt), quad_step, opt, 0.1
    )
    eval_dyn = quad_params({"kinv_ang_vel_tau": [21.6, 21.6, 6.5]})
    k1, k2 = jax.random.split(key)
    s = jax.random.normal(k1, (32, 12)) * 0.3
    a = jax.random.uniform(k2, (32, 4))
    new_ld, _, loss = fit(ld, opt.init(ld), eval_dyn, s, a)
    assert np.isfinite(float(loss))
    # named field stepped toward the plant
    assert float(
        jnp.abs(new_ld.base.kinv_ang_vel_tau - ld.base.kinv_ang_vel_tau).sum()
    ) > 0
    # every other base field frozen exactly
    for f in ld.base._fields:
        if f == "kinv_ang_vel_tau":
            continue
        np.testing.assert_array_equal(
            np.asarray(getattr(new_ld.base, f)),
            np.asarray(getattr(ld.base, f)),
        )
    # residual always trains
    assert float(
        jnp.abs(new_ld.residual.w2 - ld.residual.w2).sum()
    ) > 0
    with pytest.raises(ValueError, match="not in base fields"):
        masked_dynamics_optimizer(1e-3, ld, train_base=("no_such_param",))


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

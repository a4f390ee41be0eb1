"""End-to-end smoke tests for the three training pipelines + eval semantics."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from apg_trajectory_tracking_tpu.training.common import load_config


def test_cartpole_training_smoke(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from apg_trajectory_tracking_tpu.training.train_cartpole import TrainCartpole

    cfg = load_config("cartpole", {"sample_data": 128, "nr_epochs": 2})
    trainer = TrainCartpole(cfg, swingup=True, seed=0)
    trainer.fit(2, verbose=False)
    losses = trainer.logger.results["loss"]
    assert all(np.isfinite(losses))
    assert (tmp_path / "trained_models/cartpole/test/model_cartpole.npz").exists()
    assert (tmp_path / "trained_models/cartpole/test/results.json").exists()


def test_quad_training_smoke(tmp_path, monkeypatch, tiny_bank):
    monkeypatch.chdir(tmp_path)
    from apg_trajectory_tracking_tpu.training.train_quad import TrainQuad

    cfg = load_config("quad", {"epoch_size": 32, "self_play": 1})
    trainer = TrainQuad(cfg, seed=0, data_dir=tiny_bank)
    sp_before = int(trainer.buffers.eval_counter)
    trainer.fit(2, nr_test=3, verbose=False)
    assert int(trainer.buffers.eval_counter) > sp_before  # self-play wrote
    assert all(np.isfinite(trainer.logger.results["loss"]))
    assert trainer.logger.results["mean_success"][-1] > 0


@pytest.mark.parametrize("mode", ["autoregressive", "LSTM"])
def test_quad_recurrent_modes(tmp_path, monkeypatch, tiny_bank, mode):
    monkeypatch.chdir(tmp_path)
    from apg_trajectory_tracking_tpu.training.train_quad import TrainQuad

    cfg = load_config("quad", {"epoch_size": 16, "self_play": 1})
    trainer = TrainQuad(cfg, train_mode=mode, seed=0, data_dir=tiny_bank)
    trainer.fit(1, nr_test=2, verbose=False)
    assert all(np.isfinite(trainer.logger.results["loss"]))


def test_wing_training_smoke(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from apg_trajectory_tracking_tpu.training.train_wing import TrainWing

    cfg = load_config("wing", {"self_play": 64, "epoch_size": 16})
    trainer = TrainWing(cfg, seed=0)
    trainer.fit(1, nr_test=2, verbose=False)
    assert all(np.isfinite(trainer.logger.results["loss"]))


def test_quad_eval_train_vs_test_semantics(tiny_bank):
    """Train time resets to the reference (full-length rollouts); test time
    breaks on divergence (shorter valid spans) — evaluate_drone.py:177-184."""
    from apg_trajectory_tracking_tpu.evaluation.quad_eval import run_eval
    from apg_trajectory_tracking_tpu.dynamics.quad import quad_params
    from apg_trajectory_tracking_tpu.models import init_control_net
    from apg_trajectory_tracking_tpu.trajectory.generate import (
        load_trajectory_bank,
        prepare_trajectory,
    )

    bank = load_trajectory_bank(tiny_bank)
    refs = np.stack([prepare_trajectory(bank[i], 0.1, 0.4) for i in range(2)])
    refs[:, :, 2] += 3.0
    refs = jnp.asarray(refs)
    ref_len = refs.shape[1] - 10

    net = init_control_net(jax.random.PRNGKey(0), 15, 10, 9, 40, conv=True)
    dyn = quad_params()

    m_train, roll_train = run_eval(
        net, dyn, refs, ref_len, thresh_div=0.05, test_time=False
    )
    m_test, roll_test = run_eval(
        net, dyn, refs, ref_len, thresh_div=0.05, test_time=True
    )
    # an untrained net diverges quickly at test time
    assert np.asarray(roll_test["valid"]).sum() < np.asarray(
        roll_train["valid"]
    ).sum()
    # train-time rollouts cover the full evaluable span
    expected = min(251, ref_len + 1) * 2
    assert int(np.asarray(roll_train["valid"]).sum()) == expected


def test_checkpoint_roundtrip(tmp_path):
    from apg_trajectory_tracking_tpu.utils.checkpoints import (
        save_checkpoint,
        load_checkpoint,
        load_config as load_ckpt_config,
    )
    from apg_trajectory_tracking_tpu.models import init_control_net

    net = init_control_net(jax.random.PRNGKey(1), 15, 10, 9, 40)
    save_checkpoint(str(tmp_path), "model", net, {"horizon": 10, "dt": 0.1})
    template = init_control_net(jax.random.PRNGKey(2), 15, 10, 9, 40)
    restored = load_checkpoint(str(tmp_path), "model", template)
    for (k1, a), (k2, b) in zip(
        jax.tree_util.tree_leaves_with_path(net),
        jax.tree_util.tree_leaves_with_path(restored),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert load_ckpt_config(str(tmp_path))["horizon"] == 10


def test_minjerk_mix_option(tmp_path, monkeypatch, tiny_bank):
    """minjerk_mix replaces a fraction of replay windows with min-jerk
    windows (position continuity from the state, same end point)."""
    monkeypatch.chdir(tmp_path)
    import numpy as np
    import jax.numpy as jnp
    from apg_trajectory_tracking_tpu.training.train_quad import TrainQuad

    cfg = load_config("quad", {"epoch_size": 32, "self_play": 0,
                               "nr_epochs": 1})
    t0 = TrainQuad(cfg, seed=0, data_dir=tiny_bank, minjerk_mix=0.0)
    t1 = TrainQuad(cfg, seed=0, data_dir=tiny_bank, minjerk_mix=0.5)
    refs0 = np.asarray(t0.buffers.refs)
    refs1 = np.asarray(t1.buffers.refs)
    changed = np.any(refs0 != refs1, axis=(1, 2))
    assert 8 <= changed.sum() <= 24  # ~half the rows replaced
    # training still works
    loss = t1.run_epoch()
    assert np.isfinite(loss)


def test_quad_eval_uses_reference_exact_step(tmp_path, monkeypatch,
                                             tiny_bank):
    """Best-checkpoint selection must run the published evaluators' step:
    the promoted quad_step_fast training default may NOT leak into
    evaluation (its ~1e-5/step drift can flip rollouts at the divergence
    threshold and select a different snapshot than the published protocol
    would) — while an explicitly passed ablation step IS the eval
    subject."""
    monkeypatch.chdir(tmp_path)
    from apg_trajectory_tracking_tpu.dynamics.quad import (
        quad_step,
        quad_step_fast,
    )
    from apg_trajectory_tracking_tpu.training.train_quad import TrainQuad

    cfg = load_config("quad", {"epoch_size": 16, "self_play": 0})
    t = TrainQuad(cfg, seed=0, data_dir=tiny_bank)
    assert t.dyn_step is quad_step_fast  # training: promoted fast path
    assert t.eval_dyn_step is quad_step  # eval: reference-exact

    def ablation_step(params, state, action, dt):
        return quad_step(params, state, action, dt)

    t2 = TrainQuad(cfg, seed=0, data_dir=tiny_bank,
                   dyn_step=ablation_step)
    assert t2.eval_dyn_step is ablation_step

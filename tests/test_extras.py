"""Tests for the smaller parity components: resnet controller, quaternion
('high_mpc') dynamics + MPC variant, image-obs cartpole RL adapter, and
TensorBoard-guarded logging."""

import numpy as np
import jax
import jax.numpy as jnp


def test_resnet_net_shapes_and_grad():
    from apg_trajectory_tracking_tpu.models import (
        init_resnet_net,
        resnet_net_apply,
    )

    params = init_resnet_net(jax.random.PRNGKey(0), 15, 40)
    x = jnp.asarray(np.random.RandomState(0).randn(8, 15), jnp.float32)
    out = resnet_net_apply(params, x)
    assert out.shape == (8, 40)
    g = jax.grad(lambda p: jnp.sum(resnet_net_apply(p, x) ** 2))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(l)) for l in leaves)


def test_quad_high_hover_equilibrium():
    """thrust = g with zero rates keeps a level quad perfectly still."""
    from apg_trajectory_tracking_tpu.dynamics.quad import quad_step_high

    state = jnp.asarray([[0, 0, 1, 1, 0, 0, 0, 0, 0, 0]], jnp.float32)
    action = jnp.asarray([[9.81, 0, 0, 0]], jnp.float32)
    nxt = quad_step_high(None, state, action, 0.1)
    np.testing.assert_allclose(np.asarray(nxt), np.asarray(state), atol=1e-5)


def test_quad_high_quaternion_norm_preserved():
    """RK4 with 4 substeps keeps |q| ~ 1 over a step with body rates."""
    from apg_trajectory_tracking_tpu.dynamics.quad import quad_step_high

    state = jnp.asarray([[0, 0, 1, 1, 0, 0, 0, 0.3, -0.2, 0]], jnp.float32)
    action = jnp.asarray([[11.0, 2.0, -1.0, 0.5]], jnp.float32)
    nxt = quad_step_high(None, state, action, 0.1)
    qn = float(jnp.linalg.norm(nxt[0, 3:7]))
    assert abs(qn - 1.0) < 1e-4


def test_high_mpc_controller_tracks_hover():
    """The high_mpc MPC holds a hover reference (vy,vz,py,pz ~ 0)."""
    from apg_trajectory_tracking_tpu.controllers.mpc import MPC
    from apg_trajectory_tracking_tpu.dynamics.quad import quad_step_high

    ctrl = MPC(horizon=10, dt=0.1, dynamics="high_mpc", n_iters=60)
    state = np.zeros(12, dtype=np.float32)
    state[2] = 1.0  # 1 m altitude, level
    ref = np.zeros((10, 9), dtype=np.float32)
    ref[:, 2] = 1.0
    s10 = ctrl._euler_state_to_quat(state)
    for _ in range(5):
        u = ctrl.predict_actions(state, ref)
        s10 = np.asarray(
            quad_step_high(None, jnp.asarray(s10[None]),
                           jnp.asarray(u[0][None]), 0.1)
        )[0]
        state = np.concatenate([s10[:3], np.zeros(3), s10[7:10], np.zeros(3)])
    assert abs(s10[1]) < 0.05 and abs(s10[2] - 1.0) < 0.05, s10


def test_cartpole_rl_image_obs():
    from apg_trajectory_tracking_tpu.baselines.rl_envs import make_cartpole_rl
    from apg_trajectory_tracking_tpu.dynamics.cartpole import cartpole_params

    reset, step, obs_dim, act_dim = make_cartpole_rl(
        cartpole_params(), image_obs=True
    )
    assert obs_dim == (3, 100, 120)
    s, obs = reset(jax.random.PRNGKey(0))
    assert obs.shape == (3, 100, 120)
    assert 0.0 <= float(obs.min()) and float(obs.max()) <= 1.0
    assert float(obs.sum()) > 10  # something was drawn
    s, obs, r, d = step(s, jnp.asarray([0.3]), jax.random.PRNGKey(1))
    assert obs.shape == (3, 100, 120)


def test_sweep_single_eval_per_param(monkeypatch, capsys):
    """evaluate_quad --sweep runs exactly ONE eval per swept parameter
    value, with err and stable read from the same rollouts (regression for
    the double-eval that drew different test trajectories per column)."""
    import json
    import sys

    import apg_trajectory_tracking_tpu.evaluation.quad_eval as qe

    calls = {"n": 0}

    def counting_run_eval(*a, **k):
        calls["n"] += 1
        return {"mean_divergence": 0.1, "ratio_stable": 1.0}, None

    monkeypatch.setattr(qe, "run_eval", counting_run_eval)
    monkeypatch.setattr(
        sys, "argv",
        ["evaluate_quad.py", "-m", "assets/quad_trained", "-a", "2",
         "--sweep"],
    )
    sys.path.insert(0, "scripts")
    import evaluate_quad

    evaluate_quad.main()
    out = capsys.readouterr().out
    results = json.loads(out[out.index("{"):])
    n_entries = sum(len(v) for v in results.values())
    assert n_entries > 0
    assert calls["n"] == n_entries


def test_logger_tensorboard_guard(tmp_path):
    from apg_trajectory_tracking_tpu.utils.logging import ResultsLogger

    lg = ResultsLogger(str(tmp_path), tensorboard=True)
    lg.log("loss", 1.0)
    lg.log("mean_success", 3.0)
    lg.finalize(plot=False)
    assert (tmp_path / "results.json").exists()

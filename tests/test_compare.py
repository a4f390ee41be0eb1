"""Head-to-head comparison machinery tests (evaluation/compare.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from apg_trajectory_tracking_tpu.baselines.ppo import init_actor_critic
from apg_trajectory_tracking_tpu.controllers.mpc import MPC
from apg_trajectory_tracking_tpu.dynamics.quad import quad_params, quad_step
from apg_trajectory_tracking_tpu.evaluation.compare import (
    mpc_follow_trajectories,
    ppo_action_transform,
    ppo_net_apply,
    tracking_metrics,
    format_table,
)
from apg_trajectory_tracking_tpu.evaluation.quad_eval import run_eval


def test_ppo_adapter_through_quad_evaluator():
    """A PPO actor evaluates through the SAME evaluator as APG nets: obs
    layout matches the RL env, actions land in [0, 1]."""
    horizon = 10
    obs_dim = 15 + horizon * 9
    params = init_actor_critic(jax.random.PRNGKey(0), obs_dim, 4)
    rng = np.random.RandomState(0)
    refs = jnp.asarray(rng.randn(4, 40, 9).astype(np.float32) * 0.1)
    metrics, roll = run_eval(
        params, quad_params(), refs, 30, horizon=horizon, dt=0.1,
        test_time=True, net_apply=ppo_net_apply,
        action_transform=ppo_action_transform,
    )
    assert roll["divergences"].shape[0] == 4
    assert np.isfinite(metrics["mean_divergence"])
    # transform maps tanh-space mean to the env's [0, 1] action box
    x = jnp.asarray([-5.0, -1.0, 0.0, 1.0, 5.0])
    out = np.asarray(ppo_action_transform(x))
    np.testing.assert_allclose(out, [0.0, 0.0, 0.5, 1.0, 1.0])


def test_mpc_rollout_matches_evaluator_contract():
    """Batched MPC rollout emits the evaluator's {divergences, valid}
    contract and tracks a slow trajectory tightly."""
    rng = np.random.RandomState(1)
    # gentle circular reference at hover height
    t = np.linspace(0, 6, 80, dtype=np.float32)
    refs = np.zeros((2, 80, 9), dtype=np.float32)
    refs[:, :, 0] = 0.5 * np.sin(0.3 * t)
    refs[:, :, 1] = 0.5 * np.cos(0.3 * t) - 0.5
    refs[:, :, 2] = 3.0
    mpc = MPC(horizon=10, dt=0.1, dynamics="flightmare")
    roll = mpc_follow_trajectories(
        mpc._solve, quad_params(), jnp.asarray(refs), 60,
        thresh_div=1.0, horizon=10, dt=0.1, max_steps=61,
    )
    m = tracking_metrics(roll, 1.0, 60, max_steps=61)
    assert roll["divergences"].shape == (2, 61)
    assert m["ratio_stable"] == 1.0
    assert m["mean_divergence"] < 0.1


def test_wing_mpc_rollout_reaches_targets():
    """Batched wing MPC flies to shared waypoints through the evaluator's
    pass/divergence semantics and reports the fly_to_point contract."""
    from apg_trajectory_tracking_tpu.dynamics.fixed_wing import wing_params
    from apg_trajectory_tracking_tpu.evaluation.compare import (
        mpc_fly_to_point,
        wing_point_metrics,
    )

    targets = jnp.asarray(
        [[50.0, 2.0, -1.0], [50.0, -3.0, 2.0]], dtype=jnp.float32
    )
    mpc = MPC(horizon=10, dt=0.05, dynamics="fixed_wing_3D")
    roll = mpc_fly_to_point(
        mpc._solve, wing_params({}), targets,
        thresh_div=10.0, thresh_stable=3.0, horizon=10,
        max_steps=300, dt=0.05, segment_len=100,
    )
    m = wing_point_metrics(roll, 2)
    assert m["pass_rate"] == 1.0
    assert m["mean_target_error"] < 1.0
    assert 0 < m["mean_steps_alive"] < 300


def test_wing_ppo_adapter_through_wing_evaluator():
    """A wing PPO actor evaluates through the SAME fly_to_point as APG
    nets: obs layout matches make_wing_rl, actions clipped to [0, 1]."""
    from apg_trajectory_tracking_tpu.data.dataset import WING_MEAN, WING_STD
    from apg_trajectory_tracking_tpu.dynamics.fixed_wing import wing_params
    from apg_trajectory_tracking_tpu.evaluation.compare import (
        ppo_wing_action_transform,
        ppo_wing_net_apply,
        wing_point_metrics,
    )
    from apg_trajectory_tracking_tpu.evaluation.wing_eval import fly_to_point

    params = init_actor_critic(jax.random.PRNGKey(0), 12, 4)
    targets = jnp.asarray(
        [[50.0, 1.0, 0.0], [50.0, 0.0, -2.0]], dtype=jnp.float32
    )
    roll = fly_to_point(
        params, wing_params({}), targets,
        jnp.asarray(WING_MEAN), jnp.asarray(WING_STD),
        thresh_div=10.0, thresh_stable=3.0, horizon=10, max_steps=50,
        dt=0.05, test_time=True, net_apply=ppo_wing_net_apply,
        action_transform=ppo_wing_action_transform,
    )
    m = wing_point_metrics(roll, 2)
    assert set(m) == {"mean_target_error", "std_target_error",
                      "pass_rate", "mean_steps_alive",
                      "n", "pass_rate_ci", "mean_target_error_ci"}
    assert m["n"] == 2
    assert np.isfinite(m["mean_target_error"])
    # the wing env consumes raw [0, 1] actions — no tanh rescale
    x = jnp.asarray([-2.0, 0.0, 0.25, 1.0, 3.0])
    np.testing.assert_allclose(
        np.asarray(ppo_wing_action_transform(x)), [0.0, 0.0, 0.25, 1.0, 1.0]
    )


def test_wing_eval_hooks_default_unchanged():
    """The net_apply/action_transform hooks default to the original APG
    path: run_eval with explicit defaults matches run_eval without."""
    from apg_trajectory_tracking_tpu.data.dataset import WING_MEAN, WING_STD
    from apg_trajectory_tracking_tpu.dynamics.fixed_wing import wing_params
    from apg_trajectory_tracking_tpu.evaluation import wing_eval
    from apg_trajectory_tracking_tpu.models import init_control_net

    net = init_control_net(jax.random.PRNGKey(3), 9, 1, 3, 40, conv=False)
    kw = dict(
        nr_test=3, thresh_div=10.0, thresh_stable=3.0, horizon=10,
        max_steps=40, dt=0.05, test_time=True,
    )
    m1, roll1, _ = wing_eval.run_eval(
        net, wing_params({}), jax.random.PRNGKey(7),
        jnp.asarray(WING_MEAN), jnp.asarray(WING_STD), **kw,
    )
    m2, roll2, _ = wing_eval.run_eval(
        net, wing_params({}), jax.random.PRNGKey(7),
        jnp.asarray(WING_MEAN), jnp.asarray(WING_STD), **kw,
        net_apply=wing_eval._feedforward_apply,
        action_transform=jax.nn.sigmoid,
    )
    assert m1 == m2
    np.testing.assert_array_equal(
        np.asarray(roll1["div_target_sum"]), np.asarray(roll2["div_target_sum"])
    )


def test_format_table_markdown():
    rows = {"A": {"x": 1.0, "y": 2.0}, "B": {"x": 3.0}}
    table = format_table(rows, ("x", "y"), title="T")
    assert "### T" in table and "| A | 1.000 | 2.000 |" in table
    assert "| B | 3.000 | — |" in table

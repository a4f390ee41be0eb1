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


def test_format_table_markdown():
    rows = {"A": {"x": 1.0, "y": 2.0}, "B": {"x": 3.0}}
    table = format_table(rows, ("x", "y"), title="T")
    assert "### T" in table and "| A | 1.000 | 2.000 |" in table
    assert "| B | 3.000 | — |" in table

"""PETS baseline test: ensemble + CEM must learn to balance the cartpole
within a few trials."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from apg_trajectory_tracking_tpu.baselines.pets import PETS, cartpole_reward
from apg_trajectory_tracking_tpu.dynamics.cartpole import cartpole_params
from apg_trajectory_tracking_tpu.envs.cartpole_env import (
    env_step,
    reset_upright,
)


@pytest.mark.slow
def test_pets_learns_cartpole_balance():
    agent = PETS(
        4, 1, cartpole_reward, -1.0, 1.0, horizon=10, seed=0,
        population=100, n_elites=10, n_particles=3, n_iters=4,
    )
    dyn = cartpole_params()
    rng = np.random.RandomState(0)

    # exploration data
    state = np.asarray(reset_upright(jax.random.PRNGKey(0), 1)[0])
    for i in range(200):
        a = rng.rand(1).astype(np.float32) * 2 - 1
        s2 = np.asarray(
            env_step(dyn, jnp.asarray(state), jnp.asarray(a), 0.05)
        )
        agent.record(state, a, s2)
        state = s2
        if abs(state[2]) > 1.0:
            state = np.asarray(reset_upright(jax.random.PRNGKey(i), 1)[0])

    steps_per_trial = []
    for trial in range(2):
        agent.train_model(200)
        state = np.asarray(reset_upright(jax.random.PRNGKey(trial + 10), 1)[0])
        agent.reset_plan()
        steps = 0
        for i in range(80):
            a = agent.act(state)
            s2 = np.asarray(
                env_step(dyn, jnp.asarray(state), jnp.asarray(a), 0.05)
            )
            agent.record(state, a, s2)
            state = s2
            steps = i + 1
            if abs(state[2]) > 0.21:
                break
        steps_per_trial.append(steps)

    assert steps_per_trial[-1] > 60, f"PETS did not learn: {steps_per_trial}"


def test_pets_context_reward_sees_per_step_rows():
    """The CEM planner threads the (horizon, d) context row-by-row through
    the planned steps: with a reward that only pays on the LAST context
    row's flag, planning still runs and returns in-range actions."""
    from apg_trajectory_tracking_tpu.baselines.pets import PETS

    def reward(state, action, ctx_row):
        # pays ctx_row[0]; rows are 0 except the last -> return equals
        # the last row's value regardless of the model
        return jnp.broadcast_to(ctx_row[0], state.shape[:-1])

    agent = PETS(
        3, 2, reward, 0.0, 1.0, horizon=4, seed=0,
        population=20, n_elites=4, n_particles=2, n_iters=2,
    )
    rng = np.random.RandomState(0)
    for _ in range(8):
        agent.record(rng.randn(3), rng.rand(2), rng.randn(3))
    agent.train_model(n_batches=2)
    ctx = np.zeros((4, 1), np.float32)
    ctx[-1, 0] = 1.0
    a = agent.act(np.zeros(3, np.float32), ctx)
    assert a.shape == (2,) and np.all(a >= 0.0) and np.all(a <= 1.0)


def test_eval_pets_wing_waypoints_contract():
    """The batched PETS waypoint evaluator emits the fly_to_point contract
    (one vmapped CEM plan per lockstep control step)."""
    from apg_trajectory_tracking_tpu.baselines.pets import (
        PETS,
        eval_pets_wing_waypoints,
        make_wing_pets_reward,
    )
    from apg_trajectory_tracking_tpu.dynamics.fixed_wing import wing_params
    from apg_trajectory_tracking_tpu.evaluation.compare import (
        wing_point_metrics,
    )

    agent = PETS(
        12, 4, make_wing_pets_reward(), 0.0, 1.0, horizon=4, seed=0,
        population=20, n_elites=4, n_particles=2, n_iters=2,
    )
    rng = np.random.RandomState(0)
    for _ in range(8):
        s = rng.randn(12).astype(np.float32)
        agent.record(s, rng.rand(4), s + 0.01 * rng.randn(12))
    agent.train_model(n_batches=2)
    targets = np.array([[50.0, 1.0, 0.0], [50.0, -1.0, 1.0]], np.float32)
    roll = eval_pets_wing_waypoints(
        agent, wing_params({}), targets, max_steps=8,
    )
    m = wing_point_metrics(roll, 2)
    assert roll["div_target_sum"].shape == (2,)
    assert np.isfinite(m["mean_target_error"])
    assert 0.0 <= m["pass_rate"] <= 1.0
    assert np.all(np.asarray(roll["steps_alive"]) <= 8)


@pytest.mark.slow
def test_pets_wing_runner_smoke():
    """run_pets_wing: two tiny trials produce finite rewards and the
    history contract (the reference PETS script's default system)."""
    from apg_trajectory_tracking_tpu.baselines.pets import run_pets_wing

    agent, hist = run_pets_wing(trials=2, trial_length=25, verbose=False)
    assert len(hist["rewards"]) == 2
    assert len(hist["target_errors"]) == 2
    assert np.all(np.isfinite(hist["rewards"]))


@pytest.mark.slow
def test_pets_quad_runner_smoke(tiny_bank):
    """run_pets_quad: two tiny trials on the CI bank produce finite
    divergences (the reference quad PETS setup at dt 0.1, speed 0.2)."""
    from apg_trajectory_tracking_tpu.baselines.pets import run_pets_quad

    agent, hist = run_pets_quad(
        trials=2, trial_length=20, data_dir=str(tiny_bank), verbose=False,
    )
    assert len(hist["rewards"]) == 2
    assert np.all(np.isfinite(hist["divergences"]))
    assert all(s >= 1 for s in hist["steps"])


def test_eval_pets_quad_tracking_contract():
    """The batched quad PETS tracking evaluator emits the (divs, valid)
    contract of follow_trajectories(test_time=True): once an episode
    diverges, every later step is invalid (frozen), and the metrics feed
    metrics_from_rollout unchanged."""
    from apg_trajectory_tracking_tpu.baselines.pets import (
        PETS,
        eval_pets_quad_tracking,
        make_quad_tracking_reward,
    )
    from apg_trajectory_tracking_tpu.dynamics.quad import quad_params
    from apg_trajectory_tracking_tpu.evaluation.quad_eval import (
        metrics_from_rollout,
    )

    agent = PETS(
        12, 4, make_quad_tracking_reward(), 0.0, 1.0, horizon=4, seed=0,
        population=20, n_elites=4, n_particles=2, n_iters=2,
    )
    rng = np.random.RandomState(0)
    for _ in range(8):
        s = rng.randn(12).astype(np.float32)
        agent.record(s, rng.rand(4), s + 0.01 * rng.randn(12))
    agent.train_model(n_batches=2)

    # two gentle reference trajectories starting at the origin
    refs = np.zeros((2, 12, 9), np.float32)
    refs[:, :, 2] = 3.0 + 0.01 * np.arange(12)
    max_steps = 10
    roll = eval_pets_quad_tracking(
        agent, quad_params(), jnp.asarray(refs), ref_len=8,
        thresh_div=1.0, max_steps=max_steps,
    )
    assert roll["divergences"].shape == (2, max_steps)
    assert roll["valid"].shape == (2, max_steps)
    # valid is a prefix mask: no step is valid after the first invalid one
    for v in roll["valid"]:
        if not v.all():
            first_invalid = int(np.argmin(v))
            assert not v[first_invalid:].any()
    m = metrics_from_rollout(
        roll["divergences"], roll["valid"], 1.0, max_steps, 8,
    )
    assert 0.0 <= m["ratio_stable"] <= 1.0
    assert np.isfinite(m["mean_divergence"])

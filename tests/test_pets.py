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

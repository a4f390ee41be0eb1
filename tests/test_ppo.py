"""PPO baseline tests: machinery correctness + fast learning signal."""

import numpy as np
import jax
import jax.numpy as jnp

from apg_trajectory_tracking_tpu.baselines.ppo import (
    PPOConfig,
    make_ppo,
    train_ppo,
)
from apg_trajectory_tracking_tpu.baselines import rl_envs
from apg_trajectory_tracking_tpu.dynamics.cartpole import cartpole_params


def test_ppo_cartpole_improves():
    """Episode length must grow substantially within a small budget."""
    reset_fn, step_fn, obs_dim, act_dim = rl_envs.make_cartpole_rl(
        cartpole_params()
    )
    cfg = PPOConfig(n_envs=8, n_steps=128)
    init, train_iter = make_ppo(reset_fn, step_fn, obs_dim, act_dim, cfg)
    state = init(jax.random.PRNGKey(0))
    first = None
    for it in range(25):
        state, metrics = train_iter(state)
        if it == 0:
            first = float(metrics["mean_episode_len"])
    last = float(metrics["mean_episode_len"])
    assert last > 3 * first, f"no learning: ep_len {first} -> {last}"


def test_quad_rl_env_contract():
    from apg_trajectory_tracking_tpu.dynamics.quad import quad_params

    bank = np.random.RandomState(0).randn(3, 60, 9).astype(np.float32) * 0.1
    reset_fn, step_fn, obs_dim, act_dim = rl_envs.make_quad_rl(
        quad_params(), jnp.asarray(bank)
    )
    s, obs = reset_fn(jax.random.PRNGKey(0))
    assert obs.shape == (obs_dim,)
    s, obs, rew, done = step_fn(
        s, jnp.zeros(act_dim), jax.random.PRNGKey(1)
    )
    assert obs.shape == (obs_dim,) and np.isfinite(float(rew))


def test_quad_rl_reward_variants():
    """mpc reward + QuadEnvMario variant (rl_envs.py:227-255,446-459)."""
    from apg_trajectory_tracking_tpu.dynamics.quad import quad_params

    bank = np.random.RandomState(1).randn(3, 60, 9).astype(np.float32) * 0.1
    dyn = quad_params()
    reset_fn, step_fn, obs_dim, _ = rl_envs.make_quad_rl(
        dyn, jnp.asarray(bank), reward="mpc"
    )
    s, obs = reset_fn(jax.random.PRNGKey(0))
    s, obs, rew_mpc, done = step_fn(s, jnp.zeros(4), jax.random.PRNGKey(1))
    assert np.isfinite(float(rew_mpc))

    # same transition, mario reward differs (different shaping)
    reset_m, step_m, _, _ = rl_envs.make_quad_rl(
        dyn, jnp.asarray(bank), reward="mario"
    )
    sm, _ = reset_m(jax.random.PRNGKey(0))
    _, _, rew_mario, _ = step_m(sm, jnp.zeros(4), jax.random.PRNGKey(1))
    assert float(rew_mpc) != float(rew_mario)

    # QuadEnvMario: horizon-1 obs = 15 + 9
    reset1, step1, obs_dim1, _ = rl_envs.make_quad_rl_mario(
        dyn, jnp.asarray(bank)
    )
    assert obs_dim1 == 24
    s1, o1 = reset1(jax.random.PRNGKey(2))
    assert o1.shape == (24,)
    _, o1, r1, _ = step1(s1, jnp.zeros(4), jax.random.PRNGKey(3))
    assert o1.shape == (24,) and np.isfinite(float(r1))

    import pytest

    with pytest.raises(ValueError):
        rl_envs.make_quad_rl(dyn, jnp.asarray(bank), reward="bogus")


def test_wing_rl_env_contract():
    from apg_trajectory_tracking_tpu.dynamics.fixed_wing import wing_params

    reset_fn, step_fn, obs_dim, act_dim = rl_envs.make_wing_rl(wing_params())
    s, obs = reset_fn(jax.random.PRNGKey(0))
    assert obs.shape == (12,)
    # cruise-ish action keeps it alive and rewarded
    s, obs, rew, done = step_fn(
        s, jnp.array([0.25, 0.5, 0.5, 0.5]), jax.random.PRNGKey(1)
    )
    assert float(rew) > 0 and not bool(done)


def test_auto_reset():
    """A fallen cartpole must be re-initialized upright."""
    reset_fn, step_fn, _, _ = rl_envs.make_cartpole_rl(cartpole_params())
    s, _ = reset_fn(jax.random.PRNGKey(0))
    s = s._replace(state=jnp.array([0.0, 0.0, 1.0, 0.0]))  # fallen
    s, obs, rew, done = step_fn(s, jnp.zeros(1), jax.random.PRNGKey(1))
    assert bool(done)
    assert abs(float(s.state[2])) < 0.3  # fresh upright state
    assert float(rew) == 0.0


def test_evaluate_policy_runs():
    import jax
    from apg_trajectory_tracking_tpu.baselines.ppo import (
        init_actor_critic,
        evaluate_policy,
    )
    from apg_trajectory_tracking_tpu.baselines.rl_envs import make_cartpole_rl
    from apg_trajectory_tracking_tpu.dynamics.cartpole import cartpole_params

    reset, step, obs_dim, act_dim = make_cartpole_rl(cartpole_params())
    params = init_actor_critic(jax.random.PRNGKey(0), obs_dim, act_dim)
    m = evaluate_policy(params, reset, step, jax.random.PRNGKey(1),
                        n_episodes=4, max_steps=50)
    assert 0 < m["mean_episode_len"] <= 50
    assert "mean_return" in m

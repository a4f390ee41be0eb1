"""Functional RL environment adapters (gym-style rewards, pure functions).

Re-designs ``neural_control/environments/rl_envs.py``: the gym classes
become (reset, step) pure functions over explicit env-state pytrees with
auto-reset, built to be vmapped over thousands of parallel environments and
scanned over time — the backbone of the pure-JAX PPO baseline (the
reference uses stable-baselines3 with a single CPU env).

Reward functions and termination conditions mirror the reference:
  * cartpole: reward 1 - |x_dot| while upright, <= 250 steps
    (rl_envs.py:102-112);
  * quad: the 'mario' shaped tracking reward (rl_envs.py:257-308), done on
    instability / divergence > 0.3 / trajectory end (rl_envs.py:320-328),
    action rescaled from [-1,1] to [0,1];
  * wing: reward thresh_div - divergence from the target line
    (rl_envs.py:419-429), done on target pass / instability / divergence.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from apg_trajectory_tracking_tpu.data.dataset import (
    quad_prepare_data,
    wing_prepare_data,
    WING_MEAN,
    WING_STD,
)
from apg_trajectory_tracking_tpu.dynamics.cartpole import cartpole_step
from apg_trajectory_tracking_tpu.dynamics.quad import quad_step, quad_is_stable
from apg_trajectory_tracking_tpu.dynamics.fixed_wing import (
    wing_step,
    wing_is_stable,
)
from apg_trajectory_tracking_tpu.envs.cartpole_env import (
    env_step as cartpole_env_step,
    is_upright,
    reset_upright,
)
from apg_trajectory_tracking_tpu.trajectory.refs import project_to_line


# ---------------------------------------------------------------------------
# cartpole
# ---------------------------------------------------------------------------


class CartpoleRLState(NamedTuple):
    state: jnp.ndarray  # (4,)
    state_buffer: jnp.ndarray  # (4, 4) newest first
    action_buffer: jnp.ndarray  # (4, 1)
    step_ind: jnp.ndarray  # scalar int32


def make_cartpole_rl(dyn_params, dt=0.05, max_steps=250, image_obs=False):
    """Cartpole RL adapter. ``image_obs=False``: obs = flattened 3-step
    (state, action) history (rl_envs.py:39-44,92-95). ``image_obs=True``:
    obs = (3, 100, 120) binary image stack rendered from the state history
    (rl_envs.py:36-50,99-101 — the reference screenshots pyglet + cv2-
    thresholds; here states render procedurally on device), cart-centered
    like the reference's ``center_at_x`` roll."""
    if image_obs:
        from apg_trajectory_tracking_tpu.models.image_cartpole import (
            render_cartpole_image,
        )

        obs_dim = (3, 100, 120)
        x_threshold, half_w = 2.4, 60.0

        def _obs(s: CartpoleRLState):
            # render each buffered frame displaced relative to the CURRENT
            # cart position (the reference's roll-to-center, rl_envs.py:
            # 65-77): frame i's cart sits at (x_i - x_now); velocity is
            # encoded in the frame-to-frame displacement
            x_now = s.state_buffer[0, 0]
            offsets = (
                (s.state_buffer[:3, 0] - x_now) / x_threshold * half_w
            )
            return jax.vmap(
                lambda st, off: render_cartpole_image(st, x_offset_px=off)
            )(s.state_buffer[:3], offsets)

    else:
        obs_dim = 15  # 3 x (state(4) + action(1)) history

        def _obs(s: CartpoleRLState):
            hist = jnp.concatenate(
                [s.state_buffer[:3], s.action_buffer[:3]], axis=1
            )
            return hist.reshape(-1)

    act_dim = 1

    def reset(key):
        state = reset_upright(key, 1)[0]
        s = CartpoleRLState(
            state=state,
            state_buffer=jnp.tile(state, (4, 1)),
            action_buffer=jnp.zeros((4, 1)),
            step_ind=jnp.zeros((), jnp.int32),
        )
        return s, _obs(s)

    def step(s: CartpoleRLState, action, key):
        new_state = cartpole_env_step(dyn_params, s.state, action, dt)
        done = jnp.logical_or(
            ~is_upright(new_state), s.step_ind > max_steps
        )
        reward = jnp.where(done, 0.0, 1.0 - jnp.abs(new_state[1]))
        nxt = CartpoleRLState(
            state=new_state,
            state_buffer=jnp.roll(s.state_buffer, 1, axis=0).at[0].set(new_state),
            action_buffer=jnp.roll(s.action_buffer, 1, axis=0).at[0].set(action),
            step_ind=s.step_ind + 1,
        )
        # auto-reset
        fresh, _ = reset(key)
        nxt = jax.tree_util.tree_map(
            lambda a, b: jnp.where(done, a, b), fresh, nxt
        )
        return nxt, _obs(nxt), reward, done

    return reset, step, obs_dim, act_dim


# ---------------------------------------------------------------------------
# quad
# ---------------------------------------------------------------------------


class QuadRLState(NamedTuple):
    state: jnp.ndarray  # (12,)
    traj_idx: jnp.ndarray  # scalar int32 into the prepared bank
    current_ind: jnp.ndarray  # scalar int32


def make_quad_rl(
    dyn_params,
    prepared_bank,
    dt=0.1,
    horizon=10,
    thresh_div=0.3,
    thresh_stable=1.5,
    reward="mario",
):
    """``prepared_bank``: (N, T, 9) trajectories already subsampled to the
    control rate (prepare_trajectory).

    ``reward``: 'mario' (the reference's default, rl_envs.py:257-308,334)
    or 'mpc' (the MPC-cost-shaped alternative, rl_envs.py:227-255).
    ``horizon=1`` gives the QuadEnvMario variant (rl_envs.py:446-459) —
    single-row reference observation; the reference declares obs_dim=27
    there but its own reshape yields 15+9=24, which is what we use."""
    n_traj, T, _ = prepared_bank.shape
    obs_dim = 15 + horizon * 9
    act_dim = 4

    def _ref_window(s: QuadRLState):
        start = s.current_ind + 1
        idx = jnp.minimum(start + jnp.arange(horizon), T - 1)
        return prepared_bank[s.traj_idx][idx]

    def _obs(s: QuadRLState):
        window = _ref_window(s)
        in_state, _, in_ref, _ = quad_prepare_data(
            s.state[None], window[None]
        )
        return jnp.concatenate([in_ref.reshape(-1), in_state[0]])

    def reset(key):
        ti = jax.random.randint(key, (), 0, n_traj)
        state = jnp.zeros(12).at[:3].set(prepared_bank[ti, 0, :3])
        s = QuadRLState(
            state=state, traj_idx=ti, current_ind=jnp.zeros((), jnp.int32)
        )
        return s, _obs(s)

    def _reward_mario(s: QuadRLState, action01):
        """Shaped tracking reward (rl_envs.py:257-308)."""
        ref_row = prepared_bank[s.traj_idx, s.current_ind]
        pos_loss = jnp.sum(ref_row[:3] - s.state[:3]) ** 2
        ori_loss = jnp.sum(ref_row[3:6] - s.state[3:6]) ** 2
        vel_loss = jnp.sum(ref_row[6:9] - s.state[6:9]) ** 2
        act_reward = -0.001 * jnp.sum((0.5 - action01) ** 2)
        return (
            -0.02 * (pos_loss - 2.0)
            - 0.01 * (ori_loss - 0.2)
            - 0.002 * (vel_loss - 2.0)
            + 0.1
            + act_reward
        )

    def _reward_mpc(s: QuadRLState, action01):
        """MPC-cost-shaped reward (get_reward_mpc, rl_envs.py:227-255):
        same weights as quad_mpc_loss (pos 10, vel 1, thrust-reg 5,
        rate-reg 0.1, omega 0.1), turned into margins below thresholds."""
        ref_row = prepared_bank[s.traj_idx, s.current_ind]
        pos_rew = thresh_div - jnp.linalg.norm(ref_row[:3] - s.state[:3])
        vel_rew = thresh_div - jnp.linalg.norm(ref_row[6:9] - s.state[6:9])
        u_rew = 0.5 - jnp.abs(0.5 - action01)
        av_rew = jnp.sum(thresh_stable - jnp.abs(s.state[9:12]))
        return 0.1 * (
            10.0 * pos_rew + 1.0 * vel_rew + 0.1 * av_rew
            + 0.1 * jnp.sum(u_rew[1:]) + 5.0 * u_rew[0]
        )

    if reward not in ("mario", "mpc"):
        raise ValueError(f"reward must be 'mario' or 'mpc', got {reward!r}")
    reward_fn = _reward_mario if reward == "mario" else _reward_mpc

    def step(s: QuadRLState, action, key):
        action01 = (action + 1.0) / 2.0  # rl_envs.py:313
        new_state = quad_step(dyn_params, s.state, action01, dt)
        nxt = QuadRLState(
            state=new_state,
            traj_idx=s.traj_idx,
            current_ind=s.current_ind + 1,
        )
        ref_row = prepared_bank[nxt.traj_idx, nxt.current_ind]
        pos_div = jnp.linalg.norm(ref_row[:3] - new_state[:3])
        stable = quad_is_stable(new_state, thresh_stable)
        done = (
            ~stable
            | (pos_div > thresh_div)
            | (nxt.current_ind > T - horizon - 2)
        )
        reward = jnp.where(done, 0.0, reward_fn(nxt, action01))
        fresh, _ = reset(key)
        nxt = jax.tree_util.tree_map(
            lambda a, b: jnp.where(done, a, b), fresh, nxt
        )
        return nxt, _obs(nxt), reward, done

    return reset, step, obs_dim, act_dim


def make_quad_rl_mario(dyn_params, prepared_bank, dt=0.1,
                       speed_factor=None, **kwargs):
    """The QuadEnvMario variant (rl_envs.py:446-459): horizon-1 reference
    observation (obs = 15 state features + one 9-dim ref row); reward and
    thresholds as in :func:`make_quad_rl`."""
    return make_quad_rl(dyn_params, prepared_bank, dt=dt, horizon=1,
                        **kwargs)


# ---------------------------------------------------------------------------
# wing
# ---------------------------------------------------------------------------


class WingRLState(NamedTuple):
    state: jnp.ndarray  # (12,)
    target: jnp.ndarray  # (3,)


def make_wing_rl(
    dyn_params, dt=0.05, thresh_div=4.0, thresh_stable=0.5,
    x_dist=50.0, x_std=5.0, horizon=10,
):
    obs_dim, act_dim = 12, 4
    mean = jnp.asarray(WING_MEAN)
    std = jnp.asarray(WING_STD)

    def _obs(s: WingRLState):
        normed, _, rel_ref, _ = wing_prepare_data(
            s.state[None], s.target[None], mean, std, dt=dt, horizon=horizon
        )
        return jnp.concatenate([rel_ref[0], normed[0]])

    def reset(key):
        yz = (jax.random.uniform(key, (2,)) - 0.5) * 2 * x_std
        target = jnp.concatenate([jnp.array([x_dist]), yz])
        state = jnp.zeros(12).at[3].set(11.5)
        s = WingRLState(state=state, target=target)
        return s, _obs(s)

    def step(s: WingRLState, action, key):
        new_state = wing_step(dyn_params, s.state, action, dt)
        on_line = project_to_line(jnp.zeros(3), s.target, new_state[:3])
        div = jnp.linalg.norm(on_line - new_state[:3])
        passed = new_state[0] > s.target[0]
        unstable = ~wing_is_stable(new_state, thresh_stable)
        done = passed | unstable | (div > thresh_div)
        reward = jnp.where(done, 0.0, thresh_div - div)
        nxt = WingRLState(state=new_state, target=s.target)
        fresh, _ = reset(key)
        nxt = jax.tree_util.tree_map(
            lambda a, b: jnp.where(done, a, b), fresh, nxt
        )
        return nxt, _obs(nxt), reward, done

    return reset, step, obs_dim, act_dim

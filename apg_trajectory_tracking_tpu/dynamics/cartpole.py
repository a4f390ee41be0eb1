"""Differentiable cart-pole dynamics (friction model).

JAX re-implementation of the physics in
``neural_control/dynamics/cartpole_dynamics.py:21-119`` of the reference:
an Euler-integrated friction cart-pole with an exact rotation update for the
pole angle (sin/cos angle composition + atan2, lines 113-119).

State layout: ``[x, x_dot, theta, theta_dot]`` (4,)
Action layout: ``[force]`` in [-1, 1]; the physical force is
``action * max_force_mag * 0.5`` (line 60).

All functions broadcast over arbitrary leading batch dimensions and are
pure — parameters travel in a :class:`CartpoleParams` pytree so they can be
made trainable (system identification / adaptation experiments).
"""

from typing import NamedTuple

import jax.numpy as jnp

GRAVITY = 9.81

# Default physical parameters; values match
# neural_control/dynamics/config_cartpole.json
DEFAULT_CARTPOLE_CFG = {
    "masscart": 1.0,
    "masspole": 0.1,
    "length": 0.5,
    "max_force_mag": 30.0,
    "muc": 0.0005,
    "mup": 0.000002,
    "wind": 0.0,
    "vel_drag": 0.0,
    "contact": 0.0,
    "delay": 0.0,
    # reference hard-codes friction = .5 after loading the json
    # (cartpole_dynamics.py:34)
    "friction": 0.5,
}


class CartpoleParams(NamedTuple):
    """Cart-pole physical parameters as a differentiable pytree."""

    masscart: jnp.ndarray
    masspole: jnp.ndarray
    length: jnp.ndarray
    max_force_mag: jnp.ndarray
    friction: jnp.ndarray
    wind: jnp.ndarray

    @property
    def total_mass(self):
        return self.masspole + self.masscart

    @property
    def polemass_length(self):
        return self.masspole * self.length


def cartpole_params(modified_params=None) -> CartpoleParams:
    """Build params from defaults, optionally overriding a subset.

    ``modified_params`` plays the role of the reference's dynamics-mismatch
    dict (cartpole_dynamics.py:23-33), e.g. ``{"wind": 0.5}`` for the
    adaptation experiment.
    """
    cfg = dict(DEFAULT_CARTPOLE_CFG)
    if modified_params:
        cfg.update(modified_params)
    f32 = lambda v: jnp.asarray(v, dtype=jnp.float32)
    return CartpoleParams(
        masscart=f32(cfg["masscart"]),
        masspole=f32(cfg["masspole"]),
        length=f32(cfg["length"]),
        max_force_mag=f32(cfg["max_force_mag"]),
        friction=f32(cfg["friction"]),
        wind=f32(cfg["wind"]),
    )


def cartpole_step(params: CartpoleParams, state, action, dt):
    """One Euler step of the cart-pole.

    Mirrors ``CartpoleDynamics.simulate_cartpole``
    (cartpole_dynamics.py:53-119) including:
      * force scaling ``action * max_force_mag * 0.5``;
      * the exact rotation update for theta (angle-addition + atan2);
      * wind entering as an additive term on the pole acceleration — in the
        reference wind only exists in the CasADi twin (line 272-274); here
        there is a single step function so wind acts whenever nonzero,
        matching the MPC twin's ``thetaacc + wind * cos(theta)``.

    Args:
        params: CartpoleParams pytree.
        state: (..., 4) array.
        action: (..., 1) array in [-1, 1].
        dt: python float timestep.
    Returns:
        (..., 4) next state.
    """
    x, x_dot, theta, theta_dot = (
        state[..., 0],
        state[..., 1],
        state[..., 2],
        state[..., 3],
    )
    force = action[..., 0] * params.max_force_mag * 0.5

    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    total_mass = params.total_mass
    pml = params.polemass_length

    # cart acceleration (cartpole_dynamics.py:86-97)
    x_acc = (
        -2.0 * pml * theta_dot**2 * sin_t
        + 3.0 * params.masspole * GRAVITY * sin_t * cos_t
        + 4.0 * force
        - 4.0 * params.friction * x_dot
    ) / (4.0 * total_mass - 3.0 * params.masspole * cos_t**2)

    # pole angular acceleration (cartpole_dynamics.py:99-111)
    theta_acc = (
        -3.0 * pml * theta_dot**2 * sin_t * cos_t
        + 6.0 * total_mass * GRAVITY * sin_t
        + 6.0 * (force - params.friction * x_dot) * cos_t
    ) / (4.0 * params.length * total_mass - 3.0 * pml * cos_t**2)
    theta_acc = theta_acc + params.wind * cos_t

    new_x = x + x_dot * dt
    new_x_dot = x_dot + x_acc * dt

    # exact rotation update (cartpole_dynamics.py:113-119)
    sin_d, cos_d = jnp.sin(theta_dot * dt), jnp.cos(theta_dot * dt)
    new_sin = sin_t * cos_d + cos_t * sin_d
    new_cos = cos_t * cos_d - sin_t * sin_d
    new_theta = jnp.arctan2(new_sin, new_cos)

    new_theta_dot = theta_dot + theta_acc * dt

    return jnp.stack([new_x, new_x_dot, new_theta, new_theta_dot], axis=-1)


def wrap_theta(state):
    """Wrap the pole angle into (-pi, pi].

    Mirrors the env-side wrapping at cartpole_env.py:77-81, expressed as a
    branch-free select so it can live inside jitted rollouts.
    """
    theta = state[..., 2]
    theta = jnp.where(theta > jnp.pi, theta - 2 * jnp.pi, theta)
    theta = jnp.where(theta <= -jnp.pi, theta + 2 * jnp.pi, theta)
    return state.at[..., 2].set(theta)

"""Longitudinal (2D) fixed-wing dynamics — 6 states, 2 actions.

JAX re-implementation of ``neural_control/dynamics/fixed_wing_2D.py:33-92``
(linearized coefficients at alpha=0, u=12 m/s; used by the reference's
``fixed_wing_2D`` MPC variant).

State: [x, h, u, w, theta, q]; action: [thrust, elevator] in [0, 1].
"""

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

ALPHA_BOUND_2D = float(5.0 / 180.0 * np.pi)

DEFAULT_WING2D_CFG = {
    "mass": 1.01,
    "I_xx": 0.04766,
    "rho": 1.225,
    "S": 0.276,
    "c": 0.185,
    "g": 9.81,
    "Cl0": 0.39, "Cl_alpha": 4.5321, "Cl_q": 0.318, "Cl_del_e": 0.527,
    "Cd0": 0.0765, "Cd_alpha": 0.3346, "Cd_q": 0.354, "Cd_del_e": 0.004,
    "Cm0": 0.02, "Cm_alpha": -1.4037, "Cm_q": -0.1324, "Cm_del_e": -0.4236,
}


class Wing2DParams(NamedTuple):
    values: jnp.ndarray  # ordered per DEFAULT_WING2D_CFG keys

    def get(self, key):
        return self.values[list(DEFAULT_WING2D_CFG).index(key)]


def wing2d_params(modified_params=None) -> Wing2DParams:
    cfg = dict(DEFAULT_WING2D_CFG)
    if modified_params:
        cfg.update(modified_params)
    return Wing2DParams(
        values=jnp.asarray([cfg[k] for k in DEFAULT_WING2D_CFG], jnp.float32)
    )


def wing2d_step(params: Wing2DParams, state, action, dt):
    """One Euler step (fixed_wing_2D.py:33-92). NOTE the reference
    integrates theta with q (the pitch rate state) — preserved."""
    g = params.get
    x, h = state[..., 0], state[..., 1]
    u, w = state[..., 2], state[..., 3]
    theta, q = state[..., 4], state[..., 5]

    T = action[..., 0] * 7.0
    del_e = jnp.pi * (action[..., 1] * 40.0 - 20.0) / 180.0

    V = jnp.sqrt(u**2 + w**2)
    alpha = jnp.clip(jnp.arctan(w / u), -ALPHA_BOUND_2D, ALPHA_BOUND_2D)
    half_c_V = g("c") / (2.0 * V)

    Cl = g("Cl0") + g("Cl_alpha") * alpha + g("Cl_q") * half_c_V * q \
        + g("Cl_del_e") * del_e
    Cd = g("Cd0") + g("Cd_alpha") * alpha + g("Cd_q") * half_c_V * q \
        + g("Cd_del_e") * del_e
    Cm = g("Cm0") + g("Cm_alpha") * alpha + g("Cm_q") * half_c_V * q \
        + g("Cm_del_e") * del_e

    qbarS = 0.5 * g("rho") * V**2 * g("S")
    L = qbarS * Cl
    D = qbarS * Cd
    M = qbarS * g("c") * Cm

    m = g("mass")
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    sin_a, cos_a = jnp.sin(alpha), jnp.cos(alpha)

    x_dot = u * cos_t + w * sin_t
    h_dot = u * sin_t - w * cos_t
    u_dot = -w * q + (1.0 / m) * (
        T + L * sin_a - D * cos_a - m * g("g") * sin_t
    )
    w_dot = u * q - (1.0 / m) * (
        L * cos_a + D * sin_a - m * g("g") * cos_t
    )
    q_dot = M / g("I_xx")

    state_dot = jnp.stack([x_dot, h_dot, u_dot, w_dot, q, q_dot], axis=-1)
    return state + dt * state_dot

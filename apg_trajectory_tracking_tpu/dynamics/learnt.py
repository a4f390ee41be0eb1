"""Learnt / adaptive dynamics: analytic step + trainable residual MLP.

Re-designs the reference's dynamics-adaptation machinery
(``neural_control/dynamics/learnt_dynamics.py``,
``quad_dynamics_trained.py``, ``fixed_wing_dynamics.py:270-326``,
``cartpole_dynamics.py:122-158``) as pure pytrees:

    f_hat(s, a) = step_fn(base_params, s, a, dt) + delta_theta(s, a)

where ``base_params`` are the (optionally trainable) physical parameters and
``delta_theta`` is a small MLP initialized at (near-)zero so training starts
from the analytic model (the reference's std=1e-4 / zero init,
learnt_dynamics.py:31-38, fixed_wing_dynamics.py:306-312).
"""

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from apg_trajectory_tracking_tpu.dynamics.cartpole import cartpole_params, cartpole_step
from apg_trajectory_tracking_tpu.dynamics.quad import quad_params, quad_step
from apg_trajectory_tracking_tpu.dynamics.fixed_wing import wing_params, wing_step


class ResidualParams(NamedTuple):
    """Two-layer residual MLP: (state ++ action) -> 64 -> state_delta.

    Mirrors ``LearntDynamics.state_transformer`` (learnt_dynamics.py:77-88):
    layer 1 has a bias, layer 2 does not, relu in between.
    """

    w1: jnp.ndarray
    b1: jnp.ndarray
    w2: jnp.ndarray


def init_residual_params(
    key, state_size, action_size, out_state_size=None, std=1e-4, hidden=64
) -> ResidualParams:
    """f_hat starts equal to the analytic model: the OUTPUT layer is
    near-zero (std), so delta ~ 0 at init.

    Deliberate deviation from the reference (learnt_dynamics.py:77-82,
    which draws BOTH layers at std=1e-4): with both layers near zero the
    fit starts in a vanishing-gradient saddle (dL/dw1 is proportional to
    w2 ~ 1e-4 and vice versa), making residual adaptation orders of
    magnitude slower than intended. Standard fan-in init on the hidden
    layer preserves the starts-at-analytic invariant while giving the
    output layer O(1) input features to learn from.
    """
    if out_state_size is None:
        out_state_size = state_size
    k1, k2, k3 = jax.random.split(key, 3)
    in_dim = state_size + action_size
    bound = 1.0 / jnp.sqrt(jnp.asarray(in_dim, jnp.float32))
    return ResidualParams(
        w1=jax.random.uniform(
            k1, (in_dim, hidden), minval=-bound, maxval=bound,
            dtype=jnp.float32,
        ),
        b1=jax.random.uniform(
            k2, (hidden,), minval=-bound, maxval=bound, dtype=jnp.float32
        ),
        w2=std * jax.random.normal(
            k3, (hidden, out_state_size), dtype=jnp.float32
        ),
    )


def residual_delta(params: ResidualParams, state, action):
    """delta_theta(s, a) = W2 relu(W1 [s; a] + b1)."""
    sa = jnp.concatenate([state, action], axis=-1)
    h = jax.nn.relu(sa @ params.w1 + params.b1)
    return h @ params.w2


def residual_l2(params: ResidualParams):
    """L2 regularizer on the residual weights.

    Mirrors the norm-sum regularization in ``train_dynamics_model``
    (train_base.py:170-177). Uses Frobenius norms (not squared), as the
    reference does with ``torch.norm``.
    """
    return (
        jnp.linalg.norm(params.w1)
        + jnp.linalg.norm(params.b1)
        + jnp.linalg.norm(params.w2)
    )


class LearntDynamics(NamedTuple):
    """Trainable dynamics pytree: base physical params + residual MLP.

    ``action_transform`` is the optional learned 4x4 action map
    (learnt_dynamics.py:21-24, applied at 48-50); ``None`` disables it.
    """

    base: Any
    residual: ResidualParams
    action_transform: Optional[jnp.ndarray] = None


def learnt_step(
    step_fn: Callable, ld: LearntDynamics, state, action, dt
):
    """f_hat(s,a) = analytic step + residual (learnt_dynamics.py:90-98)."""
    if ld.action_transform is not None:
        action = action @ ld.action_transform.T
    new_state = step_fn(ld.base, state, action, dt)
    return new_state + residual_delta(ld.residual, state, action)


def make_learnt_cartpole(key, modified_params=None, std=1e-4):
    """Learnt cartpole (cartpole_dynamics.py:122-140)."""
    ld = LearntDynamics(
        base=cartpole_params(modified_params),
        residual=init_residual_params(key, 4, 1, std=std),
    )
    step = lambda p, s, a, dt: learnt_step(cartpole_step, p, s, a, dt)
    return ld, step


def make_learnt_quad(key, modified_params=None, std=1e-4, action_transform=False):
    """Learnt quad: trainable mass/inertia/kinv + residual
    (quad_dynamics_trained.py:10-69)."""
    at = jnp.eye(4, dtype=jnp.float32) if action_transform else None
    ld = LearntDynamics(
        base=quad_params(modified_params),
        residual=init_residual_params(key, 12, 4, std=std),
        action_transform=at,
    )
    step = lambda p, s, a, dt: learnt_step(quad_step, p, s, a, dt)
    return ld, step


def make_learnt_wing(key, modified_params=None, std=0.0):
    """Learnt wing: trainable inertia + aero coeffs + zero-init residual
    (fixed_wing_dynamics.py:270-326)."""
    ld = LearntDynamics(
        base=wing_params(modified_params),
        residual=init_residual_params(key, 12, 4, std=std),
    )
    step = lambda p, s, a, dt: learnt_step(wing_step, p, s, a, dt)
    return ld, step

"""Nonlinear MPC baseline, solved in-graph on the accelerator.

Re-designs ``neural_control/controllers/mpc.py``: the reference builds a
CasADi multiple-shooting NLP with per-step dynamics equality constraints and
solves it with IPOPT on the CPU each control step (mpc.py:151-338). Here the
same optimal-control problem — identical per-step quadratic costs
(``_initParams*``, lines 65-149: Q_pen state tracking for steps 0..N-2,
Q_goal = 0 on the final state, Q_u action regularization toward the default
action) and identical box bounds — is solved by direct single shooting
through the *same* JAX dynamics used for training (no CasADi twin: one
source of truth), with the action sequence reparameterized through a sigmoid
to enforce bounds and optimized by in-graph Adam. The whole solve is one
jitted program; warm starts shift the previous solution (mpc.py:336-338);
``vmap`` gives batched MPC over many environments — the reference's
``F.map(N, 'openmp')`` parallelism (mpc.py:173) becomes XLA vectorization.
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from apg_trajectory_tracking_tpu.dynamics.cartpole import (
    cartpole_params,
    cartpole_step,
)
from apg_trajectory_tracking_tpu.dynamics.quad import (
    quad_params,
    quad_step,
    quad_step_simple,
    quad_step_high,
)
from apg_trajectory_tracking_tpu.dynamics.fixed_wing import (
    wing_params,
    wing_step,
)
from apg_trajectory_tracking_tpu.dynamics.fixed_wing_2d import (
    wing2d_params,
    wing2d_step,
)


class MPCSpec(NamedTuple):
    """Per-system cost spec (mpc.py:65-149)."""

    q_pen: jnp.ndarray  # (s,) per-step state tracking weights
    q_u: jnp.ndarray  # (u,) action regularization weights
    u_default: jnp.ndarray  # (u,)
    u_min: jnp.ndarray  # (u,)
    u_max: jnp.ndarray  # (u,)


_SPECS = {
    # _initParamsSimpleQuad (mpc.py:102-117) — used for both quad models
    "flightmare": MPCSpec(
        q_pen=jnp.asarray(
            [100, 100, 100, 0, 0, 0, 10, 10, 10, 1, 1, 1], jnp.float32
        ),
        q_u=jnp.asarray([50, 1, 1, 1], jnp.float32),
        u_default=jnp.asarray([0.5, 0.5, 0.5, 0.5], jnp.float32),
        u_min=jnp.zeros(4, jnp.float32),
        u_max=jnp.ones(4, jnp.float32),
    ),
    # _initParamsCartpole (mpc.py:87-100)
    "cartpole": MPCSpec(
        q_pen=jnp.asarray([0, 3, 10, 1], jnp.float32),
        q_u=jnp.asarray([0.0], jnp.float32),
        u_default=jnp.asarray([0.0], jnp.float32),
        u_min=-jnp.ones(1, jnp.float32),
        u_max=jnp.ones(1, jnp.float32),
    ),
    # _initParamsFixedWing_3D (mpc.py:135-149)
    "fixed_wing_3D": MPCSpec(
        q_pen=jnp.asarray(
            [1000, 1000, 1000, 0, 0, 0, 0, 0, 0, 0, 0, 0], jnp.float32
        ),
        q_u=jnp.asarray([0, 10, 10, 10], jnp.float32),
        u_default=jnp.asarray([0.25, 0.5, 0.5, 0.5], jnp.float32),
        u_min=jnp.zeros(4, jnp.float32),
        u_max=jnp.ones(4, jnp.float32),
    ),
    # _initParamsHighMPC (mpc.py:65-85): 10-state quaternion point-mass;
    # action = [collective thrust 2..20 m/s^2, body rates +-6 rad/s]
    "high_mpc": MPCSpec(
        q_pen=jnp.asarray(
            [0, 100, 100, 0, 0, 0, 0, 0, 10, 10], jnp.float32
        ),
        q_u=jnp.asarray([0.1, 0.1, 0.1, 0.1], jnp.float32),
        u_default=jnp.asarray([9.81, 0.0, 0.0, 0.0], jnp.float32),
        u_min=jnp.asarray([2.0, -6.0, -6.0, -6.0], jnp.float32),
        u_max=jnp.asarray([20.0, 6.0, 6.0, 6.0], jnp.float32),
    ),
    # _initParamsFixedWing_2D (mpc.py:119-133)
    "fixed_wing_2D": MPCSpec(
        q_pen=jnp.asarray([1000, 1000, 0, 0, 0, 0], jnp.float32),
        q_u=jnp.asarray([0, 10], jnp.float32),
        u_default=jnp.asarray([0.25, 0.5], jnp.float32),
        u_min=jnp.zeros(2, jnp.float32),
        u_max=jnp.ones(2, jnp.float32),
    ),
}

_STEPS = {
    "flightmare": (quad_step, quad_params),
    "simple_quad": (quad_step_simple, quad_params),
    "high_mpc": (quad_step_high, quad_params),
    "cartpole": (cartpole_step, cartpole_params),
    "fixed_wing_3D": (wing_step, wing_params),
    "fixed_wing_2D": (wing2d_step, wing2d_params),
}

_LOGIT_CLIP = 8.0


def _make_solver(dyn_step, spec: MPCSpec, horizon, dt, n_iters, lr):
    """Build the jitted shooting solve.

    cost(z) = sum_{k<N-1} (x_{k+1} - ref_k)^T Q (x_{k+1} - ref_k)
            + sum_k (u_k - u_def)^T R (u_k - u_def)
    with u = sigmoid(z) scaled into the box (the final-state tracking term
    uses the reference's Q_goal = 0, mpc.py:61).
    """
    span = spec.u_max - spec.u_min
    state_mask = jnp.ones(horizon).at[horizon - 1].set(0.0)

    def cost_fn(z, dyn_params, x0, ref):
        u = spec.u_min + span * jax.nn.sigmoid(z)

        def body(x, inp):
            u_k, ref_k, mask_k = inp
            x1 = dyn_step(dyn_params, x, u_k, dt)
            c_state = mask_k * jnp.sum(spec.q_pen * (x1 - ref_k) ** 2)
            c_u = jnp.sum(spec.q_u * (u_k - spec.u_default) ** 2)
            return x1, c_state + c_u

        _, costs = jax.lax.scan(body, x0, (u, ref, state_mask))
        return jnp.sum(costs)

    opt = optax.adam(lr)

    @jax.jit
    def solve(dyn_params, x0, ref, z_init):
        def opt_body(carry, _):
            z, opt_state = carry
            loss, g = jax.value_and_grad(cost_fn)(z, dyn_params, x0, ref)
            updates, opt_state = opt.update(g, opt_state)
            z = optax.apply_updates(z, updates)
            z = jnp.clip(z, -_LOGIT_CLIP, _LOGIT_CLIP)
            return (z, opt_state), loss

        (z, _), losses = jax.lax.scan(
            opt_body, (z_init, opt.init(z_init)), None, length=n_iters
        )
        u = spec.u_min + span * jax.nn.sigmoid(z)
        return u, z, losses[-1]

    return solve


class MPC:
    """Receding-horizon controller with the reference's
    ``predict_actions(state, reference)`` interface (mpc.py:439-449).

    Args mirror the reference: ``dynamics`` in {flightmare, simple_quad,
    cartpole, fixed_wing_3D, fixed_wing_2D}; horizon; dt. ``n_iters``/``lr``
    control the in-graph Adam solve (50 warm-started iterations track the
    IPOPT solution closely on these problems).
    """

    def __init__(
        self,
        horizon=10,
        dt=0.1,
        dynamics="flightmare",
        modified_params=None,
        n_iters=None,
        lr=0.1,
        solver="adam",
        q_pen=None,
        **_unused,
    ):
        if dynamics not in _STEPS:
            raise ValueError(f"unknown dynamics model {dynamics}")
        self.dynamics_model = dynamics
        self.horizon = horizon
        self.dt = dt
        step_fn, params_fn = _STEPS[dynamics]
        self.dyn_params = params_fn(modified_params or {})
        spec_key = "flightmare" if dynamics == "simple_quad" else dynamics
        self.spec = _SPECS[spec_key]
        if q_pen is not None:
            # custom tracking weights (e.g. re-purposing the high_mpc
            # model, whose reference spec only weights the y/z channels)
            self.spec = self.spec._replace(
                q_pen=jnp.asarray(q_pen, jnp.float32)
            )
        if solver == "ilqr":
            from apg_trajectory_tracking_tpu.controllers.ilqr import (
                make_ilqr_solver,
            )

            # Gauss-Newton needs far fewer iterations than first-order
            # shooting, hence the lower default
            self._solve = make_ilqr_solver(
                step_fn, self.spec, horizon, dt,
                n_iters=n_iters if n_iters is not None else 10,
            )
        elif solver == "adam":
            self._solve = _make_solver(
                step_fn, self.spec, horizon, dt,
                n_iters if n_iters is not None else 50, lr,
            )
        else:
            raise ValueError(f"unknown solver {solver}")
        self.u_dim = int(self.spec.u_default.shape[0])
        self.s_dim = int(self.spec.q_pen.shape[0])
        self.reset()

    def reset(self):
        """Reset the warm start (the reference re-inits the NLP per episode,
        evaluate_fixed_wing.py:139-140)."""
        self._z = jnp.zeros((self.horizon, self.u_dim), jnp.float32)

    # -- reference construction (mpc.py:349-437) ----------------------------

    def _ref_quad(self, state, ref_states):
        """pos/vel (and att slots) from the (horizon, >=9) reference rows."""
        ref = np.zeros((self.horizon, 12), dtype=np.float32)
        ref_states = np.asarray(ref_states)
        ref[:, :3] = ref_states[: self.horizon, :3]
        ref[:, 3:6] = ref_states[: self.horizon, 3:6]
        ref[:, 6:9] = ref_states[: self.horizon, 6:9]
        return ref

    def _ref_high(self, state, ref_states):
        """Quaternion-model reference rows [pos, 0-quat, vel]: the reference
        zeroes the quaternion slots of every reference row (mpc.py:307-315)
        and its Q_pen never weights them."""
        ref = np.zeros((self.horizon, 10), dtype=np.float32)
        ref_states = np.asarray(ref_states)
        ref[:, :3] = ref_states[: self.horizon, :3]
        ref[:, 7:10] = ref_states[: self.horizon, 6:9]
        return ref

    @staticmethod
    def _euler_state_to_quat(state):
        """12-dim euler state -> 10-dim [pos, quat wxyz, vel]."""
        from apg_trajectory_tracking_tpu.trajectory.quaternions import (
            euler_to_quaternion,
        )

        q = euler_to_quaternion(state[3], state[4], state[5])
        return np.concatenate(
            [state[:3], np.asarray(q, dtype=np.float32), state[6:9]]
        ).astype(np.float32)

    def _ref_wing(self, state, target):
        """Linear ramp toward the target at the current speed
        (preprocess_fixed_wing, mpc.py:415-437). For the 2D longitudinal
        model the position is [x, h] and velocity [u, w] (the reference
        reuses the 3D slicing there, which misreads the 6-dim state — we use
        the intended layout)."""
        target = np.asarray(target, dtype=np.float32).reshape(-1)
        pos_dim = 3 if self.s_dim >= 12 else 2
        pos = state[:pos_dim]
        vel = state[3:6] if pos_dim == 3 else state[2:4]
        vec = target[:pos_dim] - pos
        speed = float(np.linalg.norm(vel))
        step_vec = vec * (speed * self.dt / max(np.linalg.norm(vec), 1e-6))
        ref = np.zeros((self.horizon, self.s_dim), dtype=np.float32)
        steps = np.arange(1, self.horizon + 1, dtype=np.float32)[:, None]
        ref[:, :pos_dim] = pos + steps * step_vec
        return ref

    def _ref_cartpole(self, state):
        """Linear interpolation of the state to zero
        (preprocess_cartpole, mpc.py:439... lines 449-470)."""
        alphas = np.linspace(1.0, 0.0, self.horizon + 2)[1:-1]
        return (state[None, :4] * alphas[:, None]).astype(np.float32)

    def predict_actions(self, current_state, ref_states=None):
        """Solve the OCP from the current state; returns (horizon, u)
        actions (caller uses row 0, as the reference does)."""
        state = np.asarray(current_state, dtype=np.float32).reshape(-1)
        if self.dynamics_model == "high_mpc":
            if state.shape[0] == 12:  # euler-state input from the quad env
                state = self._euler_state_to_quat(state)
            ref = self._ref_high(state, ref_states)
        elif self.dynamics_model in ("flightmare", "simple_quad"):
            ref = self._ref_quad(state, ref_states)
        elif self.dynamics_model in ("fixed_wing_3D", "fixed_wing_2D"):
            ref = self._ref_wing(state, ref_states)
        else:
            ref = self._ref_cartpole(state)

        u, z, _ = self._solve(
            self.dyn_params, jnp.asarray(state), jnp.asarray(ref), self._z
        )
        # warm start: shift the solution one step (mpc.py:336-338)
        self._z = jnp.concatenate([z[1:], z[-1:]], axis=0)
        return np.asarray(u)

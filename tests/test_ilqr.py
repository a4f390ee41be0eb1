"""iLQR solver: converges on the same OCPs as the shooting solver, in far
fewer iterations, with all iterates inside the control box."""

import numpy as np
import jax.numpy as jnp
import pytest

from apg_trajectory_tracking_tpu.controllers.mpc import MPC, _SPECS
from apg_trajectory_tracking_tpu.dynamics.quad import quad_params, quad_step
from apg_trajectory_tracking_tpu.dynamics.cartpole import (
    cartpole_params,
    cartpole_step,
)


def _hover_ref(horizon=10):
    ref = np.zeros((horizon, 12), dtype=np.float32)
    ref[:, 2] = 1.0
    return ref


def test_ilqr_beats_or_matches_shooting_quad():
    from apg_trajectory_tracking_tpu.controllers.ilqr import make_ilqr_solver
    from apg_trajectory_tracking_tpu.controllers.mpc import _make_solver

    spec = _SPECS["flightmare"]
    dyn = quad_params()
    x0 = jnp.zeros(12).at[2].set(0.8)  # below the hover ref
    ref = jnp.asarray(_hover_ref())
    z0 = jnp.zeros((10, 4))

    ilqr = make_ilqr_solver(quad_step, spec, 10, 0.1, n_iters=10)
    adam = _make_solver(quad_step, spec, 10, 0.1, n_iters=50, lr=0.1)

    u_i, _, cost_i = ilqr(dyn, x0, ref, z0)
    u_a, _, cost_a = adam(dyn, x0, ref, z0)
    assert np.isfinite(float(cost_i))
    # 10 Gauss-Newton iters should at least match 50 Adam iters
    assert float(cost_i) <= float(cost_a) * 1.05, (cost_i, cost_a)
    # box constraints hold
    assert np.all(np.asarray(u_i) >= np.asarray(spec.u_min) - 1e-6)
    assert np.all(np.asarray(u_i) <= np.asarray(spec.u_max) + 1e-6)


@pytest.mark.parametrize("dynamics", ["flightmare", "cartpole"])
def test_ilqr_mpc_closed_loop(dynamics):
    if dynamics == "flightmare":
        ctrl = MPC(horizon=10, dt=0.1, dynamics=dynamics, solver="ilqr")
        dyn = quad_params()
        state = np.zeros(12, dtype=np.float32)
        ref = np.zeros((10, 9), dtype=np.float32)
        ref[:, 2] = 0.0  # hover at origin
        for _ in range(20):
            u = ctrl.predict_actions(state, ref)
            state = np.asarray(
                quad_step(dyn, jnp.asarray(state[None]),
                          jnp.asarray(u[:1]), 0.1)
            )[0]
        assert np.linalg.norm(state[:3]) < 0.1, state[:3]
    else:
        ctrl = MPC(horizon=10, dt=0.05, dynamics=dynamics, solver="ilqr")
        dyn = cartpole_params()
        state = np.asarray([0.1, 0.0, 0.12, 0.0], dtype=np.float32)
        for _ in range(100):
            u = ctrl.predict_actions(state)
            state = np.asarray(
                cartpole_step(dyn, jnp.asarray(state[None]),
                              jnp.asarray(u[:1]), 0.05)
            )[0]
        assert abs(state[2]) < 0.1, state  # pole upright


def test_batched_mpc_solvers_vmap():
    """Both solvers vmap over environments (the reference's IPOPT cannot):
    batched solve == per-env solve."""
    import jax
    from apg_trajectory_tracking_tpu.controllers.ilqr import make_ilqr_solver

    spec = _SPECS["flightmare"]
    dyn = quad_params()
    solve = make_ilqr_solver(quad_step, spec, 10, 0.1, n_iters=4)
    rng = np.random.RandomState(0)
    B = 4
    x0 = jnp.asarray(rng.randn(B, 12).astype(np.float32) * 0.2)
    ref = jnp.zeros((B, 10, 12), jnp.float32)
    z0 = jnp.zeros((B, 10, 4), jnp.float32)
    batched = jax.jit(jax.vmap(solve, in_axes=(None, 0, 0, 0)))
    u_b, _, c_b = batched(dyn, x0, ref, z0)
    for i in range(B):
        u_i, _, c_i = solve(dyn, x0[i], ref[i], z0[i])
        np.testing.assert_allclose(
            np.asarray(u_b[i]), np.asarray(u_i), atol=2e-5
        )


def test_lqr_gains_stabilize_upright():
    """lqr_gains: the closed-loop linearization A - B K is Schur stable
    and P is positive definite (it is the infinite-horizon cost-to-go)."""
    import jax
    from apg_trajectory_tracking_tpu.controllers.ilqr import lqr_gains

    dyn = cartpole_params()
    K, P = lqr_gains(
        cartpole_step, dyn, 0.05, (0.01, 0.05, 10.0, 0.5), (0.01,), 4, 1
    )
    f = lambda s, u: cartpole_step(dyn, s[None], u[None], 0.05)[0]
    A = np.asarray(jax.jacfwd(lambda s: f(s, jnp.zeros(1)))(jnp.zeros(4)))
    B = np.asarray(jax.jacfwd(lambda u: f(jnp.zeros(4), u))(jnp.zeros(1)))
    eig = np.linalg.eigvals(A - B @ np.asarray(K))
    assert np.max(np.abs(eig)) < 1.0, eig
    assert np.all(np.linalg.eigvalsh(np.asarray(P)) > 0.0)


def test_ilqr_swingup_solves_protocol():
    """The two-start warm iLQR solves the swing-up protocol the shooting
    MPC cannot (DESIGN.md §4): 100% success from hanging starts, quiet
    post-swing balance."""
    import jax
    from apg_trajectory_tracking_tpu.controllers.ilqr import (
        make_cartpole_swingup_ilqr,
    )
    from apg_trajectory_tracking_tpu.evaluation.cartpole_eval import (
        swingup_metrics,
    )

    dyn = cartpole_params()
    apply_fn, init_carry = make_cartpole_swingup_ilqr(dyn)
    m = swingup_metrics(
        None, dyn, jax.random.PRNGKey(3), nr_iters=4,
        net_apply=apply_fn, horizon=60, init_carry=init_carry,
    )
    assert m["success_rate"] == 1.0, m
    assert m["mean_final_angle"] < 0.1, m
    assert m["mean_vel"] < 1.0, m


def test_cem_swingup_solves_protocol():
    """The sampling solver family (controllers/cem.py) also solves
    swing-up: same cost family + two-start structure as the iLQR, no
    derivatives."""
    import jax
    from apg_trajectory_tracking_tpu.controllers.cem import (
        make_cartpole_swingup_cem,
    )
    from apg_trajectory_tracking_tpu.evaluation.cartpole_eval import (
        swingup_metrics,
    )

    dyn = cartpole_params()
    apply_fn, init_carry = make_cartpole_swingup_cem(
        dyn, n_samples=200, n_elites=20
    )
    m = swingup_metrics(
        None, dyn, jax.random.PRNGKey(5), nr_iters=4,
        net_apply=apply_fn, horizon=60, init_carry=init_carry,
    )
    assert m["success_rate"] == 1.0, m
    assert m["mean_final_angle"] < 0.1, m

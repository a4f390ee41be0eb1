"""Golden-value and property tests for the JAX dynamics.

The strongest check: run the reference torch implementation (with a stubbed
casadi) on random batched states and require the JAX step to match to
float32 precision. Plus golden vectors from the reference __main__ blocks
and structural property tests.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from apg_trajectory_tracking_tpu.dynamics import (
    cartpole_params,
    cartpole_step,
    quad_params,
    quad_step,
    quad_step_simple,
    wing_params,
    wing_step,
)
from apg_trajectory_tracking_tpu.dynamics.learnt import (
    make_learnt_cartpole,
    make_learnt_quad,
    make_learnt_wing,
)
from apg_trajectory_tracking_tpu.ops.rotations import world_to_body_matrix

from tests.reference_oracle import load_reference_dynamics

RNG = np.random.RandomState(0)


def _rand_quad_states(n):
    s = RNG.randn(n, 12).astype(np.float32)
    s[:, 3:6] *= 0.5  # keep attitudes reasonable
    return s


# ---------------------------------------------------------------------------
# parity vs the reference torch implementation
# ---------------------------------------------------------------------------


def test_quad_flightmare_matches_reference():
    torch = __import__("pytest").importorskip("torch")

    ref = load_reference_dynamics()
    dyn = ref.quad.FlightmareDynamics()
    states = _rand_quad_states(64)
    actions = RNG.rand(64, 4).astype(np.float32)
    for dt in (0.05, 0.1):
        expected = dyn.simulate_quadrotor(
            torch.from_numpy(actions), torch.from_numpy(states), dt
        ).numpy()
        got = np.asarray(quad_step(quad_params(), states, actions, dt))
        np.testing.assert_allclose(got, expected, rtol=2e-5, atol=2e-6)


def test_quad_flightmare_golden_vector():
    """State/action from quad_dynamics_flightmare.py:325-336 __main__."""
    torch = __import__("pytest").importorskip("torch")

    ref = load_reference_dynamics()
    state = np.array(
        [
            -0.203302, -8.12219, 0.484883, -0.15613, -0.446313, 0.25728,
            -4.70952, 0.627684, -2.506545, -0.039999, -0.200001, 0.1,
        ],
        dtype=np.float32,
    )[None]
    action = np.array([[0.45, 0.46, 0.3, 0.6]], dtype=np.float32)
    expected = (
        ref.quad.FlightmareDynamics()
        .simulate_quadrotor(torch.from_numpy(action), torch.from_numpy(state), 0.05)
        .numpy()
    )
    got = np.asarray(quad_step(quad_params(), state, action, 0.05))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_quad_simple_float64_oracle():
    """The reference's torch SimpleDynamics is broken (undefined
    ``thrust_factor``, quad_dynamics_simple.py:19); its CasADi twin
    (drone_dynamics_simple, lines 109-196) defines the intended math, which
    we verify here against an independent float64 computation."""
    states = _rand_quad_states(16).astype(np.float64)
    actions = RNG.rand(16, 4)
    dt = 0.05
    mass = 0.723
    inertia = mass / 12.0 * 0.31**2 * np.array([4.5, 4.5, 7.0])
    kinv = np.array([16.6, 16.6, 5.0])

    pos, att, vel, av = (
        states[:, :3], states[:, 3:6], states[:, 6:9], states[:, 9:12]
    )
    thrust = actions[:, 0] * 15 - 7.5 + 9.81
    rates = actions[:, 1:] - 0.5
    Cr, Sr = np.cos(att[:, 0]), np.sin(att[:, 0])
    Cp, Sp = np.cos(att[:, 1]), np.sin(att[:, 1])
    Cy, Sy = np.cos(att[:, 2]), np.sin(att[:, 2])
    acc = np.stack(
        [
            (Cy * Sp * Cr + Sr * Sy) * thrust / mass,
            (Cr * Sy * Sp - Cy * Sr) * thrust / mass,
            (Cr * Cp) * thrust / mass - 9.81,
        ],
        axis=1,
    )
    torques = inertia * (kinv * (rates - av)) + np.cross(av, inertia * av)
    ang_acc = torques / inertia
    new_pos = pos + 0.5 * dt * dt * acc + 0.5 * dt * vel
    new_vel = vel + dt * acc
    new_av = av + dt * ang_acc
    # euler rate with NEW angular velocity (matches the casadi twin)
    er = np.stack(
        [
            new_av[:, 0] - Sp * new_av[:, 2],
            Cr * new_av[:, 1] + Cp * Sr * new_av[:, 2],
            -Sr * new_av[:, 1] + Cp * Cr * new_av[:, 2],
        ],
        axis=1,
    )
    new_att = att + dt * er
    expected = np.concatenate([new_pos, new_att, new_vel, new_av], axis=1)

    got = np.asarray(
        quad_step_simple(
            quad_params(),
            states.astype(np.float32),
            actions.astype(np.float32),
            dt,
        )
    )
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_cartpole_matches_reference():
    torch = __import__("pytest").importorskip("torch")

    ref = load_reference_dynamics()
    dyn = ref.cartpole.CartpoleDynamics()
    states = (RNG.randn(64, 4) * np.array([1.0, 2.0, 1.5, 2.0])).astype(
        np.float32
    )
    actions = (RNG.rand(64, 1) * 2 - 1).astype(np.float32)
    for dt in (0.02, 0.05):
        expected = dyn.simulate_cartpole(
            torch.from_numpy(states), torch.from_numpy(actions), dt
        ).numpy()
        got = np.asarray(cartpole_step(cartpole_params(), states, actions, dt))
        np.testing.assert_allclose(got, expected, rtol=2e-5, atol=2e-6)


def test_cartpole_golden_vector():
    """State/action from cartpole_dynamics.py:281-291 __main__."""
    torch = __import__("pytest").importorskip("torch")

    ref = load_reference_dynamics()
    state = np.array([[0.5, 1.3, 0.1, 0.4]], dtype=np.float32)
    action = np.array([[0.4]], dtype=np.float32)
    expected = (
        ref.cartpole.CartpoleDynamics()
        .simulate_cartpole(torch.from_numpy(state), torch.from_numpy(action), 0.02)
        .numpy()
    )
    got = np.asarray(cartpole_step(cartpole_params(), state, action, 0.02))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-7)


def test_wing_matches_reference():
    torch = __import__("pytest").importorskip("torch")

    ref = load_reference_dynamics()
    dyn = ref.wing.FixedWingDynamics()
    # states around level flight at ~11.5 m/s
    states = np.zeros((32, 12), dtype=np.float32)
    states[:, 3] = 11.5 + RNG.randn(32)
    states[:, 4:6] = RNG.randn(32, 2) * 0.5
    states[:, 6:9] = RNG.randn(32, 3) * 0.2
    states[:, 9:12] = RNG.randn(32, 3) * 0.3
    actions = RNG.rand(32, 4).astype(np.float32)
    expected = dyn.simulate_fixed_wing(
        torch.from_numpy(states), torch.from_numpy(actions), 0.05
    ).numpy()
    got = np.asarray(wing_step(wing_params(), states, actions, 0.05))
    np.testing.assert_allclose(got, expected, rtol=3e-5, atol=3e-6)


def test_wing_golden_vector():
    """State/action from fixed_wing_dynamics.py:497-512 __main__."""
    torch = __import__("pytest").importorskip("torch")

    ref = load_reference_dynamics()
    state = np.array(
        [
            0.6933, -0.8747, 0.9757, -0.8422, 0.5494, -1.1936, 0.0368,
            0.8417, -0.9412, -1.4291, 0.4538, -0.5257,
        ],
        dtype=np.float32,
    )[None]
    action = np.array([[-0.5518, -2.9553, 0.0311, -0.6691]], dtype=np.float32)
    expected = (
        ref.wing.FixedWingDynamics()
        .simulate_fixed_wing(torch.from_numpy(state), torch.from_numpy(action), 0.05)
        .numpy()
    )
    got = np.asarray(wing_step(wing_params(), state, action, 0.05))
    np.testing.assert_allclose(got, expected, rtol=2e-5, atol=2e-6)


def test_modified_params_mismatch():
    """Dynamics mismatch scenarios change the step output.

    Note: in the Flightmare model mass and inertia cancel exactly
    (force = m*thrust then acc = force/m; J^-1(J Kinv dw) = Kinv dw), a
    quirk of the reference (quad_dynamics_flightmare.py:101,84 — see the
    'why not using mass????' comment in its CasADi twin at line 269). So we
    perturb parameters that do enter: kinv and translational drag.
    """
    state = _rand_quad_states(4)
    action = RNG.rand(4, 4).astype(np.float32)
    nominal = np.asarray(quad_step(quad_params(), state, action, 0.1))
    modified = np.asarray(
        quad_step(
            quad_params({"kinv_ang_vel_tau": [21.0, 21.0, 3.0]}),
            state, action, 0.1,
        )
    )
    assert not np.allclose(nominal, modified)
    dragged = np.asarray(
        quad_step(
            quad_params({"translational_drag": [0.7, 0.7, 0.7]}),
            state, action, 0.1,
        )
    )
    assert not np.allclose(nominal, dragged)
    # mass cancels — document the quirk
    heavy = np.asarray(quad_step(quad_params({"mass": 1.0}), state, action, 0.1))
    np.testing.assert_allclose(nominal, heavy, atol=1e-6)


# ---------------------------------------------------------------------------
# property tests
# ---------------------------------------------------------------------------


def test_rotation_orthonormal():
    att = jnp.asarray(RNG.randn(16, 3).astype(np.float32))
    R = world_to_body_matrix(att)
    eye = jnp.eye(3)
    prod = jnp.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(np.asarray(prod), np.tile(eye, (16, 1, 1)), atol=1e-5)
    det = jnp.linalg.det(R)
    np.testing.assert_allclose(np.asarray(det), np.ones(16), atol=1e-5)


def test_vmap_matches_loop():
    """Batched step == per-sample step (vmap consistency)."""
    params = quad_params()
    states = _rand_quad_states(8)
    actions = RNG.rand(8, 4).astype(np.float32)
    batched = np.asarray(quad_step(params, states, actions, 0.1))
    single = np.stack(
        [
            np.asarray(quad_step(params, states[i], actions[i], 0.1))
            for i in range(8)
        ]
    )
    np.testing.assert_allclose(batched, single, rtol=1e-6)


def test_quad_hover_equilibrium():
    """Hover thrust (a0 = 0.5 -> 9.81) with zero attitude holds altitude."""
    params = quad_params()
    state = np.zeros((1, 12), dtype=np.float32)
    state[0, 2] = 2.0
    action = np.full((1, 4), 0.5, dtype=np.float32)
    nxt = state
    for _ in range(20):
        nxt = quad_step(params, nxt, action, 0.05)
    np.testing.assert_allclose(np.asarray(nxt)[0, :3], [0, 0, 2.0], atol=1e-4)


def test_jit_and_grad():
    """The step is jit-able and BPTT gradients are finite."""
    params = quad_params()

    def loss(action):
        s = jnp.zeros((1, 12)).at[0, 2].set(2.0)
        for _ in range(5):
            s = quad_step(params, s, action, 0.1)
        return jnp.sum(s[:, :3] ** 2)

    g = jax.jit(jax.grad(loss))(jnp.full((1, 4), 0.5))
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.any(np.asarray(g) != 0)


def test_learnt_dynamics_start_at_analytic():
    """Near-zero residual init => learnt step ~= analytic step."""
    key = jax.random.PRNGKey(0)
    state = _rand_quad_states(4)
    action = RNG.rand(4, 4).astype(np.float32)

    ld, step = make_learnt_quad(key, std=0.0)
    got = np.asarray(step(ld, state, action, 0.1))
    expected = np.asarray(quad_step(quad_params(), state, action, 0.1))
    np.testing.assert_allclose(got, expected, atol=1e-7)

    ld_c, step_c = make_learnt_cartpole(key, std=0.0)
    s4 = RNG.randn(4, 4).astype(np.float32)
    a1 = RNG.rand(4, 1).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(step_c(ld_c, s4, a1, 0.05)),
        np.asarray(cartpole_step(cartpole_params(), s4, a1, 0.05)),
        atol=1e-7,
    )

    ld_w, step_w = make_learnt_wing(key)
    sw = np.zeros((2, 12), dtype=np.float32)
    sw[:, 3] = 11.5
    aw = RNG.rand(2, 4).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(step_w(ld_w, sw, aw, 0.05)),
        np.asarray(wing_step(wing_params(), sw, aw, 0.05)),
        atol=1e-7,
    )


def test_quad_step_fast_matches_quad_step():
    """quad_step_fast (the pre-combined throughput path, DESIGN.md 2) is
    the same model as quad_step up to float roundoff: the J and mass
    multiply-then-divide chains cancel exactly in real arithmetic, so the
    two steps must agree to ~1 ulp per step — including under gradients
    and with non-zero drag (where the folded rot_drag/J term differs
    bitwise)."""
    import jax
    import jax.numpy as jnp

    from apg_trajectory_tracking_tpu.dynamics.quad import (
        quad_params,
        quad_step,
        quad_step_fast,
    )

    rng = np.random.RandomState(5)
    state = rng.randn(64, 12).astype(np.float32) * 0.4
    action = rng.rand(64, 4).astype(np.float32)
    for mods in ({}, {"translational_drag": [0.1, 0.2, 0.3],
                      "rotational_drag": [0.05, 0.02, 0.01]}):
        p = quad_params(mods)
        a = np.asarray(quad_step(p, state, action, 0.1))
        b = np.asarray(quad_step_fast(p, state, action, 0.1))
        np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-5)

    # gradient parity through a 10-step unroll (the BPTT path)
    def rollout_sum(step_fn, s0, acts):
        p = quad_params()

        def body(s, a):
            nxt = step_fn(p, s, a, 0.1)
            return nxt, nxt

        _, inter = jax.lax.scan(body, s0, acts)
        return jnp.sum(inter ** 2)

    acts = jnp.asarray(rng.rand(10, 8, 4).astype(np.float32))
    s0 = jnp.asarray(rng.randn(8, 12).astype(np.float32) * 0.2)
    g_a = jax.grad(lambda a: rollout_sum(quad_step, s0, a))(acts)
    g_b = jax.grad(lambda a: rollout_sum(quad_step_fast, s0, a))(acts)
    np.testing.assert_allclose(
        np.asarray(g_a), np.asarray(g_b), atol=1e-3, rtol=1e-4
    )


def test_quad_mass_arm_inertia_cancel():
    """The Flightmare model's rate-controlled torque math cancels mass,
    arm length, and frame inertia exactly (reference quirk preserved —
    quad_dynamics_flightmare.py computes thrust/mass with thrust ∝ mass
    and J ω̇ with torques ∝ J): ANY value of these params is a physical
    no-op (strictly stronger than the README robustness sweep's 1.0-1.9×
    scale factors, whose rows land on the baseline rollouts). kinv / drag
    DO perturb the step — the real mismatch knobs."""
    rng = np.random.RandomState(3)
    state = jnp.asarray(rng.randn(16, 12).astype(np.float32) * 0.4)
    action = jnp.asarray(rng.rand(16, 4).astype(np.float32))
    base = quad_step(quad_params(), state, action, 0.1)
    for param in ("mass", "arm_length", "frame_inertia"):
        scaled = quad_step(quad_params({param: 1.9}), state, action, 0.1)
        np.testing.assert_allclose(
            np.asarray(scaled), np.asarray(base), rtol=0, atol=1e-5,
            err_msg=f"{param}=1.9 should be a no-op",
        )
    for param in ("kinv_ang_vel_tau", "translational_drag"):
        scaled = quad_step(quad_params({param: 1.9}), state, action, 0.1)
        assert float(jnp.abs(scaled - base).max()) > 1e-4, (
            f"{param}=1.9 should actually perturb the step"
        )

"""External-sim adapter: the flightgym-convention round trip must reproduce
our own dynamics exactly, and a trained controller must fly through it."""

import numpy as np
import jax
import jax.numpy as jnp


def test_adapter_roundtrip_matches_quad_step():
    from apg_trajectory_tracking_tpu.dynamics.quad import (
        quad_params,
        quad_step,
    )
    from apg_trajectory_tracking_tpu.envs.external_sim import (
        ExternalSimAdapter,
        MockFlightgymBackend,
    )

    rng = np.random.RandomState(0)
    s0 = (rng.randn(12) * 0.1).astype(np.float32)
    sim = ExternalSimAdapter(MockFlightgymBackend(dt=0.1, init_state=s0))
    state = sim.reset()
    np.testing.assert_allclose(state, s0, atol=1e-6)

    direct = s0.copy()
    dyn = quad_params()
    for i in range(5):
        a = rng.rand(4).astype(np.float32)
        state, stable = sim.step(a)
        direct = np.asarray(
            quad_step(dyn, jnp.asarray(direct[None]), jnp.asarray(a[None]),
                      0.1)
        )[0]
        np.testing.assert_allclose(state, direct, atol=1e-5)
        assert isinstance(stable, bool)


def test_controller_flies_through_adapter():
    """The shipped quad controller hovers via the external-sim seam."""
    import os

    from apg_trajectory_tracking_tpu.data.dataset import quad_prepare_data
    from apg_trajectory_tracking_tpu.envs.external_sim import (
        ExternalSimAdapter,
        MockFlightgymBackend,
    )
    from apg_trajectory_tracking_tpu.models import (
        init_control_net,
        control_net_apply,
    )
    from apg_trajectory_tracking_tpu.trajectory.refs import hover_ref_window
    from apg_trajectory_tracking_tpu.utils.checkpoints import load_checkpoint

    asset = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets", "reference_pretrained",
    )
    template = init_control_net(jax.random.PRNGKey(0), 15, 10, 9, 40,
                                conv=True)
    net = load_checkpoint(asset, "model_quad", template)

    s0 = np.zeros(12, dtype=np.float32)
    s0[2] = 3.0
    sim = ExternalSimAdapter(MockFlightgymBackend(dt=0.1, init_state=s0))
    state = sim.reset()
    target = jnp.asarray([0.0, 0.0, 3.0])
    for _ in range(30):
        window = hover_ref_window(target, jnp.asarray(state), 0.1, 10)
        in_s, _, in_r, _ = quad_prepare_data(
            jnp.asarray(state[None]), window[None]
        )
        logits = control_net_apply(net, in_s, in_r)
        a = np.asarray(jax.nn.sigmoid(logits))[0].reshape(10, 4)[0]
        state, stable = sim.step(a)
        assert stable
    assert np.linalg.norm(state[:3] - np.asarray([0, 0, 3.0])) < 0.2, state


def _native_backend(**kw):
    import pytest

    from apg_trajectory_tracking_tpu.envs.external_sim import (
        NativeQuadSimBackend,
    )

    try:
        return NativeQuadSimBackend(**kw)
    except (RuntimeError, FileNotFoundError, OSError) as exc:
        pytest.skip(f"native toolchain unavailable: {exc}")


def test_native_sim_matches_quad_step():
    """The C++ external simulator (native/quad_sim.cc) reproduces the JAX
    Flightmare step to float32 accumulation noise across a chaotic
    50-step random-action rollout."""
    from apg_trajectory_tracking_tpu.dynamics.quad import (
        quad_params,
        quad_step,
    )
    from apg_trajectory_tracking_tpu.envs.external_sim import (
        ExternalSimAdapter,
    )

    rng = np.random.RandomState(0)
    s0 = (rng.randn(12) * 0.1).astype(np.float32)
    sim = ExternalSimAdapter(_native_backend(dt=0.1, init_state=s0))
    np.testing.assert_allclose(sim.reset(), s0, atol=1e-6)

    direct = s0.copy()
    dyn = quad_params()
    for _ in range(50):
        a = rng.rand(4).astype(np.float32)
        state, _ = sim.step(a)
        direct = np.asarray(
            quad_step(dyn, jnp.asarray(direct[None]), jnp.asarray(a[None]),
                      0.1)
        )[0]
        np.testing.assert_allclose(state, direct, atol=1e-4)


def test_native_sim_params_override():
    """params16 mismatch injection: doubled kinv changes the rate loop."""
    s0 = np.zeros(12, dtype=np.float32)
    s0[9] = 0.4  # initial roll rate
    p16 = np.array(
        [0.723,
         0.723 / 12 * 0.31 ** 2 * 4.5, 0.723 / 12 * 0.31 ** 2 * 4.5,
         0.723 / 12 * 0.31 ** 2 * 7.0,
         33.2, 33.2, 10.0,  # doubled kinv
         0.0, 0.0, -9.81,
         0.0, 0.0, 0.0,
         0.0, 0.0, 0.0], dtype=np.float32,
    )
    default = _native_backend(dt=0.1, init_state=s0)
    stiff = _native_backend(dt=0.1, init_state=s0, params16=p16)
    act = np.array([[9.81, 0.0, 0.0, 0.0]], dtype=np.float32)
    obs_d, *_ = default.step(act)
    obs_s, *_ = stiff.step(act)
    # one explicit-Euler rate-loop step: av' = av + dt*kinv*(0 - av)
    np.testing.assert_allclose(obs_d[0, 9], 0.4 * (1 - 0.1 * 16.6),
                               atol=1e-5)
    np.testing.assert_allclose(obs_s[0, 9], 0.4 * (1 - 0.1 * 33.2),
                               atol=1e-5)


def test_sim_to_sim_tracking(tiny_bank):
    """Sim-to-sim validation (the reference's Flightmare use case,
    flightmare.py:14-117 + train_drone.py:40-49): the shipped controller
    tracks a bank trajectory closed-loop through the EXTERNAL C++ sim with
    the same error it posts in the jitted JAX evaluator."""
    import os

    from apg_trajectory_tracking_tpu.data.dataset import quad_prepare_data
    from apg_trajectory_tracking_tpu.dynamics.quad import quad_params
    from apg_trajectory_tracking_tpu.envs.external_sim import (
        ExternalSimAdapter,
    )
    from apg_trajectory_tracking_tpu.evaluation.quad_eval import run_eval
    from apg_trajectory_tracking_tpu.models import (
        init_control_net,
        control_net_apply,
    )
    from apg_trajectory_tracking_tpu.trajectory.generate import (
        load_trajectory_bank,
        prepare_trajectory,
    )
    from apg_trajectory_tracking_tpu.utils.checkpoints import load_checkpoint

    asset = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets", "quad_trained",
    )
    template = init_control_net(jax.random.PRNGKey(0), 15, 10, 9, 40,
                                conv=True)
    net = load_checkpoint(asset, "model_quad", template)

    bank = load_trajectory_bank(tiny_bank, test=True)
    ref = prepare_trajectory(bank[0], 0.1, 0.3)
    ref[:, 2] += 3.0
    horizon, n_steps = 10, min(100, ref.shape[0] - 10)

    # closed loop through the external C++ sim
    s0 = np.zeros(12, dtype=np.float32)
    s0[:3] = ref[0, :3]
    sim = ExternalSimAdapter(_native_backend(dt=0.1, init_state=s0))
    state = sim.reset()
    divs = []
    for i in range(n_steps):
        window = jnp.asarray(ref[i + 1:i + 1 + horizon])
        in_s, _, in_r, _ = quad_prepare_data(
            jnp.asarray(state[None]), window[None]
        )
        logits = control_net_apply(net, in_s, in_r)
        a = np.asarray(jax.nn.sigmoid(logits))[0].reshape(horizon, 4)[0]
        state, stable = sim.step(a)
        assert stable
        divs.append(np.linalg.norm(state[:3] - ref[i + 1, :3]))
    ext_err = float(np.mean(divs))

    # same trajectory through the jitted evaluator (JAX dynamics)
    m, _ = run_eval(
        net, quad_params(), jnp.asarray(ref[None]), n_steps,
        thresh_div=1.0, thresh_stable=1.0, horizon=horizon, dt=0.1,
        test_time=True,
    )
    jax_err = float(m["mean_divergence"])
    assert ext_err < 0.25
    # identical physics, float32-noise-level divergence accumulation:
    # the two errors must be close (not bit-equal: the external loop
    # compounds 1e-6-level step differences over 100 chaotic steps)
    assert abs(ext_err - jax_err) < 0.05, (ext_err, jax_err)

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

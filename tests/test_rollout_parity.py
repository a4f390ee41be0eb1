"""The north-star parity test (BASELINE.json): closed-loop rollouts match
the reference implementation step for step.

Both sides run their OWN full pipeline from identical controller weights
and identical reference windows — featurization (QuadDataset.prepare_data
vs data.dataset.quad_prepare_data), network forward, sigmoid, and dynamics
step on the absolute state (FlightmareDynamics vs quad_step, exactly how
each evaluator steps) — for 30 closed-loop steps. Any divergence in any
layer compounds exponentially through the closed loop, so trajectory
agreement at float tolerance is the strongest single parity statement the
suite makes.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.reference_oracle import load_reference_dynamics


def test_closed_loop_rollout_matches_reference():
    torch = pytest.importorskip("torch")
    load_reference_dynamics()  # installs casadi stub + sys.path (or skips)

    from neural_control.dataset import QuadDataset
    from neural_control.dynamics.quad_dynamics_flightmare import (
        FlightmareDynamics,
    )
    from neural_control.models.hutter_model import Net

    from apg_trajectory_tracking_tpu.data.dataset import quad_prepare_data
    from apg_trajectory_tracking_tpu.dynamics.quad import (
        quad_params,
        quad_step,
    )
    from apg_trajectory_tracking_tpu.models import (
        init_control_net,
        control_net_apply,
    )

    horizon, dt = 10, 0.1
    torch.manual_seed(0)
    tnet = Net(15, horizon, 9, horizon * 4, conv=True)

    # copy torch weights into our pytree (transposed linears, conv verbatim)
    params = init_control_net(
        jax.random.PRNGKey(0), 15, horizon, 9, horizon * 4, conv=True
    )
    params["states_in"] = (
        jnp.asarray(tnet.states_in.weight.detach().numpy().T),
        jnp.asarray(tnet.states_in.bias.detach().numpy()),
    )
    params["conv_ref"] = (
        jnp.asarray(tnet.conv_ref.weight.detach().numpy()),
        jnp.asarray(tnet.conv_ref.bias.detach().numpy()),
    )
    for name in ("fc1", "fc2", "fc3", "fc_out"):
        layer = getattr(tnet, name)
        params[name] = (
            jnp.asarray(layer.weight.detach().numpy().T),
            jnp.asarray(layer.bias.detach().numpy()),
        )

    # a smooth synthetic reference trajectory [pos, att, vel]
    T = 60
    t = np.linspace(0, 4 * np.pi, T)
    refs = np.zeros((T, 9), dtype=np.float32)
    refs[:, 0] = np.sin(t)
    refs[:, 1] = np.cos(t) - 1.0
    refs[:, 2] = 3.0 + 0.2 * np.sin(2 * t)
    refs[1:, 6:9] = (refs[1:, :3] - refs[:-1, :3]) / dt

    tdyn = FlightmareDynamics()
    ds = QuadDataset.__new__(QuadDataset)  # prepare_data needs no __init__
    jdyn = quad_params()

    state_t = np.zeros(12, dtype=np.float32)
    state_t[:3] = refs[0, :3]
    state_j = jnp.asarray(state_t[None])

    for i in range(30):
        window = refs[i + 1 : i + 1 + horizon]

        # ---- reference pipeline: featurize -> net -> sigmoid -> step the
        # ABSOLUTE state (QuadEvaluator via drone_env.step)
        normed, _, in_ref, _ = ds.prepare_data(state_t.copy(), window.copy())
        with torch.no_grad():
            act_t = torch.sigmoid(tnet(normed, in_ref))
            act0_t = act_t.reshape(-1, horizon, 4)[:, 0]
            state_t = (
                tdyn(torch.from_numpy(state_t[None]), act0_t, dt)
                .numpy()[0]
                .astype(np.float32)
            )

        # ---- our pipeline
        in_s, _, in_r, _ = quad_prepare_data(
            state_j, jnp.asarray(window[None])
        )
        logits = control_net_apply(params, in_s, in_r)
        act0_j = jax.nn.sigmoid(logits).reshape(-1, horizon, 4)[:, 0]
        state_j = quad_step(jdyn, state_j, act0_j, dt)

        np.testing.assert_allclose(
            np.asarray(state_j)[0], state_t, atol=5e-4,
            err_msg=f"closed-loop state diverged at step {i}",
        )


def test_cartpole_closed_loop_matches_reference():
    """Cartpole net + dynamics closed loop, both pipelines side by side."""
    torch = pytest.importorskip("torch")
    load_reference_dynamics()

    from neural_control.dynamics.cartpole_dynamics import CartpoleDynamics
    from neural_control.models.simple_model import Net as RefNet

    from apg_trajectory_tracking_tpu.dynamics.cartpole import (
        cartpole_params,
        cartpole_step,
    )
    from apg_trajectory_tracking_tpu.models import (
        init_cartpole_net,
        cartpole_net_apply,
    )

    horizon, dt = 10, 0.05
    torch.manual_seed(1)
    tnet = RefNet(4, horizon)

    params = init_cartpole_net(jax.random.PRNGKey(0), 4, horizon)
    for ours, theirs in (("fc0", "fc0"), ("fc1", "fc1"), ("fc2", "fc2"),
                         ("fc3", "fc3"), ("fc_out", "fc_out")):
        layer = getattr(tnet, theirs)
        params[ours] = (
            jnp.asarray(layer.weight.detach().numpy().T),
            jnp.asarray(layer.bias.detach().numpy()),
        )

    tdyn = CartpoleDynamics()
    jdyn = cartpole_params()
    state_t = np.asarray([0.1, 0.0, 0.15, -0.1], dtype=np.float32)
    state_j = jnp.asarray(state_t[None])

    for i in range(40):
        with torch.no_grad():
            act_t = tnet(torch.from_numpy(state_t[None].copy()))
            a0_t = act_t.reshape(-1, horizon, 1)[:, 0]
            state_t = tdyn(
                torch.from_numpy(state_t[None]), a0_t, dt
            ).numpy()[0].astype(np.float32)

        acts_j = cartpole_net_apply(params, state_j)
        a0_j = acts_j.reshape(-1, horizon, 1)[:, 0]
        state_j = cartpole_step(jdyn, state_j, a0_j, dt)

        np.testing.assert_allclose(
            np.asarray(state_j)[0], state_t, atol=5e-5,
            err_msg=f"cartpole closed loop diverged at step {i}",
        )


def test_wing_closed_loop_matches_reference():
    """Wing featurize + net + dynamics closed loop vs the reference."""
    torch = pytest.importorskip("torch")
    load_reference_dynamics()

    from neural_control.dataset import WingDataset
    from neural_control.dynamics.fixed_wing_dynamics import FixedWingDynamics
    from neural_control.models.hutter_model import Net as RefNet

    from apg_trajectory_tracking_tpu.data.dataset import (
        wing_prepare_data,
        WING_MEAN,
        WING_STD,
    )
    from apg_trajectory_tracking_tpu.dynamics.fixed_wing import (
        wing_params,
        wing_step,
    )
    from apg_trajectory_tracking_tpu.models import (
        init_control_net,
        control_net_apply,
    )

    horizon, dt = 10, 0.05
    torch.manual_seed(2)
    tnet = RefNet(9, 1, 3, horizon * 4, conv=False)

    params = init_control_net(
        jax.random.PRNGKey(0), 9, 1, 3, horizon * 4, conv=False
    )
    params["states_in"] = (
        jnp.asarray(tnet.states_in.weight.detach().numpy().T),
        jnp.asarray(tnet.states_in.bias.detach().numpy()),
    )
    params["ref_in"] = (
        jnp.asarray(tnet.ref_in.weight.detach().numpy().T),
        jnp.asarray(tnet.ref_in.bias.detach().numpy()),
    )
    for name in ("fc1", "fc2", "fc3", "fc_out"):
        layer = getattr(tnet, name)
        params[name] = (
            jnp.asarray(layer.weight.detach().numpy().T),
            jnp.asarray(layer.bias.detach().numpy()),
        )

    ds = WingDataset.__new__(WingDataset)
    ds.dt = dt
    ds.horizon = horizon
    ds.mean = torch.from_numpy(np.asarray(WING_MEAN))
    ds.std = torch.from_numpy(np.asarray(WING_STD))

    tdyn = FixedWingDynamics()
    jdyn = wing_params()
    mean_j = jnp.asarray(WING_MEAN)
    std_j = jnp.asarray(WING_STD)

    target = np.asarray([50.0, 2.0, -1.5], dtype=np.float32)
    state_t = np.zeros(12, dtype=np.float32)
    state_t[3] = 11.5
    state_j = jnp.asarray(state_t[None])

    for i in range(30):
        with torch.no_grad():
            normed, _, rel_ref, _ = ds.prepare_data(
                state_t[None].copy(), target[None].copy()
            )
            act_t = torch.sigmoid(tnet(normed.float(), rel_ref.float()))
            a0_t = act_t.reshape(-1, horizon, 4)[:, 0]
            state_t = tdyn(
                torch.from_numpy(state_t[None]), a0_t, dt
            ).numpy()[0].astype(np.float32)

        normed_j, _, rel_j, _ = wing_prepare_data(
            state_j, jnp.asarray(target[None]), mean_j, std_j,
            dt=dt, horizon=horizon,
        )
        logits = control_net_apply(params, normed_j, rel_j)
        a0_j = jax.nn.sigmoid(logits).reshape(-1, horizon, 4)[:, 0]
        state_j = wing_step(jdyn, state_j, a0_j, dt)

        np.testing.assert_allclose(
            np.asarray(state_j)[0], state_t, atol=2e-3,
            err_msg=f"wing closed loop diverged at step {i}",
        )

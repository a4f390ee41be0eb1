"""Parity + integration tests for the native C++ controller runtime.

The native runtime (native/apg_controller.cc) must reproduce the exact
decision path of the Python stack: featurization (quad_prepare_data),
control-net forward (control_net_apply), sigmoid. Tolerances are float32
accumulation-order noise only — any structural mismatch shows up orders of
magnitude above them.
"""

import json
import os
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUAD_MODEL = os.path.join(REPO, "assets", "quad_trained")


@pytest.fixture(scope="session")
def native_lib():
    from apg_trajectory_tracking_tpu.utils.native_runtime import build_native

    try:
        return build_native()
    except (RuntimeError, FileNotFoundError) as exc:  # no toolchain
        pytest.skip(f"native toolchain unavailable: {exc}")


@pytest.fixture(scope="session")
def exported_quad(native_lib, tmp_path_factory):
    import sys

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from export_controller import export_control_net

    out = str(tmp_path_factory.mktemp("apgc") / "quad.apgc")
    header = export_control_net(QUAD_MODEL, out)
    assert header["system"] == "quad" and header["conv"] is True
    return out


@pytest.fixture(scope="session")
def quad_net():
    import jax

    from apg_trajectory_tracking_tpu.models import init_control_net
    from apg_trajectory_tracking_tpu.utils.checkpoints import (
        load_checkpoint,
        load_config,
    )

    cfg = load_config(QUAD_MODEL)
    template = init_control_net(
        jax.random.PRNGKey(0), 15, cfg["horizon"], cfg["ref_dim"],
        cfg["action_dim"] * cfg["horizon"], conv=True,
    )
    return load_checkpoint(QUAD_MODEL, "model_quad", template), cfg


def test_forward_parity(exported_quad, quad_net):
    """Net-only forward on featurized inputs matches JAX to f32 noise."""
    import jax
    import jax.numpy as jnp

    from apg_trajectory_tracking_tpu.models import control_net_apply
    from apg_trajectory_tracking_tpu.utils.native_runtime import (
        NativeController,
    )

    net, _ = quad_net
    nc = NativeController(exported_quad)
    assert (nc.state_dim, nc.window, nc.ref_dim, nc.out_dim) == (15, 10, 9, 40)

    rng = np.random.RandomState(0)
    in_state = rng.randn(32, 15).astype(np.float32)
    in_ref = rng.randn(32, 10, 9).astype(np.float32)
    jx = np.asarray(
        jax.nn.sigmoid(
            control_net_apply(net, jnp.asarray(in_state), jnp.asarray(in_ref))
        )
    )
    for b in range(32):
        out = nc.forward(in_state[b], in_ref[b])
        np.testing.assert_allclose(out, jx[b], atol=5e-6)


def test_quad_predict_parity(exported_quad, quad_net):
    """Full decision path (featurize + forward) matches JAX."""
    import jax
    import jax.numpy as jnp

    from apg_trajectory_tracking_tpu.data.dataset import quad_prepare_data
    from apg_trajectory_tracking_tpu.models import control_net_apply
    from apg_trajectory_tracking_tpu.utils.native_runtime import (
        NativeController,
    )

    net, _ = quad_net
    nc = NativeController(exported_quad)
    rng = np.random.RandomState(1)
    states = rng.randn(32, 12).astype(np.float32) * 0.4
    refs = rng.randn(32, 10, 9).astype(np.float32) * 0.4
    in_state, _, in_ref, _ = quad_prepare_data(
        jnp.asarray(states), jnp.asarray(refs)
    )
    jx = np.asarray(
        jax.nn.sigmoid(control_net_apply(net, in_state, in_ref))
    )
    for b in range(32):
        out = nc.quad_predict(states[b], refs[b])
        np.testing.assert_allclose(out, jx[b], atol=5e-6)


def test_closed_loop_native(exported_quad, quad_net):
    """30 closed-loop dynamics steps driven by native actions track the
    JAX-driven rollout."""
    import jax
    import jax.numpy as jnp

    from apg_trajectory_tracking_tpu.data.dataset import quad_prepare_data
    from apg_trajectory_tracking_tpu.dynamics.quad import (
        quad_params,
        quad_step,
    )
    from apg_trajectory_tracking_tpu.models import control_net_apply
    from apg_trajectory_tracking_tpu.utils.native_runtime import (
        NativeController,
    )

    net, cfg = quad_net
    nc = NativeController(exported_quad)
    dyn = quad_params()
    dt = cfg["delta_t"]

    rng = np.random.RandomState(2)
    ref = np.zeros((45, 9), dtype=np.float32)
    ref[:, :3] = np.cumsum(
        rng.randn(45, 3).astype(np.float32) * 0.01, axis=0
    )
    s_jax = np.zeros(12, dtype=np.float32)
    s_nat = np.zeros(12, dtype=np.float32)
    for t in range(30):
        window = ref[t:t + 10]
        # JAX action
        in_s, _, in_r, _ = quad_prepare_data(
            jnp.asarray(s_jax[None]), jnp.asarray(window[None])
        )
        a_jax = np.asarray(
            jax.nn.sigmoid(control_net_apply(net, in_s, in_r))
        )[0, :4]
        a_nat = nc.quad_predict(s_nat, window)[:4]
        s_jax = np.asarray(
            quad_step(dyn, jnp.asarray(s_jax[None]),
                      jnp.asarray(a_jax[None]), dt)
        )[0]
        s_nat_next = np.asarray(
            quad_step(dyn, jnp.asarray(s_nat[None]),
                      jnp.asarray(a_nat[None]), dt)
        )[0]
        s_nat = s_nat_next
    np.testing.assert_allclose(s_nat, s_jax, atol=1e-3)


def test_wing_predict_parity(native_lib, tmp_path):
    """Wing decision path (z-score featurize + dense-branch net) matches."""
    import sys

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from export_controller import export_control_net

    from apg_trajectory_tracking_tpu.data.dataset import (
        WING_MEAN,
        WING_STD,
        wing_prepare_data,
    )
    from apg_trajectory_tracking_tpu.models import (
        control_net_apply,
        init_control_net,
    )
    from apg_trajectory_tracking_tpu.utils.checkpoints import (
        load_checkpoint,
        load_config,
    )
    from apg_trajectory_tracking_tpu.utils.native_runtime import (
        NativeController,
    )

    model_dir = os.path.join(REPO, "assets", "wing_trained")
    out = str(tmp_path / "wing.apgc")
    header = export_control_net(model_dir, out)
    assert header["system"] == "wing" and header["conv"] is False

    cfg = load_config(model_dir)
    template = init_control_net(
        jax.random.PRNGKey(0), 9, 1, 3, cfg["action_dim"] * cfg["horizon"],
        conv=False,
    )
    net = load_checkpoint(model_dir, "model_wing", template)
    nc = NativeController(out)

    rng = np.random.RandomState(3)
    states = (rng.randn(16, 12) * 0.3).astype(np.float32)
    states[:, 3] += 11.5  # level flight forward speed (wing_env zero_reset)
    targets = (rng.randn(16, 3) * 4).astype(np.float32)
    targets[:, 0] += 30.0
    mean = jnp.asarray(cfg.get("mean") or WING_MEAN, dtype=jnp.float32)
    std = jnp.asarray(cfg.get("std") or WING_STD, dtype=jnp.float32)
    normed, _, rel_ref, _ = wing_prepare_data(
        jnp.asarray(states), jnp.asarray(targets), mean, std,
        dt=cfg["delta_t"], horizon=cfg["horizon"],
    )
    jx = np.asarray(jax.nn.sigmoid(control_net_apply(net, normed, rel_ref)))
    for b in range(16):
        got = nc.wing_predict(states[b], targets[b])
        np.testing.assert_allclose(got, jx[b], atol=5e-6)


def test_cartpole_predict_parity(native_lib, tmp_path):
    """Cartpole simple-net path (x zeroed, tanh output) matches."""
    import sys

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from export_controller import export_control_net

    from apg_trajectory_tracking_tpu.models import (
        cartpole_net_apply,
        init_cartpole_net,
    )
    from apg_trajectory_tracking_tpu.utils.checkpoints import load_checkpoint
    from apg_trajectory_tracking_tpu.utils.native_runtime import (
        NativeController,
    )

    model_dir = os.path.join(REPO, "assets", "cartpole_trained")
    out = str(tmp_path / "cartpole.apgc")
    header = export_control_net(model_dir, out)
    assert header["kind"] == "cartpole_net"

    template = init_cartpole_net(jax.random.PRNGKey(0), 4, 10)
    net = load_checkpoint(model_dir, "model_cartpole", template)
    nc = NativeController(out)

    rng = np.random.RandomState(4)
    states = (rng.randn(16, 4) * 0.5).astype(np.float32)
    jx = np.asarray(cartpole_net_apply(net, jnp.asarray(states)))
    for b in range(16):
        got = nc.cartpole_predict(states[b])
        np.testing.assert_allclose(got, jx[b], atol=5e-6)


def test_lstm_predict_parity(native_lib, tmp_path):
    """Recurrent decision path: carry threads across calls and matches the
    JAX lstm_net_apply step-by-step over a 20-step sequence."""
    import sys

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from export_controller import export_control_net

    from apg_trajectory_tracking_tpu.data.dataset import quad_prepare_data
    from apg_trajectory_tracking_tpu.models import (
        init_lstm_net,
        lstm_net_apply,
    )
    from apg_trajectory_tracking_tpu.utils.checkpoints import (
        load_checkpoint,
        load_config,
    )
    from apg_trajectory_tracking_tpu.utils.native_runtime import (
        NativeController,
    )

    model_dir = os.path.join(REPO, "assets", "quad_mpc_distilled_lstm")
    if not os.path.isdir(model_dir):
        pytest.skip("no distilled LSTM asset")
    out = str(tmp_path / "lstm.apgc")
    header = export_control_net(model_dir, out)
    assert header["kind"] == "lstm_net"

    cfg = load_config(model_dir)
    window = cfg.get("net_window") or cfg["horizon"]
    hidden = cfg.get("hidden") or 8
    template = init_lstm_net(
        jax.random.PRNGKey(0), 15, window, cfg["ref_dim"],
        cfg["action_dim"], conv=True, hidden=hidden,
    )
    net = load_checkpoint(model_dir, "model_quad", template)
    nc = NativeController(out)
    assert nc.kind == "lstm_net" and nc.hidden == hidden

    rng = np.random.RandomState(5)
    carry_nat = nc.init_carry()
    h = jnp.zeros((1, hidden), dtype=jnp.float32)
    carry_jax = (h, h)
    for _ in range(20):
        state = (rng.randn(12) * 0.3).astype(np.float32)
        ref = (rng.randn(window, 9) * 0.3).astype(np.float32)
        in_s, _, in_r, _ = quad_prepare_data(
            jnp.asarray(state[None]), jnp.asarray(ref[None])
        )
        carry_jax, logits = lstm_net_apply(net, carry_jax, in_s, in_r)
        want = np.asarray(jax.nn.sigmoid(logits))[0]
        got, carry_nat = nc.lstm_predict(state, ref, carry_nat)
        np.testing.assert_allclose(got, want, atol=5e-6)
        np.testing.assert_allclose(
            carry_nat[0], np.asarray(carry_jax[0])[0], atol=5e-6
        )


def test_native_eval_protocol(exported_quad, quad_net, tiny_bank):
    """The deployed artifact flies the actual eval protocol: a native-
    controller-driven test-time rollout on real bank trajectories matches
    the jitted evaluator's per-step divergences and valid mask."""
    import jax
    import jax.numpy as jnp

    from apg_trajectory_tracking_tpu.dynamics.quad import (
        quad_params,
        quad_step,
    )
    from apg_trajectory_tracking_tpu.evaluation.quad_eval import (
        follow_trajectories,
    )
    from apg_trajectory_tracking_tpu.trajectory.generate import (
        load_trajectory_bank,
        prepare_trajectory,
    )
    from apg_trajectory_tracking_tpu.utils.native_runtime import (
        NativeController,
        native_quad_rollout,
    )

    net, cfg = quad_net
    nc = NativeController(exported_quad)
    dyn = quad_params()
    dt = cfg["delta_t"]

    bank = load_trajectory_bank(tiny_bank, test=True)
    refs = np.stack(
        [prepare_trajectory(bank[i], dt, 0.4) for i in range(2)]
    )
    ref_len = refs.shape[1] - 10
    max_steps = min(251, ref_len + 1)

    roll = follow_trajectories(
        net, dyn, jnp.asarray(refs), ref_len, thresh_div=1.0,
        test_time=True, max_steps=max_steps, dt=dt,
    )
    jx_div = np.asarray(roll["divergences"])
    jx_valid = np.asarray(roll["valid"])

    step1 = jax.jit(
        lambda s, a: quad_step(dyn, s[None], a[None], dt)[0]
    )
    for t in range(2):
        divs, valid = native_quad_rollout(
            nc, refs[t], ref_len, step1, thresh_div=1.0,
            max_steps=max_steps,
        )
        assert valid.tolist() == jx_valid[t].tolist()
        # actions match to 5e-6; closed-loop tracking keeps the paths
        # together over the full protocol length
        np.testing.assert_allclose(
            divs[valid], jx_div[t][jx_valid[t]], atol=5e-3
        )


def test_export_infers_system_without_config_key(native_lib, tmp_path):
    """Checkpoints whose config lacks 'system' (e.g. distill_mpc_wing.py
    output) classify by the model_*.npz file name; wing dt defaults to
    0.05, not the quad 0.1."""
    import json as _json
    import shutil
    import sys

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from export_controller import export_control_net

    src = os.path.join(REPO, "assets", "wing_trained")
    dst = tmp_path / "wing_nosys"
    shutil.copytree(src, dst)
    cfg = _json.load(open(dst / "config.json"))
    cfg.pop("system", None)
    cfg.pop("delta_t", None)
    _json.dump(cfg, open(dst / "config.json", "w"))
    header = export_control_net(str(dst), str(tmp_path / "w.apgc"))
    assert header["system"] == "wing"
    assert header["dt"] == 0.05


def test_export_rejects_unknown_mode(native_lib, tmp_path):
    """Modes outside {concurrent, autoregressive, LSTM} are refused."""
    import json as _json
    import shutil
    import sys

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from export_controller import export_control_net

    src = os.path.join(REPO, "assets", "quad_trained")
    dst = tmp_path / "weird"
    shutil.copytree(src, dst)
    cfg = _json.load(open(dst / "config.json"))
    cfg["train_mode"] = "exotic"
    _json.dump(cfg, open(dst / "config.json", "w"))
    with pytest.raises(ValueError, match="train_mode"):
        export_control_net(str(dst), str(tmp_path / "x.apgc"))


def test_latency_binary(exported_quad):
    exe = os.path.join(REPO, "native", "build", "apg_latency")
    if not os.path.exists(exe):
        pytest.skip("latency binary not built")
    out = subprocess.run(
        [exe, exported_quad, "2000"], capture_output=True, text=True,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr
    rec = json.loads(out.stdout.strip())
    assert rec["median_ns"] > 0
    # generous sanity ceiling: one decision well under 1 ms on any CPU
    assert rec["median_ns"] < 1e6


def test_native_closed_loop(exported_quad):
    """The ENTIRE deployment stack outside Python: the exported controller
    + the C++ simulator + a C++ min-jerk hover planner fly closed-loop
    (native/closed_loop_main.cc) and land on the Python stack's numbers."""
    import jax
    import jax.numpy as jnp

    binary = os.path.join(REPO, "native", "build", "apg_closed_loop")
    proc = subprocess.run(
        [binary, exported_quad, "251"], capture_output=True, text=True,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    out = json.loads(proc.stdout)
    assert out["final_dist"] < 0.15
    assert out["us_per_step"] < 10000  # generous CI bound; ~30us locally

    # Python twin of the same scenario: hover from the same offset start
    from apg_trajectory_tracking_tpu.dynamics.quad import quad_params
    from apg_trajectory_tracking_tpu.evaluation.quad_eval import (
        follow_analytic,
    )
    from apg_trajectory_tracking_tpu.models import init_control_net
    from apg_trajectory_tracking_tpu.trajectory.refs import hover_ref_window
    from apg_trajectory_tracking_tpu.utils.checkpoints import (
        load_checkpoint,
        load_config,
    )

    cfg = load_config(QUAD_MODEL)
    template = init_control_net(
        jax.random.PRNGKey(0), 15, cfg["horizon"], cfg["ref_dim"],
        cfg["action_dim"] * cfg["horizon"], conv=True,
    )
    net = load_checkpoint(QUAD_MODEL, "model_quad", template)
    target = jnp.asarray([0.0, 0.0, 3.0])
    init = jnp.asarray([[0.3, -0.2, 2.5, 0, 0, 0, 0, 0, 0, 0, 0, 0]],
                       dtype=jnp.float32)
    roll = follow_analytic(
        net, quad_params(),
        lambda s: hover_ref_window(target, s, 0.1, 10),
        lambda p: target, init,
        thresh_div=1.0, thresh_stable=1.0, horizon=10, max_steps=251,
        dt=0.1,
    )
    divs = np.asarray(roll["divergences"])[0]
    valid = np.asarray(roll["valid"])[0]
    py_mean = float((divs * valid).sum() / valid.sum())
    assert abs(out["mean_divergence"] - py_mean) < 0.02, (
        out["mean_divergence"], py_mean,
    )


def test_native_cartpole_sim_parity(native_lib):
    """The C++ cart-pole simulator (native/cartpole_sim.cc) matches the
    JAX step (incl. the exact theta rotation update and env wrap) to
    float32 noise over a 100-step random-action rollout."""
    import ctypes

    import jax.numpy as jnp

    from apg_trajectory_tracking_tpu.dynamics.cartpole import (
        cartpole_params,
        cartpole_step,
        wrap_theta,
    )
    from apg_trajectory_tracking_tpu.utils.native_runtime import build_native

    lib = ctypes.CDLL(build_native(lib_name="libapgsim.so"))
    lib.csim_create.restype = ctypes.c_void_p
    lib.csim_create.argtypes = [ctypes.c_float,
                                ctypes.POINTER(ctypes.c_float)]
    lib.csim_free.argtypes = [ctypes.c_void_p]
    lib.csim_reset.argtypes = [ctypes.c_void_p,
                               ctypes.POINTER(ctypes.c_float)]
    lib.csim_step.argtypes = [ctypes.c_void_p, ctypes.c_float,
                              ctypes.POINTER(ctypes.c_float)]

    rng = np.random.RandomState(3)
    s0 = (rng.randn(4) * 0.3).astype(np.float32)
    sim = lib.csim_create(ctypes.c_float(0.05), None)
    fp = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    st = np.ascontiguousarray(s0)
    lib.csim_reset(sim, fp(st))

    dyn = cartpole_params()
    direct = s0.copy()
    out = np.zeros(4, dtype=np.float32)
    for _ in range(100):
        a = np.float32(rng.uniform(-1, 1))
        lib.csim_step(sim, ctypes.c_float(a), fp(out))
        direct = np.asarray(wrap_theta(cartpole_step(
            dyn, jnp.asarray(direct[None]),
            jnp.asarray([[a]], dtype=jnp.float32), 0.05,
        )))[0]
        np.testing.assert_allclose(out, direct, atol=2e-4)
    lib.csim_free(sim)


def test_native_cartpole_closed_loop(native_lib, tmp_path):
    """The fully-native cart-pole balance loop (exported controller +
    C++ sim) keeps the pole up for all 250 steps."""
    import sys

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from export_controller import export_control_net

    model_dir = os.path.join(REPO, "assets", "cartpole_balance_trained")
    apgc = str(tmp_path / "cartpole.apgc")
    header = export_control_net(model_dir, apgc)
    assert header["kind"] == "cartpole_net"

    binary = os.path.join(REPO, "native", "build", "apg_closed_loop")
    proc = subprocess.run(
        [binary, apgc, "250"], capture_output=True, text=True,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    out = json.loads(proc.stdout)
    assert out["balanced"] == 250
    assert out["mean_abs_vel"] < 1.0  # balance-selected model


def test_native_wing_sim_parity(native_lib):
    """The C++ fixed-wing simulator (native/wing_sim.cc) matches the JAX
    6-DoF step to float32 noise over a 40-step rollout from level flight
    under slowly-varying actions."""
    import ctypes

    import jax.numpy as jnp

    from apg_trajectory_tracking_tpu.dynamics.fixed_wing import (
        wing_params,
        wing_step,
    )
    from apg_trajectory_tracking_tpu.utils.native_runtime import build_native

    lib = ctypes.CDLL(build_native(lib_name="libapgsim.so"))
    lib.wsim_create.restype = ctypes.c_void_p
    lib.wsim_create.argtypes = [ctypes.c_float]
    lib.wsim_free.argtypes = [ctypes.c_void_p]
    for fn in ("wsim_reset", "wsim_get_state"):
        getattr(lib, fn).argtypes = [ctypes.c_void_p,
                                     ctypes.POINTER(ctypes.c_float)]
    lib.wsim_step.argtypes = [ctypes.c_void_p,
                              ctypes.POINTER(ctypes.c_float),
                              ctypes.POINTER(ctypes.c_float)]

    rng = np.random.RandomState(7)
    s0 = np.zeros(12, dtype=np.float32)
    s0[3] = 11.5  # level flight, u = 11.5 m/s (wing_env.py:26-28)
    sim = lib.wsim_create(ctypes.c_float(0.05))
    fp = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    st = np.ascontiguousarray(s0)
    lib.wsim_reset(sim, fp(st))

    dyn = wing_params()
    direct = s0.copy()
    out = np.zeros(12, dtype=np.float32)
    # actions near trim (the wing sampler's convention, wing_env.py:72-95)
    base = np.array([0.25, 0.5, 0.5, 0.5], dtype=np.float32)
    for i in range(40):
        a = np.clip(
            base + rng.randn(4).astype(np.float32) * 0.05, 0, 1
        ).astype(np.float32)
        lib.wsim_step(sim, fp(np.ascontiguousarray(a)), fp(out))
        direct = np.asarray(wing_step(
            dyn, jnp.asarray(direct[None]), jnp.asarray(a[None]), 0.05,
        ))[0]
        np.testing.assert_allclose(out, direct, atol=5e-4)
    lib.wsim_free(sim)


def test_native_wing_closed_loop(native_lib, tmp_path):
    """The fully-native wing fly-to-point loop (exported controller + C++
    6-DoF sim) intercepts the target at the Python stack's accuracy."""
    import sys

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from export_controller import export_control_net

    model_dir = os.path.join(REPO, "assets", "wing_trained")
    apgc = str(tmp_path / "wing.apgc")
    header = export_control_net(model_dir, apgc)
    assert header["system"] == "wing"

    binary = os.path.join(REPO, "native", "build", "apg_closed_loop")
    proc = subprocess.run(
        [binary, apgc], capture_output=True, text=True,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    out = json.loads(proc.stdout)
    # Python wing_trained posts 0.012 m on this protocol; allow margin for
    # the different lateral target draw
    assert out["target_error"] < 0.5

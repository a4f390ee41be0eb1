"""External-simulator adapter (the reference's Flightmare bridge role).

Re-designs ``neural_control/flightmare.py:14-117``: the reference wraps the
C++ ``flightgym.QuadrotorEnv_v1`` vec env so the torch evaluator can run
against an external simulator — converting its observation layout to the
12-dim state and rescaling the controller's [0,1] actions to physical
commands. Here the same seam is a thin host-side adapter around ANY backend
exposing the flightgym-style vec-env surface (``reset() -> obs``,
``step(actions) -> (obs, rew, done, info)``); the compute path (controller
inference) stays jitted, only the dynamics step crosses the host boundary,
exactly as with the reference's bridge.

The conversion math is the reference's:
  * observation rows are [pos(3), euler zyx(3), vel(3), body rates(3)] —
    attitude is flipped zyx -> xyz with the discontinuity fix
    (``transform_borders``, flightmare.py:51-55);
  * actions [0,1] -> (total thrust = a0*15 - 7.5 + 9.81, rates = a[1:] - .5)
    (``action_to_fm``, flightmare.py:72-79).

Two backends ship in-repo:
  * ``NativeQuadSimBackend`` — a REAL external C++ simulator
    (native/quad_sim.cc, the Flightmare quad model in dependency-free
    C++), the role flightgym's C++ sim plays for the reference: every
    dynamics step crosses the host/native boundary, so closed-loop runs
    through it are genuine sim-to-sim validation;
  * ``MockFlightgymBackend`` — a pure-Python stand-in integrating the JAX
    dynamics behind the same conventions (no toolchain needed).
Pointing the adapter at a real ``flightgym`` binding requires no code
changes.
"""

import numpy as np


def transform_borders(x, switch_sign=False):
    """Angle discontinuity fix (flightmare.py:51-55)."""
    new = np.sign(x) * min(abs(x), 3.14 - abs(x))
    if new != x and switch_sign:
        new = -new
    return new


def obs_to_state(obs_row):
    """Flightgym observation row -> 12-dim state (flightmare.py:57-70)."""
    state = np.zeros(12, dtype=np.float32)
    state[:3] = obs_row[:3]
    state[6:9] = obs_row[6:9]
    state[3] = transform_borders(obs_row[5], switch_sign=True)
    state[4] = transform_borders(obs_row[4])
    state[5] = transform_borders(obs_row[3])
    state[9:] = obs_row[9:12]
    return state


def action_to_fm(action01):
    """[0,1] controller action -> physical flightgym command
    (flightmare.py:72-79)."""
    act = np.asarray(action01, dtype=np.float32).copy()
    act[0] = act[0] * 15.0 - 7.5 + 9.81
    act[1:] = act[1:] - 0.5
    return act[None].astype(np.float32)


class ExternalSimAdapter:
    """Closed-loop seam between our controllers and an external simulator.

    Args:
        backend: object with ``reset() -> (1, >=12) obs`` and
            ``step((1, 4) physical actions) -> (obs, rew, done, info)`` —
            the flightgym vec-env surface.
        thresh_stable: |roll|, |pitch| bound for the stability predicate.
    """

    def __init__(self, backend, thresh_stable=0.8):
        self.backend = backend
        self.thresh_stable = thresh_stable
        self.state = np.zeros(12, dtype=np.float32)

    def reset(self):
        obs = np.asarray(self.backend.reset())
        self.state = obs_to_state(obs[0])
        return self.state

    def step(self, action01):
        """Run one external-sim step from a [0,1] controller action.

        Returns (state, stable) like the reference wrapper
        (flightmare.py:101-117).
        """
        obs, _, _, _ = self.backend.step(action_to_fm(action01))
        self.state = obs_to_state(np.asarray(obs)[0])
        stable = bool(np.all(np.abs(self.state[3:5]) < self.thresh_stable))
        return self.state, stable


class MockFlightgymBackend:
    """In-repo stand-in for the C++ flightgym sim: integrates our own quad
    dynamics behind the flightgym observation/action conventions, so the
    adapter (and anything built on it) is testable without the external
    dependency. Observations are [pos, euler zyx, vel, rates].

    Attitude-domain caveat (inherited from the reference convention): the
    adapter's ``transform_borders`` folds angles toward zero beyond
    |angle| > pi/2 (flightmare.py:51-55), so the adapter<->backend round
    trip is exact only for |roll|, |pitch|, |yaw| < pi/2. Larger attitudes
    are far past every stability threshold used in this framework
    (<= 0.8 rad) and are reported unstable either way — same behavior the
    reference exhibits against the real flightgym."""

    def __init__(self, dt=0.1, init_state=None):
        import jax.numpy as jnp  # deferred: adapter itself is numpy-only

        from apg_trajectory_tracking_tpu.dynamics.quad import (
            quad_params,
            quad_step,
        )

        self._jnp = jnp
        self._step = quad_step
        self._params = quad_params()
        self.dt = dt
        self._state = (
            np.zeros(12, dtype=np.float32)
            if init_state is None
            else np.asarray(init_state, dtype=np.float32)
        )

    def _obs(self):
        s = self._state
        obs = np.zeros((1, 12), dtype=np.float32)
        obs[0, :3] = s[:3]
        obs[0, 3] = s[5]  # yaw   (zyx order)
        obs[0, 4] = s[4]  # pitch
        obs[0, 5] = s[3]  # roll
        obs[0, 6:9] = s[6:9]
        obs[0, 9:12] = s[9:12]
        return obs

    def reset(self):
        return self._obs()

    def step(self, physical_actions):
        # invert the adapter's action_to_fm: back to the normalized [0,1]
        # convention our quad_step consumes (quad.py:79-86)
        phys = np.asarray(physical_actions, dtype=np.float32)[0]
        a01 = np.empty(4, dtype=np.float32)
        a01[0] = (phys[0] - 9.81 + 7.5) / 15.0
        a01[1:] = phys[1:] + 0.5
        nxt = self._step(
            self._params,
            self._jnp.asarray(self._state[None]),
            self._jnp.asarray(a01[None]),
            self.dt,
        )
        self._state = np.asarray(nxt)[0]
        return self._obs(), 0.0, False, {}


class NativeQuadSimBackend:
    """The in-repo EXTERNAL simulator: the Flightmare quad model compiled
    to a C++ shared library (native/quad_sim.cc), driven through ctypes
    behind the flightgym vec-env surface. Unlike the mock, every dynamics
    step executes outside Python/JAX entirely — the same process boundary
    the reference crosses into flightgym's C++ sim (flightmare.py:8-117).

    ``params16``: optional [mass, inertia(3), kinv(3), gravity(3),
    translational_drag(3), rotational_drag(3)] override (e.g. a mismatched
    sim for sim-to-sim robustness runs).
    """

    def __init__(self, dt=0.1, init_state=None, params16=None):
        import ctypes

        from apg_trajectory_tracking_tpu.utils.native_runtime import (
            build_native,
        )

        self._lib = ctypes.CDLL(build_native(lib_name="libapgsim.so"))
        self._lib.qsim_create.restype = ctypes.c_void_p
        self._lib.qsim_create.argtypes = [
            ctypes.c_float, ctypes.POINTER(ctypes.c_float)
        ]
        self._lib.qsim_free.argtypes = [ctypes.c_void_p]
        for fn in ("qsim_reset", "qsim_get_obs"):
            getattr(self._lib, fn).argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)
            ]
        self._lib.qsim_step.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        p_arg = None
        if params16 is not None:
            p16 = np.asarray(params16, dtype=np.float32)
            assert p16.shape == (16,), "params16 must be 16 floats"
            p_arg = p16.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        self._sim = self._lib.qsim_create(ctypes.c_float(dt), p_arg)
        if not self._sim:
            raise RuntimeError("qsim_create failed")
        self._ctypes = ctypes
        self._init_state = (
            np.zeros(12, dtype=np.float32)
            if init_state is None
            else np.asarray(init_state, dtype=np.float32)
        )
        self.reset()

    def __del__(self):
        if getattr(self, "_sim", None):
            self._lib.qsim_free(self._sim)
            self._sim = None

    def _fptr(self, arr):
        return arr.ctypes.data_as(self._ctypes.POINTER(self._ctypes.c_float))

    def reset(self):
        st = np.ascontiguousarray(self._init_state, dtype=np.float32)
        self._lib.qsim_reset(self._sim, self._fptr(st))
        obs = np.zeros((1, 12), dtype=np.float32)
        self._lib.qsim_get_obs(self._sim, self._fptr(obs[0]))
        return obs

    def step(self, physical_actions):
        act = np.ascontiguousarray(
            np.asarray(physical_actions, dtype=np.float32)[0]
        )
        obs = np.zeros((1, 12), dtype=np.float32)
        self._lib.qsim_step(self._sim, self._fptr(act), self._fptr(obs[0]))
        return obs, 0.0, False, {}


def evaluate_external(predict_fn, backend_factory, references, ref_len,
                      thresh_div=1.0, thresh_stable=1.0, max_steps=251,
                      dt=0.1, horizon=10, window_len=None, reset_fn=None):
    """Closed-loop tracking eval through an external simulator backend.

    The host-loop counterpart of ``evaluation.quad_eval.run_eval`` with
    test-time break semantics: same reference windows
    (``array_ref_window``), same divergence definition (distance to the
    next reference row), same metric formulas (``metrics_from_rollout``) —
    only the dynamics run in the external backend instead of the jitted
    scan. This is the sim-to-sim evaluation the reference performs against
    Flightmare (evaluate_drone.py:409-418, flightmare.py:14-117).

    Args:
        predict_fn: (state (12,), window (window_len, 9)) -> action (4,)
            in [0, 1] — one controller decision.
        backend_factory: kwargs (dt, init_state) -> flightgym-style
            backend (e.g. ``NativeQuadSimBackend``).
        references: (n, T, 9) prepared reference trajectories.
        ref_len: usable reference length (as in run_eval).
        reset_fn: optional callable invoked at each trajectory start
            (e.g. to reset a recurrent controller's hidden state).
    Returns:
        the run_eval metrics dict.

    Caveat (inherited reference convention): the stability predicate runs
    on the adapter's ``transform_borders``-folded attitude, so raw
    |roll/pitch| beyond ~2.14 rad folds back under a 1.0 threshold where
    the jitted evaluator's ``quad_is_stable`` sees the raw angle — the
    same behavior the reference exhibits against flightgym
    (flightmare.py:51-55). In practice the divergence break fires long
    before such attitudes; the CLI smoke test pins the agreement.
    """
    import jax
    import jax.numpy as jnp

    from apg_trajectory_tracking_tpu.evaluation.quad_eval import (
        metrics_from_rollout,
    )
    from apg_trajectory_tracking_tpu.trajectory.refs import array_ref_window

    refs = np.asarray(references, dtype=np.float32)
    n = refs.shape[0]
    if window_len is None:
        window_len = horizon
    windows_fn = jax.jit(jax.vmap(
        lambda ref_i, i: array_ref_window(ref_i, i, window_len),
        in_axes=(None, 0),
    ))
    divs = np.zeros((n, max_steps), dtype=np.float32)
    valid = np.zeros((n, max_steps), dtype=bool)
    for t in range(n):
        ref = refs[t]
        windows = np.asarray(
            windows_fn(jnp.asarray(ref), jnp.arange(max_steps))
        )
        s0 = np.zeros(12, dtype=np.float32)
        s0[:3] = ref[0, :3]
        sim = ExternalSimAdapter(
            backend_factory(dt=dt, init_state=s0), thresh_stable
        )
        state = sim.reset()
        if reset_fn is not None:
            reset_fn()
        for i in range(max_steps):
            if i > ref_len:
                break
            action = predict_fn(state, windows[i])
            state, stable = sim.step(action)
            j = min(i + 1, ref.shape[0] - 1)
            div = float(np.linalg.norm(ref[j, :3] - state[:3]))
            divs[t, i] = div
            valid[t, i] = True
            if div > thresh_div or not stable:
                break
    return metrics_from_rollout(divs, valid, thresh_div, max_steps, ref_len)

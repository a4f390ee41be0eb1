"""ctypes bindings for the native controller runtime (native/).

Builds ``libapgctrl.so`` on demand with the repo Makefile and exposes the
exported model's decision path to Python — used by the parity tests
(tests/test_native_runtime.py) and by latency comparisons; production
Python paths keep using the JAX forward.
"""

import ctypes
import os
import subprocess

import numpy as np

_REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
NATIVE_DIR = os.path.join(_REPO, "native")


def build_native(force=False, lib_name="libapgctrl.so"):
    """Compile the native runtime; returns the shared-library path.

    ``lib_name`` selects which built artifact to return (the Makefile's
    ``all`` builds every one): ``libapgctrl.so`` (controller runtime) or
    ``libapgsim.so`` (the external C++ simulators: quad, cartpole, wing).

    Raises RuntimeError (with the compiler output) on failure so callers
    (tests) can skip cleanly when no toolchain is available.
    """
    lib = os.path.join(NATIVE_DIR, "build", lib_name)
    srcs = [os.path.join(NATIVE_DIR, f)
            for f in ("apg_controller.cc", "apg_controller.h",
                      "quad_sim.cc", "quad_sim.h",
                      "cartpole_sim.cc", "cartpole_sim.h",
                      "wing_sim.cc", "wing_sim.h",
                      "closed_loop_main.cc",
                      "latency_main.cc", "Makefile")]
    if (not force and os.path.exists(lib)
            and os.path.getmtime(lib) >= max(os.path.getmtime(s)
                                             for s in srcs)):
        return lib
    proc = subprocess.run(
        ["make", "-C", NATIVE_DIR, "all"],
        capture_output=True, text=True,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"native build failed:\n{proc.stdout}\n{proc.stderr}"
        )
    return lib


class NativeController:
    """A loaded .apgc model (see scripts/export_controller.py)."""

    def __init__(self, model_path, lib_path=None):
        lib_path = lib_path or build_native()
        self._lib = ctypes.CDLL(lib_path)
        self._lib.apgc_load.restype = ctypes.c_void_p
        self._lib.apgc_load.argtypes = [ctypes.c_char_p]
        self._lib.apgc_free.argtypes = [ctypes.c_void_p]
        for fn in ("apgc_forward", "apgc_quad_predict", "apgc_wing_predict"):
            getattr(self._lib, fn).restype = ctypes.c_int
            getattr(self._lib, fn).argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
            ]
        self._lib.apgc_cartpole_predict.restype = ctypes.c_int
        self._lib.apgc_cartpole_predict.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        self._lib.apgc_lstm_predict.restype = ctypes.c_int
        self._lib.apgc_lstm_predict.argtypes = [
            ctypes.c_void_p] + [ctypes.POINTER(ctypes.c_float)] * 5
        self._lib.apgc_info.restype = ctypes.c_int
        self._lib.apgc_info.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32)
        ]
        self._m = self._lib.apgc_load(model_path.encode())
        if not self._m:
            raise RuntimeError(f"apgc_load failed for {model_path}")
        dims = (ctypes.c_int32 * 8)()
        self._lib.apgc_info(self._m, dims)
        (self.state_dim, self.window, self.ref_dim, self.out_dim,
         self.action_dim, conv, self.hidden, kind) = [int(d) for d in dims]
        self.conv = bool(conv)
        self.kind = {0: "control_net", 1: "cartpole_net", 2: "lstm_net"}[kind]

    def init_carry(self):
        """Zero (h, c) carry for an LSTM model (episode start)."""
        return (np.zeros(self.hidden, dtype=np.float32),
                np.zeros(self.hidden, dtype=np.float32))

    def lstm_predict(self, state, ref_abs, carry):
        """Recurrent quad decision: raw (12,) state + absolute (window, 9)
        window + (h, c) carry -> ((out_dim,) actions, new (h, c)).
        Thread the RETURNED carry into the next call (float32 carries are
        updated in place; other dtypes are converted first, so the inputs
        would be left stale)."""
        s, sp = self._buf(state)
        r, rp = self._buf(ref_abs)
        h, _ = self._buf(carry[0])
        c, _ = self._buf(carry[1])
        assert s.size == 12 and r.size == self.window * 9
        assert h.size == self.hidden and c.size == self.hidden
        out = np.empty(self.out_dim, dtype=np.float32)
        rc = self._lib.apgc_lstm_predict(
            self._m, sp, rp,
            h.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != 0:
            raise RuntimeError("apgc_lstm_predict failed (not LSTM?)")
        return out, (h, c)

    def _buf(self, arr):
        a = np.ascontiguousarray(arr, dtype=np.float32)
        return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

    def forward(self, in_state, in_ref):
        """Net-only forward on featurized inputs; returns (out_dim,)
        sigmoid-activated actions."""
        s, sp = self._buf(in_state)
        r, rp = self._buf(in_ref)
        assert s.size == self.state_dim and r.size == self.window * self.ref_dim
        out = np.empty(self.out_dim, dtype=np.float32)
        rc = self._lib.apgc_forward(
            self._m, sp, rp, out.ctypes.data_as(
                ctypes.POINTER(ctypes.c_float))
        )
        if rc != 0:
            raise RuntimeError("apgc_forward failed")
        return out

    def quad_predict(self, state, ref_abs):
        """Full quad decision: raw (12,) state + absolute (window, 9)
        reference window -> (out_dim,) actions in [0, 1]."""
        s, sp = self._buf(state)
        r, rp = self._buf(ref_abs)
        assert s.size == 12 and r.size == self.window * 9
        out = np.empty(self.out_dim, dtype=np.float32)
        rc = self._lib.apgc_quad_predict(
            self._m, sp, rp, out.ctypes.data_as(
                ctypes.POINTER(ctypes.c_float))
        )
        if rc != 0:
            raise RuntimeError("apgc_quad_predict failed (not a quad model?)")
        return out

    def wing_predict(self, state, target):
        """Full wing decision: raw (12,) state + absolute (3,) target
        waypoint -> (out_dim,) actions in [0, 1]."""
        s, sp = self._buf(state)
        t, tp = self._buf(target)
        assert s.size == 12 and t.size == 3
        out = np.empty(self.out_dim, dtype=np.float32)
        rc = self._lib.apgc_wing_predict(
            self._m, sp, tp, out.ctypes.data_as(
                ctypes.POINTER(ctypes.c_float))
        )
        if rc != 0:
            raise RuntimeError("apgc_wing_predict failed (not a wing model?)")
        return out

    def cartpole_predict(self, state):
        """Cartpole decision: raw (4,) state -> (out_dim,) actions in
        [-1, 1]."""
        s, sp = self._buf(state)
        assert s.size == 4
        out = np.empty(self.out_dim, dtype=np.float32)
        rc = self._lib.apgc_cartpole_predict(
            self._m, sp, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )
        if rc != 0:
            raise RuntimeError(
                "apgc_cartpole_predict failed (not a cartpole model?)"
            )
        return out

    def close(self):
        if getattr(self, "_m", None):
            self._lib.apgc_free(self._m)
            self._m = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def native_quad_rollout(nc, reference, ref_len, step_fn, thresh_div=1.0,
                        thresh_stable=1.0, max_steps=251):
    """Closed-loop TEST-TIME quad rollout driven by the native controller.

    Mirrors ``evaluation/quad_eval.follow_trajectories`` semantics for one
    trajectory (test_time=True): start at the first reference point,
    reference window per ``trajectory/refs.array_ref_window`` (end-of-
    trajectory rows pin position, zero the rest), divergence = distance to
    reference[i+1], break (freeze state) on divergence or instability.
    Used to validate the deployed artifact under the paper's actual eval
    protocol (tests/test_native_runtime.py).

    Args:
        nc: a NativeController for a quad model (MLP or LSTM kind).
        reference: (T, 9) prepared reference trajectory.
        ref_len: usable reference length (as in run_eval).
        step_fn: (state (12,), action (4,)) -> next state — the dynamics
            step (tests inject the jitted quad_step).
    Returns:
        (divergences (max_steps,), valid (max_steps,) bool) numpy arrays —
        the per-trajectory slices of follow_trajectories' outputs.
    """
    reference = np.asarray(reference, dtype=np.float32)
    T = reference.shape[0]
    state = np.zeros(12, dtype=np.float32)
    state[:3] = reference[0, :3]
    carry = nc.init_carry() if nc.kind == "lstm_net" else None

    divs = np.zeros(max_steps, dtype=np.float32)
    valid = np.zeros(max_steps, dtype=bool)
    done = False
    offsets = np.arange(nc.window)
    pad_row = np.zeros(9, dtype=np.float32)
    pad_row[:3] = reference[-1, :3]
    for i in range(max_steps):
        idx = i + 1 + offsets
        window = reference[np.minimum(idx, T - 1)].copy()
        window[idx >= T] = pad_row
        if carry is not None:
            act, carry = nc.lstm_predict(state, window, carry)
        else:
            act = nc.quad_predict(state, window)
        new_state = np.asarray(step_fn(state, act[:4]), dtype=np.float32)

        stable = bool(np.all(np.abs(new_state[3:5]) < thresh_stable))
        proj = reference[min(i + 1, T - 1), :3]
        div = float(np.linalg.norm(proj - new_state[:3]))
        divs[i] = div
        valid[i] = (not done) and (i <= ref_len)
        if not done:
            state = new_state
            done = div > thresh_div or not stable
    return divs, valid

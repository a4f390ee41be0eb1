"""Import the reference implementation (read-only, at /root/reference) as a
numerical test oracle.

The reference's torch dynamics import ``casadi`` (and build symbolic params in
``__init__``) even though the torch compute path never touches them. We stub
``casadi`` so the torch math — the behavior we must match — can run as-is.

Tests that use this module skip automatically when the reference checkout is
absent (e.g. on a user machine).
"""

import os
import sys
import types

import pytest

REFERENCE_PATH = os.environ.get("APG_REFERENCE_PATH", "/root/reference")


class _StubSX:
    """Minimal stand-in for casadi.SX: stores whatever it is given."""

    def __init__(self, value=None):
        self.value = value

    @staticmethod
    def sym(*args, **kwargs):
        return _StubSX()

    def __mul__(self, other):
        return _StubSX()

    __rmul__ = __mul__
    __truediv__ = __mul__
    __rtruediv__ = __mul__
    __add__ = __mul__
    __radd__ = __mul__
    __sub__ = __mul__
    __rsub__ = __mul__


def _install_gym_stub():
    """Minimal gym stand-in so reference modules that subclass gym.Env
    (drone_env.py:10-32, imported transitively by neural_control.dataset)
    load without the real gym package."""
    if "gym" in sys.modules:
        return
    gym = types.ModuleType("gym")

    class _Env:
        pass

    gym.Env = _Env
    spaces = types.ModuleType("gym.spaces")

    class _Box:
        def __init__(self, *a, **k):
            pass

    spaces.Box = _Box
    utils = types.ModuleType("gym.utils")
    seeding = types.ModuleType("gym.utils.seeding")

    def np_random(seed=None):
        import numpy as _np

        return _np.random.RandomState(seed), seed

    seeding.np_random = np_random
    utils.seeding = seeding
    gym.spaces = spaces
    gym.utils = utils
    sys.modules["gym"] = gym
    sys.modules["gym.spaces"] = spaces
    sys.modules["gym.utils"] = utils
    sys.modules["gym.utils.seeding"] = seeding


def _install_pyglet_stub():
    """Permissive pyglet stand-in (rendering imports it at module load,
    cartpole_rendering.py:11; nothing is called in headless tests)."""
    if "pyglet" in sys.modules:
        return

    class _Anything(types.ModuleType):
        def __getattr__(self, name):
            if name.startswith("__"):
                raise AttributeError(name)
            value = _Anything(self.__name__ + "." + name)
            setattr(self, name, value)
            return value

        def __call__(self, *a, **k):
            return _Anything(self.__name__ + "()")

    for name in ("pyglet", "pyglet.gl", "pyglet.graphics", "pyglet.window",
                 "pyglet.canvas"):
        mod = _Anything(name)
        mod.__all__ = []  # star-imports resolve to nothing
        sys.modules[name] = mod


def _install_pyquaternion_stub():
    """q_funcs imports pyquaternion at module load (q_funcs.py:2); the
    rollout-parity path never calls it."""
    if "pyquaternion" in sys.modules:
        return
    mod = types.ModuleType("pyquaternion")

    class Quaternion:
        def __init__(self, *a, **k):
            pass

    mod.Quaternion = Quaternion
    sys.modules["pyquaternion"] = mod


def _install_casadi_stub():
    if "casadi" in sys.modules:
        return
    stub = types.ModuleType("casadi")
    stub.SX = _StubSX
    stub.MX = _StubSX
    for name in (
        "vertcat", "cos", "sin", "tan", "atan", "sqrt", "cross",
        "Function", "constpow", "nlpsol",
    ):
        setattr(stub, name, lambda *a, **k: _StubSX())
    stub.pi = 3.141592653589793
    stub.inf = float("inf")
    sys.modules["casadi"] = stub


def load_reference_dynamics():
    """Return the reference dynamics modules, or skip the calling test."""
    import os

    if not os.path.isdir(REFERENCE_PATH):
        pytest.skip("reference checkout not available")
    _install_casadi_stub()
    _install_gym_stub()
    _install_pyglet_stub()
    _install_pyquaternion_stub()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    try:
        from neural_control.dynamics import quad_dynamics_flightmare
        from neural_control.dynamics import quad_dynamics_simple
        from neural_control.dynamics import cartpole_dynamics
        from neural_control.dynamics import fixed_wing_dynamics
    except Exception as exc:  # pragma: no cover
        pytest.skip(f"reference import failed: {exc}")
    return types.SimpleNamespace(
        quad=quad_dynamics_flightmare,
        quad_simple=quad_dynamics_simple,
        cartpole=cartpole_dynamics,
        wing=fixed_wing_dynamics,
    )

"""Live viewer (utils/live_view.py) — headless replay of flown rollouts.

Counterpart of the reference's pyglet ``Renderer`` + scene objects
(``neural_control/environments/rendering.py:57-308``). Under the Agg
backend the viewer renders offscreen and ``render()`` returns RGB frames,
which is what these tests assert on.
"""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from apg_trajectory_tracking_tpu.utils.live_view import (
    LiveViewer,
    QuadCopter2D,
    Trajectory,
    frames_to_gif,
    replay_cartpole,
    replay_quad,
    replay_wing,
)


def _quad_states(t):
    """Synthetic (T, 12) arc: x sweeps, z bobs, pitch oscillates."""
    s = np.zeros((t, 12), dtype=np.float32)
    ts = np.linspace(0, 1, t)
    s[:, 0] = 5.0 * ts
    s[:, 2] = 3.0 + np.sin(2 * np.pi * ts)
    s[:, 4] = 0.3 * np.sin(4 * np.pi * ts)
    return s


def test_viewer_headless_returns_frames():
    viewer = LiveViewer(dt=0.05, figsize=(2.0, 2.0))
    assert not viewer.interactive  # Agg
    assert not viewer.realtime  # no wall-clock pacing when headless
    viewer.add_object("quad", QuadCopter2D())
    viewer.add_object("ref", Trajectory(_quad_states(10)))
    viewer.set_center((0.0, 3.0))
    frame = viewer.render(quad=_quad_states(1)[0], ref=None)
    assert frame.dtype == np.uint8
    assert frame.ndim == 3 and frame.shape[2] == 3
    assert frame.shape[0] > 50 and frame.shape[1] > 50
    viewer.close()


def test_replay_quad_collects_frames():
    states = _quad_states(12)
    n, frames = replay_quad(
        states, reference=states[:, :3], dt=0.05, collect_every=4
    )
    assert n == 12
    assert len(frames) == 3  # i = 0, 4, 8
    # follow camera + moving quad: consecutive collected frames differ
    assert not np.array_equal(frames[0], frames[-1])


def test_replay_quad_max_frames():
    n, _ = replay_quad(_quad_states(30), dt=0.05, max_frames=7)
    assert n == 7


def test_replay_cartpole():
    t = 10
    states = np.zeros((t, 4), dtype=np.float32)
    states[:, 0] = np.linspace(-1, 1, t)
    states[:, 2] = np.linspace(-0.2, 0.2, t)
    n, frames = replay_cartpole(states, collect_every=1)
    assert n == t and len(frames) == t
    assert not np.array_equal(frames[0], frames[-1])


def test_replay_wing():
    t = 10
    states = np.zeros((t, 12), dtype=np.float32)
    states[:, 0] = np.linspace(0, 50, t)
    states[:, 2] = np.linspace(0, 4, t)
    states[:, 7] = 0.1
    n, frames = replay_wing(
        states, target=np.array([50.0, 0.0, 4.0]), collect_every=9
    )
    assert n == t and len(frames) == 2
    assert not np.array_equal(frames[0], frames[-1])


def test_frames_to_gif(tmp_path):
    _, frames = replay_quad(_quad_states(8), dt=0.05, collect_every=2)
    out = str(tmp_path / "replay.gif")
    frames_to_gif(frames, out, dt=0.05, collect_every=2)
    import os

    assert os.path.getsize(out) > 1000
    # sim-time pacing: each kept frame spans collect_every sim steps
    from PIL import Image

    with Image.open(out) as img:
        assert img.info["duration"] == 100  # 0.05 s * 2 * 1000
    with pytest.raises(ValueError):
        frames_to_gif([], out)


def test_quad_rotor_stalks_perpendicular_to_arm():
    """Regression: the stalk offset must be the +90-degree rotation of the
    pitched arm direction, not of its mirror."""
    viewer = LiveViewer(figsize=(2.0, 2.0))
    quad = viewer.add_object("quad", QuadCopter2D(trace=False))
    state = np.zeros(12, dtype=np.float32)
    state[4] = 0.3  # pitch
    viewer.render(quad=state)
    body, rotors, _ = quad._artists
    bx, bz = body.get_data()
    rx, rz = rotors.get_data()
    arm = np.array([bx[1] - bx[0], bz[1] - bz[0]])
    stalk = np.array([rx[0] - bx[0], rz[0] - bz[0]])
    assert abs(np.dot(arm, stalk)) < 1e-6
    viewer.close()


def test_wing_ned_altitude_up():
    """The wing state is NED (z positive down): a climbing wing must trace
    UPWARD on screen, and the target marker must flip the same way."""
    from apg_trajectory_tracking_tpu.utils.live_view import WingDrone

    viewer = LiveViewer(figsize=(2.0, 2.0))
    drone = viewer.add_object("wing", WingDrone())
    drone.set_target(np.array([30.0, 0.0, -5.0]))  # 5 m ABOVE start
    climb = np.zeros((4, 12), dtype=np.float32)
    climb[:, 0] = np.linspace(0, 10, 4)
    climb[:, 2] = np.linspace(0, -4, 4)  # NED: climbing
    for s in climb:
        viewer.render(wing=s)
    _, trace, _ = drone._artists
    ys = trace.get_data()[1]
    assert np.all(np.diff(ys) > 0)  # screen altitude increases
    tx, ty = drone._tgt_artist.get_data()
    assert ty[0] == 5.0
    viewer.close()


def test_add_object_removes_replaced_artists():
    """Re-registering a name into a shared viewer must not leave the old
    object's artists frozen on the axes (ghost vehicles)."""
    viewer = LiveViewer(figsize=(2.0, 2.0))
    viewer.add_object("quad", QuadCopter2D())
    viewer.render(quad=_quad_states(1)[0])
    n_artists = len(viewer.ax.lines)
    viewer.add_object("quad", QuadCopter2D())
    viewer.render(quad=_quad_states(1)[0])
    assert len(viewer.ax.lines) == n_artists
    viewer.close()


@pytest.mark.parametrize("shared", [True, False])
def test_shared_viewer_vs_owned(shared):
    """A caller-provided viewer is reused (and left open) — the CLIs'
    pattern for replaying several rollouts into one window."""
    states = _quad_states(5)
    if shared:
        viewer = LiveViewer(dt=0.05, figsize=(2.0, 2.0))
        n, _ = replay_quad(states, viewer=viewer)
        n2, _ = replay_quad(states, viewer=viewer)
        assert n == n2 == 5
        viewer.close()
    else:
        n, _ = replay_quad(states)
        assert n == 5

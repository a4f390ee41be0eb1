"""Offline random-trajectory dataset generation and loading.

Re-designs ``neural_control/trajectory/generate_trajectory.py`` (GP-sampled
feasible quadrotor trajectories via differential flatness,
compute_random_trajectory:325-467, compute_full_traj:223-322,
make_dataset:608-657, load_prepare_trajectory:566-605) as a vectorized numpy
pipeline — the casadi symbolic time-warp is replaced by directly evaluating
its closed-form integrand, and the per-index python loops of the flatness /
yaw-minimization stage are batched over the whole trajectory.

This is host-side, run-once tooling; the training/eval hot paths consume the
resulting arrays on device.

Trajectory file layout (same as the reference, 10 columns at dt=0.01):
    [pos(3), attitude quaternion wxyz(4), vel(3)]
"""

import json
import os

import numpy as np
from scipy import interpolate
from sklearn.gaussian_process import GaussianProcessRegressor
from sklearn.gaussian_process.kernels import ExpSineSquared

from apg_trajectory_tracking_tpu.trajectory.quaternions import (
    q_conjugate,
    q_mult,
    q_normalize,
    quaternion_to_euler,
)

# arena bounds used by the reference dataset (make_dataset, line 626-627)
ARENA_MAX = np.array([6.5, 10.0, 10.0])
ARENA_MIN = np.array([-6.5, -10.0, 0.0])
DEFAULT_FREQS = (0.9, 0.7, 0.7)

# kernel periodicities per axis (compute_random_trajectory:343-357)
_PERIODS = {
    "x": (37, 61, 13),
    "y": (17, 23, 51),
    "z": (19, 29, 53),
}


def _axis_kernel(length_scale, periods):
    return (
        ExpSineSquared(length_scale=length_scale, periodicity=periods[0])
        + ExpSineSquared(length_scale=3.0, periodicity=periods[1])
        + ExpSineSquared(length_scale=4.0, periodicity=periods[2])
    )


def _smooth(x, window_len=11):
    """Edge-replicated hanning smoothing (generate_trajectory.py:158-222)."""
    pad = (window_len - 1) // 2
    s = np.concatenate([np.repeat(x[0], pad), x, np.repeat(x[-1], pad)])
    w = np.hanning(window_len)
    return np.convolve(w / w.sum(), s, mode="valid")


def _time_warp(t, duration):
    """Closed-form smooth time reparameterization, zero velocity at both
    ends (the casadi integrand at compute_random_trajectory:368-392,
    evaluated directly)."""
    tau = t / duration
    pi = np.pi
    s, c = np.sin(tau * pi), np.cos(tau * pi)
    s2, c2 = np.sin(2 * tau * pi), np.cos(2 * tau * pi)
    return (
        1.524 * duration
        * -(8 * c * s**5 + 10 * c * s**3 + 39 * s * c + 12 * s2 * c2
            - 63 * tau * pi)
        / (96 * pi)
    )


def _attitude_from_flatness(pos, vel, acc, dt, n_yaw_iters=20):
    """Quaternion attitude + body rates from the flat outputs.

    Vectorized version of compute_full_traj (generate_trajectory.py:223-322):
    thrust direction -> attitude quaternion, numeric q_dot -> body rates,
    then iterative yaw-rate minimization (cumulative yaw counter-rotation).
    """
    thrust = acc + np.array([0.0, 0.0, 9.81])
    z_b = thrust / np.linalg.norm(thrust, axis=1, keepdims=True)
    e_z = np.array([0.0, 0.0, 1.0])
    q_w = 1.0 + z_b[:, 2]
    q_xyz = np.cross(np.tile(e_z, (len(z_b), 1)), z_b)
    att = q_normalize(0.5 * np.concatenate([q_w[:, None], q_xyz], axis=1))

    def rates_of(q):
        q_dot = np.gradient(q, axis=0) / dt
        return 2.0 * q_mult(q_conjugate(q), q_dot)[:, 1:]

    rate = rates_of(att)
    for _ in range(n_yaw_iters):
        yaw_corr_acc = np.cumsum(-rate[:, 2] * dt)
        # index 0 keeps the original attitude (reference loops from i=1)
        yaw_corr_acc[0] = 0.0
        q_corr = np.stack(
            [
                np.cos(yaw_corr_acc / 2.0),
                np.zeros_like(yaw_corr_acc),
                np.zeros_like(yaw_corr_acc),
                np.sin(yaw_corr_acc / 2.0),
            ],
            axis=1,
        )
        att = q_mult(att, q_corr)
        rate = rates_of(att)
        if np.max(np.abs(rate[:, 2])) < 0.005:
            break
    return att, rate


def generate_one_trajectory(
    seed,
    duration=10.0,
    dt=0.01,
    arena_max=ARENA_MAX,
    arena_min=ARENA_MIN,
    freqs=DEFAULT_FREQS,
):
    """One GP-sampled smooth feasible trajectory, (duration/dt, 10)."""
    t_coarse = np.linspace(0.0, duration, int(duration / 0.1), endpoint=False)
    t_vec = np.linspace(0.0, duration, int(duration / dt), endpoint=False)

    samples = []
    for axis, ls, seed_off in zip("xyz", freqs, range(3)):
        gp = GaussianProcessRegressor(kernel=_axis_kernel(ls, _PERIODS[axis]))
        samples.append(
            gp.sample_y(t_coarse[:, None], 1, random_state=seed + seed_off)
        )
    pos = np.concatenate(samples, axis=1)

    # rescale into the arena
    hi, lo = pos.max(axis=0), pos.min(axis=0)
    pos = (pos - (hi + lo) / 2.0) * (arena_max - arena_min) / (hi - lo)
    pos = pos + (arena_max + arena_min) / 2.0

    # smooth start/end via time warp + cubic interpolation
    warped = _time_warp(t_vec, duration)
    pos = np.stack(
        [
            interpolate.interp1d(
                t_coarse, pos[:, i], kind="cubic", fill_value="extrapolate"
            )(warped)
            for i in range(3)
        ],
        axis=1,
    )
    pos = np.stack([_smooth(pos[:, i]) for i in range(3)], axis=1)

    vel = np.gradient(pos, axis=0) / dt
    vel = np.stack([_smooth(vel[:, i]) for i in range(3)], axis=1)
    acc = np.gradient(vel, axis=0) / dt
    acc = np.stack([_smooth(acc[:, i]) for i in range(3)], axis=1)

    att, _ = _attitude_from_flatness(pos, vel, acc, dt)
    return np.concatenate([pos, att, vel], axis=1).astype(np.float32)


def generate_trajectory_bank(
    out_dir, n_train=200, n_test=20, duration=10.0, dt=0.01, seed=0
):
    """Generate and save a train/test bank of random trajectories.

    Same on-disk layout as the reference dataset (``train/traj_<i>.npy``,
    ``test/traj_<i>.npy`` + config.json) so external tooling can reuse it.

    The split assignment depends on (seed, n_train, n_test): regenerating
    an existing bank with different sizes would silently move seeds across
    the train/test boundary (test contamination), so that is refused —
    generate differently-sized banks into fresh directories (the CI
    default is 200/20 in data/traj_data; the full-scale eval bank is
    1000/100 in data/traj_data_full, ~17 s to generate).
    """
    marker = os.path.join(out_dir, "config.json")
    if os.path.exists(marker):
        with open(marker) as f:
            prev = json.load(f)
        if (prev.get("n_train"), prev.get("n_test")) != (n_train, n_test):
            raise ValueError(
                f"{out_dir} already holds a {prev.get('n_train')}/"
                f"{prev.get('n_test')} bank; resizing in place would move "
                "seeds across the train/test split — use a fresh out_dir"
            )
    rng = np.random.RandomState(seed)
    seeds = rng.permutation(100000)[: n_train + n_test]
    for sub in ("train", "test"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)
    for i, s in enumerate(seeds):
        sub = "train" if i < n_train else "test"
        path = os.path.join(out_dir, sub, f"traj_{s}.npy")
        if not os.path.exists(path):
            np.save(path, generate_one_trajectory(int(s), duration, dt))
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(
            {
                "duration": duration,
                "dt": dt,
                "n_train": n_train,
                "n_test": n_test,
                "freq_x": DEFAULT_FREQS[0],
                "freq_y": DEFAULT_FREQS[1],
                "freq_z": DEFAULT_FREQS[2],
            },
            f,
        )
    return out_dir


def load_trajectory_bank(base_dir, test=False):
    """Load all trajectories of a split as one (N, T, 10) array.

    TPU-first: the whole bank lives in one array so per-epoch sampling is a
    gather, not filesystem I/O (replaces the per-call np.load of
    load_prepare_trajectory, generate_trajectory.py:580-583).
    """
    folder = os.path.join(base_dir, "test" if test else "train")
    files = sorted(os.listdir(folder))
    bank = np.stack([np.load(os.path.join(folder, f)) for f in files])
    return bank.astype(np.float32)


def prepare_trajectory(traj, dt, speed_factor):
    """Subsample a raw 10-col trajectory to control rate & speed factor.

    Mirrors ``load_prepare_trajectory`` (generate_trajectory.py:566-605)
    including its quirks: euler angles scaled by speed_factor, velocities by
    speed_factor * 2.

    Args:
        traj: (T, 10) raw trajectory at dt=0.01.
        dt: control timestep.
        speed_factor: replay speed in (0, 1].
    Returns:
        (T', 9) array of [pos(3), euler*sf(3), vel*2sf(3)].
    """
    # non-integer strides degrade gracefully like the reference's int()
    # truncation (generate_trajectory.py:587) — e.g. --speed 0.25 at
    # dt 0.1 gives stride 2.5 -> 2, replaying slightly slower than asked
    # rather than crashing. The 1e-9 nudge keeps binary-float artifacts
    # from flipping an intended-integer stride (dt=0.29 -> 28.999999...
    # must truncate to 29, not 28); genuinely fractional strides are far
    # from an integer so the nudge cannot change them.
    take_every = max(int(dt / 0.01 * speed_factor + 1e-9), 1)
    taken = traj[::take_every]
    euler = quaternion_to_euler(taken[:, 3:7])
    return np.concatenate(
        [
            taken[:, :3],
            euler * speed_factor,
            taken[:, 7:10] * speed_factor * 2.0,
        ],
        axis=1,
    ).astype(np.float32)


def ensure_trajectory_bank(base_dir="data/traj_data", n_train=200, n_test=20):
    """Generate the bank on first use; cheap no-op afterwards."""
    marker = os.path.join(base_dir, "config.json")
    if not os.path.exists(marker):
        generate_trajectory_bank(base_dir, n_train=n_train, n_test=n_test)
    return base_dir

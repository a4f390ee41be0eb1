"""Reference-trajectory objects for closed-loop evaluation, as jit-friendly
pure functions.

Re-designs ``neural_control/trajectory/{straight,circle,polynomial,
random_traj}.py``. Two families:

  * **array-backed** (Random replay, Polynomial): the full reference is a
    precomputed (T, 9) array; per-step windows / projections are gathers —
    usable inside ``lax.scan`` (replaces the stateful ``current_ind``
    counters with an explicit index argument);
  * **analytic** (Hover, Straight, Circle): the next window is computed from
    the drone state via the closed-form min-jerk planner each step.

Reference rows are ``[pos(3), att(3), vel(3)]`` for replay trajectories and
``[pos(3), vel(3), acc(3)]`` for min-jerk outputs — consumers only index
``[:3]`` and ``[6:9]`` consistently with the reference's conventions.
"""

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp
from jax import lax

from apg_trajectory_tracking_tpu.trajectory.minjerk import min_jerk_reference


# ---------------------------------------------------------------------------
# array-backed references (Random replay / Polynomial)
# ---------------------------------------------------------------------------


def array_ref_window(reference, ind, horizon):
    """Reference window [ind+1, ind+horizon] with end-of-trajectory padding.

    Mirrors ``Random.get_ref_traj`` (random_traj.py:61-80): past the end the
    position pins to the final point and all other columns are zero. (The
    reference's tail path starts its leftover slice at ``ind`` instead of
    ``ind+1`` — an off-by-one quirk active only in the last ``horizon``
    steps; we use the consistent ``ind+1`` indexing.)

    Args:
        reference: (T, D) array.
        ind: scalar int32 current index.
        horizon: python int.
    Returns:
        (horizon, D) window.
    """
    T = reference.shape[0]
    idx = ind + 1 + jnp.arange(horizon)
    clipped = jnp.minimum(idx, T - 1)
    window = reference[clipped]
    pad_row = jnp.zeros_like(reference[0]).at[:3].set(reference[-1, :3])
    valid = (idx < T)[:, None]
    return jnp.where(valid, window, pad_row)


def array_ref_project(reference, ind):
    """Projection = the reference point at the current index
    (random_traj.py:82-86)."""
    return reference[ind, :3]


def array_ref_full_state(reference, ind):
    """Full 12-dim state for reset-to-reference (random_traj.py:88-91)."""
    row = reference[ind]
    return jnp.concatenate([row, jnp.zeros(3, dtype=row.dtype)])


# ---------------------------------------------------------------------------
# straight / hover
# ---------------------------------------------------------------------------


class StraightState(NamedTuple):
    """Line through ``a`` with unit ``direction`` (straight.py:30-62)."""

    a: jnp.ndarray  # (3,)
    direction: jnp.ndarray  # (3,) unit


def straight_init(drone_pos, direction):
    d = direction / jnp.linalg.norm(direction)
    return StraightState(a=drone_pos, direction=d)


def straight_project(s: StraightState, pos):
    """Project onto the line (straight.py:88-103)."""
    ap = pos - s.a
    return s.a + jnp.dot(s.direction, ap) * s.direction


def _to_state_rows(minjerk_rows):
    """Remap raw min-jerk rows [pos, vel, acc] to the framework's
    state-layout reference rows [pos, att(=0), vel].

    Deliberate deviation (an upstream bug not reproduced): the reference
    feeds get_reference's [pos, vel, acc] rows straight into
    QuadDataset.prepare_data, which reads columns 6:9 as VELOCITY
    (plan_trajectory.py:701-734 vs dataset.py:191-204) — so its analytic
    hover/straight/circle evals give the controller acceleration where it
    was trained to see velocity. Fixing the layout takes the flagship's
    straight-line tracking from 0.29 err / 31 stable steps to 0.036 err /
    full 251 steps with no retraining.
    """
    return jnp.concatenate(
        [
            minjerk_rows[:, :3],
            jnp.zeros_like(minjerk_rows[:, :3]),
            minjerk_rows[:, 3:6],
        ],
        axis=1,
    )


def straight_ref_window(s: StraightState, drone_state, dt, horizon,
                        max_drone_dist):
    """Receding-horizon min-jerk reference along the line
    (straight.py:64-86)."""
    pos = drone_state[:3]
    vel = drone_state[6:9]
    projected = straight_project(s, pos)
    dist1 = jnp.sum((projected - pos) ** 2)
    dist_on_line = jnp.sqrt(jnp.maximum(max_drone_dist**2 - dist1, 0.0))
    goal_pos = projected + s.direction * dist_on_line
    goal_vel = (goal_pos - pos) / horizon
    return _to_state_rows(min_jerk_reference(
        pos, vel, jnp.zeros(3), goal_pos, goal_vel, dt, horizon
    ))


def hover_ref_window(target_pos, drone_state, dt, horizon):
    """Min-jerk to a fixed hover point (straight.py:5-27)."""
    return _to_state_rows(min_jerk_reference(
        drone_state[:3],
        drone_state[6:9],
        jnp.zeros(3),
        target_pos,
        jnp.zeros(3),
        dt,
        horizon,
    ))


# ---------------------------------------------------------------------------
# circle
# ---------------------------------------------------------------------------


class CircleState(NamedTuple):
    """Circle of ``radius`` in a coordinate ``plane`` around ``mid_point``
    (circle.py:5-63). ``plane`` axes are static python ints in the
    functions below."""

    mid_point: jnp.ndarray  # (3,)
    radius: jnp.ndarray  # scalar
    direction: jnp.ndarray  # scalar +-1


def circle_init(drone_pos, drone_vel, radius, direction, plane=(0, 1),
                fallback_vel=(0.3, 0.2)):
    """Initialize the center from the drone's position + velocity tangent
    (circle.py:43-63). ``fallback_vel`` replaces the reference's random
    in-plane velocity when the drone is at rest."""
    vel_2d = jnp.stack([drone_vel[plane[0]], drone_vel[plane[1]]])
    vel_2d = jnp.where(
        jnp.all(jnp.isclose(vel_2d, 0.0)),
        jnp.asarray(fallback_vel, dtype=jnp.float32),
        vel_2d,
    )
    orth = jnp.stack([-vel_2d[1], vel_2d[0]])
    unit = orth / jnp.linalg.norm(orth)
    mid_2d = (
        jnp.stack([drone_pos[plane[0]], drone_pos[plane[1]]])
        + unit * radius * direction
    )
    mid = drone_pos.astype(jnp.float32)
    mid = mid.at[plane[0]].set(mid_2d[0]).at[plane[1]].set(mid_2d[1])
    return CircleState(
        mid_point=mid,
        radius=jnp.asarray(radius, jnp.float32),
        direction=jnp.asarray(direction, jnp.float32),
    )


def _to_alpha(point_2d):
    """Angle on the circle with the reference's branch structure
    (circle.py:73-83)."""
    x, y = point_2d[0], point_2d[1]
    # arctan(y/x) then quadrant fixes: x<0 -> +pi; elif y<0 -> +2pi
    base = jnp.where(
        x == 0, jnp.pi * 0.5, jnp.arctan(y / jnp.where(x == 0, 1.0, x))
    )
    return jnp.where(
        x < 0, base + jnp.pi, jnp.where(y < 0, base + 2 * jnp.pi, base)
    )


def _to_2d(c: CircleState, point, plane):
    rel = point - c.mid_point
    return jnp.stack([rel[plane[0]], rel[plane[1]]])


def _to_3d(c: CircleState, point_2d, plane):
    out = c.mid_point
    out = out.at[plane[0]].add(point_2d[0])
    out = out.at[plane[1]].add(point_2d[1])
    return out


def circle_project(c: CircleState, pos, plane=(0, 1)):
    """Project a position onto the circle (circle.py:91-95,134-135)."""
    alpha = _to_alpha(_to_2d(c, pos, plane))
    on_circle = jnp.stack(
        [jnp.cos(alpha) * c.radius, jnp.sin(alpha) * c.radius]
    )
    return _to_3d(c, on_circle, plane)


def circle_ref_window(c: CircleState, drone_state, dt, horizon,
                      max_drone_dist, plane=(0, 1)):
    """Receding-horizon min-jerk reference along the circle
    (circle.py:97-151)."""
    pos = drone_state[:3]
    vel = drone_state[6:9]

    # next_target (circle.py:97-122)
    projected = circle_project(c, pos, plane)
    dist_to_circle = jnp.linalg.norm(pos - projected)

    point_2d = _to_2d(c, pos, plane)
    mask = jnp.ones(3).at[plane[0]].set(0.0).at[plane[1]].set(0.0)
    dist_to_plane = jnp.sum((pos - c.mid_point) * mask)
    dist = jnp.sqrt(
        jnp.maximum(max_drone_dist**2 - dist_to_plane**2, 1e-12)
    )
    dist_from_center = jnp.linalg.norm(point_2d)
    cos_alpha = (c.radius**2 + dist_from_center**2 - dist**2) / (
        2.0 * dist_from_center * c.radius
    )
    alpha_between = jnp.arccos(jnp.clip(cos_alpha, -1.0, 1.0))
    alpha = jnp.mod(
        _to_alpha(point_2d) + alpha_between * c.direction, 2 * jnp.pi
    )
    target_on_circle = _to_3d(
        c,
        jnp.stack([jnp.cos(alpha) * c.radius, jnp.sin(alpha) * c.radius]),
        plane,
    )
    goal_pos = jnp.where(
        dist_to_circle >= max_drone_dist, projected, target_on_circle
    )

    # tangent velocity (circle.py:124-132), stepsize 0.1
    goal_2d = _to_2d(c, goal_pos, plane)
    next_alpha = _to_alpha(goal_2d) + 0.1 * c.direction
    next_point = _to_3d(
        c,
        jnp.stack(
            [jnp.cos(next_alpha) * c.radius, jnp.sin(next_alpha) * c.radius]
        ),
        plane,
    )
    direction = next_point - goal_pos

    return _to_state_rows(min_jerk_reference(
        pos, vel, jnp.zeros(3), goal_pos, direction, dt, horizon
    ))


# ---------------------------------------------------------------------------
# polynomial (host-side generation; consumed via the array-backed API)
# ---------------------------------------------------------------------------


def polynomial_reference(
    rng,
    start_pos,
    max_drone_dist=0.25,
    horizon=10,
    hover_steps=50,
    x_range=20,
    degree=5,
    dt=0.05,
):
    """Random rotated-polynomial reference (polynomial.py:84-126) as a
    (T, 9) array [pos, zeros, vel] with hover padding at both ends.

    The reference emits 6 columns (pos + finite-difference vel) which is
    incompatible with the neural featurization (it reads [6:9] as velocity —
    polynomial.py carries a 'not working with neural controller' note); we
    use the standard 9-column layout so both MPC and neural controllers
    consume it.
    """
    from scipy.stats import special_ortho_group

    dist_points = max_drone_dist / horizon
    x_start, x_final = 1.0, 1.0 + x_range
    xs = np.linspace(x_start - 1, x_final + 1, 10)
    ys = rng.rand(len(xs)) * 5 + 5
    rot = special_ortho_group.rvs(3, random_state=rng)
    coeffs = np.polyfit(xs, ys, degree)
    poly = np.poly1d(coeffs)
    grad = np.polyder(poly)

    points_2d = [[x_start, poly(x_start)]]
    x = x_start
    while x < x_final:
        g = grad(x)
        step = dist_points / np.sqrt(1 + g * g)
        x = x + step
        points_2d.append([x, poly(x)])
    points_2d = np.array(points_2d)
    points_3d = np.stack(
        [points_2d[:, 0], np.zeros(len(points_2d)), points_2d[:, 1]], axis=1
    ) @ rot

    points_3d = points_3d - points_3d[0] + np.asarray(start_pos)
    full = np.concatenate(
        [
            np.tile(points_3d[0], (hover_steps, 1)),
            points_3d,
            np.tile(points_3d[-1], (hover_steps, 1)),
        ]
    )
    vel = np.gradient(full, axis=0) / dt
    out = np.concatenate([full, np.zeros_like(full), vel], axis=1)
    return out.astype(np.float32)


def waypoint_reference(
    rng,
    points_to_traverse,
    start_pos,
    max_drone_dist=0.25,
    horizon=10,
    hover_steps=50,
    dt=0.05,
):
    """Cubic-spline reference through given waypoints (Polynomial.cubic_fit,
    polynomial.py:57-82), returned as a (T, 9) array [pos, zeros, vel] with
    hover padding — same consumption path as the random replay references.
    Used with the predefined waypoint sets (predefined_trajectories.py).
    """
    from scipy.interpolate import CubicSpline

    pts = np.asarray(points_to_traverse, dtype=float)
    dist_points = max_drone_dist / horizon
    dists = [0.0] + [
        np.linalg.norm(pts[i] - pts[i + 1]) for i in range(len(pts) - 1)
    ]
    cum = np.cumsum(dists)

    # dummy endpoint anchors to avoid fast starts (polynomial.py:64-74)
    add_before = pts[1]
    add_after = pts[-1] - (rng.rand(3) * 2 - 1)
    x = np.array([-dists[1]] + cum.tolist() + [cum[-1] + np.linalg.norm(add_after)])
    fit_pts = np.vstack([add_before, pts, add_after])
    spline = CubicSpline(x, fit_pts)

    xs = np.arange(0, cum[-1], dist_points)
    sampled = spline(xs)
    sampled = sampled - sampled[0] + np.asarray(start_pos)

    full = np.concatenate(
        [
            np.tile(sampled[0], (hover_steps, 1)),
            sampled,
            np.tile(sampled[-1], (hover_steps, 1)),
        ]
    )
    vel = np.gradient(full, axis=0) / dt
    return np.concatenate(
        [full, np.zeros_like(full), vel], axis=1
    ).astype(np.float32)


# ---------------------------------------------------------------------------
# misc
# ---------------------------------------------------------------------------


def project_to_line(a, b, p):
    """jnp projection of p onto the line a-b (q_funcs.py:6-18)."""
    ab = b - a
    denom = jnp.sum(ab**2)
    t = jnp.sum((p - a) * ab) / jnp.where(denom == 0, 1.0, denom)
    return jnp.where(denom == 0, a, a + t * ab)

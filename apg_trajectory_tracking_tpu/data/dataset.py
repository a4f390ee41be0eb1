"""Device-resident training buffers and state featurization.

Re-designs ``neural_control/dataset.py``: the reference keeps a
``torch.utils.data.Dataset`` that is *mutated during eval rollouts* by the
controller wrapper (self-play insertion, ``dataset.py:103-119``,
``network_wrapper.py:42-52``) and periodically resampled in place
(``dataset.py:88-101``). Here the same semantics are explicit and
functional: a buffer PyTree of fixed-size device arrays with a sampled
segment ``[0:num_sampled]`` and a self-play ring ``[num_sampled:]`` written
at a moving cursor; every update returns a new buffer value.

Featurization is pure per-batch math executed *inside* the jitted train and
eval steps (the reference runs it on CPU numpy/torch at DataLoader time,
``dataset.py:155-204,322-350``) — on TPU it fuses into the surrounding
matmuls, so there is no host featurization stage at all.
"""

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from apg_trajectory_tracking_tpu.ops.rotations import world_to_body_matrix

# Fixed fallback normalization stats for the fixed-wing state
# (WingDataset.set_fixed_mean, dataset.py:284-300).
WING_MEAN = np.array(
    [
        0.0, 0.0, 0.0, 11.525899887084961, -0.00016766408225521445,
        0.16617104411125183, 0.007394296582788229, 0.018172707409,
        0.020353179425001144, -0.0005361468647606671,
        0.01662314310669899, 0.004487641621381044,
    ],
    dtype=np.float32,
)
WING_STD = np.array(
    [
        16.626325607299805, 0.8449159860610962, 0.8879243731498718,
        0.6243225932121277, 0.28072822093963623, 0.29176747798,
        0.04499124363064766, 0.10370047390460968, 0.049977313727,
        0.06449887901544571, 0.27508440613746643, 0.05634994804859,
    ],
    dtype=np.float32,
)


# ---------------------------------------------------------------------------
# featurization (pure, jit-safe)
# ---------------------------------------------------------------------------


def quad_state_features(states):
    """15-dim quad controller input features.

    Mirrors ``state_preprocessing`` (dataset.py:207-220): world-frame
    velocity (3), the first two *columns* of the world-to-body rotation
    matrix flattened row-major (6), body-frame velocity (3), angular
    velocity (3).

    Args:
        states: (B, 12) raw quad states [pos, att, vel, angvel].
    Returns:
        (B, 15) feature array.
    """
    vel = states[:, 6:9]
    wtb = world_to_body_matrix(states[:, 3:6])
    vel_body = jnp.einsum("bij,bj->bi", wtb, vel)
    rot_cols = wtb[:, :, :2].reshape(states.shape[0], 6)
    return jnp.concatenate([vel, rot_cols, vel_body, states[:, 9:12]], axis=1)


def quad_prepare_data(states, ref_states):
    """Featurize a (state, reference-window) batch for the quad controller.

    Mirrors ``QuadDataset.prepare_data`` (dataset.py:155-204):

      * reference positions become relative to the drone, the drone position
        is zeroed (drone-centric frame);
      * state features per :func:`quad_state_features`;
      * reference features = [relative pos, ref vel, ref vel - drone vel].

    Args:
        states: (B, 12) raw states.
        ref_states: (B, H, 9) reference windows [pos, att, vel] (H may
            exceed the net horizon for the recurrent modes).
    Returns:
        (in_state (B, 15), current_state (B, 12) with zeroed position,
         in_ref (B, H, 9), rel_ref (B, H, 9) reference in the drone frame).
    """
    rel_ref = ref_states.at[:, :, :3].add(-states[:, None, :3])
    current = states.at[:, :3].set(0.0)
    in_state = quad_state_features(current)
    vel_minus = rel_ref[:, :, 6:9] - states[:, None, 6:9]
    in_ref = jnp.concatenate(
        [rel_ref[:, :, :3], rel_ref[:, :, 6:9], vel_minus], axis=2
    )
    return in_state, current, in_ref, rel_ref


def wing_prepare_data(states, ref_pos, mean, std, dt=0.05, horizon=10):
    """Featurize a (state, target-point) batch for the wing controller.

    Mirrors ``WingDataset.prepare_data`` + ``_compute_target_pos``
    (dataset.py:309-350): the normalized state drops position; the loss
    target is a linear ramp from the current position toward the unit
    target direction at 12 m/s (``vec_len_per_step = 12 * dt``); the net's
    reference input is the last ramp point relative to the drone.

    Args:
        states: (B, 12) raw wing states.
        ref_pos: (B, 3) absolute target waypoints.
        mean, std: (12,) normalization stats.
    Returns:
        (normed_state (B, 9), states (B, 12) unchanged, rel_ref (B, 3),
         target_pos (B, horizon, 3)).
    """
    normed = ((states - mean) / std)[:, 3:]
    rel = ref_pos - states[:, :3]
    # epsilon guard (deviation from dataset.py:313, which divides by the
    # raw norm): a drone exactly on the waypoint would emit NaNs inside
    # the jitted step and poison the whole batch; away from the
    # singularity the guard cannot change behavior
    direction = rel / jnp.maximum(
        jnp.linalg.norm(rel, axis=1, keepdims=True), 1e-6
    )
    steps = jnp.arange(1, horizon + 1, dtype=states.dtype) * (12.0 * dt)
    target_pos = states[:, None, :3] + direction[:, None, :] * steps[None, :, None]
    rel_ref = target_pos[:, -1] - states[:, :3]
    return normed, states, rel_ref, target_pos


# ---------------------------------------------------------------------------
# buffers
# ---------------------------------------------------------------------------


class QuadBuffers(NamedTuple):
    """Quad training data: sampled segment + self-play ring.

    ``states`` (N, 12), ``refs`` (N, ref_len, 9); rows ``[0:num_sampled]``
    are resampled wholesale (``resample_data``, dataset.py:88-101), rows
    ``[num_sampled:]`` form the self-play ring written at ``eval_counter``
    (``get_and_add_eval_data``, dataset.py:103-119).
    """

    states: jnp.ndarray
    refs: jnp.ndarray
    num_sampled: int
    num_self_play: int
    eval_counter: int
    mean: jnp.ndarray
    std: jnp.ndarray


class WingBuffers(NamedTuple):
    """Wing training data; ``refs`` holds (N, 3) target waypoints."""

    states: jnp.ndarray
    refs: jnp.ndarray
    num_sampled: int
    num_self_play: int
    eval_counter: int
    mean: jnp.ndarray
    std: jnp.ndarray


def make_quad_buffers(states, refs, num_sampled):
    """Build quad buffers from ``full_state_training_data`` output.

    z-score stats are computed from the initial sample like the reference's
    first-constructor path (dataset.py:60-66) and carried into checkpoints.

    Args:
        states: (N, 12); refs: (N, ref_len, 9); num_sampled: size of the
            non-self-play segment (N - num_sampled = ring size).
    """
    states = np.asarray(states, dtype=np.float32)
    refs = np.asarray(refs, dtype=np.float32)
    return QuadBuffers(
        states=jnp.asarray(states),
        refs=jnp.asarray(refs),
        num_sampled=int(num_sampled),
        num_self_play=int(states.shape[0] - num_sampled),
        eval_counter=0,
        mean=jnp.asarray(states.mean(axis=0)),
        std=jnp.asarray(states.std(axis=0)),
    )


def make_wing_buffers(states, refs, num_self_play):
    """Build wing buffers from ``sample_training_data`` output.

    Args:
        states: (N, 12); refs: (N, 3) targets; num_self_play: ring size
            (the wing dataset is almost entirely self-play,
            train_fixed_wing.py:154-162).
    """
    states = np.asarray(states, dtype=np.float32)
    refs = np.asarray(refs, dtype=np.float32)
    return WingBuffers(
        states=jnp.asarray(states),
        refs=jnp.asarray(refs),
        num_sampled=int(states.shape[0] - num_self_play),
        num_self_play=int(num_self_play),
        eval_counter=0,
        mean=jnp.asarray(WING_MEAN),
        std=jnp.asarray(WING_STD),
    )


def insert_self_play(buffers, states, refs):
    """Write visited (state, ref) pairs into the self-play ring.

    Functional version of ``get_and_add_eval_data`` (dataset.py:103-119):
    rows land at ``num_sampled + (eval_counter + i) % num_self_play``; if
    more rows arrive than the ring holds, only the newest ``num_self_play``
    survive (identical end state to sequential ring writes).
    """
    k = int(states.shape[0])
    nsp = buffers.num_self_play
    if nsp == 0 or k == 0:
        return buffers
    # eval_counter is monotonic like the reference's (dataset.py:117);
    # only the write index wraps (get_eval_index).
    new_counter = buffers.eval_counter + k
    if k > nsp:
        states = states[-nsp:]
        refs = refs[-nsp:]
        start = buffers.eval_counter + (k - nsp)
        k = nsp
    else:
        start = buffers.eval_counter
    pos = buffers.num_sampled + (start + np.arange(k)) % nsp
    pos = jnp.asarray(pos)
    return buffers._replace(
        states=buffers.states.at[pos].set(states),
        refs=buffers.refs.at[pos].set(refs),
        eval_counter=new_counter,
    )


def replace_sampled(buffers, states, refs):
    """Replace the non-self-play segment (``resample_data``,
    dataset.py:88-101); the self-play ring is untouched."""
    n = buffers.num_sampled
    return buffers._replace(
        states=buffers.states.at[:n].set(states[:n]),
        refs=buffers.refs.at[:n].set(refs[:n]),
    )

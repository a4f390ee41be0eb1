"""Device-mesh scale-out for APG training.

The reference is single-process / single-CPU-thread (SURVEY.md 2.9); the
TPU-native scale axis is the environment/batch dimension: thousands of env
instances roll out in lockstep, sharded across chips, with controller
parameters replicated and gradients reduced by XLA collectives over ICI.

Mesh layout: ``('env', 'model')`` — the model axis exists for forward
compatibility but is size 1 (64-neuron MLP controllers have nothing to
shard; see SURVEY.md 2.9: "expose a mesh abstraction where a model axis
exists but is size 1").

Everything goes through ``jax.jit`` with sharding annotations: batch args
sharded on 'env', params replicated; XLA inserts the psum for the gradient
all-reduce. Multi-host: call ``jax.distributed.initialize()`` before
building the mesh and the same code spans hosts (ICI within a slice, DCN
across slices).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None):
    """Join a multi-host run: ``jax.distributed.initialize`` before any mesh
    is built (SURVEY.md 5.8). On TPU pods the arguments are auto-detected
    from the environment; on CPU/GPU clusters pass them explicitly. The
    train CLIs call this under ``--distributed``; afterwards
    ``jax.devices()`` spans all hosts and the same mesh/sharding code runs
    unchanged (ICI within a slice, DCN across slices)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = int(num_processes)
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    jax.distributed.initialize(**kwargs)


def make_mesh(n_devices=None, model_parallel=1):
    """Mesh over the first ``n_devices`` devices with axes ('env', 'model')."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devs = np.asarray(devices[:n_devices]).reshape(
        n_devices // model_parallel, model_parallel
    )
    return Mesh(devs, axis_names=("env", "model"))


def auto_mesh(*axis_sizes):
    """The trainers' default mesh: the largest local device count that
    divides every given batch/buffer size (so minibatches and data buffers
    shard evenly on 'env'), degenerating to a size-1 mesh when nothing
    divides. On one chip this is the zero-cost identity mesh; under
    ``init_distributed`` it spans all hosts' devices."""
    n = len(jax.devices())
    d = n
    while d > 1 and any(int(s) % d != 0 for s in axis_sizes):
        d -= 1
    return make_mesh(d)


def shard_batch(mesh, tree):
    """Place leading-axis-sharded copies of batch arrays on the mesh."""
    sharding = NamedSharding(mesh, P("env"))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


def replicate(mesh, tree):
    """Replicate parameters/optimizer state across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


def make_sharded_train_step(mesh, step_fn):
    """Wrap a ``(params, opt_state, dyn_params, states, refs) ->
    (params, opt_state, loss)`` step with mesh shardings.

    Params/opt-state/dynamics replicated; (states, refs) sharded on 'env'.
    The loss is a sum over the batch, so XLA emits one psum over 'env' for
    the gradients (data parallelism) — no hand-written collectives.
    """
    rep = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("env"))
    return jax.jit(
        step_fn,
        in_shardings=(rep, rep, rep, shard, shard),
        out_shardings=(rep, rep, rep),
    )


def make_sharded_eval(mesh, eval_fn, static_argnames=()):
    """Shard a batched closed-loop eval over test episodes on 'env'."""
    rep = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("env"))
    return jax.jit(
        eval_fn,
        in_shardings=(rep, rep, shard),
        static_argnames=static_argnames,
    )


def make_sharded_epoch(mesh, step_fn, n_data=2, dyn_arg=True, donate=False,
                       unroll=1):
    """The trainers' production epoch runner: one jitted ``lax.scan`` over
    shuffled minibatches with DP shardings (params/opt-state/dynamics
    replicated, data buffers and every minibatch sharded on 'env', psum
    gradient reduction inserted by XLA).

    This is the whole-epoch equivalent of :func:`make_sharded_train_step`
    and replaces the reference's per-batch DataLoader loop
    (train_base.py:188-218); on a size-1 mesh it degenerates to the plain
    single-device epoch scan, so it is the default execution path for every
    trainer regardless of device count.

    Args:
        step_fn: ``(params, opt_state, [dyn,] *batch) -> (params, opt_state,
            loss)``.
        n_data: number of data buffers indexed per minibatch.
        dyn_arg: whether ``step_fn`` takes a (replicated) dynamics pytree.
        donate: donate the (params, opt_state) buffers so XLA updates them
            in place across the epoch call. The trainers thread the
            returned state back in, so they opt in (a measured ~0.5-3%
            win, scripts/perf_ab.py); callers that reuse the same input
            arrays across calls must keep the default.
        unroll: minibatch-scan unroll factor (4 in the trainers — the
            measured win of the outer-scan unroll lever, perf_ab.py).
    Returns:
        jitted ``(params, opt_state, [dyn,] *data, idx) -> (params,
        opt_state, mean_loss)`` with ``idx`` of shape (n_batches, B).
    """
    rep = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("env"))

    def epoch(params, opt_state, *rest):
        if dyn_arg:
            dyn, *rest = rest
        *data, idx = rest

        def body(carry, b):
            p, o = carry
            # the gather from the 'env'-sharded buffers is tiny; the
            # constraint pins the minibatch back onto 'env' so the BPTT
            # unroll and the backward pass run data-parallel
            batch = tuple(
                jax.lax.with_sharding_constraint(arr[b], shard)
                for arr in data
            )
            if dyn_arg:
                p, o, loss = step_fn(p, o, dyn, *batch)
            else:
                p, o, loss = step_fn(p, o, *batch)
            return (p, o), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), idx, unroll=unroll
        )
        return params, opt_state, jnp.mean(losses)

    in_sh = (
        (rep, rep)
        + ((rep,) if dyn_arg else ())
        + (shard,) * n_data
        + (rep,)
    )
    kw = {"donate_argnums": (0, 1)} if donate else {}
    return jax.jit(epoch, in_shardings=in_sh, out_shardings=(rep, rep, rep),
                   **kw)


def pad_to_multiple(tree, multiple, axis=0):
    """Pad every array's ``axis`` up to a multiple of ``multiple`` by
    repeating rows from the start, returning (padded_tree, original_n).
    Used to shard eval batches whose episode count (e.g. nr_test=10) does
    not divide the mesh; the padded episodes are sliced off before metrics
    so the protocol is unchanged."""
    def pad(x):
        n = x.shape[axis]
        extra = (-n) % multiple
        if extra == 0:
            return x
        reps = -(-extra // n)  # ceil, in case extra > n
        tiled = jnp.concatenate([x] * (reps + 1), axis=axis)
        return jax.lax.slice_in_dim(tiled, 0, n + extra, axis=axis)

    leaves = jax.tree_util.tree_leaves(tree)
    n = leaves[0].shape[axis] if leaves else 0
    return jax.tree_util.tree_map(pad, tree), n


def host_local_rng(seed):
    """Deterministic per-host numpy RNG for host-sharded data sampling
    (SURVEY.md 5.8): each host draws a disjoint stream so trajectory
    resampling / self-play collection shard naturally across processes
    while staying reproducible. On a single host this is just
    ``RandomState(seed)``."""
    return np.random.RandomState(seed + 7919 * jax.process_index())


def host_local_fold(key):
    """Same for jax PRNG keys: fold the process index into the key."""
    return jax.random.fold_in(key, jax.process_index())

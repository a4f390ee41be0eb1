"""Shared init/apply primitives for the hand-rolled JAX models.

Models are plain param-dict pytrees + pure apply functions: trivially
jit/vmap/shard-able, no framework state. Initializers reproduce torch's
``nn.Linear``/``nn.Conv1d`` defaults (Kaiming-uniform with a=sqrt(5), i.e.
U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weight and bias) so training
dynamics are comparable to the reference's.
"""

import jax
import jax.numpy as jnp


def linear_init(key, in_dim, out_dim):
    """torch.nn.Linear default init; weight stored (in, out) for x @ W."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(in_dim)
    w = jax.random.uniform(
        kw, (in_dim, out_dim), minval=-bound, maxval=bound, dtype=jnp.float32
    )
    b = jax.random.uniform(
        kb, (out_dim,), minval=-bound, maxval=bound, dtype=jnp.float32
    )
    return w, b


def conv1d_init(key, in_channels, out_channels, kernel_size):
    """torch.nn.Conv1d default init; weight stored (O, I, K)."""
    kw, kb = jax.random.split(key)
    fan_in = in_channels * kernel_size
    bound = 1.0 / jnp.sqrt(fan_in)
    w = jax.random.uniform(
        kw,
        (out_channels, in_channels, kernel_size),
        minval=-bound,
        maxval=bound,
        dtype=jnp.float32,
    )
    b = jax.random.uniform(
        kb, (out_channels,), minval=-bound, maxval=bound, dtype=jnp.float32
    )
    return w, b


def conv1d_apply(w, b, x):
    """Valid 1D convolution with torch NCL semantics.

    Args:
        w: (O, I, K) kernel.
        b: (O,) bias.
        x: (B, I, L) input.
    Returns:
        (B, O, L - K + 1).
    """
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out + b[None, :, None]

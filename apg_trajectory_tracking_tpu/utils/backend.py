"""Backend selection helpers.

The TPU harness in this container pins ``jax_platforms`` at interpreter
startup (sitecustomize), so plain ``JAX_PLATFORMS`` env vars cannot force
CPU — the override must go through ``jax.config`` and clear any
already-initialized backends. Every ``--cpu`` CLI flag routes here.
"""


def force_cpu_backend():
    """Force JAX onto the CPU backend, overriding a pinned platform.

    Safe to call before any arrays exist; clears already-initialized
    backends so the override takes effect even after a jax import.
    """
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        from jax.extend.backend import clear_backends

        clear_backends()
    except Exception:
        pass

"""Iterative LQR trajectory optimizer over the shared dynamics steps.

The TPU-native replacement for the reference's IPOPT multiple-shooting NLP
(``neural_control/controllers/mpc.py:151-338``): instead of a sparse
interior-point solve on the CPU, a Gauss-Newton method in-graph —

  * control box constraints via sigmoid squashing (u = lo + span * sig(z)),
    so the optimization is unconstrained in z and every iterate is feasible
    (the reference encodes the same bounds as NLP variable bounds,
    mpc.py:215-248);
  * dynamics linearized by ``jax.jacfwd`` through the *same* jitted step
    functions used for APG training — no CasADi twin;
  * cost quadratized exactly (the tracking cost is quadratic in x and the
    squash curvature enters through autodiff Hessians in z);
  * Riccati backward pass + line-searched forward rollout as ``lax.scan``s,
    fixed iteration count (static shapes; no data-dependent convergence
    loop under jit);
  * Levenberg-style regularization on Q_uu.

One call compiles to a single XLA program; ``vmap`` over the initial state
gives batched MPC for thousands of parallel environments.
"""

import jax
import jax.numpy as jnp

_LOGIT_CLIP = 8.0
_ALPHAS = jnp.asarray([1.0, 0.5, 0.25, 0.1, 0.03])


def make_ilqr_solver(dyn_step, spec, horizon, dt, n_iters=10, reg=1e-3):
    """Build a jitted iLQR solve with the same signature as the shooting
    solver (mpc.MPCSpec cost semantics: per-step state tracking with the
    final step unweighted, action regularization toward u_default).

    Returns ``solve(dyn_params, x0, ref, z_init) -> (u, z, cost)``.
    """
    span = spec.u_max - spec.u_min
    state_mask = jnp.ones(horizon).at[horizon - 1].set(0.0)
    u_dim = spec.u_default.shape[0]

    def squash(z):
        return spec.u_min + span * jax.nn.sigmoid(z)

    def step_cost(x1, z_k, ref_k, mask_k):
        u_k = squash(z_k)
        c_state = mask_k * jnp.sum(spec.q_pen * (x1 - ref_k) ** 2)
        c_u = jnp.sum(spec.q_u * (u_k - spec.u_default) ** 2)
        return c_state + c_u

    def f(x, z, dyn_params):
        return dyn_step(dyn_params, x[None], squash(z)[None], dt)[0]

    def rollout_cost(z_seq, dyn_params, x0, ref):
        def body(x, inp):
            z_k, ref_k, m_k = inp
            x1 = f(x, z_k, dyn_params)
            return x1, (x1, step_cost(x1, z_k, ref_k, m_k))

        _, (xs, costs) = jax.lax.scan(
            body, x0, (z_seq, ref, state_mask)
        )
        return xs, jnp.sum(costs)

    def solve(dyn_params, x0, ref, z_init):
        z_init = jnp.clip(z_init, -_LOGIT_CLIP, _LOGIT_CLIP)

        def ilqr_iter(carry, _):
            # the nominal trajectory xs is threaded through the carry (the
            # accepted line-search rollout), avoiding one full re-rollout
            # per iteration
            z_seq, xs, best_cost = carry
            # states entering each step: x_k for k = 0..N-1
            xs_in = jnp.concatenate([x0[None], xs[:-1]], axis=0)

            # linearize dynamics and quadratize cost per step (vmapped)
            A = jax.vmap(
                lambda x, z: jax.jacfwd(lambda x_: f(x_, z, dyn_params))(x)
            )(xs_in, z_seq)
            B = jax.vmap(
                lambda x, z: jax.jacfwd(lambda z_: f(x, z_, dyn_params))(z)
            )(xs_in, z_seq)
            # cost is evaluated at x_{k+1}: l(x1, z)
            lx = jax.vmap(
                lambda x1, z, r, m: jax.grad(step_cost)(x1, z, r, m)
            )(xs, z_seq, ref, state_mask)
            lz = jax.vmap(
                lambda x1, z, r, m: jax.grad(step_cost, argnums=1)(x1, z, r, m)
            )(xs, z_seq, ref, state_mask)
            lxx = jax.vmap(
                lambda x1, z, r, m: jax.hessian(step_cost)(x1, z, r, m)
            )(xs, z_seq, ref, state_mask)
            lzz = jax.vmap(
                lambda x1, z, r, m: jax.hessian(step_cost, argnums=1)(
                    x1, z, r, m
                )
            )(xs, z_seq, ref, state_mask)

            # backward Riccati recursion. Cost attaches to x_{k+1}, so at
            # step k: Q_x = A^T (lx_k + Vx'), Q_z = lz_k + B^T (lx_k + Vx'),
            # with V' the value of the tail after x_{k+1}.
            def backward(carry, inp):
                Vx, Vxx = carry
                A_k, B_k, lx_k, lz_k, lxx_k, lzz_k = inp
                gx = lx_k + Vx
                Gxx = lxx_k + Vxx
                Qx = A_k.T @ gx
                Qz = lz_k + B_k.T @ gx
                Qxx = A_k.T @ Gxx @ A_k
                Qzz = lzz_k + B_k.T @ Gxx @ B_k + reg * jnp.eye(u_dim)
                Qzx = B_k.T @ Gxx @ A_k
                kff = -jnp.linalg.solve(Qzz, Qz)
                K = -jnp.linalg.solve(Qzz, Qzx)
                Vx_new = Qx + K.T @ Qzz @ kff + K.T @ Qz + Qzx.T @ kff
                Vxx_new = Qxx + K.T @ Qzz @ K + K.T @ Qzx + Qzx.T @ K
                Vxx_new = 0.5 * (Vxx_new + Vxx_new.T)
                return (Vx_new, Vxx_new), (kff, K)

            init = (
                jnp.zeros_like(x0),
                jnp.zeros((x0.shape[0], x0.shape[0])),
            )
            _, (kffs, Ks) = jax.lax.scan(
                backward, init,
                (A, B, lx, lz, lxx, lzz),
                reverse=True,
            )

            # line-searched forward pass over fixed alphas
            def forward(alpha):
                def body(carry, inp):
                    x, cost = carry
                    z_k, kff_k, K_k, x_nom, ref_k, m_k = inp
                    z_new = jnp.clip(
                        z_k + alpha * kff_k + K_k @ (x - x_nom),
                        -_LOGIT_CLIP, _LOGIT_CLIP,
                    )
                    x1 = f(x, z_new, dyn_params)
                    return (
                        (x1, cost + step_cost(x1, z_new, ref_k, m_k)),
                        (z_new, x1),
                    )

                (_, cost), (z_new, xs_new) = jax.lax.scan(
                    body, (x0, 0.0),
                    (z_seq, kffs, Ks, xs_in, ref, state_mask),
                )
                return cost, z_new, xs_new

            costs, z_cands, xs_cands = jax.vmap(forward)(_ALPHAS)
            best = jnp.argmin(costs)
            improved = costs[best] < best_cost
            z_next = jnp.where(improved, z_cands[best], z_seq)
            xs_next = jnp.where(improved, xs_cands[best], xs)
            cost_next = jnp.minimum(costs[best], best_cost)
            return (z_next, xs_next, cost_next), cost_next

        xs0, cost0 = rollout_cost(z_init, dyn_params, x0, ref)
        (z, _, cost), _ = jax.lax.scan(
            ilqr_iter, (z_init, xs0, cost0), None, length=n_iters
        )
        return squash(z), z, cost

    return jax.jit(solve)

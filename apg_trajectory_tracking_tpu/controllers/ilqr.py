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
_GRAVITY = 9.81


def make_ilqr_solver(dyn_step, spec, horizon, dt, n_iters=10, reg=1e-3,
                     cost_fn=None):
    """Build a jitted iLQR solve with the same signature as the shooting
    solver (mpc.MPCSpec cost semantics: per-step state tracking with the
    final step unweighted, action regularization toward u_default).

    ``cost_fn(x1, u_k, ref_k, mask_k) -> scalar`` overrides the quadratic
    spec cost per step (``mask_k`` is 1 except at the final step, so a
    custom cost can attach terminal weight via ``1 - mask_k``). This is how
    the non-convex swing-up objective rides the same Riccati machinery
    (see ``swingup_cost`` below); cost curvature enters through autodiff
    Hessians either way.

    Returns ``solve(dyn_params, x0, ref, z_init) -> (u, z, cost)``.
    """
    span = spec.u_max - spec.u_min
    state_mask = jnp.ones(horizon).at[horizon - 1].set(0.0)
    u_dim = spec.u_default.shape[0]

    def squash(z):
        return spec.u_min + span * jax.nn.sigmoid(z)

    def step_cost(x1, z_k, ref_k, mask_k):
        u_k = squash(z_k)
        if cost_fn is not None:
            return cost_fn(x1, u_k, ref_k, mask_k)
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


def lqr_gains(dyn_step, dyn_params, dt, q_diag, r_diag, x_dim, u_dim,
              max_iters=500, tol=1e-9):
    """Discrete-time LQR about the origin equilibrium: linearize
    ``dyn_step`` there with ``jacfwd`` and iterate the Riccati recursion
    to its fixed point (host-side, once at controller build time).

    Returns ``(K, P)`` — feedback gain ``u = -K x`` and the value-function
    Hessian ``P`` (so ``x' P x`` is the infinite-horizon cost-to-go, the
    principled terminal cost for a receding-horizon solver whose target is
    a stabilizable equilibrium).
    """
    import numpy as np

    x_eq = jnp.zeros(x_dim, jnp.float32)
    u_eq = jnp.zeros(u_dim, jnp.float32)

    def f(x, u):
        return dyn_step(dyn_params, x[None], u[None], dt)[0]

    A = np.asarray(jax.jacfwd(lambda x: f(x, u_eq))(x_eq), np.float64)
    B = np.asarray(jax.jacfwd(lambda u: f(x_eq, u))(u_eq), np.float64)
    Q = np.diag(np.asarray(q_diag, np.float64))
    R = np.diag(np.asarray(r_diag, np.float64))
    P = Q.copy()
    K = np.zeros((u_dim, x_dim))
    delta = np.inf
    for _ in range(max_iters):
        K = np.linalg.solve(R + B.T @ P @ B, B.T @ P @ A)
        P_new = Q + A.T @ P @ (A - B @ K)
        delta = np.max(np.abs(P_new - P))
        P = P_new
        if delta < tol:
            break
    else:
        # runs once host-side at controller build time: a marginally
        # stabilizable or badly scaled (A, B) would otherwise degrade the
        # terminal cost / hold gains with no visible cause
        import warnings

        warnings.warn(
            f"lqr_gains: Riccati iteration did not converge in "
            f"{max_iters} iterations (last |P_new - P|_inf = {delta:.3g}); "
            "terminal cost and hold gains may be inaccurate",
            RuntimeWarning,
        )
    return jnp.asarray(K, jnp.float32), jnp.asarray(P, jnp.float32)


# ---------------------------------------------------------------------------
# Cartpole swing-up (the reference's second cartpole protocol,
# scripts/evaluate_cartpole.py:264-318): the task the first-order shooting
# MPC provably cannot solve (DESIGN.md §4). Receding-horizon iLQR closes it
# with three ingredients, each pinned by a failed ablation:
#   * wrap-invariant running cost w_cos (1 - cos θ) — quadratic ramp costs
#     have a local minimum at hanging;
#   * an LQR value-function terminal cost x' P x about upright — plain
#     terminal upright penalties capture but do not hold (0.3-0.4 success);
#   * a TWO-START solve per step: the warm-shifted previous solution (the
#     pump basin) vs an LQR-feedback rollout init (the hold basin), keeping
#     the cheaper solution. Warm-start alone gets stuck in a re-swing
#     basin after capture — the solver deliberately pitches the pole down
#     at plan costs ~30x the hold plan it never finds.
# ---------------------------------------------------------------------------

# swing-up cost weights (tuned on 10-episode draws, validated 100/100 on
# two independent 50-episode draws): running (1-cos), cart pos/vel, pole
# vel, control, and the DARE state weights for the upright LQR
_SU_W_COS = 30.0
_SU_W_X = 0.005
_SU_W_XD = 0.02
_SU_W_THD = 0.5
_SU_W_U = 0.005
_SU_LQR_Q = (0.01, 0.05, 10.0, 0.5)
_SU_LQR_R = (0.01,)


def make_cartpole_swingup_ilqr(dyn_params, horizon=60, dt=0.05,
                               n_iters=25, lqr_iters=15, k_pump=2.0):
    """Build the two-start receding-horizon iLQR swing-up controller.

    Returns ``(apply_fn, init_carry_fn)`` for the stateful evaluator
    interface: ``apply_fn(_, states, z) -> (actions (n, horizon), z_next)``
    with the warm-start carry already shifted for the next step, and
    ``init_carry_fn(states) -> z0`` seeding the carry with an
    Astrom-style energy-pump rollout (a cold zero init needs ~60 iLQR
    iterations to find the pump; the heuristic basin needs ~25).
    """
    from apg_trajectory_tracking_tpu.controllers.mpc import _SPECS
    from apg_trajectory_tracking_tpu.dynamics.cartpole import cartpole_step

    spec = _SPECS["cartpole"]
    K, P = lqr_gains(
        cartpole_step, dyn_params, dt, _SU_LQR_Q, _SU_LQR_R, 4, 1
    )
    l_eff = 2.0 * dyn_params.length  # pendulum energy length scale

    def swingup_cost(x1, u, ref_k, mask_k):
        x, xd, th, thd = x1[0], x1[1], x1[2], x1[3]
        base = (
            _SU_W_COS * (1.0 - jnp.cos(th))
            + _SU_W_X * x**2 + _SU_W_XD * xd**2 + _SU_W_THD * thd**2
        )
        term = (1.0 - mask_k) * jnp.dot(x1, P @ x1)
        return base + _SU_W_U * jnp.sum(u**2) + term

    warm_solver = make_ilqr_solver(
        cartpole_step, spec, horizon, dt, n_iters=n_iters,
        cost_fn=swingup_cost,
    )
    hold_solver = make_ilqr_solver(
        cartpole_step, spec, horizon, dt, n_iters=lqr_iters,
        cost_fn=swingup_cost,
    )

    def z_of_u(u):
        frac = (jnp.clip(u, -0.999, 0.999) - spec.u_min) / (
            spec.u_max - spec.u_min
        )
        return jnp.log(frac / (1.0 - frac))

    def policy_rollout(x0, policy):
        def body(s, _):
            u = policy(s)
            s1 = cartpole_step(dyn_params, s[None], u[None], dt)[0]
            return s1, u

        _, us = jax.lax.scan(body, x0, None, length=horizon)
        return z_of_u(us)

    def pump_policy(s):
        th, thd = s[2], s[3]
        # normalized pole energy rel. upright rest
        e = 0.5 * thd**2 + (_GRAVITY / l_eff) * (jnp.cos(th) - 1.0)
        return jnp.clip(
            -k_pump * e * jnp.sign(thd * jnp.cos(th)), -1.0, 1.0
        )[None]

    def hold_policy(s):
        return jnp.clip(-(K @ s), -1.0, 1.0)

    def init_carry(states):
        return jax.vmap(lambda s: policy_rollout(s, pump_policy))(states)

    ref0 = jnp.zeros((horizon, 4), jnp.float32)

    def apply_fn(_, states, z_warm):
        uw, zw, cw = jax.vmap(warm_solver, in_axes=(None, 0, None, 0))(
            dyn_params, states, ref0, z_warm
        )
        zl0 = jax.vmap(lambda s: policy_rollout(s, hold_policy))(states)
        ul, zl, cl = jax.vmap(hold_solver, in_axes=(None, 0, None, 0))(
            dyn_params, states, ref0, zl0
        )
        pick_hold = (cl < cw)[:, None, None]
        z = jnp.where(pick_hold, zl, zw)
        u = jnp.where(pick_hold, ul, uw)
        # shift the accepted solution one step for the next warm start
        z_next = jnp.concatenate([z[:, 1:], z[:, -1:]], axis=1)
        return u[:, :, 0], z_next

    return apply_fn, init_carry

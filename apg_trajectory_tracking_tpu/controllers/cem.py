"""Cross-entropy-method MPC over the shared dynamics steps.

The sampling-based third solver family next to Adam shooting
(``controllers/mpc.py``) and Gauss-Newton iLQR (``controllers/ilqr.py``):
derivative-free, so it needs neither a linearization nor a well-scaled
Hessian — the global-search properties come from the sample population
instead. The reference's only sampling planner is the CEM inside its
mbrl-lib PETS baseline (``baselines/pets_baseline.py:34-44``), which
plans over a *learnt* ensemble; here the same optimizer runs over the
true differentiable step functions and serves as a controller in its own
right.

Everything is one jitted program: samples roll out under ``vmap`` over a
``lax.scan`` horizon, elites refit the Gaussian, iterations are a scan.
``vmap`` over initial states batches whole eval protocols.
"""

import jax
import jax.numpy as jnp

from apg_trajectory_tracking_tpu.controllers.ilqr import (
    _SU_W_COS,
    _SU_W_U,
    _SU_W_X,
    _SU_W_XD,
    _SU_W_THD,
    _SU_LQR_Q,
    _SU_LQR_R,
    lqr_gains,
)


def make_cem_solver(dyn_step, horizon, dt, traj_cost, u_dim,
                    u_min=-1.0, u_max=1.0, n_samples=300, n_elites=30,
                    n_iters=4, std0=0.6, std_floor=0.05):
    """Build a jitted warm-startable CEM solve.

    Args:
        dyn_step: ``(params, states, actions, dt) -> next states`` — the
            same batched step functions APG training uses.
        traj_cost: ``(xs (horizon, s), us (horizon, u_dim)) -> scalar``
            whole-trajectory cost (terminal weighting is the caller's
            business — contrast the per-step ``cost_fn`` of the iLQR).
    Returns:
        ``solve(key, dyn_params, x0, mean) -> (mean, cost)`` where
        ``mean`` is the optimized action-sequence mean (the receding-
        horizon controller executes ``mean[0]`` and warm-starts the next
        call with the shifted mean) and ``cost`` is the evaluated cost of
        that RETURNED mean — one extra rollout after the refit, so
        two-start comparisons score the plan that actually executes, not
        the best sample of the last iteration.
    """

    def rollout(dyn_params, x0, us):
        def body(s, u):
            s1 = dyn_step(dyn_params, s[None], u[None], dt)[0]
            return s1, s1

        _, xs = jax.lax.scan(body, x0, us)
        return xs

    def solve(key, dyn_params, x0, mean):
        def it(carry, _):
            key, mean, std = carry
            key, k = jax.random.split(key)
            eps = jax.random.normal(k, (n_samples, horizon, u_dim))
            us = jnp.clip(mean[None] + std[None] * eps, u_min, u_max)
            xs = jax.vmap(rollout, in_axes=(None, None, 0))(
                dyn_params, x0, us
            )
            costs = jax.vmap(traj_cost)(xs, us)
            elite_idx = jnp.argsort(costs)[:n_elites]
            elites = us[elite_idx]
            new_mean = jnp.mean(elites, axis=0)
            new_std = jnp.maximum(jnp.std(elites, axis=0), std_floor)
            return (key, new_mean, new_std), costs[elite_idx[0]]

        (_, mean, _), _ = jax.lax.scan(
            it, (key, mean, jnp.full((horizon, u_dim), std0)), None,
            length=n_iters,
        )
        # score the post-refit mean itself (it is what executes)
        c_mean = traj_cost(rollout(dyn_params, x0, mean), mean)
        return mean, c_mean

    return solve


def make_cartpole_swingup_cem(dyn_params, horizon=60, dt=0.05,
                              n_samples=300, n_elites=30, n_iters=4):
    """The CEM counterpart of ``make_cartpole_swingup_ilqr``: same cost
    family (wrap-invariant pump cost + LQR value-function terminal), same
    two-start structure (warm-shifted mean vs the LQR hold rollout, keep
    the cheaper — sampling alone has the identical post-capture re-swing
    basin problem), stateful-evaluator interface.

    Returns ``(apply_fn, init_carry_fn)``; the carry is ``(means, key)``
    so the PRNG threads through the episode scan.
    """
    from apg_trajectory_tracking_tpu.dynamics.cartpole import cartpole_step

    K, P = lqr_gains(
        cartpole_step, dyn_params, dt, _SU_LQR_Q, _SU_LQR_R, 4, 1
    )

    def traj_cost(xs, us):
        x, xd, th, thd = xs[:, 0], xs[:, 1], xs[:, 2], xs[:, 3]
        run = jnp.sum(
            _SU_W_COS * (1.0 - jnp.cos(th[:-1]))
            + _SU_W_X * x[:-1] ** 2 + _SU_W_XD * xd[:-1] ** 2
            + _SU_W_THD * thd[:-1] ** 2
        ) + _SU_W_U * jnp.sum(us**2)
        return run + jnp.dot(xs[-1], P @ xs[-1])

    solve = make_cem_solver(
        cartpole_step, horizon, dt, traj_cost, 1,
        n_samples=n_samples, n_elites=n_elites, n_iters=n_iters,
    )

    def rollout(x0, us):
        def body(s, u):
            s1 = cartpole_step(dyn_params, s[None], u[None], dt)[0]
            return s1, s1

        _, xs = jax.lax.scan(body, x0, us)
        return xs

    def hold_mean(x0):
        def body(s, _):
            u = jnp.clip(-(K @ s), -1.0, 1.0)
            s1 = cartpole_step(dyn_params, s[None], u[None], dt)[0]
            return s1, u

        _, us = jax.lax.scan(body, x0, None, length=horizon)
        return us

    def apply_fn(_, states, carry):
        means, key = carry
        key, k = jax.random.split(key)

        def one(key_i, x0, mean):
            m_cem, c_cem = solve(key_i, dyn_params, x0, mean)
            m_hold = hold_mean(x0)
            c_hold = traj_cost(rollout(x0, m_hold), m_hold)
            m = jnp.where(c_hold < c_cem, m_hold, m_cem)
            # shift the accepted mean for the next warm start
            return m, jnp.concatenate([m[1:], m[-1:]], axis=0)

        keys = jax.random.split(k, states.shape[0])
        u_plan, means_next = jax.vmap(one)(keys, states, means)
        return u_plan[:, :, 0], (means_next, key)

    def init_carry(states, key=None):
        n = states.shape[0]
        if key is None:
            # derive the sampling stream from the episode batch's initial
            # states, so repeated evaluations with different reset draws
            # are independent samples of the controller's stochasticity
            bits = jax.lax.bitcast_convert_type(
                jnp.asarray(states, jnp.float32), jnp.uint32
            )
            key = jax.random.fold_in(
                jax.random.PRNGKey(0), jnp.sum(bits, dtype=jnp.uint32)
            )
        return (
            jnp.zeros((n, horizon, 1), jnp.float32),
            key,
        )

    return apply_fn, init_carry

"""Hyperparameter optimizers.

The reference delegates to GPy's L-BFGS (reference/GPTrainers.py:68,84,94) and
scipy L-BFGS-B (reference/NIGP.py:235-236). Here the objective and its exact
gradient come from one jitted ``jax.value_and_grad`` of the NLML; two drivers
are provided:

* :func:`scipy_lbfgsb` — host-loop scipy driver (bounds supported). Device
  work per evaluation is one fused NLML+grad kernel; the host only sees a
  parameter vector. Used for single-model fits and reference-parity mode.
* :func:`batched_lbfgs` — pure-JAX L-BFGS with box bounds (projected line
  search), written with ``lax.while_loop`` so random restarts vmap into one
  device launch (the reference runs restarts serially,
  reference/NIGP.py:231-239).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def scipy_lbfgsb(
    fun: Callable,
    x0: np.ndarray,
    bounds=None,
    maxiter: int = 1000,
    args=(),
    value_and_grad: Callable | None = None,
):
    """Minimise ``fun(x, *args)`` (a jax scalar fn) with scipy L-BFGS-B.

    Returns (x_opt, f_opt, n_evals). NaN/inf objective values are mapped to a
    large penalty, mirroring the reference's ``safe_obj``
    (reference/NIGP.py:119-123). Pass a pre-jitted ``value_and_grad`` to
    share one compiled gradient graph across many calls (fresh lambdas
    would otherwise recompile per call).
    """
    from scipy.optimize import minimize

    vg = value_and_grad or jax.jit(jax.value_and_grad(fun))
    n_evals = 0

    def f_np(x):
        nonlocal n_evals
        n_evals += 1
        v, g = vg(jnp.asarray(x), *args)
        v = float(v)
        g = np.asarray(g, dtype=np.float64)
        if not np.isfinite(v):
            return 1e20, np.zeros_like(g)
        g = np.nan_to_num(g, nan=0.0, posinf=1e10, neginf=-1e10)
        return v, g

    res = minimize(f_np, np.asarray(x0, np.float64), jac=True, method="L-BFGS-B",
                   bounds=bounds, options={"maxiter": maxiter})
    return res.x, float(res.fun), n_evals


class LBFGSState(NamedTuple):
    x: jax.Array
    f: jax.Array
    g: jax.Array
    # history ring buffers
    s_hist: jax.Array  # (m, n)
    y_hist: jax.Array  # (m, n)
    rho: jax.Array  # (m,)
    k: jax.Array  # iteration counter
    converged: jax.Array


def _two_loop(g, s_hist, y_hist, rho, k, m):
    """Standard L-BFGS two-loop recursion over a fixed-size ring buffer."""
    q = g
    alphas = jnp.zeros((m,), g.dtype)

    def bwd(i, carry):
        q, alphas = carry
        idx = (k - 1 - i) % m
        valid = i < jnp.minimum(k, m)
        a = rho[idx] * jnp.dot(s_hist[idx], q)
        a = jnp.where(valid, a, 0.0)
        q = q - a * y_hist[idx] * valid
        return q, alphas.at[idx].set(a)

    q, alphas = jax.lax.fori_loop(0, m, bwd, (q, alphas))
    # initial Hessian scaling gamma = s.y / y.y from most recent pair
    last = (k - 1) % m
    sy = jnp.dot(s_hist[last], y_hist[last])
    yy = jnp.dot(y_hist[last], y_hist[last])
    gamma = jnp.where(k > 0, sy / jnp.maximum(yy, 1e-30), 1.0)
    r = gamma * q

    def fwd(i, r):
        idx = (k - jnp.minimum(k, m) + i) % m
        valid = i < jnp.minimum(k, m)
        b = rho[idx] * jnp.dot(y_hist[idx], r)
        r = r + (alphas[idx] - b) * s_hist[idx] * valid
        return r

    r = jax.lax.fori_loop(0, m, fwd, r)
    return r


def batched_lbfgs(
    fun: Callable,
    x0: jax.Array,
    lower: jax.Array | None = None,
    upper: jax.Array | None = None,
    maxiter: int = 200,
    m: int = 10,
    tol: float = 1e-6,
    max_ls: int = 20,
    value_and_grad: Callable | None = None,
    ftol: float = 0.0,
):
    """Pure-JAX projected L-BFGS with backtracking Armijo line search.

    ``fun`` maps (n,) -> scalar; vmap this whole function for restart
    batches. Bounds are enforced by projection of the trial point. Returns
    (x, f, n_iters). ``value_and_grad`` overrides autodiff with a custom
    (value, grad) function (e.g. the analytic NLML gradient).

    ``ftol`` (opt-in, default off): scipy L-BFGS-B ``factr``-style
    stagnation stop — converge when an accepted step decreases f by less
    than ``ftol * max(1, |f|)``. Under vmap the while_loop runs until the
    LAST lane converges, so one wandering restart drags every lane of the
    launch to ``maxiter`` (measured on study-shaped fits: typical lanes
    converge in 20-50 iterations, stray lanes hit 200); a relative-f stop
    cuts those stragglers where they have stopped making progress anyway.
    """
    n = x0.shape[0]
    if lower is None:
        lower = jnp.full((n,), -jnp.inf, x0.dtype)
    if upper is None:
        upper = jnp.full((n,), jnp.inf, x0.dtype)

    vg = value_and_grad or jax.value_and_grad(fun)

    def clip(x):
        return jnp.clip(x, lower, upper)

    f0, g0 = vg(clip(x0))
    init = LBFGSState(
        x=clip(x0), f=f0, g=g0,
        s_hist=jnp.zeros((m, n), x0.dtype),
        y_hist=jnp.zeros((m, n), x0.dtype),
        rho=jnp.zeros((m,), x0.dtype),
        k=jnp.array(0, jnp.int32),
        converged=jnp.array(False),
    )

    def cond(st: LBFGSState):
        return jnp.logical_and(st.k < maxiter, jnp.logical_not(st.converged))

    def body(st: LBFGSState):
        d = -_two_loop(st.g, st.s_hist, st.y_hist, st.rho, st.k, m)
        # ensure descent; fall back to steepest descent
        descent = jnp.dot(d, st.g)
        d = jnp.where(descent < 0, d, -st.g)

        def ls_body(carry):
            t, _, _, it = carry
            xn = clip(st.x + t * d)
            fn, gn = vg(xn)
            ok = fn <= st.f + 1e-4 * jnp.dot(st.g, xn - st.x)
            ok = jnp.logical_and(ok, jnp.isfinite(fn))
            return (t * 0.5, (xn, fn, gn), ok, it + 1)

        def ls_cond(carry):
            _, _, ok, it = carry
            return jnp.logical_and(jnp.logical_not(ok), it < max_ls)

        t0 = jnp.where(st.k == 0, jnp.minimum(1.0, 1.0 / jnp.maximum(jnp.linalg.norm(st.g), 1e-12)), 1.0)
        x_try = clip(st.x + t0 * d)
        f_init, g_init = vg(x_try)
        ok0 = jnp.logical_and(
            f_init <= st.f + 1e-4 * jnp.dot(st.g, x_try - st.x), jnp.isfinite(f_init)
        )
        carry = (t0 * 0.5, (x_try, f_init, g_init), ok0, jnp.array(1, jnp.int32))
        _, (xn, fn, gn), ok, _ = jax.lax.while_loop(ls_cond, ls_body, carry)
        # if line search failed entirely, keep old point and stop
        fail = jnp.logical_not(ok)
        xn = jnp.where(fail, st.x, xn)
        fn = jnp.where(fail, st.f, fn)
        gn = jnp.where(fail, st.g, gn)

        s = xn - st.x
        yv = gn - st.g
        sy = jnp.dot(s, yv)
        idx = st.k % m
        good_pair = sy > 1e-10
        s_hist = st.s_hist.at[idx].set(jnp.where(good_pair, s, st.s_hist[idx]))
        y_hist = st.y_hist.at[idx].set(jnp.where(good_pair, yv, st.y_hist[idx]))
        rho = st.rho.at[idx].set(jnp.where(good_pair, 1.0 / jnp.maximum(sy, 1e-30), st.rho[idx]))

        gnorm = jnp.max(jnp.abs(gn))
        converged = jnp.logical_or(gnorm < tol, fail)
        if ftol > 0.0:
            stagnant = (st.f - fn) <= ftol * jnp.maximum(
                1.0, jnp.abs(st.f))
            converged = jnp.logical_or(converged, stagnant)
        return LBFGSState(xn, fn, gn, s_hist, y_hist, rho, st.k + 1, converged)

    out = jax.lax.while_loop(cond, body, init)
    return out.x, out.f, out.k

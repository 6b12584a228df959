"""Covariance-assembly dispatch: Pallas fused kernels on the TPU hot path.

The forward covariance work (conditioning Gram matrices, prediction
cross-covariances) runs through ``ops.pallas_kernels.ar1_cov_fused`` by
default on TPU — one VMEM-tiled pass that folds the F base kernels, AR1
weights, and the noise diagonal into a single write of the output
(reference equivalent: emukit's kernel evaluations inside every
``optimize``/``predict`` call, reference/GPTrainers.py:62-68,115-120).

The XLA composition (ops.kernels.ar1_cov) remains the implementation for

* autodiff paths (``nlml`` under ``jax.grad``): the fused kernel is
  forward-only by design — the analytic-gradient path (models/mfgp
  ``nlml_value_and_grad``) does its own trace-identity contractions,
* f64 / CPU execution (tests, parity fixtures),
* base kernels beyond rbf/matern32.

Dispatch is decided at trace time from the dtype/kernel/backend; set
``MFGP_TPU_DISABLE_PALLAS=1`` (before first trace) to force XLA everywhere.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from mfgp_tpu.ops import kernels as _k
from mfgp_tpu.ops import linalg as _la


_MATERN_PROBE: dict = {}


def _matern_pallas_ok() -> bool:
    """One-time smoke compile+check of the matern32 fused kernels on the
    live TPU backend.

    The rbf Pallas stack is TPU-verified and measured; the matern32 stack
    was added with CPU interpret-mode parity only (tunnel outage), so in
    the default ``auto`` mode its first TPU use compiles both fused
    kernels on a tiny problem, checks the covariance against the XLA
    composition, and falls back to XLA (with a warning) on any failure.
    ``MFGP_TPU_MATERN_PALLAS=1`` forces the fused path, ``=0`` forces XLA.
    """
    mode = os.environ.get("MFGP_TPU_MATERN_PALLAS", "auto")
    if mode == "1":
        return True
    if mode == "0":
        return False
    if "ok" not in _MATERN_PROBE:
        import warnings

        import numpy as np

        from mfgp_tpu.ops.pallas_kernels import (ar1_cov_fused,
                                                 syrk_grad_fused)

        try:
            X = jnp.asarray(
                np.linspace(0.0, 1.0, 16, dtype=np.float32).reshape(8, 2))
            fid = jnp.zeros((8,), jnp.int32)
            v = jnp.ones((1,), jnp.float32)
            ls = jnp.full((1, 2), 0.7, jnp.float32)
            rhos = jnp.zeros((0,), jnp.float32)
            K = ar1_cov_fused(X, fid, X, fid, v, ls, rhos, kern="matern32")
            syrk_grad_fused(jnp.eye(8, dtype=jnp.float32),
                            jnp.ones((8,), jnp.float32), X, fid, v, ls,
                            rhos, jnp.full((1,), 0.1, jnp.float32),
                            kern="matern32")
            ref = _k.ar1_cov(X, fid, X, fid, v, ls, rhos, "matern32")
            ok = bool(np.allclose(np.asarray(K), np.asarray(ref),
                                  atol=1e-4))
            if not ok:
                warnings.warn(
                    "matern32 Pallas smoke check mismatched the XLA "
                    "composition; using XLA for matern32")
        except Exception as e:  # Mosaic lowering / VMEM / worker faults
            warnings.warn(
                f"matern32 Pallas smoke compile failed ({e!r}); "
                "using XLA for matern32")
            ok = False
        _MATERN_PROBE["ok"] = ok
    return _MATERN_PROBE["ok"]


def use_pallas(dtype, kernel: str) -> bool:
    """True when the fused Pallas path applies (TPU, f32, rbf or
    matern32 base; matern32 additionally passes a one-time smoke probe)."""
    if os.environ.get("MFGP_TPU_DISABLE_PALLAS"):
        return False
    if (kernel not in ("rbf", "matern32")
            or jnp.dtype(dtype) != jnp.float32
            or jax.default_backend() != "tpu"):
        return False
    return kernel == "rbf" or _matern_pallas_ok()


def mf_train_cov(variances, lengthscales, rhos, noises, X, fid,
                 jitter: float, kernel: str) -> jax.Array:
    """AR1 training covariance + per-fidelity noise diagonal (forward)."""
    noise = _k.mf_noise_diag(fid, noises) + jitter
    if use_pallas(X.dtype, kernel):
        from mfgp_tpu.ops.pallas_kernels import ar1_cov_fused

        return ar1_cov_fused(X, fid, X, fid, variances, lengthscales,
                             rhos, noise_diag=noise, kern=kernel)
    K = _k.ar1_cov(X, fid, X, fid, variances, lengthscales, rhos, kernel)
    return _la.diag_add(K, noise)


def mf_cross_cov(variances, lengthscales, rhos, X1, fid1, X2, fid2,
                 kernel: str) -> jax.Array:
    """AR1 cross-covariance between labelled point sets (forward)."""
    if use_pallas(X1.dtype, kernel):
        from mfgp_tpu.ops.pallas_kernels import ar1_cov_fused

        return ar1_cov_fused(X1, fid1, X2, fid2, variances, lengthscales,
                             rhos, kern=kernel)
    return _k.ar1_cov(X1, fid1, X2, fid2, variances, lengthscales, rhos,
                      kernel)


# ---------------------------------------------------------------------------
# Differentiable fused training covariance (custom VJP around the Pallas
# forward). The autodiff NLML path (``models.mfgp.nlml`` under jax.grad —
# the fallback when no analytic gradient exists) then rides the fused
# kernel too: forward = one Pallas pass, backward = closed-form
# contractions of the cotangent with the per-fidelity terms (two matvecs
# per fidelity, O(F N^2 D) — no base-kernel residuals, no unfused
# elementwise backward chains).
# ---------------------------------------------------------------------------


def _ar1_terms(variances, lengthscales, rhos, X, fid, F):
    """w weights (F, N) and per-fidelity scaled kernels K_m (lazily)."""
    W = _k.ar1_fidelity_weights(rhos, F)
    return W, W[:, fid]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _ar1_train_cov_fused(kern, variances, lengthscales, rhos, X, fid):
    from mfgp_tpu.ops.pallas_kernels import ar1_cov_fused

    # interpret mode keeps this callable (and testable) off-TPU; the
    # dispatcher only routes here on TPU, so interpret is test-only
    return ar1_cov_fused(X, fid, X, fid, variances, lengthscales, rhos,
                         interpret=jax.default_backend() != "tpu",
                         kern=kern)


def _ar1_fwd(kern, variances, lengthscales, rhos, X, fid):
    K = _ar1_train_cov_fused(kern, variances, lengthscales, rhos, X, fid)
    return K, (variances, lengthscales, rhos, X, fid)


def _ar1_bwd(kern, res, Ct):
    """Cotangents of (variances, lengthscales, rhos); X/fid non-diff.

    With T_m = v_m (w_m w_m^T) o K_m and general (possibly asymmetric)
    cotangent Ct:

      v_bar_m   = sum(Ct o T_m) / v_m
      l_bar_{m,d} = sum((Ct o dK_m/dl_d-base) o (x_d - x'_d)^2) / l^3
                  = (x_d^2 . r + c . x_d^2 - 2 x_d^T A x_d) / l^3,
                    A = Ct o base, r = A 1, c = A^T 1; for rbf the base
                    IS T_m (dK/dl_d = K d^2/l^3), for matern32 it is
                    v_m (w w^T) 3 e^{-sqrt3 r} (dK/dl_d = 3 v e d^2/l^3)
      rho_bar_l = sum_m sum_ij (Ct o v_m K_m)_ij (g_i w_j + w_i g_j),
                    g_i = dW[m, fid_i]/drho_l  (product form, no division)
    """
    variances, lengthscales, rhos, X, fid = res
    F, D = lengthscales.shape
    N = X.shape[0]
    Wfid, w = _ar1_terms(variances, lengthscales, rhos, X, fid, F)
    inv_ls = 1.0 / lengthscales
    _H = jax.lax.Precision.HIGHEST

    v_bar, l_bar = [], []
    rho_bar = jnp.zeros_like(rhos)
    for m in range(F):
        if kern == "rbf":
            Km = _k.KERNELS[kern](X, X, 1.0, lengthscales[m])
            e3 = None
        else:
            # one ARD distance pass serves both the covariance and the
            # lengthscale-derivative base (matern32's dK/dl is not
            # proportional to K); same formula/guard as ops.kernels.matern32
            r = jnp.sqrt(_k.sqdist(X, X, inv_ls[m]) + 1e-36)
            e3 = jnp.exp(-_k._SQRT3 * r)
            Km = (1.0 + _k._SQRT3 * r) * e3
        B = Ct * (variances[m] * Km)  # Ct o v_m K_m
        wprod = w[m][:, None] * w[m][None, :]
        A = B * wprod  # Ct o T_m
        onesX = jnp.concatenate([jnp.ones((N, 1), X.dtype), X], axis=1)
        rA = jnp.dot(A, onesX, precision=_H)  # [A1 | A X]
        cA = jnp.dot(A.T, onesX, precision=_H)  # [A^T 1 | A^T X]
        v_bar.append(jnp.sum(rA[:, 0]) / variances[m])
        if kern == "rbf":
            rE, cE = rA, cA
        else:
            E = Ct * (variances[m] * 3.0 * e3) * wprod
            rE = jnp.dot(E, onesX, precision=_H)
            cE = jnp.dot(E.T, onesX, precision=_H)
        quad = (jnp.sum((X**2) * (rE[:, :1] + cE[:, :1]), axis=0)
                - jnp.sum(X * (rE[:, 1:] + cE[:, 1:]), axis=0))
        l_bar.append(quad * inv_ls[m] ** 3)  # v_m already inside A/E
        # rho cotangent: product-form dW, two matvecs against w
        if F > 1:
            Bw = jnp.dot(B, w[m], precision=_H)
            Btw = jnp.dot(B.T, w[m], precision=_H)
            for l in range(F - 1):
                # dW[m, f]/drho_{l} = prod_{k in (m, f], k != l+1} rho_k
                # when m < l+1 <= f else 0 (rho_l couples fidelity l -> l+1)
                dW = []
                for f in range(F):
                    if m < l + 1 <= f:
                        p = jnp.ones((), rhos.dtype)
                        for kk in range(m + 1, f + 1):
                            if kk != l + 1:
                                p = p * rhos[kk - 1]
                        dW.append(p)
                    else:
                        dW.append(jnp.zeros((), rhos.dtype))
                g = jnp.stack(dW)[fid]  # (N,)
                rho_bar = rho_bar.at[l].add(
                    jnp.dot(g, Bw) + jnp.dot(g, Btw))
    return (jnp.stack(v_bar), jnp.stack(l_bar), rho_bar, None, None)


_ar1_train_cov_fused.defvjp(_ar1_fwd, _ar1_bwd)


def ar1_cov_diff(variances, lengthscales, rhos, X, fid,
                 kernel: str) -> jax.Array:
    """Differentiable AR1 training covariance with fused-forward dispatch.

    On TPU/f32/rbf the forward is the Pallas kernel and the backward the
    closed-form contractions above; elsewhere the plain XLA composition
    (fully autodiff, incl. matern32)."""
    if use_pallas(X.dtype, kernel):
        return _ar1_train_cov_fused(kernel, variances, lengthscales, rhos,
                                    X, fid)
    return _k.ar1_cov(X, fid, X, fid, variances, lengthscales, rhos, kernel)


def sf_cov_diff(variance, lengthscales, X, kernel: str) -> jax.Array:
    """Differentiable single-fidelity training covariance: the F=1 case of
    ar1_cov_diff (shared custom VJP; rho slot empty). Serves the autodiff
    NLML paths of models/gp and the NIGP fits."""
    if use_pallas(X.dtype, kernel):
        v = jnp.reshape(jnp.asarray(variance, X.dtype), (1,))
        ls = jnp.asarray(lengthscales, X.dtype).reshape(1, -1)
        rhos = jnp.zeros((0,), X.dtype)
        fid = jnp.zeros((X.shape[0],), jnp.int32)
        return _ar1_train_cov_fused(kernel, v, ls, rhos, X, fid)
    return _k.KERNELS[kernel](X, X, variance, lengthscales)


def sf_train_cov(variance, lengthscales, noise_diag, X,
                 kernel: str) -> jax.Array:
    """Single-fidelity training covariance + noise diagonal (forward)."""
    if use_pallas(X.dtype, kernel):
        from mfgp_tpu.ops.pallas_kernels import rbf_cov_fused

        return rbf_cov_fused(X, X, variance, lengthscales,
                             noise_diag=jnp.broadcast_to(
                                 noise_diag, (X.shape[0],)), kern=kernel)
    K = _k.KERNELS[kernel](X, X, variance, lengthscales)
    return _la.diag_add(K, jnp.broadcast_to(noise_diag, (X.shape[0],)))


def sf_cross_cov(variance, lengthscales, X1, X2, kernel: str) -> jax.Array:
    """Single-fidelity cross-covariance (forward)."""
    if use_pallas(X1.dtype, kernel):
        from mfgp_tpu.ops.pallas_kernels import rbf_cov_fused

        return rbf_cov_fused(X1, X2, variance, lengthscales, kern=kernel)
    return _k.KERNELS[kernel](X1, X2, variance, lengthscales)

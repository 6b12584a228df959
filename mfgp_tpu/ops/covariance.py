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
* Matern32 (the Pallas kernel implements the RBF base).

Dispatch is decided at trace time from the dtype/kernel/backend; set
``MFGP_TPU_DISABLE_PALLAS=1`` (before first trace) to force XLA everywhere.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from mfgp_tpu.ops import kernels as _k
from mfgp_tpu.ops import linalg as _la


def use_pallas(dtype, kernel: str) -> bool:
    """True when the fused Pallas path applies (TPU, f32, RBF base)."""
    if os.environ.get("MFGP_TPU_DISABLE_PALLAS"):
        return False
    return (kernel == "rbf" and jnp.dtype(dtype) == jnp.float32
            and jax.default_backend() == "tpu")


def mf_train_cov(variances, lengthscales, rhos, noises, X, fid,
                 jitter: float, kernel: str) -> jax.Array:
    """AR1 training covariance + per-fidelity noise diagonal (forward)."""
    noise = _k.mf_noise_diag(fid, noises) + jitter
    if use_pallas(X.dtype, kernel):
        from mfgp_tpu.ops.pallas_kernels import ar1_cov_fused

        return ar1_cov_fused(X, fid, X, fid, variances, lengthscales,
                             rhos, noise_diag=noise)
    K = _k.ar1_cov(X, fid, X, fid, variances, lengthscales, rhos, kernel)
    return _la.diag_add(K, noise)


def mf_cross_cov(variances, lengthscales, rhos, X1, fid1, X2, fid2,
                 kernel: str) -> jax.Array:
    """AR1 cross-covariance between labelled point sets (forward)."""
    if use_pallas(X1.dtype, kernel):
        from mfgp_tpu.ops.pallas_kernels import ar1_cov_fused

        return ar1_cov_fused(X1, fid1, X2, fid2, variances, lengthscales,
                             rhos)
    return _k.ar1_cov(X1, fid1, X2, fid2, variances, lengthscales, rhos,
                      kernel)


def sf_train_cov(variance, lengthscales, noise_diag, X,
                 kernel: str) -> jax.Array:
    """Single-fidelity training covariance + noise diagonal (forward)."""
    if use_pallas(X.dtype, kernel):
        from mfgp_tpu.ops.pallas_kernels import rbf_cov_fused

        return rbf_cov_fused(X, X, variance, lengthscales,
                             noise_diag=jnp.broadcast_to(
                                 noise_diag, (X.shape[0],)))
    K = _k.KERNELS[kernel](X, X, variance, lengthscales)
    return _la.diag_add(K, jnp.broadcast_to(noise_diag, (X.shape[0],)))


def sf_cross_cov(variance, lengthscales, X1, X2, kernel: str) -> jax.Array:
    """Single-fidelity cross-covariance (forward)."""
    if use_pallas(X1.dtype, kernel):
        from mfgp_tpu.ops.pallas_kernels import rbf_cov_fused

        return rbf_cov_fused(X1, X2, variance, lengthscales)
    return _k.KERNELS[kernel](X1, X2, variance, lengthscales)

"""Pallas TPU kernels for the covariance hot path.

BASELINE.json's north star calls for covariance assembly as Pallas kernels
over HBM-resident matrices. The fused AR1 kernel here computes, in ONE pass
over (TILE x TILE) output tiles,

    K[i, j] = sum_m w1[m, i] w2[m, j] exp(-0.5 r2_m(i, j))   (+ noise[i] on
                                                              the diagonal)

where ``r2_m`` is the ARD squared distance under fidelity m's lengthscales
and the AR1 weights/variances are folded into ``w`` (w_tilde = W[m, fid] *
sqrt(var_m)). The XLA composition (ops.kernels.ar1_cov) materialises or
re-fuses F separate kernel matrices; the Pallas kernel holds one VMEM
accumulator, does F small MXU contractions per tile, and writes the output
exactly once — F x N^2 fewer HBM round-trips in the worst (unfused) case,
and deterministic fusion in all cases.

Forward-only: used on the conditioning/prediction/scoring paths. The NLML
gradient path keeps the rematerialised XLA composition (models.mfgp), whose
backward is autodiff-exact.

All matmuls run at f32 with ``preferred_element_type=float32``; tiles are
(128k, 128)-aligned per the TPU tiling constraints.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256


def _cdiv(a, b):
    return -(-a // b)


def _ar1_tile_kernel(a_ref, b_ref, na_ref, nb_ref, w1_ref, w2_ref,
                     noise_ref, out_ref, *, F: int, with_noise: bool):
    """One (TILE, TILE) output tile of the fused AR1 covariance.

    a_ref/b_ref: (F, TILE, D) lengthscale-scaled inputs; na/nb: (F, TILE)
    squared norms of the scaled inputs; w1/w2: (F, TILE) sqrt(var)-folded
    AR1 weights; noise_ref: (TILE,) per-point noise (diagonal tiles only).
    """
    acc = jnp.zeros((TILE, TILE), jnp.float32)
    for m in range(F):
        a = a_ref[m]
        b = b_ref[m]
        # HIGHEST precision: the MXU's default bf16 passes lose ~1e-3 on
        # the cross term, which the r2 cancellation then amplifies
        # (measured 0.34 absolute error at N=8192 without this)
        cross = jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        r2 = na_ref[m][:, None] + nb_ref[m][None, :] - 2.0 * cross
        r2 = jnp.maximum(r2, 0.0)
        acc += (w1_ref[m][:, None] * w2_ref[m][None, :]) * jnp.exp(-0.5 * r2)
    if with_noise:
        i = pl.program_id(0)
        j = pl.program_id(1)
        row = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
        # noise_ref holds this row-tile's slice of the noise vector;
        # (row == col) on a diagonal tile selects the global diagonal,
        # where noise[row] == noise[col]
        acc = acc + jnp.where((row == col) & (i == j),
                              noise_ref[0][None, :], 0.0)
    out_ref[:] = acc


def _prep(X, fid, variances, lengthscales, rhos, w_override=None):
    """XLA-side precomputation: scaled inputs, norms, folded weights.

    Cheap O(F N D) work; keeps the kernel free of per-d lane transposes.
    """
    from mfgp_tpu.ops.kernels import ar1_fidelity_weights

    F, D = lengthscales.shape
    inv_l = 1.0 / lengthscales  # (F, D)
    A = X[None, :, :] * inv_l[:, None, :]  # (F, N, D)
    nA = jnp.sum(A * A, axis=2)  # (F, N)
    if w_override is None:
        W = ar1_fidelity_weights(rhos, F)  # (F, F)
        w = W[:, fid] * jnp.sqrt(variances)[:, None]  # (F, N)
    else:
        w = w_override
    return A, nA, w


def _pad_axis(x, axis, mult):
    n = x.shape[axis]
    p = _cdiv(n, mult) * mult - n
    if p == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, p)
    return jnp.pad(x, pad)


@functools.partial(jax.jit, static_argnames=("interpret",))
def ar1_cov_fused(X1, fid1, X2, fid2, variances, lengthscales, rhos,
                  noise_diag=None, interpret: bool = False):
    """Fused AR1 covariance via Pallas (RBF base kernels).

    Same contract as ``ops.kernels.ar1_cov`` (+ optional fused noise
    diagonal, valid when X1 is X2-aligned, i.e. the training Gram matrix).
    X1: (N, D), X2: (M, D); returns (N, M) f32.
    """
    X1 = jnp.asarray(X1, jnp.float32)
    X2 = jnp.asarray(X2, jnp.float32)
    variances = jnp.asarray(variances, jnp.float32)
    lengthscales = jnp.asarray(lengthscales, jnp.float32)
    rhos = jnp.asarray(rhos, jnp.float32)
    N, D = X1.shape
    M = X2.shape[0]
    F = variances.shape[0]

    A, nA, w1 = _prep(X1, fid1, variances, lengthscales, rhos)
    B, nB, w2 = _prep(X2, fid2, variances, lengthscales, rhos)
    with_noise = noise_diag is not None
    noise = (jnp.zeros((N,), jnp.float32) if not with_noise
             else jnp.asarray(noise_diag, jnp.float32))

    Ap = _pad_axis(A, 1, TILE)
    Bp = _pad_axis(B, 1, TILE)
    nAp = _pad_axis(nA, 1, TILE)
    nBp = _pad_axis(nB, 1, TILE)
    w1p = _pad_axis(w1, 1, TILE)
    w2p = _pad_axis(w2, 1, TILE)
    noisep = _pad_axis(noise, 0, TILE)[None, :]  # 2D for TPU layout
    Np, Mp = Ap.shape[1], Bp.shape[1]

    grid = (Np // TILE, Mp // TILE)
    out = pl.pallas_call(
        functools.partial(_ar1_tile_kernel, F=F, with_noise=with_noise),
        grid=grid,
        in_specs=[
            pl.BlockSpec((F, TILE, D), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, TILE, D), lambda i, j: (0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, TILE), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, TILE), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, TILE), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, Mp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * F * Np * Mp * (D + 4),
            bytes_accessed=4 * (Np * Mp + 2 * F * (Np + Mp) * (D + 2)),
            transcendentals=F * Np * Mp,
        ),
        interpret=interpret,
    )(Ap, Bp, nAp, nBp, w1p, w2p, noisep)
    return out[:N, :M]


@functools.partial(jax.jit, static_argnames=("interpret",))
def rbf_cov_fused(X1, X2, variance, lengthscales, noise_diag=None,
                  interpret: bool = False):
    """Fused single-fidelity RBF covariance: the F=1 special case."""
    F1 = jnp.ones((1,), jnp.float32)
    z1 = jnp.zeros((X1.shape[0],), jnp.int32)
    z2 = jnp.zeros((X2.shape[0],), jnp.int32)
    return ar1_cov_fused(
        X1, z1, X2, z2, jnp.asarray([variance], jnp.float32),
        jnp.asarray(lengthscales, jnp.float32).reshape(1, -1),
        F1[:0], noise_diag=noise_diag, interpret=interpret)

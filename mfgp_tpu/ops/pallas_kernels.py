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
_SQRT3 = 1.7320508075688772


def _cdiv(a, b):
    return -(-a // b)


def _base(r2, kern: str):
    """Unit-variance base kernel from the ARD squared distance.

    ``rbf``: exp(-r2/2). ``matern32``: (1 + sqrt(3) r) exp(-sqrt(3) r)
    (ops.kernels.matern32 semantics incl. its 1e-36 sqrt guard).
    """
    if kern == "rbf":
        return jnp.exp(-0.5 * r2)
    r = jnp.sqrt(r2 + 1e-36)
    return (1.0 + _SQRT3 * r) * jnp.exp(-_SQRT3 * r)


def _ar1_tile_kernel(a_ref, b_ref, na_ref, nb_ref, w1_ref, w2_ref,
                     noise_ref, out_ref, *, F: int, with_noise: bool,
                     kern: str):
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
        acc += (w1_ref[m][:, None] * w2_ref[m][None, :]) * _base(r2, kern)
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


@functools.partial(jax.jit, static_argnames=("interpret", "kern"))
def ar1_cov_fused(X1, fid1, X2, fid2, variances, lengthscales, rhos,
                  noise_diag=None, interpret: bool = False,
                  kern: str = "rbf"):
    """Fused AR1 covariance via Pallas (``kern``: rbf or matern32 base).

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
        functools.partial(_ar1_tile_kernel, F=F, with_noise=with_noise,
                          kern=kern),
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


@functools.partial(jax.jit, static_argnames=("interpret", "kern"))
def rbf_cov_fused(X1, X2, variance, lengthscales, noise_diag=None,
                  interpret: bool = False, kern: str = "rbf"):
    """Fused single-fidelity covariance: the F=1 special case (the name
    predates matern32 support; ``kern`` selects the base)."""
    F1 = jnp.ones((1,), jnp.float32)
    z1 = jnp.zeros((X1.shape[0],), jnp.int32)
    z2 = jnp.zeros((X2.shape[0],), jnp.int32)
    ls = jnp.broadcast_to(
        jnp.asarray(lengthscales, jnp.float32).reshape(-1),
        (X1.shape[1],))
    return ar1_cov_fused(
        X1, z1, X2, z2, jnp.asarray([variance], jnp.float32),
        ls.reshape(1, -1), F1[:0], noise_diag=noise_diag,
        interpret=interpret, kern=kern)


# ---------------------------------------------------------------------------
# Fused syrk + trace-identity gradient contractions
# ---------------------------------------------------------------------------
# The analytic NLML gradient (models/mfgp._nlml_vg_core) needs, for
# W = K^-1 - alpha alpha^T and each fidelity m,
#
#   sv[m] = (W o T_m) @ [1, X]          (row sums + X-weighted row sums)
#   diagW                               (per-fidelity noise gradients)
#
# with T_m = var_m (w_m w_m^T) o K_m. The XLA path materialises
# K^-1 = Linv^T Linv to HBM (1.6 GB at N=20k) and then runs three
# elementwise+matvec passes over it. This kernel never materialises K^-1:
# a 1D grid walks the LOWER tile pairs (i >= j); for each pair it
# accumulates the K^-1 tile in VMEM over the k contraction steps
# (Linv_ki^T @ Linv_kj, k >= i — rows above i are zero in both operands),
# and on the pair's last step rebuilds T_m from the scaled inputs (exact
# _prep math) and contracts directly into per-pair partial sums. Host-side
# segment sums by i (row side) and j (mirrored column side, strict lower
# only) assemble the full-matrix sv. FLOPs equal the structure-aware syrk
# (~N^3/3 multiplies); the N^2 HBM round-trip and the separate
# contraction passes disappear.
_SG_TILE = 640


# ---------------------------------------------------------------------------
# Fused posterior mean/variance
# ---------------------------------------------------------------------------
# The blocked explicit-inverse posterior (models/*.predict_blocked_inv)
# runs three passes per grid block: assemble Kxs (Pallas), V = Linv Kxs^T
# (triangular MXU matmul), then mean/variance reductions — Kxs and V
# round-trip HBM between them. This kernel fuses the whole posterior:
# a 1D grid walks (grid tile j, factor row i, k <= i DESCENDING); the
# first step of each row (k == i) rebuilds the cross-covariance tile
# S_i = Kxs[train tile i, grid tile j]^T from the scaled inputs (exact
# _prep math, so each tile's transcendentals are computed ONCE per
# (j, i)) and parks it in a VMEM-resident (Np, Tg) strip; every step
# contracts acc += Linv[i, k] @ S_k straight from that strip. Row ends
# (k == 0) add colsum(acc^2) into the variance block; the build step
# adds alpha[i] . S_i into the mean block. Kxs and V never exist in HBM,
# the matmul FLOPs stay the triangular-aware N^2 M / 2, and the only
# HBM traffic is Linv (once) + the O(N + M) operands.
_PF_TILE_N = 1024  # factor tile (rows of Linv)
_PF_TILE_G = 512   # grid tile (columns of the strip)


def _posterior_fused_kernel(j_of, i_of, k_of, Lik_ref, Ai_ref, nAi_ref,
                            wi_ref, Bg_ref, nBg_ref, wg_ref, a_ref,
                            mu_ref, vs_ref, strip_ref, acc_ref, *,
                            F: int, T: int, TG: int, kern: str):
    p = pl.program_id(0)
    i = i_of[p]
    k = k_of[p]
    new_j = (i == 0) & (k == 0)
    build = k == i  # first step of row i: rebuild S_i, reset acc
    rowend = k == 0

    @pl.when(new_j)
    def _():
        # fresh (8, TG) output blocks for this grid tile (row 0 carries
        # the data; the 7 pad rows exist for Mosaic's (8, 128) tiling)
        mu_ref[:] = jnp.zeros_like(mu_ref)
        vs_ref[:] = jnp.zeros_like(vs_ref)

    @pl.when(build)
    def _():
        s = jnp.zeros((T, TG), jnp.float32)
        for m in range(F):
            cross = jax.lax.dot_general(
                Ai_ref[m], Bg_ref[m], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            r2 = jnp.maximum(
                nAi_ref[m][:, None] + nBg_ref[m][None, :] - 2.0 * cross,
                0.0)
            s += (wi_ref[m][:, None] * wg_ref[m][None, :]) * _base(r2, kern)
        strip_ref[pl.ds(i * T, T)] = s
        mu_ref[0:1] = mu_ref[0:1] + jax.lax.dot_general(
            a_ref[:], s, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
        Lik_ref[:], strip_ref[pl.ds(k * T, T)], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)

    @pl.when(rowend)
    def _():
        vs_ref[0:1] = vs_ref[0:1] + jnp.sum(
            acc_ref[:] * acc_ref[:], axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret", "kern",
                                             "tile_n", "tile_g"))
def posterior_fused(Linv, alpha, X, fid, Xs, fid_s, variances,
                    lengthscales, rhos, interpret: bool = False,
                    kern: str = "rbf", tile_n: int = _PF_TILE_N,
                    tile_g: int = _PF_TILE_G):
    """(mu, quad) of the AR1 posterior over test points ``Xs`` where
    ``mu = Kxs alpha`` and ``quad[s] = || Linv Kxs[s]^T ||^2`` (so
    ``var = kss - quad``), fused into one Pallas pass (see block comment).

    Exact mathematics of predict_blocked_inv's per-block body at HIGHEST
    precision; callers add kss and likelihood noise.
    """
    T, TG = tile_n, tile_g
    N = X.shape[0]
    M = Xs.shape[0]
    F = variances.shape[0]
    Linv = jnp.asarray(Linv, jnp.float32)
    A, nA, w = _prep(jnp.asarray(X, jnp.float32), fid, variances,
                     lengthscales, rhos)
    Bg, nBg, wg = _prep(jnp.asarray(Xs, jnp.float32), fid_s, variances,
                        lengthscales, rhos)
    Np = _cdiv(N, T) * T
    Mp = _cdiv(M, TG) * TG
    nb = Np // T
    mg = Mp // TG
    Lp = jnp.pad(Linv, ((0, Np - N), (0, Np - N)))
    ap = jnp.pad(jnp.asarray(alpha, jnp.float32), (0, Np - N))[None, :]
    Apad = _pad_axis(A, 1, T)
    nApad = _pad_axis(nA, 1, T)
    # padded train lanes must contribute NOTHING to mu/quad: their folded
    # weight is zero, which zeroes their Kxs rows exactly
    wpad = _pad_axis(w, 1, T)
    Bgp = _pad_axis(Bg, 1, TG)
    nBgp = _pad_axis(nBg, 1, TG)
    wgp = _pad_axis(wg, 1, TG)

    # (j, i, k): k descends i..0 so the row's first step builds strip[i]
    j_of, i_of, k_of = [], [], []
    for j in range(mg):
        for i in range(nb):
            for k in range(i, -1, -1):
                j_of.append(j)
                i_of.append(i)
                k_of.append(k)
    steps = len(j_of)
    mk = lambda a: jnp.asarray(a, jnp.int32)  # noqa: E731

    D = X.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((T, T), lambda p, j, i, k: (i[p], k[p]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, T, D), lambda p, j, i, k: (0, i[p], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, T), lambda p, j, i, k: (0, i[p]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, T), lambda p, j, i, k: (0, i[p]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, TG, D), lambda p, j, i, k: (0, j[p], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, TG), lambda p, j, i, k: (0, j[p]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, TG), lambda p, j, i, k: (0, j[p]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T), lambda p, j, i, k: (0, i[p]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # (8, TG) blocks satisfy Mosaic's (8, 128) tiling; row 0 of
            # each block carries the grid tile, rows 1-7 are pad
            pl.BlockSpec((8, TG), lambda p, j, i, k: (j[p], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TG), lambda p, j, i, k: (j[p], 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((Np, TG), jnp.float32),
                        pltpu.VMEM((T, TG), jnp.float32)],
    )
    mu, quad = pl.pallas_call(
        functools.partial(_posterior_fused_kernel, F=F, T=T, TG=TG,
                          kern=kern),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((mg * 8, TG), jnp.float32),
                   jax.ShapeDtypeStruct((mg * 8, TG), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * steps * T * T * TG + mg * nb * F * 2 * T * TG * D,
            bytes_accessed=steps * T * T * 4,
            transcendentals=mg * nb * F * T * TG,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )(mk(j_of), mk(i_of), mk(k_of),
      Lp, Apad, nApad, wpad, Bgp, nBgp, wgp, ap)
    mu = mu.reshape(mg, 8, TG)[:, 0].reshape(Mp)
    quad = quad.reshape(mg, 8, TG)[:, 0].reshape(Mp)
    return mu[:M], quad[:M]


def _syrk_grad_kernel(i_of, j_of, k_of, pair_of, first, last,
                      Lki_ref, Lkj_ref, Ai_ref, Aj_ref, nAi_ref, nAj_ref,
                      wi_ref, wj_ref, xiT_ref, xjT_ref, ai_ref, aj_ref,
                      svr_ref, svc_ref, dw_ref, *rest, F: int, T: int,
                      kern: str):
    if kern == "rbf":
        (acc,) = rest
        svr2_ref = svc2_ref = None
    else:
        # matern32: the lengthscale derivative is NOT proportional to the
        # covariance (dK/dlog l_d = 3 v e^{-sqrt3 r} d_d^2/l_d^2), so a
        # second matrix M2 = W o (w w^T 3 e^{-sqrt3 r}) is contracted
        # alongside the covariance-based M
        svr2_ref, svc2_ref, acc = rest
    p = pl.program_id(0)
    is_first = first[p] == 1
    is_last = last[p] == 1
    is_diag = i_of[p] == j_of[p]

    @pl.when(is_first)
    def _():
        acc[:] = jnp.zeros_like(acc)
        svr_ref[:] = jnp.zeros_like(svr_ref)
        svc_ref[:] = jnp.zeros_like(svc_ref)
        dw_ref[:] = jnp.zeros_like(dw_ref)
        if kern != "rbf":
            svr2_ref[:] = jnp.zeros_like(svr2_ref)
            svc2_ref[:] = jnp.zeros_like(svc2_ref)

    acc[:] = acc[:] + jax.lax.dot_general(
        Lki_ref[:], Lkj_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)

    @pl.when(is_last)
    def _():
        Wt = acc[:] - ai_ref[0][:, None] * aj_ref[0][None, :]
        row = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
        for m in range(F):
            cross = jax.lax.dot_general(
                Ai_ref[m], Aj_ref[m], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            r2 = jnp.maximum(
                nAi_ref[m][:, None] + nAj_ref[m][None, :] - 2.0 * cross,
                0.0)
            wprod = wi_ref[m][:, None] * wj_ref[m][None, :]
            if kern == "rbf":
                Am2 = None
                Tm = wprod * jnp.exp(-0.5 * r2)
            else:
                r = jnp.sqrt(r2 + 1e-36)
                e = jnp.exp(-_SQRT3 * r)
                Tm = wprod * ((1.0 + _SQRT3 * r) * e)
                Am2 = Wt * (wprod * (3.0 * e))
            Am = Wt * Tm
            # row side: sv_i += A @ xj, stored transposed (4, T)
            svr_ref[0, m] = jax.lax.dot_general(
                xjT_ref[:], Am, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            # mirrored column side (strict lower tiles only): the upper
            # tile (j, i) contributes A^T @ xi to rows j
            svc_ref[0, m] = jnp.where(
                is_diag, 0.0,
                jax.lax.dot_general(
                    xiT_ref[:], Am, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST))
            if kern != "rbf":
                svr2_ref[0, m] = jax.lax.dot_general(
                    xjT_ref[:], Am2, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                svc2_ref[0, m] = jnp.where(
                    is_diag, 0.0,
                    jax.lax.dot_general(
                        xiT_ref[:], Am2, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST))
        dw_ref[0, 0] = jnp.where(
            is_diag, jnp.sum(jnp.where(row == col, Wt, 0.0), axis=1), 0.0)


@functools.partial(jax.jit, static_argnames=("interpret", "tile", "kern"))
def syrk_grad_fused(Linv, alpha, X, fid, variances, lengthscales, rhos,
                    noises, interpret: bool = False,
                    tile: int = _SG_TILE, kern: str = "rbf"):
    """(g_logvar, g_logls, g_lognoise) of the AR1 NLML via the fused
    syrk+contraction kernel (``kern``: rbf or matern32 base; see block
    comment above).

    Exact mathematics of models/mfgp._nlml_vg_core's contraction phase at
    inv_mode precision HIGHEST, without materialising K^-1. The matern32
    base emits a second contraction pair (its lengthscale derivative is
    not proportional to the covariance) — ~2x the gradient-contraction
    FLOPs of the rbf path, still zero K^-1 HBM traffic.
    """
    T = tile
    N, D = X.shape
    F = variances.shape[0]
    Linv = jnp.asarray(Linv, jnp.float32)
    A, nA, w = _prep(jnp.asarray(X, jnp.float32), fid, variances,
                     lengthscales, rhos)
    Np = _cdiv(N, T) * T
    nb = Np // T
    Lp = jnp.pad(Linv, ((0, Np - N), (0, Np - N)))
    ap = jnp.pad(jnp.asarray(alpha, jnp.float32), (0, Np - N))[None, :]
    Apad = _pad_axis(A, 1, T)
    nApad = _pad_axis(nA, 1, T)
    wpad = _pad_axis(w, 1, T)
    onesx = jnp.concatenate(
        [jnp.ones((N, 1), jnp.float32), jnp.asarray(X, jnp.float32)],
        axis=1)
    xT = jnp.pad(onesx, ((0, Np - N), (0, 0))).T  # (1+D, Np)

    # enumerate (pair, k) steps: lower pairs row-major, k = i..nb-1
    i_of, j_of, k_of, pair_of, first, last = [], [], [], [], [], []
    pair = 0
    for i in range(nb):
        for j in range(i + 1):
            ks = list(range(i, nb))
            for t, k in enumerate(ks):
                i_of.append(i)
                j_of.append(j)
                k_of.append(k)
                pair_of.append(pair)
                first.append(1 if t == 0 else 0)
                last.append(1 if t == len(ks) - 1 else 0)
            pair += 1
    npairs = pair
    mk = lambda a: jnp.asarray(a, jnp.int32)  # noqa: E731
    steps = len(i_of)

    in_specs = [
        pl.BlockSpec((T, T), lambda p, i, j, k, pr, f, l: (k[p], i[p]),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((T, T), lambda p, i, j, k, pr, f, l: (k[p], j[p]),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((F, T, D),
                     lambda p, i, j, k, pr, f, l: (0, i[p], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((F, T, D),
                     lambda p, i, j, k, pr, f, l: (0, j[p], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((F, T), lambda p, i, j, k, pr, f, l: (0, i[p]),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((F, T), lambda p, i, j, k, pr, f, l: (0, j[p]),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((F, T), lambda p, i, j, k, pr, f, l: (0, i[p]),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((F, T), lambda p, i, j, k, pr, f, l: (0, j[p]),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1 + D, T), lambda p, i, j, k, pr, f, l: (0, i[p]),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1 + D, T), lambda p, i, j, k, pr, f, l: (0, j[p]),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T), lambda p, i, j, k, pr, f, l: (0, i[p]),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T), lambda p, i, j, k, pr, f, l: (0, j[p]),
                     memory_space=pltpu.VMEM),
    ]
    sv_spec = pl.BlockSpec((1, F, 1 + D, T),
                           lambda p, i, j, k, pr, f, l: (pr[p], 0, 0, 0),
                           memory_space=pltpu.VMEM)
    out_specs = [
        sv_spec, sv_spec,
        pl.BlockSpec((1, 1, T),
                     lambda p, i, j, k, pr, f, l: (pr[p], 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    sv_shape = jax.ShapeDtypeStruct((npairs, F, 1 + D, T), jnp.float32)
    out_shape = [sv_shape, sv_shape,
                 jax.ShapeDtypeStruct((npairs, 1, T), jnp.float32)]
    if kern != "rbf":
        out_specs += [sv_spec, sv_spec]
        out_shape += [sv_shape, sv_shape]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(steps,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((T, T), jnp.float32)],
    )
    outs = pl.pallas_call(
        functools.partial(_syrk_grad_kernel, F=F, T=T, kern=kern),
        grid_spec=grid_spec,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            # syrk accumulation + last-step base rebuild and sv
            # contractions (matern32 contracts two extra (1+D, T) x (T, T)
            # pairs per fidelity and costs a sqrt besides the exp)
            flops=(2 * steps * T * T * T
                   + npairs * F * 2 * T * T
                   * (D + (2 if kern == "rbf" else 4) * (1 + D))),
            bytes_accessed=steps * 2 * T * T * 4,
            transcendentals=npairs * F * T * T * (1 if kern == "rbf" else 2),
        ),
        # double-buffered (T, T) Linv blocks + the K^-1 scratch + the
        # lane-padded (F, T, D) operand blocks exceed the 16 MB default
        # scoped-vmem budget; v5e has headroom (measured 18.5 MB)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(96 if T >= 1024 else 48) * 1024 * 1024),
        interpret=interpret,
    )(mk(i_of), mk(j_of), mk(k_of), mk(pair_of), mk(first), mk(last),
      Lp, Lp, Apad, Apad, nApad, nApad, wpad, wpad, xT, xT, ap, ap)
    if kern == "rbf":
        svr, svc, dw = outs
        svr2 = svc2 = None
    else:
        svr, svc, dw, svr2, svc2 = outs

    pr_i = mk([i for i in range(nb) for j in range(i + 1)])
    pr_j = mk([j for i in range(nb) for j in range(i + 1)])

    def _assemble(r, c):
        SVi = jax.ops.segment_sum(r, pr_i, num_segments=nb)
        SVj = jax.ops.segment_sum(c, pr_j, num_segments=nb)
        return (SVi + SVj).transpose(1, 2, 0, 3).reshape(
            F, 1 + D, Np)[:, :, :N]

    SV = _assemble(svr, svc)
    s = SV[:, 0, :]  # (F, N) row sums of W o T_m
    Xf = jnp.asarray(X, jnp.float32)
    g_logvar = 0.5 * jnp.sum(s, axis=1)
    inv_ls = 1.0 / jnp.asarray(lengthscales, jnp.float32)
    if kern == "rbf":
        # dK/dlog l_d = K o d_d^2/l_d^2 — proportional to the covariance,
        # so the same SV serves the lengthscale quadratic
        s2, Ax2 = s, SV[:, 1:, :]
    else:
        SV2 = _assemble(svr2, svc2)
        s2, Ax2 = SV2[:, 0, :], SV2[:, 1:, :]
    g_logls = (jnp.einsum("nd,mn->md", Xf**2, s2)
               - jnp.einsum("nd,mdn->md", Xf, Ax2)) * (inv_ls**2)
    # diagonal tiles are the pairs with i == j
    diag_pairs = mk([pr for pr, (ii, jj) in enumerate(
        [(i, j) for i in range(nb) for j in range(i + 1)]) if ii == jj])
    diagW = dw[diag_pairs, 0].reshape(Np)[:N]
    noises = jnp.asarray(noises, jnp.float32)
    g_lognoise = jnp.stack([
        0.5 * noises[f] * jnp.sum(jnp.where(fid == f, diagW, 0.0))
        for f in range(F)])
    return g_logvar, g_logls, g_lognoise

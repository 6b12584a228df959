"""ICI-distributed blocked Cholesky factorization.

The single remaining replicated O(N^2) object in the training step is the
covariance/Cholesky pair (the gradient's inverse is already column-sharded,
parallel/sharded.py). This module factorizes a column-sharded SPD matrix in
place: chip c owns the contiguous column block [c*Nc, (c+1)*Nc); the
right-looking algorithm walks static panels of width ``block``:

  1. the panel owner factorizes its (b x b) diagonal block and solves the
     sub-diagonal rows (all local work),
  2. the finished panel is broadcast with one ``psum`` (owner contributes,
     others contribute zeros),
  3. every chip applies the trailing update to its own columns with one
     MXU matmul.

Per-chip memory is O(N^2 / n_mp); comms are N/b panel broadcasts of
(N x b) over ICI (= one matrix pass total). The panel loop is a static
Python loop (shapes fixed per step), so XLA sees N/b small jitted stages.

1D block-column layout (not block-cyclic): the trailing update shrinks
toward the last chips, so late panels idle early chips — acceptable at the
panel counts used here; cyclic layout is the standard refinement if this
becomes the bottleneck (ROADMAP).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mfgp_tpu.ops import linalg as _la
from mfgp_tpu.parallel.mesh import MP_AXIS

_HIGHEST = jax.lax.Precision.HIGHEST


def make_sharded_cholesky(mesh: Mesh, n: int, block: int = 256):
    """Build ``f(K) -> L`` for (n, n) SPD inputs, column-sharded over mp.

    ``n`` must be divisible by ``n_mp * block`` (static panel layout).
    The returned function accepts a replicated or sharded K and returns L
    with the same sharding semantics as its input partitioning under jit
    (callers keep it sharded by passing a sharded K).
    """
    n_mp = mesh.shape[MP_AXIS]
    if n % n_mp:
        raise ValueError(f"n={n} not divisible by mp={n_mp}")
    nc = n // n_mp
    if nc % block:
        raise ValueError(f"column block {nc} not divisible by panel {block}")

    def shard_body(K_cols):
        # K_cols: (n, nc) — this chip's columns of the symmetric K
        idx = jax.lax.axis_index(MP_AXIS)
        col0 = idx * nc
        A = K_cols

        for k in range(0, n, block):
            owner = k // nc  # static
            k_local = k % nc  # static
            # --- 1. owner factorizes the panel (everyone computes on its
            # own slice; non-owners produce garbage that the psum masks out)
            pan_cols = jax.lax.dynamic_slice(
                A, (0, k_local), (n, block))  # (n, block)
            diag = jax.lax.dynamic_slice(pan_cols, (k, 0), (block, block))
            Lkk = _la.chol(diag)
            below = jax.lax.dynamic_slice(
                pan_cols, (0, 0), (n, block))  # rows k+block.. updated below
            # solve L21 Lkk^T = A21 -> L21 = A21 Lkk^-T (rows > k)
            sol = jax.scipy.linalg.solve_triangular(
                Lkk, below.T, lower=True).T  # (n, block)
            # assemble this chip's candidate finished panel:
            # rows < k: 0; rows in [k, k+block): Lkk (lower); rows >= k+block: sol
            rows = jnp.arange(n)[:, None]
            panel = jnp.where(rows < k, 0.0,
                              jnp.where(rows < k + block,
                                        jnp.pad(Lkk, ((k, n - k - block),
                                                      (0, 0))),
                                        sol))
            is_owner = (idx == owner)
            panel = jnp.where(is_owner, panel, jnp.zeros_like(panel))
            # --- 2. broadcast the finished panel (psum-as-broadcast)
            panel = jax.lax.psum(panel, MP_AXIS)  # (n, block)
            # --- 3. owner writes the panel into its columns
            A = jnp.where(
                is_owner,
                jax.lax.dynamic_update_slice(
                    A, jax.lax.dynamic_slice(panel, (0, 0), (n, block)),
                    (0, k_local)),
                A)
            # --- 4. trailing update on every chip's columns > k+block-1:
            # A[i, j] -= sum_c panel[i, c] * panel[j, c]
            my_cols = col0 + jnp.arange(nc)
            pj = panel[my_cols]  # (nc, block) = L[j, panel] for my columns
            upd = jnp.dot(panel, pj.T, precision=_HIGHEST)  # (n, nc)
            col_active = (my_cols >= k + block)[None, :]
            row_active = (jnp.arange(n) >= k + block)[:, None]
            A = A - jnp.where(col_active & row_active, upd, 0.0)

        # zero the strict upper triangle of the global matrix in my columns
        my_cols = col0 + jnp.arange(nc)
        tril = jnp.arange(n)[:, None] >= my_cols[None, :]
        return jnp.where(tril, A, 0.0)

    smapped = jax.shard_map(shard_body, mesh=mesh,
                            in_specs=P(None, MP_AXIS),
                            out_specs=P(None, MP_AXIS))

    return jax.jit(smapped)

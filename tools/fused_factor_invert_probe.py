"""Probe: fused Cholesky factor + triangular inverse (VERDICT r4 #7).

The bench unit's two triangular phases — ``chol(Kn)`` (XLA's monolithic
TPU kernel, ~120-170 ms warm at N=20k f32) and ``tri_inv_recursive(L)``
(~111 ms) — walk the same triangular panels. Hypothesis under test: a
single blocked program that factorizes AND inverts panel-by-panel can
share panel traffic (each diagonal block's factor + its explicit inverse
are computed once and consumed immediately) and beat the two-pass
chain.

The fused schedule (left-looking inverse interleaved into the
right-looking factorization): at panel k,

    L_kk  = chol(T_kk)                 (XLA kernel on (b, b))
    ik    = L_kk^-1                    (one small tri_solve — ALREADY
                                        computed by chol_blocked for the
                                        panel solve; the two-pass chain
                                        recomputes it inside
                                        tri_inv_recursive's base case)
    L_ik  = T_ik @ ik.T                (panel solve, MXU)
    M_kj  = -ik @ (sum_{j<=l<k} L_kl M_lj)   (inverse row k, MXU matmuls
                                        over the just-written L row)
    T_ij -= L_ik L_jk^T                (structure-aware trailing update)

Cost accounting: identical total multiplies to the two-pass chain
(N^3/6 factor + N^3/6 inverse), but the inverse recurrence here is a
SEQUENTIAL O(N/b) row chain where tri_inv_recursive is an O(log N)
divide-and-conquer — the fusion trades dependency depth for locality.
This probe measures which effect wins on the v5e.

Run (TPU):  python tools/fused_factor_invert_probe.py --n 20000
Run (CPU):  python tools/fused_factor_invert_probe.py --n 2048 --cpu

Outcome is recorded in ROADMAP.md either way (a measured-negative
retires the last unprobed FLOP-level bench lever).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def fused_factor_invert(K, block=2048, precision=None):
    """(L, Linv) from one blocked pass sharing panel factors/inverses."""
    import jax
    import jax.numpy as jnp

    from mfgp_tpu.ops import linalg as _la

    precision = precision or jax.lax.Precision.HIGHEST
    n = K.shape[0]
    if n <= block:
        L = jnp.linalg.cholesky(K)
        return L, _la.tri_solve(L, jnp.eye(n, dtype=K.dtype))
    nb = -(-n // block)
    lob = [i * block for i in range(nb)]
    hib = [min(n, (i + 1) * block) for i in range(nb)]
    T = {(i, j): K[lob[i]:hib[i], lob[j]:hib[j]]
         for i in range(nb) for j in range(i + 1)}
    Lb: dict[tuple, object] = {}   # factor blocks (i >= j)
    Mb: dict[tuple, object] = {}   # inverse blocks (i >= j)
    for k in range(nb):
        Lkk = jnp.linalg.cholesky(T[(k, k)])
        bk = hib[k] - lob[k]
        ik = _la.tri_solve(Lkk, jnp.eye(bk, dtype=K.dtype))
        Lb[(k, k)] = Lkk
        Mb[(k, k)] = ik
        # inverse row k: M_kj = -ik @ sum_{j<=l<k} L_kl M_lj, consuming
        # the L row while its blocks are hot
        for j in range(k):
            acc = jnp.dot(Lb[(k, j)], Mb[(j, j)], precision=precision)
            for l in range(j + 1, k):
                acc = acc + jnp.dot(Lb[(k, l)], Mb[(l, j)],
                                    precision=precision)
            Mb[(k, j)] = -jnp.dot(ik, acc, precision=precision)
        # panel solve + structure-aware trailing update
        panel = {}
        for i in range(k + 1, nb):
            Lik = jnp.dot(T[(i, k)], ik.T, precision=precision)
            panel[i] = Lik
            Lb[(i, k)] = Lik
        for i in range(k + 1, nb):
            for j in range(k + 1, i + 1):
                T[(i, j)] = T[(i, j)] - jnp.dot(
                    panel[i], panel[j].T, precision=precision)

    def _assemble(blocks):
        rows = []
        for i in range(nb):
            parts = [blocks[(i, j)] for j in range(i + 1)]
            if n > hib[i]:
                parts.append(jnp.zeros((hib[i] - lob[i], n - hib[i]),
                                       K.dtype))
            rows.append(jnp.concatenate(parts, axis=1))
        return jnp.concatenate(rows, axis=0)

    return _assemble(Lb), _assemble(Mb)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20_000)
    ap.add_argument("--block", type=int, default=2048)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from mfgp_tpu.ops import linalg as _la

    n = args.n
    rng = np.random.default_rng(0)
    A = rng.standard_normal((n, n)).astype(np.float32) / np.sqrt(n)
    K = jnp.asarray(A @ A.T + 2.0 * np.eye(n, dtype=np.float32))

    base = jax.jit(lambda K: (lambda L: (L, _la.tri_inv_recursive(L)))(
        _la.chol(K)))
    fused = jax.jit(lambda K: fused_factor_invert(K, block=args.block))

    def timeit(fn):
        # time a scalar REDUCTION of the outputs fetched to the host:
        # on the axon tunnel, block_until_ready on the big (N, N)
        # outputs returns in ~0.1 ms without waiting for the compute
        # (measured), so the wall-clock must be pinned by a host read
        sfn = jax.jit(lambda K: [jnp.sum(o) for o in fn(K)])
        out = fn(K)
        _ = [float(s) for s in sfn(K)]
        ts = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            _ = [float(s) for s in sfn(K)]
            ts.append(time.perf_counter() - t0)
        return min(ts), out

    t_base, (Lb_, Mi_b) = timeit(base)
    t_fused, (Lf_, Mi_f) = timeit(fused)
    # same-answer check (both are valid Cholesky inverses of the same K;
    # compare the reconstructed K^-1 action on a vector)
    v = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    ref = np.asarray(Mi_b.T @ (Mi_b @ v))
    got = np.asarray(Mi_f.T @ (Mi_f @ v))
    rel = float(np.linalg.norm(ref - got) / np.linalg.norm(ref))
    print(json.dumps({
        "n": n, "block": args.block,
        "chol_plus_tri_inv_seconds": round(t_base, 4),
        "fused_factor_invert_seconds": round(t_fused, 4),
        "speedup_x": round(t_base / t_fused, 3),
        "kinv_action_rel_err": rel,
    }))


if __name__ == "__main__":
    main()

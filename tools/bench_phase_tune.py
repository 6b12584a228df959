"""Per-phase knob sweep for the N=20k bench unit on the real TPU.

VERDICT r3 #4: the remaining bench levers are per-phase MXU efficiency
(the unit is otherwise arithmetic-bound; ROADMAP 'Performance'). This
times each phase's variants on warm executables:

  chol:      XLA monolithic vs chol_blocked(block)
  trtri:     tri_inv_recursive(base in {512, 1024, 2048})
  syrk+grad: syrk_grad_fused(tile in {512, 640, 768})
  posterior: predict_blocked_inv(block_size in {1024, 1536, 2048})

  python tools/bench_phase_tune.py [--phases chol trtri syrk post]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def timeit(fn, *args, repeats=3):
    import jax

    jax.block_until_ready(fn(*args))  # compile + warm
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phases", nargs="+",
                    default=["chol", "trtri", "syrk", "post"])
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import M_GRID, N_TRAIN, _theta, build_problem
    from mfgp_tpu.models import mfgp as mf
    from mfgp_tpu.ops import covariance as _cov
    from mfgp_tpu.ops import linalg as _la

    print(f"devices: {jax.devices()}", flush=True)
    X, fid, y, grid, grid_fid = build_problem(N_TRAIN, M_GRID)
    v, l, r, nz = _theta()
    params = mf.MFGPParams(
        jnp.log(jnp.asarray(v, jnp.float32)),
        jnp.log(jnp.asarray(l, jnp.float32)),
        jnp.asarray(r, jnp.float32),
        jnp.log(jnp.asarray(nz, jnp.float32)))
    Xj, fj, yj = jnp.asarray(X), jnp.asarray(fid), jnp.asarray(y)
    gj, gfj = jnp.asarray(grid), jnp.asarray(grid_fid)

    asm = jax.jit(lambda p: _cov.mf_train_cov(
        p.variances, p.lengthscales, p.rhos, p.noises, Xj, fj, 1e-6,
        "rbf"))
    Kn = jax.block_until_ready(asm(params))
    print(f"assembly: {timeit(asm, params, repeats=args.repeats) * 1e3:.1f} ms",
          flush=True)

    L = jax.block_until_ready(jax.jit(_la.chol)(Kn))
    if "chol" in args.phases:
        t = timeit(jax.jit(_la.chol), Kn, repeats=args.repeats)
        print(f"chol XLA: {t * 1e3:.1f} ms", flush=True)
        for blk in (1024, 2048):
            f = jax.jit(lambda K, b=blk: _la.chol_blocked(K, block=b))
            t = timeit(f, Kn, repeats=args.repeats)
            print(f"chol_blocked({blk}): {t * 1e3:.1f} ms", flush=True)

    Linv = jax.block_until_ready(jax.jit(_la.tri_inv_recursive)(L))
    if "trtri" in args.phases:
        for base in (512, 1024, 2048):
            f = jax.jit(lambda Lm, b=base: _la.tri_inv_recursive(Lm, base=b))
            t = timeit(f, L, repeats=args.repeats)
            print(f"tri_inv_recursive(base={base}): {t * 1e3:.1f} ms",
                  flush=True)

    alpha = jax.block_until_ready(jax.jit(_la.solve_posterior)(L, yj))
    if "syrk" in args.phases:
        from mfgp_tpu.ops.pallas_kernels import syrk_grad_fused

        for tile in (512, 640, 768):
            f = jax.jit(lambda Li, a, t_=tile: syrk_grad_fused(
                Li, a, Xj, fj, params.variances, params.lengthscales,
                params.rhos, params.noises, tile=t_))
            try:
                t = timeit(f, Linv, alpha, repeats=args.repeats)
                print(f"syrk_grad_fused(tile={tile}): {t * 1e3:.1f} ms",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"syrk_grad_fused(tile={tile}): FAILED {e!r}",
                      flush=True)

    if "post" in args.phases:
        state = mf.MFGPStateInv(Xj, fj, yj, Linv, alpha)
        for blk in (1024, 1536, 2048):
            f = jax.jit(lambda p, s, b=blk: mf.predict_blocked_inv(
                p, s, gj, gfj, kernel="rbf", block_size=b))
            t = timeit(f, params, state, repeats=args.repeats)
            print(f"predict_blocked_inv({blk}): {t * 1e3:.1f} ms",
                  flush=True)

    if "postfused" in args.phases:
        from mfgp_tpu.ops.pallas_kernels import posterior_fused

        # VMEM bound: the strip scratch is Np x TG x 4B (~42 MB at
        # TG=512), so TG tops out near 1024 at N=20k
        for tn in (512, 1024, 2048):
            for tg in (256, 512, 768, 1024):
                f = jax.jit(lambda Li, a, t_=tn, g_=tg: posterior_fused(
                    Li, a, Xj, fj, gj, gfj, params.variances,
                    params.lengthscales, params.rhos,
                    tile_n=t_, tile_g=g_))
                try:
                    t = timeit(f, Linv, alpha, repeats=args.repeats)
                    print(f"posterior_fused(T={tn}, TG={tg}): "
                          f"{t * 1e3:.1f} ms", flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"posterior_fused(T={tn}, TG={tg}): "
                          f"FAILED {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()

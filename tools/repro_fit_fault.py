"""Minimal repro probe for the >8-lane restart-batched fit fault.

Round-3 finding (ROADMAP): 30- and 90-lane restart-batched MF fit
executables "fault the TPU worker" on the axon tunnel while 8-lane
launches run fine; the study driver was capped at fit_chunk=8 without a
root cause. This probe isolates the variables:

  python tools/repro_fit_fault.py --lanes 30            # compile+run
  python tools/repro_fit_fault.py --lanes 30 --compile-only
  python tools/repro_fit_fault.py --lanes 30 --family sf
  python tools/repro_fit_fault.py --lanes 30 --maxiter 20

Prints the compiled executable's memory_analysis() BEFORE executing, so
an HBM-exhaustion root cause is visible even when execution faults; use
one subprocess per lane count (the driver loop in tools/fit_fault_sweep.sh)
so a worker fault can't take later probes down with it.

Synthetic data matches the study matrix's shapes exactly
(data/study_batched.py: N=709-row GPData with t<3600, D=3, F=3,
n_restarts=8, maxiter=200, tol=1e-3, ftol=1e-6, f32).
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=8)
    ap.add_argument("--family", choices=("mf", "sf", "nigp"), default="mf")
    ap.add_argument("--n", type=int, default=709)
    ap.add_argument("--restarts", type=int, default=8)
    ap.add_argument("--maxiter", type=int, default=200)
    ap.add_argument("--ftol", type=float, default=1e-6)
    ap.add_argument("--compile-only", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--converging", action="store_true",
                    help="smooth WRBF-like targets (fits converge in "
                    "20-50 iters like the real study) instead of pure "
                    "noise (never converges -> every lane runs to "
                    "maxiter, the longest possible execution)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from mfgp_tpu.data import study_batched as sb

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    B, N, D, F, R = args.lanes, args.n, 3, 3, args.restarts
    dtype = np.float32
    Xn = rng.uniform(0, 10, (B, N, D)).astype(dtype)
    if args.converging:
        c = rng.uniform(0, 10, (B, 4, D))
        yn = np.stack([
            sum(5.0 * np.exp(-0.5 * np.sum((Xn[b] - c[b, i]) ** 2, -1)
                             / 4.0) for i in range(4))
            for b in range(B)]).astype(dtype)
        yn += 0.1 * rng.standard_normal((B, N)).astype(dtype)
    else:
        yn = rng.standard_normal((B, N)).astype(dtype)
    X = jnp.asarray(Xn)
    y = jnp.asarray(yn)
    fid = jnp.asarray(np.sort(rng.integers(0, F, (B, N)), axis=1)[:, ::-1]
                      .copy(), jnp.int32)

    if args.family == "mf":
        n_mf = F + F * D + F
        inits = np.zeros((R, n_mf), dtype)
        inits[1:] = rng.standard_normal((R - 1, n_mf))
        fixed_rhos = jnp.ones((F - 1,), dtype)
        inf = jnp.full((n_mf,), jnp.inf, dtype)
        fn = lambda: sb._fit_mf_batch(jnp.asarray(inits), X, fid, y,
                                      fixed_rhos, -inf, inf, "rbf", 1e-6,
                                      args.maxiter, 1e-3, args.ftol)
        lowered = jax.jit(
            lambda X_, f_, y_: sb._fit_mf_batch(
                jnp.asarray(inits), X_, f_, y_, fixed_rhos, -inf, inf,
                "rbf", 1e-6, args.maxiter, 1e-3, args.ftol)
        ).lower(X, fid, y)
    elif args.family == "sf":
        inits = np.zeros((R, D + 2), dtype)
        inits[1:] = rng.standard_normal((R - 1, D + 2))
        fn = lambda: sb._fit_sf_batch(jnp.asarray(inits), X, y, "rbf",
                                      1e-6, args.maxiter, 1e-3, args.ftol)
        lowered = jax.jit(
            lambda X_, y_: sb._fit_sf_batch(
                jnp.asarray(inits), X_, y_, "rbf", 1e-6, args.maxiter,
                1e-3, args.ftol)).lower(X, y)
    else:
        n_ni = 2 * D + 2
        initsb = jnp.asarray(
            rng.standard_normal((B, max(2, 2), n_ni)).astype(dtype))
        lo = jnp.full((n_ni,), np.log(1e-6), dtype)
        hi = jnp.full((n_ni,), np.log(1e6), dtype)
        fn = lambda: sb._fit_nigp_batch(initsb, X, y, lo, hi,
                                        args.maxiter, args.ftol)
        lowered = jax.jit(
            lambda i_, X_, y_: sb._fit_nigp_batch(
                i_, X_, y_, lo, hi, args.maxiter, args.ftol)
        ).lower(initsb, X, y)

    t0 = time.monotonic()
    compiled = lowered.compile()
    t_compile = time.monotonic() - t0
    print(f"compiled in {t_compile:.1f}s", flush=True)
    try:
        ma = compiled.memory_analysis()
        print(f"memory_analysis: {ma}", flush=True)
    except Exception as e:  # noqa: BLE001 - diagnostics only
        print(f"memory_analysis unavailable: {e!r}", flush=True)

    if args.compile_only:
        print("COMPILE-ONLY OK", flush=True)
        return

    print(f"executing at {time.strftime('%H:%M:%S')}...", flush=True)
    t0 = time.monotonic()
    out = jax.tree.map(np.asarray, fn())
    t_run = time.monotonic() - t0
    fs = out if isinstance(out, np.ndarray) else out
    print(f"ran in {t_run:.1f}s; out shape {np.shape(fs)}; "
          f"finite {np.isfinite(np.asarray(fs)).mean():.3f}", flush=True)
    print("RUN OK", flush=True)


if __name__ == "__main__":
    main()

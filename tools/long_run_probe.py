"""Isolate DURATION as the TPU-worker crash trigger.

A single device launch that is nothing but a fori_loop of matmuls — no
fit code, no Pallas, trivial memory — sized by --minutes. If this
crashes the worker at the same multi-minute scale where the fit
executables crash (tools/fit_fault_sweep.sh: 9-16 min) while short runs
pass, the round-3 'lane count' theory is dead and the real launch
constraint is wall-clock per execution.

  python tools/long_run_probe.py --minutes 2
  python tools/long_run_probe.py --minutes 12
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=2.0)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    print(f"devices: {jax.devices()}", flush=True)
    n = args.n

    @jax.jit
    def burn(x, iters):
        def body(_, y):
            return y @ y * (1.0 / n) + 0.001
        return jax.lax.fori_loop(0, iters, body, x)

    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((n, n)).astype(np.float32))
    # calibrate: time 200 iterations
    t0 = time.monotonic()
    jax.block_until_ready(burn(x, 200))
    per200 = time.monotonic() - t0
    print(f"200 iters (incl. compile): {per200:.2f}s", flush=True)
    t0 = time.monotonic()
    jax.block_until_ready(burn(x, 200))
    per200 = time.monotonic() - t0
    print(f"200 iters warm: {per200:.2f}s", flush=True)
    iters = int(args.minutes * 60.0 / per200 * 200)
    print(f"target {args.minutes} min -> {iters} iters; "
          f"executing at {time.strftime('%H:%M:%S')}", flush=True)
    t0 = time.monotonic()
    out = jax.block_until_ready(burn(x, iters))
    print(f"ran {time.monotonic() - t0:.1f}s; out[0,0]={float(out[0, 0])}",
          flush=True)
    print("RUN OK", flush=True)


if __name__ == "__main__":
    main()

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

    def timed(iters):
        """Wall-clock to a SCALAR FETCH — on the axon tunnel,
        block_until_ready does not actually block (measured: a warm
        200-iteration launch 'completed' in 0.00 s), so only a data
        fetch is a real synchronization point."""
        t0 = time.monotonic()
        v = float(burn(x, iters)[0, 0])
        return time.monotonic() - t0, v

    per200, _ = timed(200)
    print(f"200 iters (incl. compile): {per200:.2f}s", flush=True)
    per200, _ = timed(200)
    print(f"200 iters warm: {per200:.2f}s", flush=True)
    iters = max(200, int(args.minutes * 60.0 / per200 * 200))
    print(f"target {args.minutes} min -> {iters} iters; "
          f"executing at {time.strftime('%H:%M:%S')}", flush=True)
    dt, v = timed(iters)
    print(f"ran {dt:.1f}s; out[0,0]={v}", flush=True)
    print("RUN OK", flush=True)


if __name__ == "__main__":
    main()

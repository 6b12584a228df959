"""Probe AOT executable serialization on the axon tunnel (VERDICT r3 #5).

Two candidate compile-skipping mechanisms:

1. ``jax.experimental.serialize_executable`` — pickles the COMPILED
   PJRT executable; loading it in a fresh process would skip the tunnel
   compile entirely. Expected to fail on axon: the plugin's IFRT client
   implements ``serialize_executable`` but documents "serialize->parse
   only" with no deserialize round-trip (utils/cache.py gate).
2. ``jax.export`` — serializes STABLEHLO, so a fresh process still pays
   the XLA compile; useful only as a trace cache. Measured here for
   completeness.

  python tools/aot_export_probe.py          # phase 1: export + save
  python tools/aot_export_probe.py --load   # phase 2 (fresh process)
"""

from __future__ import annotations

import argparse
import pickle
import sys
import time

sys.path.insert(0, "/root/repo")

PATH_PJRT = "/tmp/aot_probe_pjrt.pkl"
PATH_EXPORT = "/tmp/aot_probe_export.bin"


def make_fn():
    import jax.numpy as jnp

    def f(x):
        return (x @ x.T).sum(axis=1) * 0.5 + jnp.tanh(x).sum()

    return f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--load", action="store_true")
    ap.add_argument("--n", type=int, default=2048)
    args = ap.parse_args()

    import jax
    import numpy as np

    print(f"devices: {jax.devices()}", flush=True)
    x = np.random.default_rng(0).standard_normal(
        (args.n, args.n)).astype(np.float32)
    f = make_fn()

    if not args.load:
        t0 = time.monotonic()
        compiled = jax.jit(f).lower(x).compile()
        print(f"compile: {time.monotonic() - t0:.1f}s", flush=True)
        out = np.asarray(compiled(x))
        print(f"run ok, out[0]={out[0]:.4f}", flush=True)
        try:
            from jax.experimental.serialize_executable import serialize

            blob = serialize(compiled)
            with open(PATH_PJRT, "wb") as fh:
                pickle.dump(blob, fh)
            print(f"PJRT serialize OK: {len(pickle.dumps(blob))} bytes",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — probe
            print(f"PJRT serialize FAILED: {e!r}", flush=True)
        try:
            from jax import export as jexport

            exp = jexport.export(jax.jit(f))(x)
            with open(PATH_EXPORT, "wb") as fh:
                fh.write(exp.serialize())
            print("jax.export serialize OK", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"jax.export serialize FAILED: {e!r}", flush=True)
        return

    # fresh process: try to LOAD and run without recompiling
    try:
        from jax.experimental.serialize_executable import deserialize_and_load

        with open(PATH_PJRT, "rb") as fh:
            blob = pickle.load(fh)
        t0 = time.monotonic()
        compiled = deserialize_and_load(*blob)
        out = np.asarray(compiled(x))
        print(f"PJRT deserialize+run OK in {time.monotonic() - t0:.1f}s, "
              f"out[0]={out[0]:.4f}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"PJRT deserialize FAILED: {e!r}", flush=True)
    try:
        from jax import export as jexport

        with open(PATH_EXPORT, "rb") as fh:
            exp = jexport.deserialize(fh.read())
        t0 = time.monotonic()
        out = np.asarray(jax.jit(exp.call)(x))
        print(f"jax.export call (recompiles) in "
              f"{time.monotonic() - t0:.1f}s, out[0]={out[0]:.4f}",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"jax.export load FAILED: {e!r}", flush=True)


if __name__ == "__main__":
    main()

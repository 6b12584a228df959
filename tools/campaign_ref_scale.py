"""Campaign at the reference's sim scale: one variant, B=150, >=10 seeds.

VERDICT r3 #7: run one variant at the reference's sim planner budget
(B=150, reference/exploreSimSettings.py:199) with realistic iteration
counts x >=10 seeds on the chip; record wall-clock + outcome stats for
the PARITY.md table against the recorded 88-run means (BASELINE.md).

  python tools/plan... tools/campaign_ref_scale.py --variant MFEGP \
      --seeds 10 --bd 5 --plan-iters 40

If the confirmed per-launch wall-clock ceiling on the tunnel worker
bites (see ROADMAP 'TPU worker fault'), drop --seeds per launch with
--chunk and the script runs ceil(seeds/chunk) ensemble launches.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="MFEGP")
    ap.add_argument("--seeds", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--budget", type=float, default=150.0)
    ap.add_argument("--bd", type=int, default=5)
    ap.add_argument("--plan-iters", type=int, default=40)
    ap.add_argument("--e-max", type=int, default=24)
    ap.add_argument("--chunk", type=int, default=0,
                    help=">0: split the seed ensemble into launches of "
                         "this many lanes (per-launch wall-clock ceiling)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from mfgp_tpu.sim.mission_device import DeviceMission
    from mfgp_tpu.utils.configs import ExperimentConfig

    v = args.variant.upper()
    exp = ExperimentConfig(multi_fidelity=v.startswith("MF"),
                           ergodic=v in ("MFEGP", "SFEGP"),
                           B=args.budget, BD=args.bd, update_hyps=False)
    mission = DeviceMission(exp, seed=args.seed,
                            plan_iters=args.plan_iters, e_max=args.e_max)
    print(f"devices: {jax.devices()}; n_max={mission.n_max}", flush=True)

    t0 = time.perf_counter()
    if args.chunk and args.chunk < args.seeds:
        results = []
        mission._ens_jit = {}
        for s0 in range(args.seed, args.seed + args.seeds, args.chunk):
            k = min(args.chunk, args.seed + args.seeds - s0)
            m = DeviceMission(exp, seed=s0, plan_iters=args.plan_iters,
                              e_max=args.e_max)
            # run_ensemble compiles into _ens_jit[bd]; sharing the dict
            # reuses ONE vmapped executable across every chunk (the fn
            # closes over the first mission, whose config is identical;
            # seeds enter through the traced key argument). Tail chunks
            # pad to the chunk size so the shapes match.
            m._ens_jit = mission._ens_jit
            results.extend(m.run_ensemble(args.chunk)[:k])
            print(f"  seeds {s0}..{s0 + k - 1}: "
                  f"{time.perf_counter() - t0:.1f}s cumulative",
                  flush=True)
    else:
        results = mission.run_ensemble(args.seeds)
    wall = time.perf_counter() - t0

    rmse = np.array([r.rmse for r in results])
    wmse = np.array([getattr(r, "wmse", np.nan) for r in results])
    out = {
        "variant": v, "budget": args.budget, "bd": args.bd,
        "plan_iters": args.plan_iters, "seeds": args.seeds,
        "wall_seconds": round(wall, 1),
        "seconds_per_run": round(wall / args.seeds, 1),
        "rmse_mean": round(float(np.nanmean(rmse)), 4),
        "rmse_std": round(float(np.nanstd(rmse)), 4),
        "rmse": [round(float(r), 4) for r in rmse],
        "replans": [r.n_replans for r in results],
        "budget_used": [round(float(r.budget_used), 2) for r in results],
    }
    if np.isfinite(wmse).any():
        out["wmse_mean"] = round(float(np.nanmean(wmse)), 4)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

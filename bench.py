"""Headline benchmark: F-16 heading-env step latency at 10^6 aircraft.

Prints ONE JSON line:
  {"metric": ..., "value": <s/step at n=1e6>, "unit": "s/step",
   "vs_baseline": <reference_time / our_time, i.e. speedup, >1 is better>}

Reference baseline: 0.2103 s/step at n=10^6 on the reference's (unspecified)
GPU - BASELINE.md / envs/measure_env/time_neuralplane.npy.

Usage: python bench.py [--n 1000000] [--steps 100] [--sweep]
"""
from __future__ import annotations

import argparse
import json
import sys

BASELINE_S_PER_STEP_1M = 0.2103


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    # the reference times 500 steps (envs/measure_env.py:74); shorter runs
    # under-amortize the first-dispatch tail through the TPU relay
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--sweep", action="store_true",
                    help="also print the 10^0..10^6 sweep to stderr")
    ap.add_argument("--combat-sweep", action="store_true",
                    help="also print the combat/shoot env sweep "
                         "(SingleCombat[Shoot], MultipleCombat[Shoot] at "
                         "n=10^1..10^6) to stderr")
    ap.add_argument("--combat-max-exp", type=int, default=6)
    ap.add_argument("--aero", default="auto",
                    choices=["auto", "pallas", "stacked", "distilled"],
                    help="aero backend; 'auto' = distilled on TPU when its"
                         " trained npz ships (fidelity-gated at xdot"
                         " R^2>=0.999 vs the 43-net ensemble,"
                         " surrogates/distill.py), else the 43-net 'pallas'"
                         " parity kernel")
    args = ap.parse_args()

    from neuralplane_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    from neuralplane_tpu.measure import (measure_combat_sweep,
                                         measure_env_step, measure_sweep)

    if args.sweep:
        for row in measure_sweep(steps=min(args.steps, 500)):
            print(json.dumps(row), file=sys.stderr)
    if args.combat_sweep:
        for row in measure_combat_sweep(max_exp=args.combat_max_exp,
                                        steps=min(args.steps, 200)):
            print(json.dumps(row), file=sys.stderr, flush=True)

    res = measure_env_step(args.n, steps=args.steps,
                           aero_backend=args.aero)
    print(json.dumps({
        "metric": "f16_heading_env_step_1M_agents",
        "value": round(res["s_per_step"], 6),
        "unit": "s/step",
        "vs_baseline": round(BASELINE_S_PER_STEP_1M / res["s_per_step"], 2),
        "aero_backend": args.aero,
    }))


if __name__ == "__main__":
    main()

"""Sweep the whole-step kernel's tile size on real TPU.

The fused env-step kernel (ops/step_pallas.py) tiles the agent batch; the
default TILE was tuned for the grouped 43-net backend. The distilled
backend shifts the MXU/VPU balance, so re-sweep:

    python tools/sweep_tile.py [--n 1000000] [--steps 60] [--aero auto]
        [--tiles 1024,2048,4096,8192]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--aero", default="auto",
                    choices=["auto", "pallas", "distilled"])
    ap.add_argument("--tiles", default="1024,2048,4096,8192")
    args = ap.parse_args()

    from neuralplane_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    from neuralplane_tpu import measure
    from neuralplane_tpu.ops import step_pallas

    from neuralplane_tpu.ops import aero_pallas
    base = step_pallas.TILE
    base_d = aero_pallas.DISTILLED_TILE
    for tile in [int(t) for t in args.tiles.split(",")]:
        step_pallas.TILE = tile
        aero_pallas.DISTILLED_TILE = tile
        try:
            res = measure.measure_env_step(args.n, steps=args.steps,
                                           aero_backend=args.aero)
            print(f"tile {tile:5d}: {res['s_per_step']*1e3:8.3f} ms/step "
                  f"({res['agent_steps_per_s']/1e6:7.1f} M agent-steps/s)")
        except Exception as e:  # noqa: BLE001 - report and keep sweeping
            print(f"tile {tile:5d}: FAILED {type(e).__name__}: {e}")
    step_pallas.TILE = base
    aero_pallas.DISTILLED_TILE = base_d


if __name__ == "__main__":
    main()

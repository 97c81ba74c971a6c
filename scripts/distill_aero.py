"""Train the consolidated aero surrogate (surrogates/distill.py) and write
`neuralplane_tpu/data/f16_aero_distilled.npz`.

Usage:
    python scripts/distill_aero.py [--hidden 128] [--steps 20000]
        [--gate 0.9995] [--out <path>]

Prints per-coefficient R^2 vs the 43-net ensemble (bf16-quantized eval,
matching the TPU kernel) and refuses to write the npz if the minimum R^2
misses the gate.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--gate", type=float, default=0.999)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from neuralplane_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import numpy as np

    from neuralplane_tpu.ops.aero import AERO_NAMES, load_aero_weights
    from neuralplane_tpu.surrogates import distill

    w43 = load_aero_weights()
    params, mean, std = distill.fit(
        w43, hidden=args.hidden, steps=args.steps, batch=args.batch,
        lr=args.lr, seed=args.seed)

    import numpy as np

    # crash insurance: raw z-space params saved before any gating/eval
    np.savez("/tmp/distill_params_raw.npz",
             **{k: np.asarray(v) for k, v in params._asdict().items()},
             out_mean=mean, out_std=std)

    rep = distill.evaluate(w43, params, mean, std)
    rep_f32 = distill.evaluate(w43, params, mean, std, quantized=False)
    print(f"[f32 fit]   min coeff R2 = {rep_f32['r2_min']:.6f} ({rep_f32['worst']})")
    for name, r2, mx in zip(AERO_NAMES, rep["r2"], rep["max_abs"]):
        print(f"  {name:18s} R2 {r2:.6f}  max|err| {mx:.5f}")
    print(f"[quantized] min coeff R2 = {rep['r2_min']:.6f} ({rep['worst']})")

    # the acceptance gate is XDOT-level fidelity (what the env integrates),
    # not per-coefficient z-space R2 - see distill.xdot_fidelity docstring
    fid = distill.xdot_fidelity(w43, params, mean, std)
    rep.update(fid)
    print("xdot R2 per row:", np.round(fid["xdot_r2"], 6))
    print(f"xdot R2 min = {fid['xdot_r2_min']:.6f} "
          f"(gate {args.gate}; bf16 grouped kernel on this protocol: 0.9997)")

    if fid["xdot_r2_min"] < args.gate:
        print(f"FAILED xdot gate {args.gate}; not writing npz", file=sys.stderr)
        sys.exit(1)

    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "neuralplane_tpu", "data", "f16_aero_distilled.npz")
    distill.to_npz(out, params, mean, std, rep)
    print(f"wrote {out} (hidden={args.hidden}, "
          f"xdot R2 min {fid['xdot_r2_min']:.6f})")


if __name__ == "__main__":
    main()

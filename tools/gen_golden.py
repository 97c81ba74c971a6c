"""Generate golden test fixtures by RUNNING the reference implementation (CPU torch).

Produces tests/golden/f16_golden.npz with:
  - x:      [N, 17] random (state, control) query points in flight envelope
  - coeffs: [N, 43] reference aero-surrogate outputs (canonical order of
            neuralplane_tpu.ops.aero.AERO_NAMES)
  - xdot:   [N, 12] reference nlplant derivatives
  - traj_s0/traj_u/traj:  10-step euler trajectory (fixed controls) via the
            reference F16Dynamics + torchdiffeq, for integration parity
  - trim_x/trim_xdot: derivative at the measure_env.py INIT_U trim point

Run:  python tools/gen_golden.py
"""
from __future__ import annotations

import os
import sys

import numpy as np
import torch

REF = "/root/reference"
sys.path.insert(0, os.path.join(REF, "envs", "models", "F16"))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden", "f16_golden.npz")

# Canonical order must match neuralplane_tpu.ops.aero.AERO_NAMES.
AERO_NAMES = (
    "Cx", "Cz", "Cm", "Cy", "Cn", "Cl",
    "Cxq", "Cyr", "Cyp", "Czq", "Clr", "Clp", "Cmq", "Cnr", "Cnp",
    "delta_Cx_lef", "delta_Cz_lef", "delta_Cm_lef", "delta_Cy_lef",
    "delta_Cn_lef", "delta_Cl_lef",
    "delta_Cxq_lef", "delta_Cyr_lef", "delta_Cyp_lef", "delta_Czq_lef",
    "delta_Clr_lef", "delta_Clp_lef", "delta_Cmq_lef", "delta_Cnr_lef",
    "delta_Cnp_lef",
    "delta_Cy_r30", "delta_Cn_r30", "delta_Cl_r30",
    "delta_Cy_a20", "delta_Cy_a20_lef", "delta_Cn_a20", "delta_Cn_a20_lef",
    "delta_Cl_a20", "delta_Cl_a20_lef",
    "delta_Cnbeta", "delta_Clbeta", "delta_Cm", "eta_el",
)

# measure_env.py:12-16 INIT_U trim point (SI), converted to the sim's US units.
INIT_U_SI = [14.3842921301, 0.0, 999.240528869, 0.0, 0.0680626236787, 0.0,
             100.08096494, 0.121545455798, 0.0, 0.0, -0.031583522788, 0.0,
             20000.0, 0.0, 0.0, 0.0, 0.0]
FT = 0.3048
LBF = 4.448222


def sample_states(rng: np.random.Generator, n: int) -> np.ndarray:
    x = np.zeros((n, 17), dtype=np.float64)
    x[:, 0] = rng.uniform(-1e4, 1e4, n)          # npos ft
    x[:, 1] = rng.uniform(-1e4, 1e4, n)          # epos ft
    x[:, 2] = rng.uniform(3000, 30000, n)        # alt ft
    x[:, 3] = rng.uniform(-np.pi, np.pi, n)      # roll
    x[:, 4] = rng.uniform(-1.2, 1.2, n)          # pitch (|ct|>0)
    x[:, 5] = rng.uniform(-np.pi, np.pi, n)      # yaw
    x[:, 6] = rng.uniform(300, 1500, n)          # vt ft/s
    x[:, 7] = rng.uniform(np.radians(-18), np.radians(43), n)   # alpha
    x[:, 8] = rng.uniform(np.radians(-28), np.radians(28), n)   # beta
    x[:, 9:12] = rng.uniform(-2, 2, (n, 3))      # P, Q, R
    x[:, 12] = rng.uniform(0, 20000, n)          # T lbf
    x[:, 13] = rng.uniform(-25, 25, n)           # el deg
    x[:, 14] = rng.uniform(-21, 21, n)           # ail
    x[:, 15] = rng.uniform(-30, 30, n)           # rud
    x[:, 16] = rng.uniform(0, 25, n)             # lef
    return x


def main() -> None:
    from F16_dynamics import F16Dynamics  # reference module (read-only)

    torch.manual_seed(0)
    dyn = F16Dynamics("cpu")

    rng = np.random.default_rng(42)
    x = sample_states(rng, 256)
    xt = torch.tensor(x, dtype=torch.float32)

    with torch.no_grad():
        xdot = dyn.nlplant(xt).numpy()

        alpha = xt[:, 7] * 180.0 / torch.pi
        beta = xt[:, 8] * 180.0 / torch.pi
        el = xt[:, 13]
        h = dyn.hifi_F16
        coeff_map = {}
        (coeff_map["Cx"], coeff_map["Cz"], coeff_map["Cm"], coeff_map["Cy"],
         coeff_map["Cn"], coeff_map["Cl"]) = h.hifi_C(alpha, beta, el)
        (coeff_map["Cxq"], coeff_map["Cyr"], coeff_map["Cyp"], coeff_map["Czq"],
         coeff_map["Clr"], coeff_map["Clp"], coeff_map["Cmq"], coeff_map["Cnr"],
         coeff_map["Cnp"]) = h.hifi_damping(alpha)
        (coeff_map["delta_Cx_lef"], coeff_map["delta_Cz_lef"],
         coeff_map["delta_Cm_lef"], coeff_map["delta_Cy_lef"],
         coeff_map["delta_Cn_lef"], coeff_map["delta_Cl_lef"]) = h.hifi_C_lef(alpha, beta)
        (coeff_map["delta_Cxq_lef"], coeff_map["delta_Cyr_lef"],
         coeff_map["delta_Cyp_lef"], coeff_map["delta_Czq_lef"],
         coeff_map["delta_Clr_lef"], coeff_map["delta_Clp_lef"],
         coeff_map["delta_Cmq_lef"], coeff_map["delta_Cnr_lef"],
         coeff_map["delta_Cnp_lef"]) = h.hifi_damping_lef(alpha)
        (coeff_map["delta_Cy_r30"], coeff_map["delta_Cn_r30"],
         coeff_map["delta_Cl_r30"]) = h.hifi_rudder(alpha, beta)
        (coeff_map["delta_Cy_a20"], coeff_map["delta_Cy_a20_lef"],
         coeff_map["delta_Cn_a20"], coeff_map["delta_Cn_a20_lef"],
         coeff_map["delta_Cl_a20"], coeff_map["delta_Cl_a20_lef"]) = h.hifi_ailerons(alpha, beta)
        (coeff_map["delta_Cnbeta"], coeff_map["delta_Clbeta"],
         coeff_map["delta_Cm"], coeff_map["eta_el"], _zero) = h.hifi_other_coeffs(alpha, el)
        coeffs = np.stack([coeff_map[n].numpy() for n in AERO_NAMES], axis=1)

        # 10-step euler trajectory at fixed controls from a level-flight state.
        s0 = torch.zeros((4, 12))
        s0[:, 2] = torch.tensor([19000.0, 19500.0, 20000.0, 15000.0])
        s0[:, 6] = torch.tensor([1000.0, 1100.0, 1200.0, 900.0])
        u0 = torch.zeros((4, 5))
        u0[:, 0] = 2000.0
        u0[:, 1] = torch.tensor([-2.0, 0.0, 2.0, -1.0])
        traj = [s0.numpy().copy()]
        s = s0.clone()
        for _ in range(10):
            # torchdiffeq euler over [0, dt] == one explicit euler step
            # (nlplant returns zeros for the control columns, so controls
            # integrate as constants - `F16_dynamics.py:60`).
            x_full = torch.hstack((s, u0))
            s = (x_full + 0.02 * dyn.nlplant(x_full))[:, :12]
            traj.append(s.numpy().copy())
        traj = np.stack(traj)  # [11, 4, 12]

        # trim point (SI -> US units)
        trim = np.array(INIT_U_SI, dtype=np.float64)
        trim[[0, 1, 2, 6]] /= FT
        trim[12] /= LBF
        trim_t = torch.tensor(trim[None, :], dtype=torch.float32)
        trim_xdot = dyn.nlplant(trim_t).numpy()

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(
        OUT,
        x=x.astype(np.float32), coeffs=coeffs.astype(np.float32),
        xdot=xdot.astype(np.float32),
        traj_s0=s0.numpy().astype(np.float32), traj_u=u0.numpy().astype(np.float32),
        traj=traj.astype(np.float32),
        trim_x=trim.astype(np.float32), trim_xdot=trim_xdot.astype(np.float32),
    )
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()

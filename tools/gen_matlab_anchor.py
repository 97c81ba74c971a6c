"""Generate the MATLAB/C ground-truth anchor fixture.

The reference commits two independent table-evaluation ground truths for the
43 aero surrogates (`envs/models/F16/model/test_model.py:60-394`):
  - coefs.csv   — MATLAB implementation of the NASA table lookups
  - coefs_C.csv — C implementation (nlplant.c) of the same lookups
both evaluated on a 630-point (alpha, beta, dele) grid (rows 0-2 = inputs,
rows 3-46 = one coefficient each; the lef/aileron groups are only valid on
the first 400 columns, where alpha <= the lef-table limit of 45 deg).

This script decodes both CSVs into tests/golden/f16_matlab_anchor.npz with
the row->coefficient mapping from test_model.py hardcoded below, so the test
suite can score our surrogates against the reference's own independent
ground truth WITHOUT reading /root/reference at test time.

Run:  python tools/gen_matlab_anchor.py
"""
from __future__ import annotations

import os

import numpy as np

REF = "/root/reference/envs/models/F16/model"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden", "f16_matlab_anchor.npz")

# (name, csv_row, n_valid_points) — mapping transcribed from
# test_model.py:60-394 (the :400 slices are the lef-group rows).
ROWS = [
    ("Cx", 3, 630), ("Cz", 4, 630), ("Cm", 5, 630), ("Cy", 6, 630),
    ("Cn", 7, 630), ("Cl", 8, 630),
    ("Cxq", 9, 630), ("Cyr", 10, 630), ("Cyp", 11, 630), ("Czq", 12, 630),
    ("Clr", 13, 630), ("Clp", 14, 630), ("Cmq", 15, 630), ("Cnr", 16, 630),
    ("Cnp", 17, 630),
    ("delta_Cx_lef", 18, 400), ("delta_Cz_lef", 19, 400),
    ("delta_Cm_lef", 20, 400), ("delta_Cy_lef", 21, 400),
    ("delta_Cn_lef", 22, 400), ("delta_Cl_lef", 23, 400),
    ("delta_Cxq_lef", 24, 400), ("delta_Cyr_lef", 25, 400),
    ("delta_Cyp_lef", 26, 400), ("delta_Czq_lef", 27, 400),
    ("delta_Clr_lef", 28, 400), ("delta_Clp_lef", 29, 400),
    ("delta_Cmq_lef", 30, 400), ("delta_Cnr_lef", 31, 400),
    ("delta_Cnp_lef", 32, 400),
    ("delta_Cy_r30", 33, 630), ("delta_Cn_r30", 34, 630),
    ("delta_Cl_r30", 35, 630),
    ("delta_Cy_a20", 36, 400), ("delta_Cn_a20", 37, 400),
    ("delta_Cl_a20", 38, 400),
    ("delta_Cy_a20_lef", 39, 400), ("delta_Cn_a20_lef", 40, 400),
    ("delta_Cl_a20_lef", 41, 400),
    ("delta_Cnbeta", 42, 630), ("delta_Clbeta", 43, 630),
    ("delta_Cm", 44, 630), ("eta_el", 45, 630),
    # row 46 (delta_Cm_ds) is identically zero in both anchors and the
    # reference returns a constant 0 for it (hifi_F16_AeroData.py:816)
]

# The C program wrote its aileron block INTERLEAVED (Cy, Cy_lef, Cn, Cn_lef,
# Cl, Cl_lef) while the MATLAB file groups non-lef then lef; verified by
# cross-matching every C row against the surrogate predictions (only this
# permutation scores R2>0.96 on all six). test_model.py's C reads for these
# rows are commented out, so the reference never noticed.
C_ROW_OVERRIDE = {
    "delta_Cy_a20": 36, "delta_Cy_a20_lef": 37,
    "delta_Cn_a20": 38, "delta_Cn_a20_lef": 39,
    "delta_Cl_a20": 40, "delta_Cl_a20_lef": 41,
}


def main() -> None:
    matlab = np.loadtxt(os.path.join(REF, "coefs.csv"), delimiter=",")
    c_impl = np.loadtxt(os.path.join(REF, "coefs_C.csv"), delimiter=",")
    assert matlab.shape == c_impl.shape == (47, 630), matlab.shape
    assert np.allclose(matlab[46], 0.0) and np.allclose(c_impl[46], 0.0)

    # The two CSVs carry DIFFERENT input grids in rows 0-2 (the reference's
    # test_model.py scores the MLPs on the MATLAB grid only and merely
    # overlays the C curves): the C sweep covers alpha -16.3..42.66 deg in
    # 405 columns and zero-pads the remaining 225. Store each anchor with
    # its own grid so both can be scored on the points it was evaluated at.
    c_cols = np.where((c_impl[0] != 0) | (c_impl[1] != 0)
                      | (c_impl[2] != 0))[0]
    n_c = c_cols.max() + 1
    assert n_c == 405, n_c

    names = np.array([r[0] for r in ROWS])
    rows = np.array([r[1] for r in ROWS])
    rows_c = np.array([C_ROW_OVERRIDE.get(r[0], r[1]) for r in ROWS])
    valid = np.array([r[2] for r in ROWS])
    np.savez_compressed(
        OUT,
        alpha=matlab[0], beta=matlab[1], dele=matlab[2],
        matlab=matlab[rows],
        alpha_c=c_impl[0, :n_c], beta_c=c_impl[1, :n_c],
        dele_c=c_impl[2, :n_c], c=c_impl[rows_c][:, :n_c],
        names=names, valid=valid)
    print(f"wrote {OUT}: {len(ROWS)} coefficients; MATLAB grid 630 pts, "
          f"C grid {n_c} pts")


if __name__ == "__main__":
    main()

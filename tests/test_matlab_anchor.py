"""Surrogate fidelity vs the reference's independent MATLAB/C ground truth.

The reference commits two table-lookup implementations' outputs on a fixed
(alpha, beta, dele) grid (`envs/models/F16/model/coefs.csv` from MATLAB,
`coefs_C.csv` from nlplant.c) and scores its 43 MLP surrogates against them
(`model/test_model.py:60-394`). This test reproduces that anchor for OUR
stacked-surrogate query: per-coefficient R^2 against both ground truths,
computed on each anchor's own grid (the C file carries a different sweep in
its input rows — see tools/gen_matlab_anchor.py, which decoded both CSVs
into the committed fixture tests/golden/f16_matlab_anchor.npz).

Gates: every coefficient R^2 >= 0.96 against BOTH anchors, median >= 0.99
(the reference's surrogate training pipeline gates per-net test R^2 > 0.97
vs its interpolated tables, `example/train_model/train_model.py:163`;
the committed per-net scores live in model/model_name.csv).
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from neuralplane_tpu.ops.aero import IDX, aero_coeffs, load_aero_weights

FIXTURE = os.path.join(os.path.dirname(__file__), "golden",
                       "f16_matlab_anchor.npz")


def _r2(truth: np.ndarray, pred: np.ndarray) -> float:
    ss = float(((truth - pred) ** 2).sum())
    tv = float(((truth - truth.mean()) ** 2).sum())
    return 1.0 - ss / tv


@pytest.fixture(scope="module")
def anchor():
    z = np.load(FIXTURE)
    w = load_aero_weights()
    pred_m = np.asarray(aero_coeffs(w, jnp.asarray(z["alpha"]),
                                    jnp.asarray(z["beta"]),
                                    jnp.asarray(z["dele"])))
    pred_c = np.asarray(aero_coeffs(w, jnp.asarray(z["alpha_c"]),
                                    jnp.asarray(z["beta_c"]),
                                    jnp.asarray(z["dele_c"])))
    return z, pred_m, pred_c


def test_all_coefficients_match_matlab_and_c(anchor):
    z, pred_m, pred_c = anchor
    r2_m, r2_c = {}, {}
    for i, name in enumerate(z["names"]):
        name = str(name)
        v = int(z["valid"][i])          # lef rows: alpha-table range limit
        k = IDX[name]
        r2_m[name] = _r2(z["matlab"][i, :v], pred_m[:v, k])
        r2_c[name] = _r2(z["c"][i], pred_c[:, k])

    for name in r2_m:
        assert r2_m[name] >= 0.96, f"{name} vs MATLAB: R2={r2_m[name]:.4f}"
        assert r2_c[name] >= 0.96, f"{name} vs C: R2={r2_c[name]:.4f}"
    assert float(np.median(list(r2_m.values()))) >= 0.99
    assert float(np.median(list(r2_c.values()))) >= 0.99


def test_anchor_grids_are_consistent(anchor):
    """Where both ground truths evaluated comparable sweeps, they agree with
    each other — sanity that the fixture decoding (incl. the C file's
    interleaved aileron block) is right, not just that our nets are close."""
    z, _, _ = anchor
    # MATLAB grid restricted to the C sweep's alpha range, per-coefficient
    # cross-anchor R^2 via our prediction as the common probe is already
    # covered above; here check the direct overlap: both contain the exact
    # point (alpha=-16.3, beta=-28.6, dele=-19.3) as column 0
    assert z["alpha"][0] == z["alpha_c"][0] == -16.3
    assert z["beta"][0] == z["beta_c"][0] == -28.6
    assert z["dele"][0] == z["dele_c"][0] == -19.3
    for i, name in enumerate(z["names"]):
        # column 0 of both anchors is the same physical point
        assert abs(z["matlab"][i, 0] - z["c"][i, 0]) < 0.05, str(name)

"""Fused Pallas aero kernel: interpret-mode correctness on CPU.

The real-device path is exercised by bench.py / the TPU verify drives; here
the kernel's math (group packing, block-diagonal matmuls, in-kernel
transpose, padding) runs under the Pallas interpreter and must match the
stacked XLA path within bf16-multiplicand tolerance.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from neuralplane_tpu.ops.aero import aero_coeffs, load_aero_weights


@pytest.fixture()
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        lambda *a, **k: orig(*a, **{**k, "interpret": True}))


def test_kernel_matches_stacked(interpret_pallas):
    from neuralplane_tpu.ops.aero_pallas import (aero_coeffs_pallas_t,
                                                 pack_grouped)
    w = load_aero_weights()
    gw = pack_grouped(w)
    rng = np.random.default_rng(0)
    n = 700  # deliberately not a tile multiple: exercises padding
    alpha = jnp.asarray(rng.uniform(-15, 40, n), jnp.float32)
    beta = jnp.asarray(rng.uniform(-25, 25, n), jnp.float32)
    el = jnp.asarray(rng.uniform(-20, 20, n), jnp.float32)

    ref = np.asarray(aero_coeffs(w, alpha, beta, el))
    out = np.asarray(aero_coeffs_pallas_t(gw, alpha, beta, el, tile=256))
    assert out.shape == (43, n)
    # bf16 multiplicands vs f32(highest, CPU): per-coefficient scaled error
    scale = np.abs(ref).mean(0) + 1e-6
    err = np.abs(out.T - ref) / scale
    assert err.mean() < 2e-2, err.mean()
    assert np.isfinite(out).all()


def test_fused_totals_matches_xla_buildup(interpret_pallas):
    """The in-kernel build-up must equal the stacked-query + ops/buildup.py
    XLA path (shared arithmetic, different execution placement)."""
    from neuralplane_tpu.ops.aero import IDX
    from neuralplane_tpu.ops.aero_pallas import (aero_totals_pallas_ft,
                                                 pack_grouped_t)
    from neuralplane_tpu.ops.buildup import B_SPAN, CBAR, coeff_buildup

    w = load_aero_weights()
    gw_t = pack_grouped_t(w)
    rng = np.random.default_rng(1)
    n = 300
    alpha = rng.uniform(-15, 40, n)
    beta = rng.uniform(-25, 25, n)
    el = rng.uniform(-20, 20, n)
    dlef = rng.uniform(0.0, 1.0, n)
    dail = rng.uniform(-1.0, 1.0, n)
    drud = rng.uniform(-1.0, 1.0, n)
    P, Q, R = (rng.uniform(-1, 1, n) for _ in range(3))
    vt = rng.uniform(300, 1200, n)
    feats = jnp.asarray(
        np.stack([alpha, beta, el, dlef, dail, drud, P, Q, R,
                  1.0 / (2.0 * vt)]), jnp.float32)

    got = np.asarray(aero_totals_pallas_ft(gw_t, feats, tile=128))
    assert got.shape == (6, n)

    c = np.asarray(aero_coeffs(w, jnp.asarray(alpha, jnp.float32),
                               jnp.asarray(beta, jnp.float32),
                               jnp.asarray(el, jnp.float32))).T  # [43, n]
    ref = np.stack(coeff_buildup(
        lambda nm: c[IDX[nm]], dlef=dlef, dail=dail, drud=drud,
        P=P, Q=Q, R=R, beta_deg=beta,
        half_cbar_v=CBAR / (2 * vt), half_b_v=B_SPAN / (2 * vt)))
    scale = np.abs(ref).mean(1, keepdims=True) + 1e-4
    err = np.abs(got - ref) / scale
    assert err.mean() < 2e-2, err.mean()
    assert np.isfinite(got).all()


def test_whole_nlplant_kernel_matches_xla(interpret_pallas):
    """The fused xdot kernel must reproduce the stacked-XLA nlplant within
    bf16-multiplicand tolerance across a realistic flight envelope."""
    from neuralplane_tpu.ops.aero_pallas import (nlplant_pallas_ft,
                                                 pack_grouped_t)
    from neuralplane_tpu.ops.dynamics import nlplant_f16

    w = load_aero_weights()
    gw_t = pack_grouped_t(w)
    rng = np.random.default_rng(2)
    n = 500  # not a tile multiple: exercises batch padding
    s = np.zeros((n, 12), np.float32)
    s[:, 0] = rng.uniform(-1e4, 1e4, n)          # npos
    s[:, 1] = rng.uniform(-1e4, 1e4, n)          # epos
    s[:, 2] = rng.uniform(3000, 30000, n)        # alt
    s[:, 3] = rng.uniform(-1.0, 1.0, n)          # roll
    s[:, 4] = rng.uniform(-0.8, 0.8, n)          # pitch
    s[:, 5] = rng.uniform(-3.0, 3.0, n)          # yaw
    s[:, 6] = rng.uniform(300, 1200, n)          # vt
    s[:, 7] = rng.uniform(-0.3, 0.7, n)          # alpha
    s[:, 8] = rng.uniform(-0.4, 0.4, n)          # beta
    s[:, 9:12] = rng.uniform(-1.0, 1.0, (n, 3))  # P Q R
    u = np.zeros((n, 5), np.float32)
    u[:, 0] = rng.uniform(0, 5e4, n)             # thrust
    u[:, 1:4] = rng.uniform(-20, 20, (n, 3))     # el ail rud
    s, u = jnp.asarray(s), jnp.asarray(u)

    got = np.asarray(nlplant_pallas_ft(gw_t, s, u, tile=128))
    ref = np.asarray(nlplant_f16(w, s, u))
    assert got.shape == ref.shape == (n, 12)
    # kinematic rows (0-5) are aero-free and should agree to f32 roundoff;
    # force/moment rows inherit the bf16 surrogate tolerance
    assert np.allclose(got[:, :6], ref[:, :6], rtol=1e-5, atol=1e-4)
    scale = np.abs(ref[:, 6:]).mean(0) + 1e-3
    err = np.abs(got[:, 6:] - ref[:, 6:]) / scale
    assert err.mean() < 2e-2, err.mean()
    assert np.isfinite(got).all()


def test_coefficient_major_contract(interpret_pallas):
    from neuralplane_tpu.ops.aero import aero_coeffs_t, select_aero_weights
    w = load_aero_weights()
    gw = select_aero_weights(w, backend="pallas")
    a = jnp.linspace(-10.0, 40.0, 64)
    z = jnp.zeros(64)
    ct = np.asarray(aero_coeffs_t(gw, a, z, z))
    c = np.asarray(aero_coeffs_t(w, a, z, z))  # stacked path, transposed
    assert ct.shape == c.shape == (43, 64)
    scale = np.abs(c).mean(1, keepdims=True) + 1e-6
    assert (np.abs(ct - c) / scale).mean() < 5e-2

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

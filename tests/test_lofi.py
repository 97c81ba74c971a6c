"""Lo-fi Stevens-Lewis table tests: exact parity with the reference
scalar implementation on in-domain queries (lofi_F16_AeroData.py)."""
import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from neuralplane_tpu.ops import lofi

REF_DIR = "/root/reference/envs/models/F16"
HAS_REF = os.path.isfile(os.path.join(REF_DIR, "lofi_F16_AeroData.py"))


def test_damping_shape_and_values():
    a = jnp.array([-10.0, 0.0, 20.0, 45.0])
    out = lofi.damping(a)
    assert len(out) == 9 and out[0].shape == (4,)
    # grid-node values read straight from the table
    np.testing.assert_allclose(float(out[0][0]), -0.267, rtol=1e-6)  # CXq(-10)
    np.testing.assert_allclose(float(out[3][1]), -28.9, rtol=1e-6)   # CZq(0)


def test_clcn_odd_in_beta():
    a = jnp.array([10.0, 10.0])
    b = jnp.array([15.0, -15.0])
    cl, cn = lofi.clcn(a, b)
    np.testing.assert_allclose(float(cl[0]), -float(cl[1]), rtol=1e-6)
    np.testing.assert_allclose(float(cn[0]), -float(cn[1]), rtol=1e-6)


def test_cz_corrections():
    a = jnp.array([0.0])
    base = float(lofi.cz(a, jnp.array([0.0]), jnp.array([0.0]))[0])
    np.testing.assert_allclose(base, -0.100, rtol=1e-5)  # CZ table at alpha=0
    with_el = float(lofi.cz(a, jnp.array([0.0]), jnp.array([25.0]))[0])
    np.testing.assert_allclose(with_el, base - 0.19, rtol=1e-4)


@pytest.mark.skipif(not HAS_REF, reason="reference lofi module not present")
def test_parity_with_reference():
    sys.path.insert(0, REF_DIR)
    import lofi_F16_AeroData as ref
    rng = np.random.default_rng(1)
    alphas = rng.uniform(-9.9, 44.9, 30)
    betas = rng.uniform(-29.9, 29.9, 30)
    deles = rng.uniform(-23.9, 23.9, 30)
    a, b, d = map(jnp.asarray, (alphas, betas, deles))

    damp = lofi.damping(a)
    dmc = lofi.dmomdcon(a, b)
    cl, cn = lofi.clcn(a, b)
    cx, cm = lofi.cxcm(a, d)
    czv = lofi.cz(a, b, d)
    for i in range(30):
        np.testing.assert_allclose(
            [float(damp[j][i]) for j in range(9)],
            ref.damping(float(alphas[i])), rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(
            [float(dmc[j][i]) for j in range(4)],
            ref.dmomdcon(float(alphas[i]), float(betas[i])),
            rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(
            [float(cl[i]), float(cn[i])],
            ref.clcn(float(alphas[i]), float(betas[i])), rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(
            [float(cx[i]), float(cm[i])],
            ref.cxcm(float(alphas[i]), float(deles[i])), rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(
            float(czv[i]),
            ref.cz(float(alphas[i]), float(betas[i]), float(deles[i])),
            rtol=1e-4, atol=1e-6)

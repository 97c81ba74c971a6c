"""Stacked aero-surrogate parity vs golden outputs from the reference MLPs."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralplane_tpu.ops.aero import AERO_NAMES, aero_coeffs, load_aero_weights

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "f16_golden.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


@pytest.fixture(scope="module")
def weights():
    return load_aero_weights()


def test_aero_matches_reference(golden, weights):
    x = golden["x"]
    alpha = x[:, 7] * 180.0 / np.pi
    beta = x[:, 8] * 180.0 / np.pi
    el = x[:, 13]
    got = np.asarray(aero_coeffs(weights, jnp.asarray(alpha), jnp.asarray(beta),
                                 jnp.asarray(el)))
    want = golden["coeffs"]
    # padding is algebraically exact; tolerance covers f32 reassociation from
    # folding the z-scoring into layer 1.
    for k, name in enumerate(AERO_NAMES):
        np.testing.assert_allclose(
            got[:, k], want[:, k], rtol=2e-4, atol=3e-5,
            err_msg=f"coefficient {name} mismatch")


def test_aero_jit_vmap_scales(weights):
    """Query must jit and handle a large batch without shape surprises."""
    n = 4096
    key = jax.random.PRNGKey(0)
    a, b, e = jax.random.uniform(key, (3, n), minval=-10.0, maxval=40.0)
    fn = jax.jit(lambda a, b, e: aero_coeffs(weights, a, b, e))
    out = fn(a, b, e)
    assert out.shape == (n, len(AERO_NAMES))
    assert bool(jnp.all(jnp.isfinite(out)))

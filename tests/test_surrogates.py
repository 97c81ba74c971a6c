"""Surrogate pipeline + interpolation + render tooling tests."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralplane_tpu.ops.interp import interpn, table_from_flat
from neuralplane_tpu.surrogates import load_tables, train_surrogate
from neuralplane_tpu.surrogates.train import _mlp_apply, _pad_layers

REF_DATA = "/root/reference/example/data"
HAS_REF_DATA = os.path.isdir(REF_DATA)


def test_interpn_exact_on_linear():
    """Multilinear interpolation must reproduce affine functions exactly."""
    axes = [jnp.array([0.0, 1.0, 3.0]), jnp.array([-1.0, 0.0, 2.0]),
            jnp.array([0.0, 4.0])]
    g = jnp.meshgrid(*axes, indexing="ij")
    vals = 2.0 * g[0] - 3.0 * g[1] + 0.5 * g[2] + 1.0
    pts = jnp.array([[0.5, -0.5, 2.0], [2.0, 1.0, 1.0], [3.0, 2.0, 4.0]])
    expect = 2.0 * pts[:, 0] - 3.0 * pts[:, 1] + 0.5 * pts[:, 2] + 1.0
    np.testing.assert_allclose(np.asarray(interpn(axes, vals, pts)),
                               np.asarray(expect), rtol=1e-6)


def test_interpn_clamps_out_of_domain():
    axes = [jnp.array([0.0, 1.0])]
    vals = jnp.array([1.0, 2.0])
    out = interpn(axes, vals, jnp.array([[-5.0], [10.0]]))
    np.testing.assert_allclose(np.asarray(out), [1.0, 2.0])


def test_table_from_flat_fortran_order():
    """Reference flat layout: value(i,j) at i + n0*j (mexndinterp:38-48)."""
    axes = [np.arange(2.0), np.arange(3.0)]
    flat = np.arange(6.0)  # (i, j): 0->(0,0) 1->(1,0) 2->(0,1) ...
    table = table_from_flat(flat, axes)
    assert table.shape == (2, 3)
    assert table[1, 0] == 1.0 and table[0, 1] == 2.0


@pytest.mark.skipif(not HAS_REF_DATA, reason="NASA tables not present")
def test_load_tables_shapes():
    tabs = load_tables(REF_DATA, ["Cx", "Cy", "Cxq"])
    assert tabs["Cx"].values.shape == (20, 19, 5)   # ALPHA1 x BETA1 x DH1
    assert tabs["Cy"].values.shape == (20, 19)
    assert tabs["Cxq"].values.shape == (20,)
    # interpolation at a grid node returns the node value
    t = tabs["Cxq"]
    out = t(np.array([[t.axes[0][3]]]))
    np.testing.assert_allclose(out[0], t.values[3], rtol=1e-6)


@pytest.mark.skipif(not HAS_REF_DATA, reason="NASA tables not present")
def test_train_and_pad_roundtrip():
    """Quick-train one surrogate, then verify the stacked padding is EXACT:
    padded [3->20->20->10->1] forward == raw net forward on z-scored input."""
    tabs = load_tables(REF_DATA, ["Cxq"])
    r = train_surrogate(tabs["Cxq"], jax.random.PRNGKey(0), epochs=60,
                        subdivide=2)
    assert np.isfinite(r["test_r2"])

    W1, B1, W2, B2, W3, B3, W4, B4 = _pad_layers(r)
    alpha = np.array([-15.0, 0.0, 37.5], np.float64)
    raw_in = np.stack([alpha, np.zeros(3), np.zeros(3)], axis=1)
    h = np.maximum(raw_in @ W1 + B1, 0.0)
    h = np.maximum(h @ W2 + B2, 0.0)
    h = np.maximum(h @ W3 + B3, 0.0)
    padded_out = h @ W4 + B4

    z = (alpha[:, None] - r["x_mean"]) / r["x_std"]
    direct = np.asarray(_mlp_apply(r["params"], jnp.asarray(z, jnp.float32)))
    direct_out = direct[:, 0] * r["y_std"] + r["y_mean"]
    np.testing.assert_allclose(padded_out, direct_out, rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(not HAS_REF_DATA, reason="NASA tables not present")
def test_shipped_surrogates_match_tables():
    """Fidelity check (test_model.py analogue): the shipped stacked
    surrogates must track the NASA tables with high R^2 on random
    in-envelope queries."""
    from neuralplane_tpu.ops.aero import IDX, aero_coeffs, load_aero_weights
    w = load_aero_weights()
    tabs = load_tables(REF_DATA, ["Cx", "Cm", "Cy"])
    rng = np.random.default_rng(0)
    n = 512
    alpha = rng.uniform(-15.0, 40.0, n)
    beta = rng.uniform(-25.0, 25.0, n)
    el = rng.uniform(-20.0, 20.0, n)
    coeffs = np.asarray(aero_coeffs(w, jnp.asarray(alpha), jnp.asarray(beta),
                                    jnp.asarray(el)))
    for name, pts in (("Cx", np.stack([alpha, beta, el], 1)),
                      ("Cm", np.stack([alpha, beta, el], 1)),
                      ("Cy", np.stack([alpha, beta], 1))):
        truth = tabs[name](pts)
        pred = coeffs[:, IDX[name]]
        ss_res = np.sum((truth - pred) ** 2)
        ss_tot = np.sum((truth - truth.mean()) ** 2)
        r2 = 1 - ss_res / ss_tot
        assert r2 > 0.95, f"{name}: surrogate vs table R^2 = {r2:.4f}"


def test_acmi_and_metrics(tmp_path):
    from neuralplane_tpu.render import (ACMIWriter, TrajectoryRecorder,
                                        evaluate_metrics)
    path = str(tmp_path / "rec.txt.acmi")
    w = ACMIWriter(path)
    states = np.array([[1000.0, 2000.0, 20000.0, 0.1, 0.05, 1.0]])
    w.write_frame(0.0, states)
    w.write_frame(0.02, states)
    lines = open(path).read().splitlines()
    assert lines[0] == "FileType=text/acmi/tacview"
    assert "#0.00" in lines and "#0.02" in lines
    assert any(l.startswith("100,T=") for l in lines)

    rec = TrajectoryRecorder()
    for _ in range(5):
        rec.record(altitude=20000.0, vt=1100.0, pitch=0.0, alpha=0.1,
                   beta=0.0, G=1.0)
    m = evaluate_metrics(rec.arrays())
    assert 0 < m["SSM"] <= 1 and 0 < m["OSM"] <= 1
    assert np.isfinite(m["mean_TAS"])


def test_acmi_extra_objects(tmp_path):
    """Missile objects ride the current frame; `-id` destroys them
    (TacView object lines after a `#t` stamp belong to that frame)."""
    from neuralplane_tpu.render import ACMIWriter
    path = str(tmp_path / "rec.txt.acmi")
    w = ACMIWriter(path)
    states = np.array([[1000.0, 2000.0, 20000.0, 0.1, 0.05, 1.0]])
    w.write_frame(0.0, states)
    w.write_object(1000, np.array([500.0, 600.0, 19000.0, 0.0, 0.2, 0.9]),
                   name="AAM", color="Red")
    w.write_frame(0.1, states)
    w.remove_object(1000)
    lines = open(path).read().splitlines()
    mis = [l for l in lines if l.startswith("1000,T=")]
    assert len(mis) == 1 and "Type=Missile" in mis[0] and "Name=AAM" in mis[0]
    # the missile line belongs to frame 0.00 (after #0.00, before #0.10)
    assert lines.index(mis[0]) < lines.index("#0.10")
    assert lines.index("-1000") > lines.index("#0.10")

"""Distilled consolidated aero surrogate (surrogates/distill.py +
ops/aero_pallas.py distilled kernels): path equivalence and, when the
trained npz is present, the fidelity gate.

Parity tests use SYNTHETIC random distilled weights - the kernel, the XLA
quantized eval, and the fused step must agree regardless of what the net
was trained on; fidelity of the shipped npz is a separate (skippable-if-
absent) gate test.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from neuralplane_tpu.ops.aero_pallas import (OUT, DistilledAeroWeightsT,
                                             nlplant_pallas_distilled)
from neuralplane_tpu.surrogates import distill

NPZ = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "neuralplane_tpu", "data", "f16_aero_distilled.npz")


@pytest.fixture()
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        lambda *a, **k: orig(*a, **{**k, "interpret": True}))


def _random_weights(key, hidden=64):
    ks = jax.random.split(key, 6)
    F = distill.N_FEAT
    bf = jnp.bfloat16
    r = lambda k, sh, s: (jax.random.normal(k, sh) * s).astype(jnp.float32)
    return DistilledAeroWeightsT(
        W1=r(ks[0], (hidden, F), 0.5).astype(bf), b1=r(ks[1], (hidden,), 0.1),
        W2=r(ks[2], (hidden, hidden), 0.15).astype(bf),
        b2=r(ks[3], (hidden,), 0.1),
        W3=r(ks[4], (OUT, hidden + F), 0.1).astype(bf),
        b3=r(ks[5], (OUT,), 0.05),
        out_mean=jnp.zeros(OUT).at[:5].set(0.02),
        out_std=jnp.ones(OUT) * jnp.linspace(0.02, 2.0, OUT))


def _random_states(key, n):
    ks = jax.random.split(key, 4)
    s = jax.random.uniform(ks[0], (n, 12), minval=-1.0, maxval=1.0)
    s = s.at[:, 2].set(jax.random.uniform(ks[1], (n,), minval=5000., maxval=25000.))
    s = s.at[:, 6].set(jax.random.uniform(ks[2], (n,), minval=400., maxval=1200.))
    u = jax.random.uniform(ks[3], (n, 5), minval=-15.0, maxval=15.0)
    u = u.at[:, 0].set(4000.0)
    return s, u


def test_feature_rows_match_featurize():
    x = jnp.array([[-15.0, -20.0, -10.0], [35.0, 0.0, 0.0],
                   [80.0, 25.0, 20.0]], jnp.float32)
    want = distill.featurize(x)  # [n, F] f32
    from neuralplane_tpu.ops.aero_pallas import distilled_feature_rows
    got = distilled_feature_rows(x[:, 0], x[:, 1], x[:, 2])  # [F, n] bf16
    np.testing.assert_allclose(np.asarray(got.T, np.float32),
                               np.asarray(want.astype(jnp.bfloat16),
                                          np.float32), rtol=0, atol=0)


def test_distilled_kernel_matches_xla(interpret_pallas):
    dw = _random_weights(jax.random.PRNGKey(0))
    s, u = _random_states(jax.random.PRNGKey(1), 70)
    xd_k = nlplant_pallas_distilled(dw, s, u, tile=32)

    # XLA twin: quantized_coeffs + nlplant_core (same arithmetic)
    from neuralplane_tpu.ops.aero import IDX, K
    from neuralplane_tpu.ops.dynamics import nlplant_core
    p = distill.DistilledParams(
        W1=dw.W1.astype(jnp.float32), b1=dw.b1,
        W2=dw.W2.astype(jnp.float32), b2=dw.b2,
        W3=dw.W3[:K].astype(jnp.float32), b3=dw.b3[:K])
    R2D = 180.0 / np.pi
    c = distill.quantized_coeffs(p, np.asarray(dw.out_mean[:K]),
                                 np.asarray(dw.out_std[:K]),
                                 s[:, 7] * R2D, s[:, 8] * R2D, u[:, 1])
    xd_x = np.stack(nlplant_core(tuple(s[:, i] for i in range(12)),
                                 tuple(u[:, i] for i in range(5)),
                                 lambda nm: c[IDX[nm]]), axis=1)
    np.testing.assert_allclose(np.asarray(xd_k), xd_x, rtol=2e-5, atol=2e-5)


def test_fused_step_distilled_matches_portable(interpret_pallas, monkeypatch):
    """Whole fused step with distilled weights == portable step computing
    dynamics through the same distilled weights (XLA dispatch)."""
    from neuralplane_tpu.envs import ControlEnv

    n = 40
    env = ControlEnv(num_envs=n, config="heading", model="F16",
                     aero_backend="stacked")
    dw = _random_weights(jax.random.PRNGKey(7), hidden=64)
    # swap in distilled weights post-construction on both paths
    env.model.weights = dw
    env._task_kernel = True
    import dataclasses
    env.config = dataclasses.replace(env.config, kernel_obs_noise=False, kernel_reset_draws=False)
    env_ref = ControlEnv(num_envs=n, config="heading", model="F16",
                         aero_backend="stacked")
    env_ref.model.weights = dw
    env_ref._task_kernel = False

    from neuralplane_tpu.models.f16 import from_fm

    state, _ = env.reset(jax.random.PRNGKey(0))
    for i in range(3):
        a = jax.random.uniform(jax.random.PRNGKey(20 + i), (n, 4),
                               minval=-1.0, maxval=1.0)
        # portable path wants the agent-major F16State (FM carries no
        # recent_*); copy leaves so donation of `state` can't alias it
        ref_state = jax.tree.map(
            jnp.array, state.replace(model=from_fm(state.model)))
        state, out = env._step_fused(state, a)
        ref_state, out_ref = env_ref.step(ref_state, a)
        np.testing.assert_allclose(np.asarray(out.obs),
                                   np.asarray(out_ref.obs),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_array_equal(np.asarray(out.done),
                                      np.asarray(out_ref.done))
        np.testing.assert_array_equal(np.asarray(out.bad_done),
                                      np.asarray(out_ref.bad_done))
        np.testing.assert_allclose(np.asarray(state.model.s),
                                   np.asarray(ref_state.model.s),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(not os.path.exists(NPZ),
                    reason="distilled npz not trained yet")
def test_shipped_npz_fidelity_gate():
    """The committed distilled net must hold the xdot-level gate vs the
    43-net ensemble (recomputed live, not just the stored metric)."""
    from neuralplane_tpu.ops.aero import K, load_aero_weights
    from neuralplane_tpu.ops.aero_pallas import load_distilled_t

    with np.load(NPZ) as z:
        assert z["xdot_r2"].min() >= 0.999
    dw = load_distilled_t()
    p = distill.DistilledParams(
        W1=dw.W1.astype(jnp.float32), b1=dw.b1,
        W2=dw.W2.astype(jnp.float32), b2=dw.b2,
        W3=dw.W3[:K].astype(jnp.float32), b3=dw.b3[:K])
    fid = distill.xdot_fidelity(load_aero_weights(), p,
                                np.asarray(dw.out_mean[:K]),
                                np.asarray(dw.out_std[:K]), n=2048)
    assert fid["xdot_r2_min"] >= 0.998  # small sample; npz stores the 8192-pt run

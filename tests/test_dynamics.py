"""nlplant + integrator parity vs reference-generated goldens."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralplane_tpu.ops.aero import load_aero_weights
from neuralplane_tpu.ops.dynamics import nlplant_f16, nlplant_uav
from neuralplane_tpu.ops.integrators import integrate

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "f16_golden.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


@pytest.fixture(scope="module")
def weights():
    return load_aero_weights()


def _split(x):
    return jnp.asarray(x[:, :12]), jnp.asarray(x[:, 12:])


def test_nlplant_matches_reference(golden, weights):
    s, u = _split(golden["x"])
    got = np.asarray(nlplant_f16(weights, s, u))
    want = golden["xdot"][:, :12]
    # absolute scale of xdot components spans ~1e-3 .. ~1e3; mixed tolerance.
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_nlplant_trim_point(golden, weights):
    s, u = _split(golden["trim_x"][None, :])
    got = np.asarray(nlplant_f16(weights, s, u))[0]
    want = golden["trim_xdot"][0, :12]
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_euler_trajectory_matches_reference(golden, weights):
    s = jnp.asarray(golden["traj_s0"])
    u = jnp.asarray(golden["traj_u"])
    f = lambda s_, u_: nlplant_f16(weights, s_, u_)
    step = jax.jit(lambda s_: integrate(f, s_, u, 0.02, "euler"))
    for t in range(10):
        s = step(s)
        np.testing.assert_allclose(
            np.asarray(s), golden["traj"][t + 1], rtol=3e-3, atol=3e-3,
            err_msg=f"trajectory diverged at step {t + 1}")


def test_rk4_close_to_euler_small_dt(weights):
    s = jnp.asarray(np.tile([0, 0, 20000, 0, 0, 0, 1100, 0.05, 0, 0, 0, 0],
                            (3, 1)).astype(np.float32))
    u = jnp.asarray(np.tile([2000, 0, 0, 0, 0], (3, 1)).astype(np.float32))
    f = lambda s_, u_: nlplant_f16(weights, s_, u_)
    se = integrate(f, s, u, 0.02, "euler")
    sr = integrate(f, s, u, 0.02, "rk4")
    np.testing.assert_allclose(np.asarray(se), np.asarray(sr), rtol=1e-2, atol=0.5)


def test_uav_nlplant_level_flight():
    s = jnp.zeros((2, 12)).at[:, 2].set(600.0).at[:, 6].set(100.0)
    u = jnp.zeros((2, 3))
    xdot = np.asarray(nlplant_uav(s, u))
    # level flight, no forces: gravity pulls w_dot = +g (body z down), npos_dot = U
    np.testing.assert_allclose(xdot[:, 0], 100.0, rtol=1e-6)
    np.testing.assert_allclose(xdot[:, 8], 9.81, rtol=1e-6)
    assert np.allclose(xdot[:, 3:6], 0.0)

"""Cessna-172P linear-aero model: physics sanity + env integration.

The reference advertises a Cessna 172P model (`README.md:39-40`) but ships
none, so there is no golden data to diff against; these tests pin the
physics instead: force balance at the analytic trim point, static stability
signs, control-effect signs, and the full env contract.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralplane_tpu.envs import ControlEnv
from neuralplane_tpu.ops.atmosphere import atmos
from neuralplane_tpu.ops.linear_aero import C172P, nlplant_linear

ALT, VT = 5500.0, 220.0
# Trim at (ALT, VT), level flight (theta = alpha): solved by Newton in the
# dev notes; the test re-derives the pitch/force balance from the table.
TRIM_ALPHA, TRIM_DE_DEG, TRIM_T = -0.0071, -0.39, 299.5


def _state(alpha=TRIM_ALPHA, theta=None, vt=VT, n=1):
    s = np.zeros((n, 12), np.float32)
    s[:, 2] = ALT
    s[:, 6] = vt
    s[:, 7] = alpha
    s[:, 4] = alpha if theta is None else theta
    return jnp.array(s)


def _ctrl(T=TRIM_T, el=TRIM_DE_DEG, ail=0.0, rud=0.0, n=1):
    u = np.zeros((n, 5), np.float32)
    u[:, 0], u[:, 1], u[:, 2], u[:, 3] = T, el, ail, rud
    return jnp.array(u)


def test_trim_point_balances():
    """At the trim point all fast-state derivatives are ~0 and thrust
    equals drag computed from the derivative table."""
    xd = np.asarray(nlplant_linear(C172P, _state(), _ctrl()))[0]
    assert abs(xd[6]) < 0.5     # vt_dot ft/s^2
    assert abs(xd[7]) < 5e-3    # alpha_dot rad/s
    assert abs(xd[10]) < 5e-3   # Q_dot rad/s^2
    assert abs(xd[2]) < 2.0     # alt_dot ft/s (level)
    # thrust ~= drag: CD = CD0 + k CL^2 with CL = W/(qbar S)
    _, qbar, _ = atmos(jnp.array([ALT]), jnp.array([VT]))
    CL = 2300.0 / (float(qbar[0]) * C172P.const.s_area)
    D = float(qbar[0]) * C172P.const.s_area * (C172P.CD0 + C172P.k_ind * CL ** 2)
    assert abs(TRIM_T - D) / D < 0.05


def test_static_stability_signs():
    """Pitch/weathercock/dihedral stability and control-effect signs."""
    xd0 = np.asarray(nlplant_linear(C172P, _state(), _ctrl()))[0]
    # pitch-up perturbation -> restoring nose-down moment (Cma < 0)
    xd = np.asarray(nlplant_linear(C172P, _state(alpha=TRIM_ALPHA + 0.05),
                                   _ctrl()))[0]
    assert xd[10] < xd0[10] - 0.5
    # sideslip -> restoring yaw (Cnb > 0) and rolling away (Clb < 0)
    sb = _state()
    sb = sb.at[0, 8].set(0.1)
    xdb = np.asarray(nlplant_linear(C172P, sb, _ctrl()))[0]
    assert xdb[11] > 0.05       # R_dot: yaw into the wind
    assert xdb[9] < -0.05       # P_dot: dihedral roll
    # elevator up (negative) -> pitch up; more thrust -> accelerate
    xde = np.asarray(nlplant_linear(C172P, _state(),
                                    _ctrl(el=TRIM_DE_DEG - 5.0)))[0]
    assert xde[10] > xd0[10] + 0.1
    xdt = np.asarray(nlplant_linear(C172P, _state(), _ctrl(T=TRIM_T + 100)))[0]
    assert xdt[6] > xd0[6] + 1.0


def test_level_flight_holds():
    """Euler-integrating 10 s at trim keeps altitude/speed (longitudinally
    stable airframe, fixed controls)."""
    s, u = _state(n=4), _ctrl(n=4)
    step = jax.jit(lambda s: s + 0.02 * nlplant_linear(C172P, s, u))
    for _ in range(500):
        s = step(s)
    s = np.asarray(s)
    assert np.isfinite(s).all()
    np.testing.assert_allclose(s[:, 2], ALT, atol=20.0)    # alt within 20 ft
    np.testing.assert_allclose(s[:, 6], VT, atol=2.0)      # vt within 2 ft/s


@pytest.mark.parametrize("task", ["heading"])
def test_c172p_env_contract(task):
    """ControlEnv with the C172P model: full step contract, finite
    obs/reward, GA-scale reset ranges from heading_c172p.yaml."""
    env = ControlEnv(num_envs=8, config="heading_c172p", model="C172P")
    state, obs = env.reset(jax.random.PRNGKey(0))
    s = np.asarray(state.model.s)
    assert (s[:, 2] >= 5000.0).all() and (s[:, 2] <= 6000.0).all()
    assert (s[:, 6] >= 200.0).all() and (s[:, 6] <= 240.0).all()
    for i in range(5):
        a = jax.random.uniform(jax.random.PRNGKey(i), (8, env.num_actions),
                               minval=-0.3, maxval=0.3)
        state, out = env.step(state, a)
        assert np.isfinite(np.asarray(out.obs)).all()
        assert np.isfinite(np.asarray(out.reward)).all()
    assert out.obs.shape == (8, env.num_observation)

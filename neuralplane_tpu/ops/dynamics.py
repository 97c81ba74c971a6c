"""6-DOF flight dynamics as pure batched functions: xdot = f(s, u).

F-16: full wind-axis force equations + inertia-coupled moment equations with
neural aero-coefficient surrogates. Behavior parity with the reference
`envs/models/F16/F16_dynamics.py:37-227` (nlplant), re-expressed as a pure
function over (state [n,12], control [n,5]) with the 43 surrogate queries
collapsed into one stacked evaluation (ops/aero.py).

UAV: simplified point-mass rigid body with body-frame force controls; parity
with `envs/models/UAV/UAV_dynamics.py:15-84` (SI units internally).

State layout (F-16, US units):
    0 npos ft | 1 epos ft | 2 alt ft | 3 roll rad | 4 pitch rad | 5 yaw rad
    6 vt ft/s | 7 alpha rad | 8 beta rad | 9 P rad/s | 10 Q rad/s | 11 R rad/s
Control layout (F-16): 0 T lbf | 1 el deg | 2 ail deg | 3 rud deg | 4 lef deg
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .aero import AeroWeights, aero_coeffs_t, IDX
from .atmosphere import atmos
from .buildup import B_SPAN, CBAR, coeff_buildup

# F-16 mass/geometry constants (Stevens & Lewis); B_SPAN/CBAR/XCG live in
# ops/buildup.py (shared with the fused Pallas build-up).
G = 32.17          # ft/s^2
MASS = 636.94      # slugs
S_AREA = 300.0     # ft^2
HENG = 0.0
JY = 55814.0
JXZ = 982.0
JZ = 63100.0
JX = 9496.0
R2D = 180.0 / jnp.pi


class AirframeConst(NamedTuple):
    """Mass/geometry/inertia of a rigid airframe (US units: slug, ft)."""
    mass: float
    s_area: float
    b_span: float
    cbar: float
    jx: float
    jy: float
    jz: float
    jxz: float
    heng: float   # engine angular momentum (slug ft^2/s)


F16_CONST = AirframeConst(mass=MASS, s_area=S_AREA, b_span=B_SPAN, cbar=CBAR,
                          jx=JX, jy=JY, jz=JZ, jxz=JXZ, heng=HENG)


def sixdof_eom(sv, T, qbar, coeffs, const: AirframeConst = F16_CONST):
    """Navigation + wind-axis force + inertia-coupled moment equations for
    any rigid airframe, given the TOTAL body-axis aero coefficients. The
    airframe-independent back half of nlplant (`F16_dynamics.py:133-227`);
    nlplant_core feeds it the F-16 surrogate build-up, nlplant_linear
    (ops/linear_aero.py) a stability-derivative build-up.

    Args:
        sv: tuple of the 12 state vectors (layout in the module docstring).
        T: thrust vector (lbf, along body x).
        qbar: dynamic pressure vector (computed by the caller, which needs
            it for the coefficient build-up too).
        coeffs: (Cx, Cy, Cz, Cl, Cm, Cn) total body-axis coefficients.
        const: airframe mass/geometry/inertia.

    Returns:
        list of the 12 state-derivative vectors.
    """
    _, _, alt, phi, theta, psi, vt_raw, alpha_r, beta_r, P, Q, R = sv
    Cx_tot, Cy_tot, Cz_tot, Cl_tot, Cm_tot, Cn_tot = coeffs
    vt = jnp.maximum(vt_raw, 0.01)

    sa, ca = jnp.sin(alpha_r), jnp.cos(alpha_r)
    sb, cb = jnp.sin(beta_r), jnp.cos(beta_r)
    st, ct, tt = jnp.sin(theta), jnp.cos(theta), jnp.tan(theta)
    sphi, cphi = jnp.sin(phi), jnp.cos(phi)
    spsi, cpsi = jnp.sin(psi), jnp.cos(psi)

    # Navigation equations (body->NED via wind-axis velocity components).
    U = vt * ca * cb
    V = vt * sb
    W = vt * sa * cb
    npos_dot = (U * (ct * cpsi)
                + V * (sphi * cpsi * st - cphi * spsi)
                + W * (cphi * st * cpsi + sphi * spsi))
    epos_dot = (U * (ct * spsi)
                + V * (sphi * spsi * st + cphi * cpsi)
                + W * (cphi * st * spsi - sphi * cpsi))
    alt_dot = U * st - V * (sphi * ct) - W * (cphi * ct)
    phi_dot = P + tt * (Q * sphi + R * cphi)
    theta_dot = Q * cphi - R * sphi
    psi_dot = (Q * sphi + R * cphi) / ct

    # Wind-axis force equations.
    qS_m = qbar * const.s_area / const.mass
    Udot = R * V - Q * W - G * st + qS_m * Cx_tot + T / const.mass
    Vdot = P * W - R * U + G * ct * sphi + qS_m * Cy_tot
    Wdot = Q * U - P * V + G * ct * cphi + qS_m * Cz_tot
    vt_dot = (U * Udot + V * Vdot + W * Wdot) / vt
    alpha_dot = (U * Wdot - W * Udot) / (U * U + W * W)
    beta_dot = (Vdot * vt - V * vt_dot) / (vt * vt * cb)

    # Moment equations with full inertia coupling.
    jx, jy, jz, jxz, heng = const.jx, const.jy, const.jz, const.jxz, const.heng
    L_tot = Cl_tot * qbar * const.s_area * const.b_span
    M_tot = Cm_tot * qbar * const.s_area * const.cbar
    N_tot = Cn_tot * qbar * const.s_area * const.b_span
    denom = jx * jz - jxz * jxz
    P_dot = (jz * L_tot + jxz * N_tot
             - (jz * (jz - jy) + jxz * jxz) * Q * R
             + jxz * (jx - jy + jz) * P * Q + jxz * Q * heng) / denom
    Q_dot = (M_tot + (jz - jx) * P * R - jxz * (P * P - R * R) - R * heng) / jy
    R_dot = (jx * N_tot + jxz * L_tot
             + (jx * (jx - jy) + jxz * jxz) * P * Q
             - jxz * (jx - jy + jz) * Q * R + jx * Q * heng) / denom

    return [npos_dot, epos_dot, alt_dot, phi_dot, theta_dot, psi_dot,
            vt_dot, alpha_dot, beta_dot, P_dot, Q_dot, R_dot]


def nlplant_core(sv, uv, get_coeff):
    """Everything in nlplant except the surrogate matmuls, over generic
    per-feature vectors - the single source of truth shared by the XLA path
    (vectors are [n] column slices) and the fused Pallas kernel (vectors are
    [T] lane rows of the tile block, ops/aero_pallas.py).

    Args:
        sv: tuple of the 12 state vectors (layout in the module docstring).
        uv: tuple of the 5 control vectors (T, el, ail, rud, lef).
        get_coeff: name -> surrogate-output vector (AERO_NAMES entry).

    Returns:
        list of the 12 state-derivative vectors.
    """
    _, _, alt, _, _, _, vt_raw, _, beta_r, P, Q, R = sv
    T, el, ail, rud, lef = uv
    vt = jnp.maximum(vt_raw, 0.01)
    beta_deg = beta_r * R2D

    dail = ail / 21.5
    drud = rud / 30.0
    dlef = 1.0 - lef / 25.0

    _, qbar, _ = atmos(alt, vt)

    inv_2v = 1.0 / (2.0 * vt)
    coeffs = coeff_buildup(
        get_coeff, dlef=dlef, dail=dail, drud=drud, P=P, Q=Q, R=R,
        beta_deg=beta_deg, half_cbar_v=CBAR * inv_2v, half_b_v=B_SPAN * inv_2v)

    return sixdof_eom(sv, T, qbar, coeffs, F16_CONST)


def nlplant_f16(w: AeroWeights, s: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """F-16 state derivative. s: [n,12], u: [n,5] -> xdot [n,12].

    On the TPU path (w is GroupedAeroWeightsT) the WHOLE computation -
    surrogate matmuls, coefficient build-up, navigation/force/moment
    equations - runs inside one fused Pallas kernel (nlplant_pallas_ft),
    so per step XLA touches only [n,12] in / [n,12] out. Column slices of
    [n,12] arrays read at ~1/8 HBM bandwidth on TPU (the 12-dim lives in
    sublanes), so keeping the per-feature math out of XLA is worth ~4.5 ms
    at n=10^6. The portable path runs the identical arithmetic
    (nlplant_core) on XLA vectors.
    """
    if type(w).__name__ == "GroupedAeroWeightsT":
        from .aero_pallas import nlplant_pallas_ft
        return nlplant_pallas_ft(w, s, u)
    if type(w).__name__ == "DistilledAeroWeightsT":
        from .aero_pallas import nlplant_pallas_distilled
        return nlplant_pallas_distilled(w, s, u)
    alpha = s[:, 7] * R2D
    beta = s[:, 8] * R2D
    c = aero_coeffs_t(w, alpha, beta, u[:, 1])
    xd = nlplant_core(tuple(s[:, i] for i in range(12)),
                      tuple(u[:, i] for i in range(5)),
                      lambda name: c[IDX[name]])
    return jnp.stack(xd, axis=1)


# --- UAV (simplified rigid body, SI units) ---
UAV_M = 300.0
UAV_G = 9.81
UAV_IX = UAV_IY = UAV_IZ = 1.0
UAV_IXZ = 0.0
UAV_LBAR = UAV_MM = UAV_NN = 1.0


def nlplant_uav(s: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """UAV state derivative. s: [n,12] (SI: m, m/s), u: [n,3] forces (N)."""
    phi, theta, psi = s[:, 3], s[:, 4], s[:, 5]
    U, V, W = s[:, 6], s[:, 7], s[:, 8]
    P, Q, R = s[:, 9], s[:, 10], s[:, 11]
    Fx, Fy, Fz = u[:, 0], u[:, 1], u[:, 2]

    st, ct, tt = jnp.sin(theta), jnp.cos(theta), jnp.tan(theta)
    sphi, cphi = jnp.sin(phi), jnp.cos(phi)
    spsi, cpsi = jnp.sin(psi), jnp.cos(psi)

    npos_dot = (U * (ct * cpsi) + V * (sphi * st * cpsi - cphi * spsi)
                + W * (sphi * spsi + cphi * st * cpsi))
    epos_dot = (U * (ct * spsi) + V * (sphi * st * spsi + cphi * cpsi)
                + W * (-sphi * cpsi + cphi * st * spsi))
    alt_dot = U * st - V * (sphi * ct) - W * (cphi * ct)
    phi_dot = P + (R * cphi + Q * sphi) * tt
    theta_dot = Q * cphi - R * sphi
    psi_dot = (R * cphi + Q * sphi) / ct

    U_dot = V * R - W * Q - UAV_G * st + Fx / UAV_M
    V_dot = -U * R + W * P + UAV_G * ct * sphi + Fy / UAV_M
    W_dot = U * Q - V * P + UAV_G * ct * cphi + Fz / UAV_M

    b0 = UAV_LBAR - Q * R * (UAV_IZ - UAV_IY) + P * Q * UAV_IXZ
    b1 = UAV_NN - P * Q * (UAV_IY - UAV_IX) - Q * R * UAV_IXZ
    b2 = UAV_MM - P * R * (UAV_IX - UAV_IZ) - (P * P - R * R) * UAV_IXZ
    denom = UAV_IZ * UAV_IX - UAV_IXZ ** 2
    P_dot = (b0 * UAV_IZ + b1 * UAV_IXZ) / denom
    Q_dot = b2 / UAV_IY
    R_dot = (b0 * UAV_IXZ + b1 * UAV_IX) / denom

    return jnp.stack([
        npos_dot, epos_dot, alt_dot, phi_dot, theta_dot, psi_dot,
        U_dot, V_dot, W_dot, P_dot, Q_dot, R_dot,
    ], axis=1)

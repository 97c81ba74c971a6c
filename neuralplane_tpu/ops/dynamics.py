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

import jax.numpy as jnp

from .aero import AeroWeights, aero_coeffs_t, IDX
from .atmosphere import atmos

# F-16 mass/geometry constants (Stevens & Lewis).
G = 32.17          # ft/s^2
MASS = 636.94      # slugs
B_SPAN = 30.0      # ft
S_AREA = 300.0     # ft^2
CBAR = 11.32       # ft
XCGR = 0.35
XCG = 0.30
HENG = 0.0
JY = 55814.0
JXZ = 982.0
JZ = 63100.0
JX = 9496.0
R2D = 180.0 / jnp.pi


def nlplant_f16(w: AeroWeights, s: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """F-16 state derivative. s: [n,12], u: [n,5] -> xdot [n,12]."""
    alt = s[:, 2]
    phi, theta, psi = s[:, 3], s[:, 4], s[:, 5]
    vt = jnp.maximum(s[:, 6], 0.01)
    alpha_r, beta_r = s[:, 7], s[:, 8]
    P, Q, R = s[:, 9], s[:, 10], s[:, 11]
    alpha, beta = alpha_r * R2D, beta_r * R2D

    sa, ca = jnp.sin(alpha_r), jnp.cos(alpha_r)
    sb, cb = jnp.sin(beta_r), jnp.cos(beta_r)
    st, ct, tt = jnp.sin(theta), jnp.cos(theta), jnp.tan(theta)
    sphi, cphi = jnp.sin(phi), jnp.cos(phi)
    spsi, cpsi = jnp.sin(psi), jnp.cos(psi)

    T, el, ail, rud, lef = u[:, 0], u[:, 1], u[:, 2], u[:, 3], u[:, 4]
    dail = ail / 21.5
    drud = rud / 30.0
    dlef = 1.0 - lef / 25.0

    _, qbar, _ = atmos(alt, vt)

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

    # One stacked surrogate query for all 43 coefficients.
    c = aero_coeffs_t(w, alpha, beta, el)

    def g(name: str) -> jnp.ndarray:
        return c[IDX[name]]

    Cx, Cz, Cm = g("Cx"), g("Cz"), g("Cm")
    Cy, Cn, Cl = g("Cy"), g("Cn"), g("Cl")
    Cxq, Cyr, Cyp, Czq = g("Cxq"), g("Cyr"), g("Cyp"), g("Czq")
    Clr, Clp, Cmq, Cnr, Cnp = g("Clr"), g("Clp"), g("Cmq"), g("Cnr"), g("Cnp")
    dCx_lef, dCz_lef, dCm_lef = g("delta_Cx_lef"), g("delta_Cz_lef"), g("delta_Cm_lef")
    dCy_lef, dCn_lef, dCl_lef = g("delta_Cy_lef"), g("delta_Cn_lef"), g("delta_Cl_lef")
    dCxq_lef, dCyr_lef, dCyp_lef = g("delta_Cxq_lef"), g("delta_Cyr_lef"), g("delta_Cyp_lef")
    dClr_lef, dClp_lef, dCmq_lef = g("delta_Clr_lef"), g("delta_Clp_lef"), g("delta_Cmq_lef")
    dCnr_lef, dCnp_lef = g("delta_Cnr_lef"), g("delta_Cnp_lef")
    dCy_r30, dCn_r30, dCl_r30 = g("delta_Cy_r30"), g("delta_Cn_r30"), g("delta_Cl_r30")
    dCy_a20, dCy_a20_lef = g("delta_Cy_a20"), g("delta_Cy_a20_lef")
    dCn_a20, dCn_a20_lef = g("delta_Cn_a20"), g("delta_Cn_a20_lef")
    dCl_a20, dCl_a20_lef = g("delta_Cl_a20"), g("delta_Cl_a20_lef")
    dCnbeta, dClbeta, dCm = g("delta_Cnbeta"), g("delta_Clbeta"), g("delta_Cm")
    eta_el = g("eta_el")
    dCm_ds = 0.0  # deep-stall increment: zero in the reference (hifi_other_coeffs)

    # Total coefficient build-up with rate damping and lef/aileron/rudder deltas.
    half_cbar_v = CBAR / (2.0 * vt)
    half_b_v = B_SPAN / (2.0 * vt)
    dXdQ = half_cbar_v * (Cxq + dCxq_lef * dlef)
    Cx_tot = Cx + dCx_lef * dlef + dXdQ * Q
    dZdQ = half_cbar_v * (Czq + dCz_lef * dlef)
    Cz_tot = Cz + dCz_lef * dlef + dZdQ * Q
    dMdQ = half_cbar_v * (Cmq + dCmq_lef * dlef)
    Cm_tot = (Cm * eta_el + Cz_tot * (XCGR - XCG) + dCm_lef * dlef
              + dMdQ * Q + dCm + dCm_ds)
    dYdail = dCy_a20 + dCy_a20_lef * dlef
    dYdR = half_b_v * (Cyr + dCyr_lef * dlef)
    dYdP = half_b_v * (Cyp + dCyp_lef * dlef)
    Cy_tot = (Cy + dCy_lef * dlef + dYdail * dail + dCy_r30 * drud
              + dYdR * R + dYdP * P)
    dNdail = dCn_a20 + dCn_a20_lef * dlef
    dNdR = half_b_v * (Cnr + dCnr_lef * dlef)
    dNdP = half_b_v * (Cnp + dCnp_lef * dlef)
    Cn_tot = (Cn + dCn_lef * dlef - Cy_tot * (XCGR - XCG) * (CBAR / B_SPAN)
              + dNdail * dail + dCn_r30 * drud + dNdR * R + dNdP * P
              + dCnbeta * beta)
    dLdail = dCl_a20 + dCl_a20_lef * dlef
    dLdR = half_b_v * (Clr + dClr_lef * dlef)
    dLdP = half_b_v * (Clp + dClp_lef * dlef)
    Cl_tot = (Cl + dCl_lef * dlef + dLdail * dail + dCl_r30 * drud
              + dLdR * R + dLdP * P + dClbeta * beta)

    # Wind-axis force equations.
    qS_m = qbar * S_AREA / MASS
    Udot = R * V - Q * W - G * st + qS_m * Cx_tot + T / MASS
    Vdot = P * W - R * U + G * ct * sphi + qS_m * Cy_tot
    Wdot = Q * U - P * V + G * ct * cphi + qS_m * Cz_tot
    vt_dot = (U * Udot + V * Vdot + W * Wdot) / vt
    alpha_dot = (U * Wdot - W * Udot) / (U * U + W * W)
    beta_dot = (Vdot * vt - V * vt_dot) / (vt * vt * cb)

    # Moment equations with full inertia coupling.
    L_tot = Cl_tot * qbar * S_AREA * B_SPAN
    M_tot = Cm_tot * qbar * S_AREA * CBAR
    N_tot = Cn_tot * qbar * S_AREA * B_SPAN
    denom = JX * JZ - JXZ * JXZ
    P_dot = (JZ * L_tot + JXZ * N_tot
             - (JZ * (JZ - JY) + JXZ * JXZ) * Q * R
             + JXZ * (JX - JY + JZ) * P * Q + JXZ * Q * HENG) / denom
    Q_dot = (M_tot + (JZ - JX) * P * R - JXZ * (P * P - R * R) - R * HENG) / JY
    R_dot = (JX * N_tot + JXZ * L_tot
             + (JX * (JX - JY) + JXZ * JXZ) * P * Q
             - JXZ * (JX - JY + JZ) * Q * R + JX * Q * HENG) / denom

    return jnp.stack([
        npos_dot, epos_dot, alt_dot, phi_dot, theta_dot, psi_dot,
        vt_dot, alpha_dot, beta_dot, P_dot, Q_dot, R_dot,
    ], axis=1)


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

"""Standard-atmosphere model (US units: ft, ft/s, slug/ft^3, lbf/ft^2).

Behavior parity with the reference `envs/models/F16/F16_dynamics.py:22-35`
(atmos) and `envs/models/F16_model.py:156-162` (EAS2TAS).
"""
from __future__ import annotations

import jax.numpy as jnp

RHO0 = 2.377e-3          # sea-level density (slug/ft^3)
GAMMA_R = 1.4 * 1716.3   # gamma * R for air (ft.lbf/slug/R)


def atmos(alt: jnp.ndarray, vt: jnp.ndarray):
    """Mach number, dynamic pressure qbar, static pressure ps at altitude.

    Temperature lapse to the 35 kft tropopause, isothermal 390 R above.
    """
    tfac = 1.0 - 0.703e-5 * alt
    temp = jnp.where(alt >= 35000.0, 390.0, 519.0 * tfac)
    rho = RHO0 * jnp.power(tfac, 4.14)
    mach = vt / jnp.sqrt(GAMMA_R * temp)
    qbar = 0.5 * rho * vt * vt
    ps = 1715.0 * rho * temp
    ps = jnp.where(ps == 0.0, 1715.0, ps)
    return mach, qbar, ps


def eas2tas(alt: jnp.ndarray) -> jnp.ndarray:
    """EAS->TAS conversion factor sqrt(rho0/rho) from altitude (ft)."""
    tfac = 1.0 - 0.703e-5 * alt
    return jnp.sqrt(1.0 / jnp.power(tfac, 4.14))

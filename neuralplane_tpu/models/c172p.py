"""Cessna-172P vehicle model: the GA airframe the reference advertises.

The reference README claims "several classical fixed-wing aircraft dynamics
models, such as the Cessna 172P and F16" (`README.md:39-40`) but implements
only the F-16; this supplies the 172P against the same BaseModel getter
interface (`envs/models/model_base.py:25-250`). It shares the F-16 model's
state container, masked reset, actuator lag, integrator plumbing, and every
derived-quantity getter (same [n,12] wind-axis state layout + US units) —
only the dynamics function and the control scales differ, which is exactly
the "integrate your own fixed-wing model" interface the reference promises:
subclass, point `dynamics` at your airframe's xdot.

Scales: thrust action [-1,1] -> ~500 lbf (a 180 hp prop at cruise speeds);
surface throws el +/-25 deg, ail +/-20 deg, rud +/-16 deg (C172-class
values, vs the F-16's uniform 45 deg).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.linear_aero import C172P, nlplant_linear
from ..utils.config import EnvConfig
from .f16 import F16Model


class C172PModel(F16Model):
    thrust_scale = 500.0
    surface_scales = (25.0, 20.0, 16.0)

    def __init__(self, config: EnvConfig, weights=None):
        # No aero surrogates: the 172P build-up is a closed-form derivative
        # table (ops/linear_aero.py), fully fused by XLA into the step.
        super().__init__(config, weights=None)

    def dynamics(self, s: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
        return nlplant_linear(C172P, s, u)

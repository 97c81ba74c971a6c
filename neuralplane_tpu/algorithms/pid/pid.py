"""Batched PID core as a pure state-transition function.

Functional re-design of the reference `PID` (`algorithms/pid/pid.py:6-56`):
the mutable members (target/error/derivative/integrator + reset latch)
become an explicit `PIDState` pytree; `update_all` returns a new state plus
the PID output. The reference's NaN/Inf early-return (`pid.py:18-21`) is a
host-sync debugging tripwire and is intentionally not replicated - inputs
are kept finite upstream.

Anti-windup parity (`pid.py:36-41`): the integrator only accumulates when
not output-limited OR when the error drives back toward zero, then clamps
to +-Kimax.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import struct

from .config import PIDGains


@struct.dataclass
class PIDState:
    target: jnp.ndarray       # [n]
    error: jnp.ndarray        # [n]
    derivative: jnp.ndarray   # [n]
    integrator: jnp.ndarray   # [n]
    initialized: jnp.ndarray  # [] bool - reference's `reset` latch, inverted


def pid_init(n: int) -> PIDState:
    z = jnp.zeros((n,), jnp.float32)
    return PIDState(target=z, error=z, derivative=z, integrator=z,
                    initialized=jnp.zeros((), bool))


def pid_update_all(g: PIDGains, st: PIDState, target: jnp.ndarray,
                   measurement: jnp.ndarray, limit_I: jnp.ndarray
                   ) -> Tuple[PIDState, jnp.ndarray]:
    """One PID step. Returns (state, P + D + I); FF is `target * Kff`,
    read from the returned state via `pid_ff`."""
    error = target - measurement
    derivative = jnp.where(st.initialized, (error - st.error) / g.dt, 0.0)

    if g.Ki != 0.0 and g.dt > 0.0:
        # bit-parity with the reference's anti-windup (`pid.py:38`):
        # `~limit | (error*dt < 0)` == `~limit | (error < 0)`. NOTE this is
        # one-sided - at the NEGATIVE output limit a negative error still
        # winds deeper while a recovering positive error is blocked (true
        # anti-windup would compare sign(error) against the ACTIVE limit
        # direction). Preserved as-is: the shipped gains (config.py) were
        # tuned against this behavior and the combat stabilizer inherits it.
        grow = (~limit_I) | (error * g.dt < 0.0)
        integrator = st.integrator + error * g.Ki * g.dt * grow
        integrator = jnp.clip(integrator, -g.Kimax, g.Kimax)
    else:
        integrator = jnp.zeros_like(st.integrator)

    new = PIDState(target=target, error=error, derivative=derivative,
                   integrator=integrator, initialized=jnp.ones((), bool))
    out = error * g.Kp + derivative * g.Kd + integrator
    return new, out


def pid_ff(g: PIDGains, st: PIDState) -> jnp.ndarray:
    return st.target * g.Kff

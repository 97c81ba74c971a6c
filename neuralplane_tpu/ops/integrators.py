"""Fixed-step ODE integrators for batched dynamics.

Replaces the reference's torchdiffeq `odeint_adjoint` call
(`envs/models/F16_model.py:64-67`): the reference always integrates one fixed
step [0, dt] with `method='euler'` (configs) over a time-invariant f, so the
general-purpose adaptive machinery collapses to s + dt * f(s). We provide
euler (default, parity) and rk4 (higher order at 4x the dynamics cost),
both jit/scan-friendly.
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

DynamicsFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]  # (s, u) -> sdot


def euler_step(f: DynamicsFn, s: jnp.ndarray, u: jnp.ndarray, dt: float) -> jnp.ndarray:
    return s + dt * f(s, u)


def rk4_step(f: DynamicsFn, s: jnp.ndarray, u: jnp.ndarray, dt: float) -> jnp.ndarray:
    k1 = f(s, u)
    k2 = f(s + 0.5 * dt * k1, u)
    k3 = f(s + 0.5 * dt * k2, u)
    k4 = f(s + dt * k3, u)
    return s + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


_SOLVERS = {"euler": euler_step, "rk4": rk4_step}


def integrate(f: DynamicsFn, s: jnp.ndarray, u: jnp.ndarray, dt: float,
              solver: str = "euler") -> jnp.ndarray:
    """One fixed integration step of the given solver."""
    try:
        step = _SOLVERS[solver]
    except KeyError:
        raise ValueError(f"Unknown solver {solver!r}; options: {sorted(_SOLVERS)}")
    return step(f, s, u, dt)


def integrate_with_xdot(f: DynamicsFn, s: jnp.ndarray, u: jnp.ndarray,
                        dt: float, solver: str = "euler"):
    """One step, also returning the step-start derivative f(s, u).

    The derivative is a free byproduct (euler computes exactly it; rk4's k1
    is it), letting consumers that need "the xdot experienced during this
    step" (overload/accel checks) skip a second full dynamics evaluation -
    the single most expensive computation in the env step.
    """
    if solver == "euler":
        xdot = f(s, u)
        return s + dt * xdot, xdot
    if solver == "rk4":
        k1 = f(s, u)
        k2 = f(s + 0.5 * dt * k1, u)
        k3 = f(s + 0.5 * dt * k2, u)
        k4 = f(s + dt * k3, u)
        return s + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4), k1
    raise ValueError(f"Unknown solver {solver!r}; options: {sorted(_SOLVERS)}")

"""UAV point-mass vehicle model (SI internally, feet at the getter boundary).

Functional parity with the reference `envs/models/UAV_model.py:10-175`:
state holds body-frame velocities directly, controls are three body forces
scaled by 27000 N with the same first-order actuator lag; getters convert
SI -> feet so tasks see one unit convention regardless of model.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.atmosphere import atmos as _atmos, eas2tas as _eas2tas
from ..ops.dynamics import nlplant_uav
from ..ops.integrators import integrate, integrate_with_xdot
from ..utils.config import EnvConfig
from .f16 import F16State

FT = 0.3048
GRAV = 32.174
FORCE_SCALE = 27000.0


class UAVModel:
    """Same pytree state container as F16 (s[n,12], u padded to 5)."""

    num_states = 12
    num_controls = 5  # storage width; only first 3 (Fx, Fy, Fz) are live

    def __init__(self, config: EnvConfig, weights=None):
        self.config = config
        self.dt = config.dt
        self.solver = config.solver
        self.airspeed = config.airspeed

    def init_state(self, n: int) -> F16State:
        s = jnp.zeros((n, self.num_states), dtype=jnp.float32)
        u = jnp.zeros((n, self.num_controls), dtype=jnp.float32)
        return F16State(s=s, u=u, recent_s=s, recent_u=u)

    def reset(self, state: F16State, mask: jnp.ndarray, key: jax.Array) -> F16State:
        n = state.s.shape[0]
        cfg = self.config
        k_alt, k_vt = jax.random.split(key)
        s_new = jnp.zeros_like(state.s)
        s_new = s_new.at[:, 2].set(jax.random.uniform(
            k_alt, (n,), minval=cfg.min_altitude, maxval=cfg.max_altitude) * FT)
        s_new = s_new.at[:, 6].set(jax.random.uniform(
            k_vt, (n,), minval=cfg.min_vt, maxval=cfg.max_vt) * FT)
        u_new = jnp.zeros_like(state.u).at[:, 0].set(cfg.init_state.init_T)
        m = mask[:, None]
        s = jnp.where(m, s_new, state.s)
        u = jnp.where(m, u_new, state.u)
        return F16State(s=s, u=u,
                        recent_s=jnp.where(m, s, state.recent_s),
                        recent_u=jnp.where(m, u, state.recent_u))

    def update(self, state: F16State, action: jnp.ndarray) -> F16State:
        a = jnp.clip(action, -1.0, 1.0)
        u3 = 0.9 * state.u[:, :3] + 0.1 * a[:, :3] * FORCE_SCALE
        u = jnp.concatenate([u3, jnp.zeros_like(state.u[:, 3:])], axis=1)
        f = lambda s_, u_: nlplant_uav(s_, u_[:, :3])
        s = integrate(f, state.s, u, self.dt, self.solver)
        return F16State(s=s, u=u, recent_s=state.s, recent_u=state.u)

    def update_with_xdot(self, state: F16State, action: jnp.ndarray):
        a = jnp.clip(action, -1.0, 1.0)
        u3 = 0.9 * state.u[:, :3] + 0.1 * a[:, :3] * FORCE_SCALE
        u = jnp.concatenate([u3, jnp.zeros_like(state.u[:, 3:])], axis=1)
        f = lambda s_, u_: nlplant_uav(s_, u_[:, :3])
        s, xdot = integrate_with_xdot(f, state.s, u, self.dt, self.solver)
        return F16State(s=s, u=u, recent_s=state.s, recent_u=state.u), xdot

    def extended_state(self, state: F16State) -> jnp.ndarray:
        return nlplant_uav(state.s, state.u[:, :3])

    # --- getters (feet out) ---
    def get_position(self, st):
        return st.s[:, 0] / FT, st.s[:, 1] / FT, st.s[:, 2] / FT

    def get_posture(self, st):
        return st.s[:, 3], st.s[:, 4], st.s[:, 5]

    def get_vt(self, st):
        return jnp.sqrt(st.s[:, 6] ** 2 + st.s[:, 7] ** 2 + st.s[:, 8] ** 2) / FT

    def get_TAS(self, st):
        return self.get_vt(st) + self.airspeed

    def get_EAS2TAS(self, st):
        return _eas2tas(st.s[:, 2] / FT)

    def get_EAS(self, st):
        return self.get_TAS(st) / self.get_EAS2TAS(st)

    def get_AOA(self, st):
        return jnp.zeros_like(st.s[:, 0])

    def get_AOS(self, st):
        return jnp.zeros_like(st.s[:, 0])

    def get_angular_velocity(self, st):
        return st.s[:, 9], st.s[:, 10], st.s[:, 11]

    def get_thrust(self, st):
        return jnp.zeros_like(st.u[:, 0])

    def get_control_surface(self, st):
        z = jnp.zeros_like(st.u[:, 0])
        return z, z, z, z

    def get_velocity(self, st):
        return st.s[:, 6] / FT, st.s[:, 7] / FT, st.s[:, 8] / FT

    def get_ground_speed(self, st, xdot):
        return xdot[:, 0] / FT, xdot[:, 1] / FT

    def get_climb_rate(self, st, xdot):
        return xdot[:, 2] / FT

    def get_euler_angular_velocity(self, st, xdot):
        return xdot[:, 3], xdot[:, 4], xdot[:, 5]

    def get_acceleration(self, st, xdot):
        vel_u, vel_v, vel_w = self.get_velocity(st)
        u_dot, v_dot, w_dot = xdot[:, 6] / FT, xdot[:, 7] / FT, xdot[:, 8] / FT
        P, Q, R = st.s[:, 9], st.s[:, 10], st.s[:, 11]
        return (u_dot + Q * vel_w - R * vel_v,
                v_dot + R * vel_u - P * vel_w,
                w_dot + P * vel_v - Q * vel_u)

    def get_accels(self, st, xdot):
        vel_u, vel_v, vel_w = self.get_velocity(st)
        u_dot, v_dot, w_dot = xdot[:, 6] / FT, xdot[:, 7] / FT, xdot[:, 8] / FT
        P, Q, R = st.s[:, 9], st.s[:, 10], st.s[:, 11]
        phi, theta = st.s[:, 3], st.s[:, 4]
        nx = (u_dot + Q * vel_w - R * vel_v) / GRAV + jnp.sin(theta)
        ny = (v_dot + R * vel_u - P * vel_w) / GRAV - jnp.cos(theta) * jnp.sin(phi)
        nz = -(w_dot + P * vel_v - Q * vel_u) / GRAV + jnp.cos(theta) * jnp.cos(phi)
        return nx, ny, nz

    def get_G(self, st, xdot):
        nx, ny, nz = self.get_accels(st, xdot)
        return jnp.sqrt(nx * nx + ny * ny + nz * nz)

    def get_atmos(self, st):
        return _atmos(st.s[:, 2] / FT, self.get_vt(st))

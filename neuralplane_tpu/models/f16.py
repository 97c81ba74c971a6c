"""F-16 vehicle model: pure state transitions + derived-quantity getters.

Functional re-design of the reference's mutable `F16Model`
(`envs/models/F16_model.py:10-198`): state is an immutable pytree, `reset` is
a masked `where`-select, `update` applies the actuator first-order lag then a
fixed integrator step, and every derived quantity is a pure function. Getters
that need the state derivative take a precomputed `xdot` argument - the
reference recomputes `nlplant` inside each consumer (obs/accels/overload,
4x per step); here the env computes it once per step and threads it through.

Units: US (ft, ft/s, lbf, rad) throughout, matching the reference.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.aero import AeroWeights
from ..ops.atmosphere import atmos as _atmos, eas2tas as _eas2tas
from ..ops.dynamics import nlplant_f16
from ..ops.integrators import integrate, integrate_with_xdot
from ..utils.config import EnvConfig

GRAV = 32.174
# Full-throttle thrust scale: action [-1,1] -> lbf (reference F16_model.py:53).
THRUST_SCALE = 0.225 * 76300.0 / 0.3048
SURFACE_SCALE = 45.0  # deg, for el/ail/rud


@struct.dataclass
class F16State:
    s: jnp.ndarray          # [n, 12] vehicle state
    u: jnp.ndarray          # [n, 5] control (T, el, ail, rud, lef)
    recent_s: jnp.ndarray   # state before the last update (combat rollback)
    recent_u: jnp.ndarray


# Feature-major storage rows for the fused-step path: the whole-step Pallas
# kernel (ops/step_pallas.py) reads and writes [rows, n] tiles whose row
# counts are sublane-padded (12 state rows -> 16, 5 control rows -> 8).
# Keeping the env state in exactly that layout makes the kernel boundary a
# pure buffer reuse - no [16,n]->[n,12] slice+re-layout copies per step
# (~0.5 ms at n=10^6, measured from the jax.profiler trace). Row counts are
# the kernel's own, so layout changes cannot drift apart silently.
from ..ops.aero_pallas import N_XD as FM_S_ROWS  # noqa: E402
from ..ops.step_pallas import N_UO as FM_U_ROWS  # noqa: E402


@struct.dataclass
class F16StateFM:
    """F16State stored feature-major + sublane-padded ([16,n] / [8,n]).

    Drop-in for F16State everywhere the state is *read*: `s` and `u` are
    properties returning the agent-major views (free bitcasts under jit at
    kernel boundaries; cheap row-gathers elsewhere). `recent_*` is NOT
    carried: nothing on the fused control-task path consumes it, and an
    unchanged donated passthrough costs a full-buffer XLA copy per step
    (~0.2 ms at n=10^6, measured); the properties return the current state
    as a best-effort stand-in (combat/planning, the real consumers, run on
    the portable F16State path)."""
    sf: jnp.ndarray          # [16, n]; rows 0..11 = state, rest zero
    uf: jnp.ndarray          # [8, n]; rows 0..4 = control, rest zero

    @property
    def s(self) -> jnp.ndarray:
        return self.sf[:12].T

    @property
    def u(self) -> jnp.ndarray:
        return self.uf[:5].T

    @property
    def recent_s(self) -> jnp.ndarray:
        raise NotImplementedError(
            "F16StateFM does not carry recent_s (an unchanged donated "
            "passthrough costs a full copy per step); combat/planning, the "
            "rollback consumers, run on the portable F16State path")

    @property
    def recent_u(self) -> jnp.ndarray:
        raise NotImplementedError(
            "F16StateFM does not carry recent_u; see recent_s")


def to_fm(state: F16State) -> F16StateFM:
    """Convert agent-major state to the fused-path feature-major layout."""
    if isinstance(state, F16StateFM):
        return state
    pad_s = lambda a: jnp.pad(a.T, ((0, FM_S_ROWS - a.shape[1]), (0, 0)))
    pad_u = lambda a: jnp.pad(a.T, ((0, FM_U_ROWS - a.shape[1]), (0, 0)))
    return F16StateFM(sf=pad_s(state.s), uf=pad_u(state.u))


def from_fm(state: F16StateFM) -> F16State:
    """Convert the fused-path feature-major layout back to the portable
    agent-major state. `recent_*` is not carried by F16StateFM, so the
    current state stands in (the only information an FM state has)."""
    if isinstance(state, F16State):
        return state
    s, u = state.s, state.u
    return F16State(s=s, u=u, recent_s=s, recent_u=u)


class F16Model:
    """Stateless model ops; config + aero weights are trace-time constants.

    Subclass hook points for other airframes sharing the [n,12] wind-axis
    state layout (e.g. models/c172p.py): override `dynamics` plus the
    `thrust_scale`/`surface_scales` class attributes.
    """

    num_states = 12
    num_controls = 5
    thrust_scale = THRUST_SCALE
    surface_scales = (SURFACE_SCALE, SURFACE_SCALE, SURFACE_SCALE)

    def __init__(self, config: EnvConfig, weights: AeroWeights):
        self.config = config
        self.weights = weights
        self.dt = config.dt
        self.solver = config.solver
        self.airspeed = config.airspeed

    # --- lifecycle ---
    def init_state(self, n: int) -> F16State:
        s = jnp.zeros((n, self.num_states), dtype=jnp.float32)
        u = jnp.zeros((n, self.num_controls), dtype=jnp.float32)
        return F16State(s=s, u=u, recent_s=s, recent_u=u)

    def reset(self, state: F16State, mask: jnp.ndarray, key: jax.Array) -> F16State:
        """Masked re-init: alt~U(min,max), vt~U(min,max), T=init_T, rest zero.

        Parity with `F16_model.reset` (`envs/models/F16_model.py:33-45`), as a
        branch-free select so it stays inside jit.
        """
        n = state.s.shape[0]
        cfg = self.config
        k_alt, k_vt = jax.random.split(key)
        s_new = jnp.zeros_like(state.s)
        s_new = s_new.at[:, 2].set(jax.random.uniform(
            k_alt, (n,), minval=cfg.min_altitude, maxval=cfg.max_altitude))
        s_new = s_new.at[:, 6].set(jax.random.uniform(
            k_vt, (n,), minval=cfg.min_vt, maxval=cfg.max_vt))
        u_new = jnp.zeros_like(state.u).at[:, 0].set(cfg.init_state.init_T)

        m = mask[:, None]
        s = jnp.where(m, s_new, state.s)
        u = jnp.where(m, u_new, state.u)
        recent_s = jnp.where(m, s, state.recent_s)
        recent_u = jnp.where(m, u, state.recent_u)
        return F16State(s=s, u=u, recent_s=recent_s, recent_u=recent_u)

    def dynamics(self, s: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
        """xdot = f(s, u); the one airframe-specific piece (overridable)."""
        return nlplant_f16(self.weights, s, u)

    def _lagged_controls(self, state: F16State, action: jnp.ndarray
                         ) -> jnp.ndarray:
        """u <- 0.9*u + 0.1*scale(action); lef pinned to 0
        (`envs/models/F16_model.py:51-62`)."""
        a = jnp.clip(action, -1.0, 1.0)
        if a.shape[1] < 4:  # narrow action spaces (e.g. tracking's 3) -> pad
            a = jnp.concatenate(
                [a, jnp.zeros((a.shape[0], 4 - a.shape[1]), a.dtype)], axis=1)
        scale = jnp.array([self.thrust_scale, *self.surface_scales],
                          dtype=state.u.dtype)
        u4 = 0.9 * state.u[:, :4] + 0.1 * a[:, :4] * scale
        return jnp.concatenate([u4, jnp.zeros_like(state.u[:, 4:5])], axis=1)

    def update(self, state: F16State, action: jnp.ndarray) -> F16State:
        """Actuator first-order lag + one integrator step
        (`envs/models/F16_model.py:51-67`)."""
        u = self._lagged_controls(state, action)
        s = integrate(self.dynamics, state.s, u, self.dt, self.solver)
        return F16State(s=s, u=u, recent_s=state.s, recent_u=state.u)

    def update_with_xdot(self, state: F16State, action: jnp.ndarray):
        """update() that also returns the step-start derivative f(s, u) -
        the integrator computes it anyway, and consumers that accept the
        one-substep-stale value (overload/accel checks) save a second full
        dynamics evaluation per step."""
        u = self._lagged_controls(state, action)
        s, xdot = integrate_with_xdot(self.dynamics, state.s, u, self.dt,
                                      self.solver)
        return F16State(s=s, u=u, recent_s=state.s, recent_u=state.u), xdot

    def raw_control_update(self, state: F16State, u: jnp.ndarray) -> F16State:
        """Integrate with an explicitly-set control vector (PID/combat path)."""
        s = integrate(self.dynamics, state.s, u, self.dt, self.solver)
        return F16State(s=s, u=u, recent_s=state.s, recent_u=state.u)

    def extended_state(self, state: F16State) -> jnp.ndarray:
        """xdot at the current (s, u): compute ONCE per step and share."""
        return self.dynamics(state.s, state.u)

    # --- getters (pure; mirror the BaseModel interface, model_base.py:25-250) ---
    def get_position(self, st: F16State):
        return st.s[:, 0], st.s[:, 1], st.s[:, 2]

    def get_posture(self, st: F16State):
        return st.s[:, 3], st.s[:, 4], st.s[:, 5]

    def get_vt(self, st: F16State):
        return st.s[:, 6]

    def get_TAS(self, st: F16State):
        return st.s[:, 6] + self.airspeed

    def get_EAS2TAS(self, st: F16State):
        return _eas2tas(st.s[:, 2])

    def get_EAS(self, st: F16State):
        return self.get_TAS(st) / self.get_EAS2TAS(st)

    def get_AOA(self, st: F16State):
        return st.s[:, 7]

    def get_AOS(self, st: F16State):
        return st.s[:, 8]

    def get_angular_velocity(self, st: F16State):
        return st.s[:, 9], st.s[:, 10], st.s[:, 11]

    def get_thrust(self, st: F16State):
        return st.u[:, 0]

    def get_control_surface(self, st: F16State):
        return st.u[:, 1], st.u[:, 2], st.u[:, 3], st.u[:, 4]

    def get_velocity(self, st: F16State):
        """Body-frame velocity components from (vt, alpha, beta)."""
        sa, ca = jnp.sin(st.s[:, 7]), jnp.cos(st.s[:, 7])
        sb, cb = jnp.sin(st.s[:, 8]), jnp.cos(st.s[:, 8])
        vt = st.s[:, 6]
        return vt * cb * ca, vt * sb, vt * cb * sa

    def get_ground_speed(self, st: F16State, xdot: jnp.ndarray):
        return xdot[:, 0], xdot[:, 1]

    def get_climb_rate(self, st: F16State, xdot: jnp.ndarray):
        return xdot[:, 2]

    def get_euler_angular_velocity(self, st: F16State, xdot: jnp.ndarray):
        return xdot[:, 3], xdot[:, 4], xdot[:, 5]

    def _body_accel(self, st: F16State, xdot: jnp.ndarray):
        """Shared u_dot/v_dot/w_dot + velocity terms for accel getters."""
        s = st.s
        sa, ca = jnp.sin(s[:, 7]), jnp.cos(s[:, 7])
        sb, cb = jnp.sin(s[:, 8]), jnp.cos(s[:, 8])
        vt = s[:, 6]
        vel_u, vel_v, vel_w = vt * cb * ca, vt * sb, vt * cb * sa
        u_dot = cb * ca * xdot[:, 6] - vt * sb * ca * xdot[:, 8] - vt * cb * sa * xdot[:, 7]
        v_dot = sb * xdot[:, 6] + vt * cb * xdot[:, 8]
        w_dot = cb * sa * xdot[:, 6] - vt * sb * sa * xdot[:, 8] + vt * cb * ca * xdot[:, 7]
        return vel_u, vel_v, vel_w, u_dot, v_dot, w_dot

    def get_acceleration(self, st: F16State, xdot: jnp.ndarray):
        vel_u, vel_v, vel_w, u_dot, v_dot, w_dot = self._body_accel(st, xdot)
        P, Q, R = st.s[:, 9], st.s[:, 10], st.s[:, 11]
        ax = u_dot + Q * vel_w - R * vel_v
        ay = v_dot + R * vel_u - P * vel_w
        az = w_dot + P * vel_v - Q * vel_u
        return ax, ay, az

    def get_accels(self, st: F16State, xdot: jnp.ndarray):
        """Load factors at cg (g units) incl. gravity projection."""
        vel_u, vel_v, vel_w, u_dot, v_dot, w_dot = self._body_accel(st, xdot)
        P, Q, R = st.s[:, 9], st.s[:, 10], st.s[:, 11]
        phi, theta = st.s[:, 3], st.s[:, 4]
        nx = (u_dot + Q * vel_w - R * vel_v) / GRAV + jnp.sin(theta)
        ny = (v_dot + R * vel_u - P * vel_w) / GRAV - jnp.cos(theta) * jnp.sin(phi)
        nz = -(w_dot + P * vel_v - Q * vel_u) / GRAV + jnp.cos(theta) * jnp.cos(phi)
        return nx, ny, nz

    def get_G(self, st: F16State, xdot: jnp.ndarray):
        nx, ny, nz = self.get_accels(st, xdot)
        return jnp.sqrt(nx * nx + ny * ny + nz * nz)

    def get_atmos(self, st: F16State):
        return _atmos(st.s[:, 2], st.s[:, 6])

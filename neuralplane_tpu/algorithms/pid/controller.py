"""Controller facade: attitude stabilization + TECS + L1 navigation.

Pure-function re-design of the reference `Controller`
(`algorithms/pid/controller.py:14-148`): demand tensors and sub-controller
filter states live in one `ControllerState` pytree threaded through the env
step. Measurements are bundled once per step into `FlightData` (built from
the model state + the shared xdot), fixing the reference's repeated
`get_extended_state` recomputation and its broken
`stabilize(self.s, self.es, ...)` call signature
(`envs/singlecombat_env.py:251` vs `controller.py:69` - E4 bit-rot note in
SURVEY.md S2).
"""
from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ...utils.math import wrap_PI
from .attitude import (RateState, pitch_servo_out, rate_init, roll_servo_out,
                       yaw_rate_out)
from .config import ControllerConfig
from .l1 import (L1State, l1_init, l1_nav_roll, l1_update_heading_hold,
                 l1_update_level_flight, l1_update_loiter,
                 l1_update_waypoint)
from .tecs import TECSInputs, TECSState, tecs_init, tecs_update_pitch_throttle

PI = math.pi


class FlightData(NamedTuple):
    """Per-step measurement bundle consumed by all controllers."""
    roll: jnp.ndarray
    pitch: jnp.ndarray
    yaw: jnp.ndarray
    TAS: jnp.ndarray
    eas2tas: jnp.ndarray
    roll_rate: jnp.ndarray   # euler angle rates (xdot[:,3:6])
    pitch_rate: jnp.ndarray
    yaw_rate: jnp.ndarray
    climb_rate: jnp.ndarray  # xdot[:,2]
    acc_x: jnp.ndarray       # body-frame acceleration x
    position: jnp.ndarray    # [n, 2] (npos, epos)
    ground_speed: jnp.ndarray  # [n, 2] (xdot[:,0:2])


def flight_data(model, mstate, xdot: jnp.ndarray) -> FlightData:
    """Build the bundle from the model interface + the shared xdot."""
    roll, pitch, yaw = model.get_posture(mstate)
    ax, _, _ = model.get_acceleration(mstate, xdot)
    npos, epos, _ = model.get_position(mstate)
    return FlightData(
        roll=roll, pitch=pitch, yaw=yaw,
        TAS=model.get_TAS(mstate), eas2tas=model.get_EAS2TAS(mstate),
        roll_rate=xdot[:, 3], pitch_rate=xdot[:, 4], yaw_rate=xdot[:, 5],
        climb_rate=xdot[:, 2], acc_x=ax,
        position=jnp.stack([npos, epos], axis=1),
        ground_speed=xdot[:, 0:2])


@struct.dataclass
class ControllerState:
    roll_ctl: RateState
    pitch_ctl: RateState
    yaw_ctl: RateState
    tecs: TECSState
    l1: L1State
    # demands (controller.py:33-41)
    roll_dem: jnp.ndarray
    pitch_dem: jnp.ndarray
    yaw_dem: jnp.ndarray
    yaw_rate_dem: jnp.ndarray
    throttle_dem: jnp.ndarray
    # servo outputs (deg)
    ail: jnp.ndarray
    el: jnp.ndarray
    rud: jnp.ndarray


class Controller:
    """Stateless op collection; all methods are (state, data) -> state."""

    def __init__(self, config: ControllerConfig = None, dt: float = 0.02,
                 airspeed_min: float = 100.0, airspeed_max: float = 2300.0):
        self.cfg = config or ControllerConfig.make(dt, airspeed_min,
                                                   airspeed_max)

    def init_state(self, n: int) -> ControllerState:
        z = jnp.zeros((n,), jnp.float32)
        return ControllerState(
            roll_ctl=rate_init(n), pitch_ctl=rate_init(n),
            yaw_ctl=rate_init(n), tecs=tecs_init(n), l1=l1_init(n),
            roll_dem=z, pitch_dem=z, yaw_dem=z, yaw_rate_dem=z,
            throttle_dem=z, ail=z, el=z, rud=z)

    def reset(self, st: ControllerState, mask: jnp.ndarray) -> ControllerState:
        """Zero all filter/demand state for masked rows (the reference's
        'fix reset controller' TODO, controller.py:13 - done here)."""
        fresh = self.init_state(mask.shape[0])

        def sel(new, old):
            if new.ndim == 0:  # `initialized` scalars: keep running
                return old
            m = mask.reshape(mask.shape[0], *([1] * (new.ndim - 1)))
            return jnp.where(m, new, old)
        return jax.tree_util.tree_map(sel, fresh, st)

    # --- speed scaler (controller.py:43-49) ---
    def speed_scaler(self, TAS: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        scale_min = min(0.5, 1000.0 / (2 * cfg.airspeed_max))
        scale_max = max(2.0, 1000.0 / (0.7 * cfg.airspeed_min))
        return jnp.clip(1000.0 / (TAS + 1e-8), scale_min, scale_max)

    # --- attitude stabilization (controller.py:51-74) ---
    def stabilize(self, st: ControllerState, data: FlightData
                  ) -> ControllerState:
        cfg = self.cfg
        scaler = self.speed_scaler(data.TAS)
        roll_ctl, ail = roll_servo_out(
            cfg.roll, st.roll_ctl, wrap_PI(st.roll_dem - data.roll), scaler,
            data.roll_rate, data.eas2tas)
        pitch_ctl, el = pitch_servo_out(
            cfg.pitch, st.pitch_ctl, wrap_PI(st.pitch_dem - data.pitch),
            scaler, data.pitch_rate, data.roll, data.pitch, data.TAS,
            data.eas2tas)
        yaw_ctl, rud = yaw_rate_out(
            cfg.yaw, st.yaw_ctl, st.yaw_rate_dem, scaler, data.yaw_rate,
            data.eas2tas)
        return st.replace(roll_ctl=roll_ctl, pitch_ctl=pitch_ctl,
                          yaw_ctl=yaw_ctl, ail=ail, el=el, rud=rud)

    # --- TECS longitudinal demands (controller.py:77-84) ---
    def cal_pitch_throttle(self, st: ControllerState, hgt_dem: jnp.ndarray,
                           TAS_dem: jnp.ndarray, altitude: jnp.ndarray,
                           data: FlightData) -> ControllerState:
        inputs = TECSInputs(
            altitude=altitude, climb_rate=data.climb_rate, roll=data.roll,
            pitch=data.pitch, yaw=data.yaw, TAS=data.TAS,
            eas2tas=data.eas2tas, acc_x=data.acc_x)
        tecs = tecs_update_pitch_throttle(self.cfg.tecs, st.tecs, hgt_dem,
                                          TAS_dem, inputs)
        return st.replace(tecs=tecs, pitch_dem=tecs.pitch_dem,
                          throttle_dem=tecs.throttle_dem)

    # --- L1 lateral navigation (controller.py:86-138) ---
    def _apply_nav(self, st: ControllerState, l1: L1State, data: FlightData
                   ) -> ControllerState:
        roll_dem = jnp.clip(l1_nav_roll(self.cfg.l1, l1, data.pitch),
                            -self.cfg.roll_limit, self.cfg.roll_limit)
        yaw_rate_dem = (self.cfg.gravity * jnp.tan(roll_dem) / data.TAS
                        * data.eas2tas)
        return st.replace(l1=l1, roll_dem=roll_dem,
                          yaw_rate_dem=yaw_rate_dem)

    def update_waypoint(self, st: ControllerState, prev_WP, next_WP, dist_min,
                        data: FlightData) -> ControllerState:
        l1 = l1_update_waypoint(self.cfg.l1, st.l1, prev_WP, next_WP,
                                dist_min, data.position, data.ground_speed,
                                data.yaw)
        return self._apply_nav(st, l1, data)

    def update_loiter(self, st: ControllerState, center_WP, radius,
                      loiter_direction, data: FlightData) -> ControllerState:
        l1 = l1_update_loiter(self.cfg.l1, st.l1, center_WP, radius,
                              loiter_direction, data.position,
                              data.ground_speed, data.yaw)
        return self._apply_nav(st, l1, data)

    def update_heading_hold(self, st: ControllerState, navigation_heading,
                            data: FlightData) -> ControllerState:
        l1 = l1_update_heading_hold(self.cfg.l1, st.l1, navigation_heading,
                                    data.ground_speed, data.yaw)
        return self._apply_nav(st, l1, data)

    def update_level_flight(self, st: ControllerState, data: FlightData
                            ) -> ControllerState:
        l1 = l1_update_level_flight(st.l1, data.yaw)
        return self._apply_nav(st, l1, data)

    # --- normalized env action (controller.py:140-148) ---
    def get_action(self, st: ControllerState) -> jnp.ndarray:
        return jnp.stack([st.throttle_dem, -st.el / 45.0, -st.ail / 45.0,
                          -st.rud / 45.0], axis=1)

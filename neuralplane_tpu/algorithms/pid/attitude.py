"""Roll / pitch / yaw rate controllers (ArduPilot-style servo loops).

Pure-function re-design of the reference controllers
(`algorithms/pid/rollController.py:10-49`, `pitchController.py:11-94`,
`yawController.py:13-92` get_rate_out path). Shared structure: angle error ->
desired rate (tau), rate PID on scaler^2-scaled rates, feed-forward divided
by (scaler * eas2tas), output converted to degrees and clamped to +-45 with
the *unclamped* value latched for anti-windup (`rollController.py:38-41`).

All arrays are flat [n]; the `FlightData` bundle provides measurements.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
from flax import struct

from .config import RateControllerConfig
from .pid import PIDState, pid_ff, pid_init, pid_update_all

PI = math.pi


@struct.dataclass
class RateState:
    pid: PIDState
    last_out: jnp.ndarray  # [n] deg, unclamped (anti-windup latch)


def rate_init(n: int) -> RateState:
    return RateState(pid=pid_init(n), last_out=jnp.zeros((n,), jnp.float32))


def _rate_out(cfg: RateControllerConfig, st: RateState,
              desired_rate: jnp.ndarray, scaler: jnp.ndarray,
              rate_meas: jnp.ndarray, eas2tas: jnp.ndarray,
              limit_deg: float = 45.0) -> Tuple[RateState, jnp.ndarray]:
    limit_I = jnp.abs(st.last_out) >= limit_deg
    pid_st, pid_out = pid_update_all(
        cfg.gains, st.pid, desired_rate * scaler * scaler,
        rate_meas * scaler * scaler, limit_I)
    ff_out = pid_ff(cfg.gains, pid_st) / (scaler * eas2tas + 1e-8)
    out = (ff_out + pid_out) * 180.0 / PI
    new = RateState(pid=pid_st, last_out=out)
    return new, jnp.clip(out, -limit_deg, limit_deg)


def roll_servo_out(cfg: RateControllerConfig, st: RateState,
                   angle_err: jnp.ndarray, scaler: jnp.ndarray,
                   roll_rate: jnp.ndarray, eas2tas: jnp.ndarray
                   ) -> Tuple[RateState, jnp.ndarray]:
    """Aileron demand in deg (`rollController.py:43-49`)."""
    tau = max(cfg.tau, 0.05)
    desired_rate = angle_err / tau
    if cfg.rmax_pos:
        desired_rate = jnp.clip(desired_rate, -cfg.rmax_pos, cfg.rmax_pos)
    return _rate_out(cfg, st, desired_rate, scaler, roll_rate, eas2tas)


def _pitch_coordination(cfg: RateControllerConfig, roll, pitch, tas, eas2tas):
    """Turn-coordination pitch-rate offset + inverted-flight flag
    (`pitchController.py:47-69`)."""
    m_upright = jnp.abs(roll) < (PI / 2)
    m_right = roll >= (PI / 2)
    roll_eff = jnp.where(
        m_upright, jnp.clip(roll, -4 * PI / 9, 4 * PI / 9),
        jnp.where(m_right, jnp.clip(roll, 5 * PI / 9, PI),
                  jnp.clip(roll, -PI, -5 * PI / 9)))
    inverted = ~m_upright
    shallow = jnp.abs(pitch) <= (7 * PI / 18)
    rate_offset = (shallow * jnp.cos(pitch)
                   * jnp.abs(cfg.gravity / tas * jnp.tan(roll_eff)
                             * jnp.sin(roll_eff) * eas2tas) * cfg.roll_ff)
    rate_offset = jnp.where(inverted, -rate_offset, rate_offset)
    return inverted, rate_offset


def pitch_servo_out(cfg: RateControllerConfig, st: RateState,
                    angle_err: jnp.ndarray, scaler: jnp.ndarray,
                    pitch_rate: jnp.ndarray, roll: jnp.ndarray,
                    pitch: jnp.ndarray, tas: jnp.ndarray,
                    eas2tas: jnp.ndarray) -> Tuple[RateState, jnp.ndarray]:
    """Elevator demand in deg (`pitchController.py:71-94`): coordination
    offset, inverted handling, and bank-proportional demand reduction."""
    tau = max(cfg.tau, 0.05)
    desired_rate = angle_err / tau
    inverted, rate_offset = _pitch_coordination(cfg, roll, pitch, tas, eas2tas)
    rate1 = desired_rate + rate_offset
    if cfg.rmax_pos:
        rate1 = jnp.minimum(rate1, cfg.rmax_pos)
    if cfg.rmax_neg:
        rate1 = jnp.maximum(rate1, -cfg.rmax_neg)
    desired_rate = jnp.where(inverted, rate_offset - desired_rate, rate1)

    # reduce demand proportionally at high bank + moderate pitch
    roll_wrapped = jnp.abs(roll)
    roll_wrapped = jnp.where(roll_wrapped > PI / 2, PI - roll_wrapped,
                             roll_wrapped)
    engage = ((roll_wrapped > 5 * PI / 18) & (jnp.abs(pitch) < 7 * PI / 18))
    roll_prop = (roll_wrapped - 5 * PI / 18) / (4 * PI / 18) * engage
    desired_rate = desired_rate * (1.0 - roll_prop)
    return _rate_out(cfg, st, desired_rate, scaler, pitch_rate, eas2tas)


def yaw_rate_out(cfg: RateControllerConfig, st: RateState,
                 desired_rate: jnp.ndarray, scaler: jnp.ndarray,
                 yaw_rate: jnp.ndarray, eas2tas: jnp.ndarray
                 ) -> Tuple[RateState, jnp.ndarray]:
    """Rudder demand in deg (`yawController.py:71-86` get_rate_out path,
    the one the facade actually uses, `controller.py:69-74`)."""
    return _rate_out(cfg, st, desired_rate, scaler, yaw_rate, eas2tas)


@struct.dataclass
class YawDamperState:
    """Filter/integrator state of the legacy sideslip damper
    (`yawController.py:34-37`)."""
    last_out: jnp.ndarray          # [n] deg (anti-windup latch on +-45)
    last_rate_hp_out: jnp.ndarray  # [n] high-pass output memory
    last_rate_hp_in: jnp.ndarray   # [n] high-pass input memory
    integrator: jnp.ndarray        # [n]


def yaw_damper_init(n: int) -> YawDamperState:
    z = jnp.zeros((n,), jnp.float32)
    return YawDamperState(last_out=z, last_rate_hp_out=z,
                          last_rate_hp_in=z, integrator=z)


def yaw_servo_out(cfg: "YawDamperConfig", st: YawDamperState,
                  scaler: jnp.ndarray, roll: jnp.ndarray, vt: jnp.ndarray,
                  rate_z: jnp.ndarray, ay: jnp.ndarray,
                  eas2tas: jnp.ndarray) -> Tuple[YawDamperState, jnp.ndarray]:
    """Legacy ArduPilot sideslip-damper servo path
    (`yawController.py:39-68` get_servo_out).

    Yaw-rate measurement minus the turn-coordination offset
    g*sin(roll)*KFF*eas2tas/vt is high-passed (one-pole, 0.996008), fed to a
    lateral-accel + washed-rate integrator (KI, KA), and the rudder demand is
    KD*(integrator - hp_rate)*scaler^2 clamped to +-45 deg. KA/KI/KD/KFF come
    from `config/yawcontroller.yaml` (defaults KA=KI=KD=0, i.e. the damper is
    configured OFF in the reference too; it exists as the classical
    alternative to the rate loop). The KD<1e-4 early-return and the
    conditional anti-windup accumulation (+only when latched low, -only when
    latched high) are preserved; gain conditionals are Python-level because
    gains are static config floats."""
    mask = jnp.abs(roll) < (PI / 2)
    roll_eff = jnp.where(mask, jnp.clip(roll, -4 * PI / 9, 4 * PI / 9), roll)
    rate_offset = cfg.KFF * cfg.gravity * jnp.sin(roll_eff) * eas2tas / vt
    rate_hp_in = (rate_z - rate_offset) * 180.0 / PI
    rate_hp_out = (0.996008 * st.last_rate_hp_out + rate_hp_in
                   - st.last_rate_hp_in)
    integ_in = -cfg.KI * (cfg.KA * ay + rate_hp_out)
    if cfg.KD > 0:
        # anti-windup: only integrate toward recovery while output saturated
        lo = st.last_out < -45.0
        hi = st.last_out > 45.0
        step = integ_in * cfg.gains.dt
        integrator = (st.integrator
                      + jnp.maximum(step, 0.0) * lo
                      + jnp.minimum(step, 0.0) * hi
                      + step * ~(lo | hi))
    else:
        integrator = jnp.zeros_like(st.integrator)
    if cfg.KD < 1e-4:
        new = YawDamperState(last_out=st.last_out,
                             last_rate_hp_out=rate_hp_out,
                             last_rate_hp_in=rate_hp_in,
                             integrator=integrator)
        return new, jnp.zeros_like(rate_z)
    int_lim = cfg.imax * 0.01 / (cfg.KD * scaler * scaler)
    integrator = jnp.clip(integrator, -int_lim, int_lim)
    out = (cfg.KD * integrator * scaler * scaler
           + cfg.KD * (-rate_hp_out) * scaler * scaler)
    new = YawDamperState(last_out=out, last_rate_hp_out=rate_hp_out,
                         last_rate_hp_in=rate_hp_in, integrator=integrator)
    return new, jnp.clip(out, -45.0, 45.0)

"""TECS total-energy controller as a pure state-transition function.

Re-design of the reference `TECS` (`algorithms/pid/TECS.py:19-446`): the ~25
persistent filter/integrator tensors become one `TECSState` pytree and
`update_pitch_throttle` is a pure function running the same stage pipeline
(update -> update_speed -> update_speed_demand -> update_height_demand ->
update_energies -> update_pitch -> update_throttle_with_airspeed,
`TECS.py:412-446`). The first-call `reset` latch becomes jnp.where selects on
an `initialized` flag captured at entry (the reference clears it inside
update_speed_demand; stages after that don't branch on it).

Quirk preserved for trajectory parity: `update_height_demand` writes the
*previous filtered* `hgt_dem` into the rate limiter's pass-through branch
(`TECS.py:193` uses self.hgt_dem, not the local average) - ArduPilot's
original uses the local value; the reference's feedback form is replicated.

All arrays flat [n]; units ft / ft/s / rad (post the /0.3048 conversions).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
from flax import struct

from .config import TECSConfig


class TECSInputs(NamedTuple):
    """Measurements consumed per call (from model getters + shared xdot)."""
    altitude: jnp.ndarray    # [n] ft
    climb_rate: jnp.ndarray  # [n] ft/s (xdot[:,2])
    roll: jnp.ndarray
    pitch: jnp.ndarray
    yaw: jnp.ndarray
    TAS: jnp.ndarray         # [n] ft/s
    eas2tas: jnp.ndarray
    acc_x: jnp.ndarray       # [n] body-x acceleration (get_acceleration()[0])


@struct.dataclass
class TECSState:
    acc_x_lpf: jnp.ndarray
    TAS_max: jnp.ndarray
    TAS_dem_adj: jnp.ndarray
    TAS_rate_dem_lpf: jnp.ndarray
    hgt_dem: jnp.ndarray
    hgt_dem_in_prev: jnp.ndarray
    hgt_dem_rate_ltd: jnp.ndarray
    hgt_dem_lpf: jnp.ndarray
    hgt_dem_prev: jnp.ndarray
    post_TO_hgt_offset: jnp.ndarray
    max_climb_scaler: jnp.ndarray
    max_sink_scaler: jnp.ndarray
    climb_rate_limit: jnp.ndarray
    sink_rate_limit: jnp.ndarray
    pitch_dem_unc: jnp.ndarray
    integSEBdot: jnp.ndarray
    integKE: jnp.ndarray
    last_pitch_dem: jnp.ndarray
    STEdotErrLast: jnp.ndarray
    integTHR_state: jnp.ndarray
    # outputs (read by the Controller facade, controller.py:77-84)
    pitch_dem: jnp.ndarray
    throttle_dem: jnp.ndarray
    STEdot_dem: jnp.ndarray
    STEdot_est: jnp.ndarray
    SEBdot_dem: jnp.ndarray
    SEBdot_est: jnp.ndarray
    initialized: jnp.ndarray  # [] bool


def tecs_init(n: int) -> TECSState:
    z = jnp.zeros((n,), jnp.float32)
    ones = jnp.ones((n,), jnp.float32)
    return TECSState(
        acc_x_lpf=z, TAS_max=z, TAS_dem_adj=z, TAS_rate_dem_lpf=z,
        hgt_dem=z, hgt_dem_in_prev=z, hgt_dem_rate_ltd=z, hgt_dem_lpf=z,
        hgt_dem_prev=z, post_TO_hgt_offset=z,
        max_climb_scaler=ones, max_sink_scaler=ones,
        climb_rate_limit=z, sink_rate_limit=z,
        pitch_dem_unc=z, integSEBdot=z, integKE=z, last_pitch_dem=z,
        STEdotErrLast=z, integTHR_state=z,
        pitch_dem=z, throttle_dem=z, STEdot_dem=z, STEdot_est=z,
        SEBdot_dem=z, SEBdot_est=z,
        initialized=jnp.zeros((), bool))


def tecs_update_pitch_throttle(cfg: TECSConfig, st: TECSState,
                               hgt_dem_in_raw: jnp.ndarray,
                               TAS_dem: jnp.ndarray, inp: TECSInputs
                               ) -> TECSState:
    """One TECS cycle; returns the new state whose pitch_dem / throttle_dem
    fields are the demands (parity: `TECS.py:412-446`)."""
    dt, g = cfg.dt, cfg.gravity
    reset = ~st.initialized
    THR_max = max(cfg.THR_max, cfg.THR_min + 0.01)
    THR_min = cfg.THR_min
    pitch_max = max(cfg.pitch_max, cfg.pitch_min)
    pitch_min = cfg.pitch_min

    # --- input saturation gate (TECS.py:417-424) ---
    max_climb_cond = st.pitch_dem_unc > pitch_max
    max_descent_cond = st.pitch_dem_unc < pitch_min
    m1 = max_climb_cond & (hgt_dem_in_raw > st.hgt_dem_in_prev)
    m2 = max_descent_cond & (hgt_dem_in_raw < st.hgt_dem_in_prev)
    hgt_dem_in = jnp.where(m1 | m2, st.hgt_dem_in_prev, hgt_dem_in_raw)

    # --- update (TECS.py:108-126): reset inits + energies-rate bounds ---
    alt, pitch = inp.altitude, inp.pitch
    climb_rate_limit = jnp.where(
        reset, cfg.maxClimbRate * st.max_climb_scaler, st.climb_rate_limit)
    sink_rate_limit = jnp.where(
        reset, cfg.maxSinkRate * st.max_sink_scaler, st.sink_rate_limit)
    last_pitch_dem = jnp.where(reset, pitch, st.last_pitch_dem)
    hgt_dem = jnp.where(reset, alt, st.hgt_dem)
    hgt_dem_in_prev = jnp.where(reset, alt, st.hgt_dem_in_prev)
    hgt_dem_lpf = jnp.where(reset, alt, st.hgt_dem_lpf)
    hgt_dem_rate_ltd = jnp.where(reset, alt, st.hgt_dem_rate_ltd)
    hgt_dem_prev = jnp.where(reset, alt, st.hgt_dem_prev)
    height = alt
    climb_rate = inp.climb_rate
    STEdot_max = climb_rate_limit * g
    STEdot_min = -sink_rate_limit * g

    # --- update_speed (TECS.py:127-158) ---
    acc_x = inp.acc_x
    alpha = dt / (dt + cfg.timeConst)
    acc_x_lpf = jnp.where(reset, acc_x,
                          st.acc_x_lpf * (1 - alpha) + acc_x * alpha)
    TAS_max = jnp.where(reset, cfg.airspeed_max * inp.eas2tas, st.TAS_max)
    TAS_max = jnp.minimum(TAS_max, cfg.airspeed_max * inp.eas2tas)
    TAS_min = cfg.airspeed_min * inp.eas2tas
    TAS_max = jnp.maximum(TAS_max, TAS_min)
    TAS_state = inp.TAS

    # --- update_speed_demand (TECS.py:160-184) ---
    TAS_dem_adj_prev = jnp.where(reset, TAS_state, st.TAS_dem_adj)
    TAS_dem = jnp.clip(TAS_dem, TAS_min, TAS_max)
    velRateMax = STEdot_max / TAS_state
    velRateMin = STEdot_min / TAS_state
    d = TAS_dem - TAS_dem_adj_prev
    m1 = d > velRateMax * dt
    m2 = d < velRateMin * dt
    TAS_dem_adj = jnp.where(m1, TAS_dem_adj_prev + velRateMax * dt,
                            jnp.where(m2, TAS_dem_adj_prev + velRateMin * dt,
                                      TAS_dem))
    TAS_rate_dem = jnp.where(m1, velRateMax,
                             jnp.where(m2, velRateMin, d / dt))
    TAS_rate_dem_lpf = jnp.where(
        reset, TAS_rate_dem,
        st.TAS_rate_dem_lpf * (1 - alpha) + TAS_rate_dem * alpha)
    TAS_dem_adj = jnp.clip(TAS_dem_adj, TAS_min, TAS_max)

    # --- update_height_demand (TECS.py:186-212) ---
    climb_rate_limit = cfg.maxClimbRate * st.max_climb_scaler
    sink_rate_limit = cfg.maxSinkRate * st.max_sink_scaler
    hgt_dem_avg = 0.5 * (hgt_dem_in + hgt_dem_in_prev)
    hgt_dem_in_prev = hgt_dem_in
    d = hgt_dem_avg - hgt_dem_rate_ltd
    m1 = d > climb_rate_limit * dt
    m2 = d < -sink_rate_limit * dt
    # pass-through branch uses the previous filtered hgt_dem (reference quirk)
    hgt_dem_rate_ltd = jnp.where(
        m1, hgt_dem_rate_ltd + climb_rate_limit * dt,
        jnp.where(m2, hgt_dem_rate_ltd - sink_rate_limit * dt, hgt_dem))
    coef = min(dt / (dt + max(cfg.hgt_dem_tconst, dt)), 1.0)
    hgt_rate_dem = (hgt_dem_rate_ltd - hgt_dem_lpf) / cfg.hgt_dem_tconst
    hgt_dem_lpf = hgt_dem_rate_ltd * coef + (1 - coef) * hgt_dem_lpf
    post_TO_hgt_offset = st.post_TO_hgt_offset * (1 - coef)
    hgt_dem = hgt_dem_lpf + post_TO_hgt_offset
    hgt_dem_alpha = dt / max(dt + cfg.hgt_dem_tconst, dt)
    m1 = max_climb_cond & (hgt_dem > hgt_dem_prev)
    m2 = max_descent_cond & (hgt_dem < hgt_dem_prev)
    m3 = ~(m1 | m2)
    max_climb_scaler = jnp.where(m1, st.max_climb_scaler * (1 - hgt_dem_alpha),
                                 st.max_climb_scaler)
    max_climb_scaler = jnp.where(
        m3, max_climb_scaler * (1 - hgt_dem_alpha) + hgt_dem_alpha,
        max_climb_scaler)
    max_sink_scaler = jnp.where(m2, st.max_sink_scaler * (1 - hgt_dem_alpha),
                                st.max_sink_scaler)
    max_sink_scaler = jnp.where(
        m3, max_sink_scaler * (1 - hgt_dem_alpha) + hgt_dem_alpha,
        max_sink_scaler)
    hgt_dem_prev = hgt_dem

    # --- update_energies (TECS.py:214-224) ---
    SPE_dem = hgt_dem * g
    SKE_dem = 0.5 * TAS_dem_adj * TAS_dem_adj
    SKEdot_dem = TAS_state * (TAS_rate_dem - TAS_rate_dem_lpf)
    SPE_est = height * g
    SKE_est = 0.5 * TAS_state * TAS_state
    SPEdot = climb_rate * g
    SKEdot = TAS_state * (acc_x - acc_x_lpf)
    STEdot_est = SPEdot + SKEdot

    # --- update_pitch (TECS.py:354-410, active version) ---
    SKE_w = min(max(cfg.spdWeight, 0.0), 2.0)
    SPE_w = min(2.0 - SKE_w, 1.0)
    SKE_w = min(SKE_w, 1.0)
    SEB_dem = SPE_dem * SPE_w - SKE_dem * SKE_w
    SEB_est = SPE_est * SPE_w - SKE_est * SKE_w
    SEB_error = SEB_dem - SEB_est
    SPEdot_dem = (SPE_dem - SPE_est) / cfg.timeConst
    SEBdot_dem = SPEdot_dem * SPE_w - SKEdot_dem * SKE_w
    SEBdot_dem = jnp.clip(SEBdot_dem, -cfg.maxSinkRate * g,
                          cfg.maxClimbRate * g)
    SEBdot_est = SPEdot * SPE_w - SKEdot * SKE_w
    SEBdot_error = SEBdot_dem - SEBdot_est
    SEBdot_dem_total = (0.5 * SEBdot_dem * cfg.timeConst
                        + SEBdot_error * cfg.pitchDamp + 0.8 * SEB_error)
    gainInv = TAS_state * g * cfg.timeConst
    m1 = st.pitch_dem_unc > pitch_max
    m2 = st.pitch_dem_unc < pitch_min
    integSEB_delta = jnp.where(
        m1, jnp.minimum(SEB_error * cfg.integGain,
                        pitch_max - st.pitch_dem_unc),
        jnp.where(m2, jnp.minimum(SEB_error * cfg.integGain,
                                  pitch_min - st.pitch_dem_unc),
                  SEB_error * cfg.integGain))
    inhibit = (((st.pitch_dem_unc > pitch_max) & (integSEB_delta > 0))
               | ((st.pitch_dem_unc < pitch_min) & (integSEB_delta < 0)))
    coef_i = 1 - dt / (dt + cfg.timeConst)
    integSEBdot = jnp.where(inhibit, st.integSEBdot * coef_i,
                            st.integSEBdot + integSEB_delta * dt)
    integKE = jnp.where(
        inhibit, st.integKE * coef_i,
        st.integKE + (SKE_est - SKE_dem) * SKE_w * dt / cfg.timeConst)
    KE_limit = 0.25 * (pitch_max - pitch_min) * gainInv
    integKE = jnp.clip(integKE, -KE_limit, KE_limit)
    pitch_dem_unc = (SEBdot_dem_total + integSEBdot) / gainInv
    pitch_dem = jnp.clip(pitch_dem_unc, pitch_min, pitch_max)
    incr = dt * cfg.vertAccLim / TAS_state
    pitch_dem = jnp.clip(pitch_dem, last_pitch_dem - incr,
                         last_pitch_dem + incr)
    last_pitch_dem = pitch_dem

    # --- update_throttle_with_airspeed (TECS.py:226-288) ---
    SPE_err_max = jnp.maximum(0.5 * TAS_max * TAS_max - SKE_dem, 0.0)
    SPE_err_min = jnp.minimum(0.5 * TAS_min * TAS_min - SKE_dem, 0.0)
    STE_error = (jnp.clip(SPE_dem - SPE_est, SPE_err_min, SPE_err_max)
                 + SKE_dem - SKE_est)
    STEdot_dem = jnp.clip(SPEdot_dem + SKEdot_dem, STEdot_min, STEdot_max)
    STEdot_error = STEdot_dem - SPEdot - SKEdot
    filt = 2 * dt
    STEdot_error = filt * STEdot_error + (1 - filt) * st.STEdotErrLast
    STEdotErrLast = STEdot_error
    K_STE2Thr = (THR_max - THR_min) / (cfg.timeConst
                                       * (STEdot_max - STEdot_min))
    nomThr = cfg.throttle_cruise * 0.01
    roll, yaw = inp.roll, inp.yaw
    a = (jnp.cos(yaw) * jnp.sin(roll) * jnp.sin(pitch)
         - jnp.cos(roll) * jnp.sin(yaw))
    b = (jnp.cos(yaw) * jnp.cos(roll)
         + jnp.sin(yaw) * jnp.sin(roll) * jnp.sin(pitch))
    cosPhi2 = jnp.clip(a * a + b * b, 0.1, 1.0)
    STEdot_dem = STEdot_dem + cfg.rollComp * (1.0 / cosPhi2 - 1.0)
    ff_throttle = nomThr + STEdot_dem / (STEdot_max - STEdot_min) * (
        THR_max - THR_min)
    throttle_dem = (STE_error + STEdot_error * cfg.thrDamp) * K_STE2Thr \
        + ff_throttle
    THRmin0 = min(max(THR_min, 0.0), THR_max)
    maxAmp = 0.5 * (THR_max - THRmin0)
    integ_max = jnp.clip(THR_max - throttle_dem + 0.1, -maxAmp, maxAmp)
    integ_min = jnp.clip(THR_min - throttle_dem - 0.1, -maxAmp, maxAmp)
    integTHR_state = st.integTHR_state + STE_error * cfg.integGain * dt \
        * K_STE2Thr
    integTHR_state = jnp.clip(integTHR_state, integ_min, integ_max)
    throttle_dem = jnp.clip(0.5 * throttle_dem + integTHR_state,
                            THR_min, THR_max)

    return TECSState(
        acc_x_lpf=acc_x_lpf, TAS_max=TAS_max, TAS_dem_adj=TAS_dem_adj,
        TAS_rate_dem_lpf=TAS_rate_dem_lpf, hgt_dem=hgt_dem,
        hgt_dem_in_prev=hgt_dem_in_prev, hgt_dem_rate_ltd=hgt_dem_rate_ltd,
        hgt_dem_lpf=hgt_dem_lpf, hgt_dem_prev=hgt_dem_prev,
        post_TO_hgt_offset=post_TO_hgt_offset,
        max_climb_scaler=max_climb_scaler, max_sink_scaler=max_sink_scaler,
        climb_rate_limit=climb_rate_limit, sink_rate_limit=sink_rate_limit,
        pitch_dem_unc=pitch_dem_unc, integSEBdot=integSEBdot, integKE=integKE,
        last_pitch_dem=last_pitch_dem, STEdotErrLast=STEdotErrLast,
        integTHR_state=integTHR_state,
        pitch_dem=pitch_dem, throttle_dem=throttle_dem,
        STEdot_dem=STEdot_dem, STEdot_est=STEdot_est,
        SEBdot_dem=SEBdot_dem, SEBdot_est=SEBdot_est,
        initialized=jnp.ones((), bool))

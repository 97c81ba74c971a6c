"""Termination conditions as vectorized pure predicates.

Each returns (bad_done, done, exceed_time_limit) bool arrays [n]. Parity with
the reference `envs/termination_conditions/*` (X1-X9 in SURVEY.md S2), minus
the per-trigger host prints (a hidden host sync in the reference hot path);
triggered counts are surfaced through the env's on-device info counters
instead.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..utils.config import EnvConfig
from ..utils.math import wrap_PI

Bools = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]


def _none_like(x):
    z = jnp.zeros_like(x, dtype=bool)
    return z


def overload(cfg: EnvConfig, model, mstate, xdot) -> Bools:
    """|a| > acceleration_limit ft/s^2 (`overload.py:8-42`)."""
    ax, ay, az = model.get_acceleration(mstate, xdot)
    acc = jnp.sqrt(ax * ax + ay * ay + az * az)
    bad = acc > cfg.acceleration_limit
    return bad, _none_like(bad), _none_like(bad)


def low_altitude(cfg: EnvConfig, model, mstate) -> Bools:
    """alt < altitude_limit ft (`low_altitude.py:8-36`)."""
    _, _, alt = model.get_position(mstate)
    bad = alt < cfg.altitude_limit
    return bad, _none_like(bad), _none_like(bad)


def high_speed(cfg: EnvConfig, model, mstate) -> Bools:
    """TAS >= max_velocity Mach (`high_speed.py:8`)."""
    mach = model.get_TAS(mstate) * 0.3048 / 340.0
    bad = mach >= cfg.max_velocity
    return bad, _none_like(bad), _none_like(bad)


def low_speed(cfg: EnvConfig, model, mstate) -> Bools:
    """TAS <= min_velocity Mach (`low_speed.py:8`)."""
    mach = model.get_TAS(mstate) * 0.3048 / 340.0
    bad = mach <= cfg.min_velocity
    return bad, _none_like(bad), _none_like(bad)


def extreme_state(cfg: EnvConfig, model, mstate) -> Bools:
    """alpha/beta outside the envelope, degrees (`extreme_state.py:8-42`)."""
    r2d = 180.0 / jnp.pi
    alpha = model.get_AOA(mstate) * r2d
    beta = model.get_AOS(mstate) * r2d
    bad = ((alpha < cfg.min_alpha) | (alpha > cfg.max_alpha)
           | (beta < cfg.min_beta) | (beta > cfg.max_beta))
    return bad, _none_like(bad), _none_like(bad)


def timeout(cfg: EnvConfig, step_count) -> Bools:
    """step_count >= max_steps -> exceed_time_limit (`timeout.py:8-35`)."""
    exceed = step_count >= cfg.max_steps
    return _none_like(exceed), _none_like(exceed), exceed


def unreach_heading(cfg: EnvConfig, model, mstate, step_count,
                    target_altitude, target_heading, target_vt) -> Bools:
    """Heading-task goal check (`unreach_heading.py:10-61`).

    In-tolerance inside the window -> done (target resample + bonus);
    past max_check_interval and off-target -> bad_done.
    """
    _, _, heading = model.get_posture(mstate)
    _, _, altitude = model.get_position(mstate)
    vt = model.get_vt(mstate)
    over_max = step_count >= cfg.max_check_interval
    past_min = step_count >= cfg.min_check_interval
    off_hdg = jnp.abs(wrap_PI(heading - target_heading)) >= jnp.pi / 36.0
    off_alt = jnp.abs(altitude - target_altitude) >= 100.0
    off_vt = jnp.abs(vt - target_vt) >= 20.0
    off = off_hdg | off_alt | off_vt
    bad = over_max & off
    done = (~off) & (~over_max) & past_min
    return bad, done, _none_like(bad)


def unreach_posture(cfg: EnvConfig, model, mstate, step_count,
                    target_pitch, target_heading, target_vt) -> Bools:
    """Control-task goal check (`unreach_posture.py:10-63`, no min window)."""
    _, pitch, heading = model.get_posture(mstate)
    vt = model.get_vt(mstate)
    over_max = step_count >= cfg.max_check_interval
    off_hdg = jnp.abs(wrap_PI(heading - target_heading)) >= jnp.pi / 36.0
    off_pitch = jnp.abs(pitch - target_pitch) >= jnp.pi / 36.0
    off_vt = jnp.abs(vt - target_vt) >= 20.0
    off = off_hdg | off_pitch | off_vt
    bad = over_max & off
    done = (~off) & (~over_max)
    return bad, done, _none_like(bad)


def unreach_target(cfg: EnvConfig, model, mstate, step_count,
                   target_npos, target_epos, target_altitude) -> Bools:
    """Tracking-task goal check (`unreach_target.py:8-55`, no min window)."""
    npos, epos, altitude = model.get_position(mstate)
    over_max = step_count >= cfg.max_check_interval
    off = ((jnp.abs(npos - target_npos) >= 100.0)
           | (jnp.abs(epos - target_epos) >= 100.0)
           | (jnp.abs(altitude - target_altitude) >= 100.0))
    bad = over_max & off
    done = (~off) & (~over_max)
    return bad, done, _none_like(bad)


def crash(cfg: EnvConfig, ego_pos, enm_pos) -> Bools:
    """Pairwise distance < distance_limit ft -> both crash (`crash.py:7-46`)."""
    dist = jnp.linalg.norm(enm_pos - ego_pos, axis=-1)
    bad = dist < cfg.distance_limit
    return bad, _none_like(bad), _none_like(bad)


def shutdown(cfg: EnvConfig, ego_blood, enm_blood) -> Bools:
    """Blood <= 0: ego dead -> bad_done (lose); enemy dead while ego alive
    -> done (win) (`shutdown.py:36-40`)."""
    bad = ego_blood <= 0.0
    done = (enm_blood <= 0.0) & ~bad
    return bad, done, _none_like(bad)

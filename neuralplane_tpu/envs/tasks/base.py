"""Shared task machinery: the common 19-slot observation tail + spaces.

Every single-agent task observation is [3 task-specific slots] + the same
19 vehicle slots (altitude, attitude trig, EAS, alpha/beta trig, body rates,
normalized controls, EAS2TAS) - reference layouts at
`envs/tasks/heading_task.py:71-152`, `control_task.py:70-152`,
`tracking_task.py:73-155`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...utils.config import EnvConfig

FT = 0.3048
THRUST_NORM = 0.3048 / (0.225 * 76300.0)   # 1 / thrust scale


def vehicle_obs_tail(model, mstate) -> jnp.ndarray:
    """The 19 shared observation slots (indices 3..21). Returns [n, 19]."""
    _, _, altitude = model.get_position(mstate)
    roll, pitch, _ = model.get_posture(mstate)
    EAS = model.get_EAS(mstate)
    alpha = model.get_AOA(mstate)
    beta = model.get_AOS(mstate)
    P, Q, R = model.get_angular_velocity(mstate)
    T = model.get_thrust(mstate)
    el, ail, rud, lef = model.get_control_surface(mstate)
    eas2tas = model.get_EAS2TAS(mstate)
    return jnp.stack([
        altitude * FT / 5000.0,
        jnp.sin(roll), jnp.cos(roll),
        jnp.sin(pitch), jnp.cos(pitch),
        EAS * FT / 340.0,
        jnp.sin(alpha), jnp.cos(alpha),
        jnp.sin(beta), jnp.cos(beta),
        P, Q, R,
        T * THRUST_NORM,
        el / 45.0, ail / 45.0, rud / 45.0, lef / 45.0,
        eas2tas,
    ], axis=1)


def add_sensor_noise(obs: jnp.ndarray, key: jax.Array, noise_scale: float) -> jnp.ndarray:
    """Gaussian sensor noise on the whole observation (heading_task.py:152)."""
    if noise_scale == 0.0:
        return obs
    return obs + jax.random.normal(key, obs.shape, obs.dtype) * noise_scale


def control_task_termination(cfg, model, mstate, xdot, step_count,
                             unreach_name: str, unreach_cond):
    """Shared termination combinator for the three control tasks: OR the
    five safety conditions (task_base.py:75-96 composition) with the task's
    unreach condition, accumulating per-condition on-device trigger counters
    (replaces the reference's per-trigger host prints, SURVEY.md S5).
    The (name, condition) order must match ops/task_pallas.COND_NAMES -
    keeping it in ONE place is what guarantees the fused kernel's counter
    rows and the XLA path stay aligned."""
    from .. import terminations

    conds = [
        ("overload", terminations.overload(cfg, model, mstate, xdot)),
        ("low_altitude", terminations.low_altitude(cfg, model, mstate)),
        ("high_speed", terminations.high_speed(cfg, model, mstate)),
        ("low_speed", terminations.low_speed(cfg, model, mstate)),
        ("extreme_state", terminations.extreme_state(cfg, model, mstate)),
        (unreach_name, unreach_cond),
    ]
    bad = jnp.zeros_like(step_count, dtype=bool)
    done = jnp.zeros_like(bad)
    exceed = jnp.zeros_like(bad)
    info = {}
    for name, (b, d, e) in conds:
        bad, done, exceed = bad | b, done | d, exceed | e
        info[f"termination/{name}"] = (b | d | e).sum()
    return done, bad, exceed, info


class BaseTask:
    """Config container + observation/action sizes (task_base.py:8-43)."""

    def __init__(self, config: EnvConfig):
        self.config = config
        self.num_observation = config.num_observation
        self.num_actions = config.num_actions

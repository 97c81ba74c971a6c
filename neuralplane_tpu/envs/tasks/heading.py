"""Heading task: reach (target altitude, heading, speed); targets re-sampled
on goal-reach so one episode chains many goals.

Parity with `envs/tasks/heading_task.py:19-152`. The reference hardcodes
FIXED target increments (dheading = 2pi/3, dalt = 1000 ft, dvt = 0) with the
random version commented out (`:60-65`); `heading_random_increments: true`
in the scenario config enables the random variant.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ...utils.math import wrap_PI
from .. import rewards, terminations
from .base import (BaseTask, add_sensor_noise, control_task_termination,
                   vehicle_obs_tail)

FT = 0.3048


@struct.dataclass
class HeadingTaskState:
    target_altitude: jnp.ndarray  # [n] ft
    target_heading: jnp.ndarray   # [n] rad
    target_vt: jnp.ndarray        # [n] ft/s


class HeadingTask(BaseTask):
    # fused TPU task kernel (ops/task_pallas.py) variant + target row order
    kernel_variant = "heading"

    @staticmethod
    def kernel_targets(tstate: "HeadingTaskState"):
        return (tstate.target_altitude, tstate.target_heading,
                tstate.target_vt)

    @staticmethod
    def state_from_kernel_targets(t0, t1, t2) -> "HeadingTaskState":
        """Inverse of kernel_targets (kernel_reset_draws path)."""
        return HeadingTaskState(target_altitude=t0, target_heading=t1,
                                target_vt=t2)

    def init_state(self, n: int) -> HeadingTaskState:
        z = jnp.zeros(n, dtype=jnp.float32)
        return HeadingTaskState(target_altitude=z, target_heading=z, target_vt=z)

    def reset(self, model, mstate, tstate: HeadingTaskState,
              mask: jnp.ndarray, key: jax.Array) -> HeadingTaskState:
        cfg = self.config
        _, _, altitude = model.get_position(mstate)
        _, _, heading = model.get_posture(mstate)
        vt = model.get_vt(mstate)
        n = altitude.shape[0]
        if cfg.heading_random_increments:
            kh, ka, kv = jax.random.split(key, 3)
            d_hdg = (jax.random.uniform(kh, (n,)) - 0.5) * 2.0 * cfg.max_heading_increment
            d_alt = (jax.random.uniform(ka, (n,)) - 0.5) * 2.0 * cfg.max_altitude_increment
            d_vt = (jax.random.uniform(kv, (n,)) - 0.5) * 2.0 * cfg.max_velocities_u_increment
        else:
            d_hdg = 2.0 * jnp.pi / 3.0
            d_alt = 1000.0
            d_vt = 0.0
        return HeadingTaskState(
            target_altitude=jnp.where(mask, altitude + d_alt, tstate.target_altitude),
            target_heading=jnp.where(mask, wrap_PI(heading + d_hdg), tstate.target_heading),
            target_vt=jnp.where(mask, vt + d_vt, tstate.target_vt),
        )

    def reset_from_init(self, tstate: HeadingTaskState, mask: jnp.ndarray,
                        alt_init: jnp.ndarray, vt_init: jnp.ndarray,
                        key: jax.Array) -> HeadingTaskState:
        """Target resample for the fused whole-step kernel path
        (ops/step_pallas.py): reset rows always restart from the init state
        (altitude=alt_init, vt=vt_init, heading=0 - models/f16.py:reset),
        so the post-reset targets follow from the init draws alone without
        materializing the post-reset state. RNG draws match reset() exactly."""
        cfg = self.config
        n = alt_init.shape[0]
        if cfg.heading_random_increments:
            kh, ka, kv = jax.random.split(key, 3)
            d_hdg = (jax.random.uniform(kh, (n,)) - 0.5) * 2.0 * cfg.max_heading_increment
            d_alt = (jax.random.uniform(ka, (n,)) - 0.5) * 2.0 * cfg.max_altitude_increment
            d_vt = (jax.random.uniform(kv, (n,)) - 0.5) * 2.0 * cfg.max_velocities_u_increment
        else:
            d_hdg = 2.0 * jnp.pi / 3.0
            d_alt = 1000.0
            d_vt = 0.0
        return HeadingTaskState(
            target_altitude=jnp.where(mask, alt_init + d_alt,
                                      tstate.target_altitude),
            target_heading=jnp.where(mask, wrap_PI(jnp.zeros(n) + d_hdg),
                                     tstate.target_heading),
            target_vt=jnp.where(mask, vt_init + d_vt, tstate.target_vt),
        )

    def get_obs(self, model, mstate, tstate: HeadingTaskState, key: jax.Array):
        _, _, altitude = model.get_position(mstate)
        _, _, heading = model.get_posture(mstate)
        vt = model.get_vt(mstate)
        head = jnp.stack([
            (altitude - tstate.target_altitude) * FT / 1000.0,
            wrap_PI(heading - tstate.target_heading),
            (vt - tstate.target_vt) * FT / 340.0,
        ], axis=1)
        obs = jnp.concatenate([head, vehicle_obs_tail(model, mstate)], axis=1)
        return add_sensor_noise(obs, key, self.config.noise_scale)

    def get_reward(self, model, mstate, tstate: HeadingTaskState,
                   is_done, bad_done):
        return (rewards.heading_reward(model, mstate, tstate.target_altitude,
                                       tstate.target_heading, tstate.target_vt)
                + rewards.event_driven_reward(is_done, bad_done))

    def get_termination(self, model, mstate, xdot, step_count,
                        tstate: HeadingTaskState):
        """OR of [Overload, LowAltitude, HighSpeed, LowSpeed, ExtremeState,
        UnreachHeading] (heading_task.py:39-47; Timeout commented out there)."""
        cfg = self.config
        return control_task_termination(
            cfg, model, mstate, xdot, step_count, "unreach_heading",
            terminations.unreach_heading(cfg, model, mstate, step_count,
                                         tstate.target_altitude,
                                         tstate.target_heading,
                                         tstate.target_vt))

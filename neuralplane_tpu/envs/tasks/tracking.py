"""Tracking task: fly to a 3-D point sampled on a sphere sector around the
aircraft. Parity with `envs/tasks/tracking_task.py:19-155`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from .. import rewards, terminations
from .base import (BaseTask, add_sensor_noise, control_task_termination,
                   vehicle_obs_tail)

FT = 0.3048


@struct.dataclass
class TrackingTaskState:
    target_npos: jnp.ndarray      # [n] ft
    target_epos: jnp.ndarray      # [n] ft
    target_altitude: jnp.ndarray  # [n] ft


class TrackingTask(BaseTask):
    kernel_variant = "tracking"

    @staticmethod
    def kernel_targets(tstate: "TrackingTaskState"):
        return (tstate.target_npos, tstate.target_epos,
                tstate.target_altitude)

    @staticmethod
    def state_from_kernel_targets(t0, t1, t2) -> "TrackingTaskState":
        """Inverse of kernel_targets (kernel_reset_draws path)."""
        return TrackingTaskState(target_npos=t0, target_epos=t1,
                                 target_altitude=t2)

    def init_state(self, n: int) -> TrackingTaskState:
        z = jnp.zeros(n, dtype=jnp.float32)
        return TrackingTaskState(target_npos=z, target_epos=z, target_altitude=z)

    def reset(self, model, mstate, tstate: TrackingTaskState,
              mask: jnp.ndarray, key: jax.Array) -> TrackingTaskState:
        cfg = self.config
        npos, epos, altitude = model.get_position(mstate)
        n = npos.shape[0]
        kd, k1, k2 = jax.random.split(key, 3)
        distance = (jax.random.uniform(kd, (n,)) * (cfg.max_distance - cfg.min_distance)
                    + cfg.min_distance)
        theta1 = jax.random.uniform(k1, (n,)) * jnp.pi / 3.0 - jnp.pi / 6.0
        theta2 = jax.random.uniform(k2, (n,)) * jnp.pi / 3.0 - jnp.pi / 6.0
        d_n = distance * jnp.cos(theta1) * jnp.cos(theta2)
        d_e = distance * jnp.cos(theta1) * jnp.sin(theta2)
        d_a = distance * jnp.sin(theta1)
        return TrackingTaskState(
            target_npos=jnp.where(mask, npos + d_n, tstate.target_npos),
            target_epos=jnp.where(mask, epos + d_e, tstate.target_epos),
            target_altitude=jnp.where(mask, altitude + d_a, tstate.target_altitude),
        )

    def reset_from_init(self, tstate: TrackingTaskState, mask: jnp.ndarray,
                        alt_init: jnp.ndarray, vt_init: jnp.ndarray,
                        key: jax.Array) -> TrackingTaskState:
        """Fused-step-kernel resample (see HeadingTask.reset_from_init):
        reset rows restart from npos=epos=0, altitude=alt_init."""
        cfg = self.config
        n = alt_init.shape[0]
        kd, k1, k2 = jax.random.split(key, 3)
        distance = (jax.random.uniform(kd, (n,)) * (cfg.max_distance - cfg.min_distance)
                    + cfg.min_distance)
        theta1 = jax.random.uniform(k1, (n,)) * jnp.pi / 3.0 - jnp.pi / 6.0
        theta2 = jax.random.uniform(k2, (n,)) * jnp.pi / 3.0 - jnp.pi / 6.0
        d_n = distance * jnp.cos(theta1) * jnp.cos(theta2)
        d_e = distance * jnp.cos(theta1) * jnp.sin(theta2)
        d_a = distance * jnp.sin(theta1)
        return TrackingTaskState(
            target_npos=jnp.where(mask, d_n, tstate.target_npos),
            target_epos=jnp.where(mask, d_e, tstate.target_epos),
            target_altitude=jnp.where(mask, alt_init + d_a,
                                      tstate.target_altitude),
        )

    def get_obs(self, model, mstate, tstate: TrackingTaskState, key: jax.Array):
        npos, epos, altitude = model.get_position(mstate)
        head = jnp.stack([
            (npos - tstate.target_npos) * FT / 1000.0,
            (epos - tstate.target_epos) * FT / 1000.0,
            (altitude - tstate.target_altitude) * FT / 1000.0,
        ], axis=1)
        obs = jnp.concatenate([head, vehicle_obs_tail(model, mstate)], axis=1)
        return add_sensor_noise(obs, key, self.config.noise_scale)

    def get_reward(self, model, mstate, tstate: TrackingTaskState,
                   is_done, bad_done):
        return (rewards.position_reward(model, mstate, tstate.target_npos,
                                        tstate.target_epos, tstate.target_altitude)
                + rewards.event_driven_reward(is_done, bad_done))

    def get_termination(self, model, mstate, xdot, step_count,
                        tstate: TrackingTaskState):
        cfg = self.config
        return control_task_termination(
            cfg, model, mstate, xdot, step_count, "unreach_target",
            terminations.unreach_target(cfg, model, mstate, step_count,
                                        tstate.target_npos,
                                        tstate.target_epos,
                                        tstate.target_altitude))

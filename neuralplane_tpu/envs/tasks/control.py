"""Control (posture) task: reach (target pitch, heading, speed) with RANDOM
target increments. Parity with `envs/tasks/control_task.py:19-152`.
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
class ControlTaskState:
    target_pitch: jnp.ndarray    # [n] rad
    target_heading: jnp.ndarray  # [n] rad
    target_vt: jnp.ndarray       # [n] ft/s


class ControlTask(BaseTask):
    kernel_variant = "control"

    @staticmethod
    def kernel_targets(tstate: "ControlTaskState"):
        return (tstate.target_pitch, tstate.target_heading, tstate.target_vt)

    @staticmethod
    def state_from_kernel_targets(t0, t1, t2) -> "ControlTaskState":
        """Inverse of kernel_targets (kernel_reset_draws path)."""
        return ControlTaskState(target_pitch=t0, target_heading=t1,
                                target_vt=t2)

    def init_state(self, n: int) -> ControlTaskState:
        z = jnp.zeros(n, dtype=jnp.float32)
        return ControlTaskState(target_pitch=z, target_heading=z, target_vt=z)

    def reset(self, model, mstate, tstate: ControlTaskState,
              mask: jnp.ndarray, key: jax.Array) -> ControlTaskState:
        cfg = self.config
        _, pitch, heading = model.get_posture(mstate)
        vt = model.get_vt(mstate)
        n = pitch.shape[0]
        kp, kh, kv = jax.random.split(key, 3)
        d_pitch = (jax.random.uniform(kp, (n,)) - 0.5) * 2.0 * cfg.max_pitch_increment
        d_hdg = (jax.random.uniform(kh, (n,)) - 0.5) * 2.0 * cfg.max_heading_increment
        d_vt = (jax.random.uniform(kv, (n,)) - 0.5) * 2.0 * cfg.max_velocities_u_increment
        return ControlTaskState(
            target_pitch=jnp.where(mask, wrap_PI(pitch + d_pitch), tstate.target_pitch),
            target_heading=jnp.where(mask, wrap_PI(heading + d_hdg), tstate.target_heading),
            target_vt=jnp.where(mask, vt + d_vt, tstate.target_vt),
        )

    def reset_from_init(self, tstate: ControlTaskState, mask: jnp.ndarray,
                        alt_init: jnp.ndarray, vt_init: jnp.ndarray,
                        key: jax.Array) -> ControlTaskState:
        """Fused-step-kernel resample (see HeadingTask.reset_from_init):
        reset rows restart from pitch=0, heading=0, vt=vt_init."""
        cfg = self.config
        n = alt_init.shape[0]
        kp, kh, kv = jax.random.split(key, 3)
        d_pitch = (jax.random.uniform(kp, (n,)) - 0.5) * 2.0 * cfg.max_pitch_increment
        d_hdg = (jax.random.uniform(kh, (n,)) - 0.5) * 2.0 * cfg.max_heading_increment
        d_vt = (jax.random.uniform(kv, (n,)) - 0.5) * 2.0 * cfg.max_velocities_u_increment
        return ControlTaskState(
            target_pitch=jnp.where(mask, wrap_PI(d_pitch), tstate.target_pitch),
            target_heading=jnp.where(mask, wrap_PI(d_hdg), tstate.target_heading),
            target_vt=jnp.where(mask, vt_init + d_vt, tstate.target_vt),
        )

    def get_obs(self, model, mstate, tstate: ControlTaskState, key: jax.Array):
        _, pitch, heading = model.get_posture(mstate)
        vt = model.get_vt(mstate)
        head = jnp.stack([
            wrap_PI(pitch - tstate.target_pitch),
            wrap_PI(heading - tstate.target_heading),
            (vt - tstate.target_vt) * FT / 340.0,
        ], axis=1)
        obs = jnp.concatenate([head, vehicle_obs_tail(model, mstate)], axis=1)
        return add_sensor_noise(obs, key, self.config.noise_scale)

    def get_reward(self, model, mstate, tstate: ControlTaskState,
                   is_done, bad_done):
        return (rewards.posture_reward(model, mstate, tstate.target_pitch,
                                       tstate.target_heading, tstate.target_vt)
                + rewards.event_driven_reward(is_done, bad_done))

    def get_termination(self, model, mstate, xdot, step_count,
                        tstate: ControlTaskState):
        cfg = self.config
        return control_task_termination(
            cfg, model, mstate, xdot, step_count, "unreach_posture",
            terminations.unreach_posture(cfg, model, mstate, step_count,
                                         tstate.target_pitch,
                                         tstate.target_heading,
                                         tstate.target_vt))

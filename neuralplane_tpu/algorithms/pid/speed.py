"""Speed controller: throttle from longitudinal-acceleration error.

The reference `SpeedController` (`algorithms/pid/speedController.py:10-45`)
is bit-rotted - it references a `rate_pid` that is never assigned (C8 in
SURVEY.md S2) and borrows the attitude-loop servo math wholesale. This is
the intended behavior, wired correctly: a PID on demanded vs measured
longitudinal acceleration with the speedcontroller.yaml gains
(Kp 5, Ki 25, Kff 80, Kimax 100), anti-windup latched on the +-100%
throttle saturation, output in percent throttle.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import struct

from .config import SpeedControllerConfig
from .pid import PIDState, pid_ff, pid_init, pid_update_all


@struct.dataclass
class SpeedState:
    pid: PIDState
    last_out: jnp.ndarray  # [n] percent, unclamped (anti-windup latch)


def speed_init(n: int) -> SpeedState:
    return SpeedState(pid=pid_init(n), last_out=jnp.zeros((n,), jnp.float32))


def speed_throttle_out(cfg: SpeedControllerConfig, st: SpeedState,
                       desired_accel: jnp.ndarray, accel_meas: jnp.ndarray,
                       limit_pct: float = 100.0
                       ) -> Tuple[SpeedState, jnp.ndarray]:
    """Throttle demand in percent from an acceleration error (ft/s^2)."""
    limit_I = jnp.abs(st.last_out) >= limit_pct
    pid_st, pid_out = pid_update_all(cfg.gains, st.pid, desired_accel,
                                     accel_meas, limit_I)
    out = pid_out + pid_ff(cfg.gains, pid_st)
    new = SpeedState(pid=pid_st, last_out=out)
    return new, jnp.clip(out, -limit_pct, limit_pct)

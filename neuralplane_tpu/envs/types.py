"""Environment state/output pytrees."""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class EnvState:
    """Full simulator state: one immutable pytree, sharded on the agent axis."""
    model: Any            # vehicle state pytree (models.F16State)
    task: Any             # task target pytree
    step_count: jnp.ndarray          # [n] int32
    is_done: jnp.ndarray             # [n] bool - goal reached (resample+bonus)
    bad_done: jnp.ndarray            # [n] bool - constraint violation
    exceed_time_limit: jnp.ndarray   # [n] bool - truncation
    key: jax.Array                   # PRNG key threaded through steps


@struct.dataclass
class StepOutput:
    """Per-step outputs, mirroring the reference's 6-tuple
    (obs, reward, done, bad_done, exceed_time_limit, info) at
    `envs/env_base.py:99-109`; info is a dict of on-device scalar counters
    (per-condition termination triggers), flushed to host only when logged."""
    obs: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    bad_done: jnp.ndarray
    exceed_time_limit: jnp.ndarray
    info: Any = None
    # per-agent liveness AFTER the step (float [n]); team-combat envs set it
    # so MAPPO's active_masks can zero dead-but-not-done agents mid-episode
    # (SharedReplayBuffer active_masks semantics). None elsewhere.
    active: Any = None

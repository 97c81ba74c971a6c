"""Host-side vectorized-env adapter (the GPUVecEnv analogue).

Gives the pure-JAX env a stateful numpy interface shaped
[num_envs, num_agents, dim] for interop with host training loops and parity
tests (reference `envs/env_wrappers.py:84-124`). The on-device training path
(runner/) does NOT use this - it scans the pure env directly; this wrapper
exists for the gym-style contract and keeps arrays on device between calls,
converting to numpy only at the boundary.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import ControlEnv, Env


class GymVecEnv:
    """Stateful wrapper: holds EnvState, numpy in/out."""

    def __init__(self, env: Env, seed: int = 0):
        self.env = env
        self.num_envs = env.num_envs
        self.num_agents = env.num_agents
        self._key = jax.random.PRNGKey(seed)
        self._state = None

    @property
    def num_observation(self) -> int:
        return self.env.num_observation

    @property
    def num_actions(self) -> int:
        return self.env.num_actions

    def _split(self, x: jnp.ndarray) -> np.ndarray:
        arr = np.asarray(x)
        return arr.reshape(self.num_envs, self.num_agents, *arr.shape[1:])

    def reset(self) -> np.ndarray:
        self._key, k = jax.random.split(self._key)
        self._state, obs = self.env.reset(k)
        return self._split(obs)

    def step(self, actions: np.ndarray) -> Tuple[np.ndarray, ...]:
        assert self._state is not None, "call reset() first"
        flat = jnp.asarray(actions, dtype=jnp.float32).reshape(
            self.num_envs * self.num_agents, -1)
        self._state, out = self.env.step(self._state, flat)
        return (self._split(out.obs),
                self._split(out.reward[:, None]),
                self._split(out.done[:, None]),
                self._split(out.bad_done[:, None]),
                self._split(out.exceed_time_limit[:, None]),
                {})


def make_control_vec_env(num_envs: int, scenario: str = "heading",
                         model: str = "F16", seed: int = 0) -> GymVecEnv:
    return GymVecEnv(ControlEnv(num_envs, config=scenario, model=model), seed=seed)

"""Hierarchical planning env: high-level targets, frozen low-level policy.

Re-design of the reference `PlanningEnv` (`envs/planning_env.py:31-177`):
the high-level action sets (pitch, heading, vt) target deltas; an inner
`lax.scan` runs `low_level_steps` (default 50) low-level control steps, each
building the 22-dim control observation (`low_level_obs:60-142` - identical
to the control task's layout, noise-free) and querying a FROZEN PPO actor
deterministically for surface commands. Rows whose termination flags raised
mid-loop are rolled back to their pre-update state and frozen
(`planning_env.py:160-166`).

The reference hardcodes the low-level checkpoint path (`planning_env.py:16`);
here the actor params are injected explicitly (or loaded from
config.low_level_ckpt), and the GRU hidden state of the low-level actor is
part of the env state pytree.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..algorithms import networks as nets
from ..algorithms.rl_config import RLConfig
from ..utils.checkpoint import load_pytree
from ..utils.config import EnvConfig
from ..utils.math import wrap_PI
from .base import Env
from .types import EnvState, StepOutput

FT = 0.3048


@struct.dataclass
class PlanningState:
    env: EnvState
    h_low: jnp.ndarray  # low-level actor GRU state [n, L, H]


class PlanningEnv(Env):
    """Tracking task driven by (d_pitch, d_heading, d_vt) high-level actions."""

    def __init__(self, num_envs: int = 1, config: str | EnvConfig = "tracking",
                 model: str = "F16", low_level_params: Optional[dict] = None,
                 low_level_cfg: Optional[RLConfig] = None):
        super().__init__(num_envs, config=config, task="tracking", model=model)
        self.low_level_steps = self.config.low_level_steps

        # frozen low-level controller: a PPO actor over the 22-dim control
        # obs -> 4 surface commands (reference Args block, planning_env.py:18-29)
        cfg = low_level_cfg or RLConfig()
        self.low_spec = nets.NetSpec.from_config(cfg, obs_dim=22, act_dim=4)
        if low_level_params is None and self.config.low_level_ckpt:
            low_level_params = load_pytree(self.config.low_level_ckpt)
            if "actor" in low_level_params:
                low_level_params = low_level_params["actor"]
        if low_level_params is None:
            # random-init fallback keeps the env runnable without a trained
            # checkpoint (tests, shape checks); training quality requires one
            low_level_params = nets.init_actor(jax.random.PRNGKey(0),
                                               self.low_spec)
        self.low_level_params = low_level_params

    # observation/action sizes seen by the HIGH-level agent
    @property
    def num_observation(self) -> int:
        return self.task.num_observation

    @property
    def num_actions(self) -> int:
        return 3  # (d_pitch, d_heading, d_vt) - planning_env.py:150-152

    def init_planning_state(self, key: jax.Array) -> PlanningState:
        return PlanningState(
            env=self.init_state(key),
            h_low=nets.init_rnn_state(self.n, self.low_spec))

    @functools.partial(jax.jit, static_argnums=0)
    def reset(self, key: jax.Array) -> Tuple[PlanningState, jnp.ndarray]:
        state = self._masked_reset(self.init_state(key))
        key, k_obs = jax.random.split(state.key)
        state = state.replace(key=key)
        obs = self.task.get_obs(self.model, state.model, state.task, k_obs)
        return PlanningState(
            env=state, h_low=nets.init_rnn_state(self.n, self.low_spec)), obs

    def _low_level_obs(self, mstate, target_pitch, target_heading, target_vt):
        """22-dim control obs, noise-free (`planning_env.py:60-142`)."""
        from .tasks.base import vehicle_obs_tail
        _, pitch, heading = self.model.get_posture(mstate)
        vt = self.model.get_vt(mstate)
        head = jnp.stack([
            wrap_PI(pitch - target_pitch),
            wrap_PI(heading - target_heading),
            (vt - target_vt) * FT / 340.0,
        ], axis=1)
        return jnp.concatenate([head, vehicle_obs_tail(self.model, mstate)],
                               axis=1)

    @functools.partial(jax.jit, static_argnums=0)
    def step(self, state: PlanningState, action: jnp.ndarray
             ) -> Tuple[PlanningState, StepOutput]:
        estate = self._masked_reset(state.env)
        # fresh low-level memory for re-initialized rows
        reset_mask = (state.env.is_done | state.env.bad_done
                      | state.env.exceed_time_limit)
        h_low = state.h_low * (~reset_mask).astype(jnp.float32)[:, None, None]

        action = jnp.clip(action, -1.0, 1.0)
        _, pitch, yaw = self.model.get_posture(estate.model)
        vt = self.model.get_vt(estate.model)
        target_pitch = pitch + action[:, 0] * 0.3
        target_heading = yaw + action[:, 1] * 0.3
        target_vt = vt + action[:, 2] * 30.0

        def inner(carry, _):
            mstate, h_low, flags, step_count = carry
            done, bad, exceed = flags
            obs_low = self._low_level_obs(mstate, target_pitch,
                                          target_heading, target_vt)
            mean, _, h_low = nets.actor_step(
                self.low_level_params, self.low_spec, obs_low, h_low,
                jnp.ones((self.n, 1), jnp.float32))
            new_mstate = self.model.update(mstate, mean)
            # roll back + freeze rows already flagged (planning_env.py:160-166)
            frozen = (done | bad | exceed)[:, None]
            s = jnp.where(frozen, mstate.s, new_mstate.s)
            u = jnp.where(frozen, mstate.u, new_mstate.u)
            mstate = new_mstate.replace(s=s, u=u)
            step_count = step_count + 1
            xdot = self.model.extended_state(mstate)
            d, b, e, _ = self.task.get_termination(self.model, mstate, xdot,
                                                   step_count, estate.task)
            flags = (done | d, bad | b, exceed | e)
            return (mstate, h_low, flags, step_count), None

        zero = jnp.zeros(self.n, dtype=bool)
        (mstate, h_low, (done, bad, exceed), step_count), _ = jax.lax.scan(
            inner,
            (estate.model, h_low, (zero, zero, zero), estate.step_count),
            None, length=self.low_level_steps)

        key, k_obs = jax.random.split(estate.key)
        obs = self.task.get_obs(self.model, mstate, estate.task, k_obs)
        reward = self.task.get_reward(self.model, mstate, estate.task,
                                      done, bad)
        new_env = EnvState(model=mstate, task=estate.task,
                           step_count=step_count, is_done=done, bad_done=bad,
                           exceed_time_limit=exceed, key=key)
        out = StepOutput(obs=obs, reward=reward, done=done, bad_done=bad,
                         exceed_time_limit=exceed)
        return PlanningState(env=new_env, h_low=h_low), out

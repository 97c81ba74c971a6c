"""F16Sim runner: on-device rollout collection + fully-jitted PPO training.

Re-design of the reference `F16SimRunner` (`runner/F16sim_runner.py:25-229`).
The reference's per-step host round trip (numpy buffer -> torch policy ->
numpy env wrapper -> numpy buffer) becomes a single `lax.scan` over the
buffer_size steps running entirely on device; the host loop only launches
one collect + one train XLA program per episode and reads back scalar
metrics.

Mask construction parity (`F16sim_runner.insert:138-154`):
  dones_env      = any-over-agents is_done   -> masks[t+1] = 0 (whole env)
  bad_dones_env  = any-over-agents bad_done  -> bad_masks[t+1] = 0
  reset_env      = any-over-agents any-flag  -> rnn states zeroed
"""
from __future__ import annotations

import functools
import logging
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..algorithms.ppo.buffer import RolloutBatch
from ..algorithms.rl_config import RLConfig
from .base import Runner


@struct.dataclass
class RolloutCarry:
    env_state: object
    obs: jnp.ndarray        # [n, obs_dim]
    h_actor: jnp.ndarray    # [n, L, H]
    h_critic: jnp.ndarray   # [n, L, H]
    masks: jnp.ndarray      # [n, 1]
    bad_masks: jnp.ndarray  # [n, 1]
    key: jax.Array


class F16SimRunner(Runner):
    """PPO on the single-agent control envs (heading / control / tracking)."""

    def __init__(self, env, cfg: RLConfig, run_dir: str = "runs/debug",
                 eval_env=None, model_dir: Optional[str] = None,
                 use_tensorboard: bool = False, mesh=None):
        super().__init__(env, cfg, run_dir, eval_env, model_dir,
                         use_tensorboard)
        self.num_envs = env.num_envs
        self.num_agents = env.num_agents
        self.n = env.n
        # Data-parallel mesh (SURVEY.md S2 P1-P3): env/rollout state sharded
        # over the 'dp' axis, policy + optimizer replicated; XLA inserts the
        # gradient all-reduce over ICI inside trainer.train. None = one chip.
        self.mesh = mesh
        if mesh is not None:
            from ..parallel import replicate
            assert self.n % mesh.devices.size == 0, (
                f"n={self.n} must divide over {mesh.devices.size} devices")
            self.train_state = replicate(self.train_state, mesh)

    def _shard_carry(self, carry: "RolloutCarry") -> "RolloutCarry":
        """Place a rollout carry with batch-leading arrays sharded on dp."""
        if self.mesh is None:
            return carry
        from ..parallel import shard_env_state
        return shard_env_state(carry, self.mesh)

    # ---- rollout ----
    def init_carry(self, key: jax.Array) -> RolloutCarry:
        k_reset, k_roll = jax.random.split(key)
        env_state, obs = self.env.reset(k_reset)
        h_a, h_c = self.policy.init_rnn_states(self.n)
        ones = jnp.ones((self.n, 1), jnp.float32)
        return RolloutCarry(env_state=env_state, obs=obs, h_actor=h_a,
                            h_critic=h_c, masks=ones, bad_masks=ones,
                            key=k_roll)

    def _env_flags(self, done, bad, exceed) -> Tuple[jnp.ndarray, jnp.ndarray,
                                                     jnp.ndarray]:
        """Per-env any-over-agents reductions, broadcast back to [n, 1]."""
        def env_any(x):
            per_env = jnp.any(x.reshape(self.num_envs, self.num_agents), axis=1)
            return jnp.repeat(per_env, self.num_agents)[:, None]
        return env_any(done), env_any(bad), env_any(done | bad | exceed)

    def _collect_step(self, params: dict, carry: RolloutCarry):
        key, k_act = jax.random.split(carry.key)
        values, actions, logp, h_a, h_c = self.policy.get_actions(
            params, carry.obs, carry.h_actor, carry.h_critic, carry.masks,
            k_act)
        env_state, out = self.env.step(carry.env_state, actions)

        dones_env, bad_env, reset_env = self._env_flags(
            out.done, out.bad_done, out.exceed_time_limit)
        next_masks = 1.0 - dones_env.astype(jnp.float32)
        next_bad_masks = 1.0 - bad_env.astype(jnp.float32)
        keep = 1.0 - reset_env.astype(jnp.float32)
        h_a = h_a * keep[:, :, None]
        h_c = h_c * keep[:, :, None]

        step_data = dict(
            obs=carry.obs, actions=actions, rewards=out.reward[:, None],
            masks=carry.masks, bad_masks=carry.bad_masks,
            action_log_probs=logp, value_preds=values,
            done_count=out.done.sum(),
            bad_count=out.bad_done.sum(),
            info=out.info if out.info is not None else {},
        )
        new_carry = RolloutCarry(env_state=env_state, obs=out.obs,
                                 h_actor=h_a, h_critic=h_c, masks=next_masks,
                                 bad_masks=next_bad_masks, key=key)
        return new_carry, step_data

    @functools.partial(jax.jit, static_argnums=0)
    def collect(self, params: dict, carry: RolloutCarry
                ) -> Tuple[RolloutCarry, RolloutBatch, jnp.ndarray]:
        """Roll buffer_size steps; returns (carry, batch, episodes_finished).

        Two-level scan: outer over the T/L recurrent chunks, inner over the
        L steps of a chunk. The rnn states are recorded ONCE per chunk (the
        stored *input* state of the chunk's first step - all the PPO update
        ever reads, algorithms/ppo/buffer.make_chunks), not once per step:
        at the reference's 3000x3000 control workload the per-step history
        was the single largest allocation (2 x 4.3 GB of the 16 GB chip)."""
        T, L = self.cfg.buffer_size, self.cfg.data_chunk_length
        if T % L != 0:
            raise ValueError(f"buffer_size {T} % data_chunk_length {L} != 0")

        def inner(c, _):
            return self._collect_step(params, c)

        def outer(c, _):
            h0_a, h0_c = c.h_actor, c.h_critic
            c, steps = jax.lax.scan(inner, c, None, length=L)
            return c, (steps, h0_a, h0_c)

        carry, (steps, h0_a, h0_c) = jax.lax.scan(outer, carry, None,
                                                  length=T // L)
        steps = jax.tree.map(lambda x: x.reshape((T,) + x.shape[2:]), steps)
        bootstrap = self.policy.get_values(params, carry.obs, carry.h_critic,
                                           carry.masks)
        batch = RolloutBatch(
            obs=jnp.concatenate([steps["obs"], carry.obs[None]], axis=0),
            actions=steps["actions"],
            rewards=steps["rewards"],
            masks=jnp.concatenate([steps["masks"], carry.masks[None]], axis=0),
            bad_masks=jnp.concatenate([steps["bad_masks"],
                                       carry.bad_masks[None]], axis=0),
            action_log_probs=steps["action_log_probs"],
            value_preds=jnp.concatenate([steps["value_preds"],
                                         bootstrap[None]], axis=0),
            rnn_states_actor=h0_a,
            rnn_states_critic=h0_c,
        )
        counters = {k: v.sum() for k, v in steps.get("info", {}).items()}
        counters["episodes_reached_target"] = steps["done_count"].sum()
        counters["episodes_failed"] = steps["bad_count"].sum()
        return carry, batch, (steps["done_count"].sum()
                              + steps["bad_count"].sum(), counters)

    # ---- main loop ----
    def run(self) -> Dict[str, float]:
        cfg = self.cfg
        carry = self._shard_carry(self.init_carry(self.next_key()))
        total_steps_per_episode = cfg.buffer_size * self.n
        episodes = max(1, int(cfg.num_env_steps) // total_steps_per_episode)
        start = time.time()
        train_infos: Dict[str, float] = {}

        for episode in range(episodes):
            carry, batch, (done_count, counters) = self.collect(
                self.train_state.params, carry)
            train_infos = self.train(batch)
            total_num_steps = (episode + 1) * total_steps_per_episode

            if episode % cfg.log_interval == 0:
                # avg episode reward = sum(rewards) / #episode-ends
                # (F16sim_runner.py:98-99)
                ends = ((batch.masks[1:] == 0).sum()
                        + (batch.bad_masks[1:] == 0).sum())
                avg_rew = batch.rewards.sum() / jnp.maximum(ends, 1)
                train_infos["average_episode_rewards"] = float(avg_rew)
                train_infos.update(
                    {k: float(v) for k, v in counters.items()})
                fps = int(total_num_steps / (time.time() - start))
                logging.info(
                    "episode %d/%d steps %d FPS %d avg_episode_reward %.3f",
                    episode, episodes, total_num_steps, fps, float(avg_rew))
                train_infos["fps"] = fps
                self.log_info(train_infos, total_num_steps)

            if cfg.use_eval and episode % cfg.eval_interval == 0 and episode:
                self.log_info(self.eval(), total_num_steps)

            if episode % cfg.save_interval == 0 or episode == episodes - 1:
                self.save("latest")
                self.save(f"ep{episode}")
        return train_infos

    # ---- evaluation (deterministic rollout; F16sim_runner.py:156-193) ----
    def eval(self, num_steps: Optional[int] = None) -> Dict[str, float]:
        env = self.eval_env if self.eval_env is not None else self.env
        steps = num_steps or self.env.config.max_steps
        key = self.next_key()
        k_reset, key = jax.random.split(key)
        state, obs = env.reset(k_reset)
        h_a, _ = self.policy.init_rnn_states(env.n)
        masks = jnp.ones((env.n, 1), jnp.float32)

        # params is an ARGUMENT (not a closure): a fresh closure per eval()
        # would miss jit's cache and recompile the whole rollout - with
        # params constant-folded into the executable - every eval_interval
        if not hasattr(self, "_eval_rollout"):
            @functools.partial(jax.jit, static_argnames=("steps",))
            def rollout(params, init, steps):
                def step_fn(carry, _):
                    state, obs, h_a, masks, total_rew, total_done = carry
                    actions, h_a = self.policy.act(params, obs, h_a, masks,
                                                   deterministic=True)
                    state, out = env.step(state, actions)
                    reset = out.done | out.bad_done | out.exceed_time_limit
                    masks = 1.0 - out.done.astype(jnp.float32)[:, None]
                    h_a = h_a * (1.0 - reset.astype(jnp.float32))[:, None, None]
                    total_rew = total_rew + out.reward.sum()
                    total_done = total_done + reset.sum()
                    return (state, out.obs, h_a, masks, total_rew,
                            total_done), None
                return jax.lax.scan(step_fn, init, None, length=steps)
            self._eval_rollout = rollout

        init = (state, obs, h_a, masks, jnp.zeros(()), jnp.zeros((), jnp.int32))
        (state, obs, h_a, masks, total_rew, total_done), _ = \
            self._eval_rollout(self.train_state.params, init, steps=steps)
        episodes = jnp.maximum(total_done, 1)
        return {"eval_average_episode_rewards":
                float(total_rew / episodes)}

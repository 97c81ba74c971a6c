"""MAPPO self-play runner: centralized critic over the ego team.

The reference ships MAPPO modules but never wires them to a runner
(`runner/base_runner.py:7-8` hardcodes `algorithms.ppo`; SURVEY.md S2 A4m).
This runner actually trains MAPPO on the combat envs: the ego team's
observations are concatenated into the centralized critic input (share_obs),
active_masks track per-agent liveness, and the SharedRolloutBatch feeds the
MAPPO trainer. Opponent pool / ELO machinery is inherited from
SelfplayRunner.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..algorithms.mappo import MAPPOPolicy, MAPPOTrainer, SharedRolloutBatch
from ..algorithms.rl_config import RLConfig
from .selfplay import SelfplayCarry, SelfplayRunner


class MAPPOSelfplayRunner(SelfplayRunner):
    def _build_policy(self, env, cfg: RLConfig):
        half = env.num_agents // 2
        policy = MAPPOPolicy(cfg, env.num_observation,
                             env.num_observation * half, env.num_actions,
                             act_space=getattr(env, "action_space", None),
                             prior_slots=getattr(env, "shoot_prior_slots",
                                                 (11, 13)))
        return policy, MAPPOTrainer(cfg, policy)

    def init_carry(self, key: jax.Array) -> SelfplayCarry:
        carry = super().init_carry(key)
        return carry.replace(active_masks=jnp.ones((self.n_ego, 1),
                                                   jnp.float32))

    def _share_obs(self, ego_obs: jnp.ndarray) -> jnp.ndarray:
        """Concat the ego team's obs per env, tiled back per agent."""
        g = ego_obs.reshape(self.num_envs, self.half, -1)
        cent = g.reshape(self.num_envs, 1, -1)
        return jnp.broadcast_to(
            cent, (self.num_envs, self.half, cent.shape[-1])
        ).reshape(self.n_ego, -1)

    def _collect_step(self, params: dict, opp_params: dict,
                      carry: SelfplayCarry):
        key, k_act, k_opp = jax.random.split(carry.key, 3)
        cent_obs = self._share_obs(carry.ego_obs)
        values, actions, logp, h_a, h_c = self.policy.get_actions(
            params, cent_obs, carry.ego_obs, carry.h_actor, carry.h_critic,
            carry.ego_masks, k_act)

        def opp_act(p, obs, h, m, k):
            return self.policy.act({"actor": p}, obs, h, m, key=k,
                                   deterministic=False)
        opp_actions, h_opp = jax.vmap(opp_act)(
            opp_params, self._opp_slices(carry.opp_obs),
            self._opp_slices(carry.h_opp), self._opp_slices(carry.opp_masks),
            jax.random.split(k_opp, self.num_opponents))
        opp_actions = opp_actions.reshape(self.n_ego, -1)
        h_opp = h_opp.reshape(carry.h_opp.shape)

        env_state, out = self.env.step(carry.env_state,
                                       self._merge(actions, opp_actions))

        def env_any(x):
            per_env = jnp.any(x.reshape(self.num_envs, self.num_agents),
                              axis=1)
            return jnp.repeat(per_env, self.half)[:, None]
        dones_env = env_any(out.done)
        bad_env = env_any(out.bad_done)
        reset_env = env_any(out.done | out.bad_done | out.exceed_time_limit)
        next_masks = 1.0 - dones_env.astype(jnp.float32)
        next_bad = 1.0 - bad_env.astype(jnp.float32)
        keep = (1.0 - reset_env.astype(jnp.float32))[:, :, None]
        h_a, h_c, h_opp = h_a * keep, h_c * keep, h_opp * keep

        ego_obs, opp_obs = self._split(out.obs)
        ego_rew, opp_rew = self._split(out.reward[:, None])
        # per-AGENT liveness at the NEXT obs (SharedReplayBuffer
        # active_masks semantics, `algorithms/utils/buffer.py:305` "whether
        # agent[i] is alive in obs[t]" / `:343` "1 - agent_done_t" — intent
        # the reference's runners never wire: no runner ever passes
        # active_masks to insert(), so it stays all-ones there): team envs
        # expose out.active, so a shot-down agent is inactive mid-episode
        # while its env group keeps running; an env-group reset revives
        # everyone. In these envs any per-agent done is env-level (group
        # reset), so liveness is the only mid-episode inactivation source.
        if out.active is not None:
            base, _ = self._split(out.active[:, None])
        else:
            base = jnp.ones_like(carry.active_masks)
        next_active = jnp.maximum(base, reset_env.astype(jnp.float32))
        step_data = dict(
            obs=carry.ego_obs, share_obs=cent_obs, actions=actions,
            rewards=ego_rew, opp_rewards=opp_rew, masks=carry.ego_masks,
            bad_masks=carry.bad_masks, active_masks=carry.active_masks,
            action_log_probs=logp, value_preds=values,
            done_count=out.done.sum() + out.bad_done.sum(),
        )
        for k in ("shoot/launches", "shoot/hits", "shoot/pk_sum"):
            if k in out.info:
                step_data[k.replace("/", "_")] = out.info[k]
        new_carry = SelfplayCarry(
            env_state=env_state, ego_obs=ego_obs, opp_obs=opp_obs,
            h_actor=h_a, h_critic=h_c, h_opp=h_opp, ego_masks=next_masks,
            opp_masks=next_masks, bad_masks=next_bad, key=key,
            active_masks=next_active)
        return new_carry, step_data

    @functools.partial(jax.jit, static_argnums=0)
    def collect(self, params: dict, opp_params: dict, carry: SelfplayCarry
                ) -> Tuple[SelfplayCarry, SharedRolloutBatch, jnp.ndarray]:
        # two-level scan: rnn states recorded once per recurrent chunk (the
        # chunk-start input - all make_chunks reads; see runner/f16sim.py)
        T, L = self.cfg.buffer_size, self.cfg.data_chunk_length
        if T % L != 0:
            raise ValueError(f"buffer_size {T} % data_chunk_length {L} != 0")

        def inner(c, _):
            return self._collect_step(params, opp_params, c)

        def outer(c, _):
            h0_a, h0_c = c.h_actor, c.h_critic
            c, steps = jax.lax.scan(inner, c, None, length=L)
            return c, (steps, h0_a, h0_c)

        carry, (steps, h0_a, h0_c) = jax.lax.scan(outer, carry, None,
                                                  length=T // L)
        steps = jax.tree.map(lambda x: x.reshape((T,) + x.shape[2:]), steps)
        cent = self._share_obs(carry.ego_obs)
        bootstrap = self.policy.get_values(params, cent, carry.h_critic,
                                           carry.ego_masks)
        batch = SharedRolloutBatch(
            obs=jnp.concatenate([steps["obs"], carry.ego_obs[None]], axis=0),
            share_obs=jnp.concatenate([steps["share_obs"], cent[None]],
                                      axis=0),
            actions=steps["actions"], rewards=steps["rewards"],
            masks=jnp.concatenate([steps["masks"], carry.ego_masks[None]],
                                  axis=0),
            bad_masks=jnp.concatenate([steps["bad_masks"],
                                       carry.bad_masks[None]], axis=0),
            active_masks=jnp.concatenate(
                [steps["active_masks"], carry.active_masks[None]], axis=0),
            action_log_probs=steps["action_log_probs"],
            value_preds=jnp.concatenate([steps["value_preds"],
                                         bootstrap[None]], axis=0),
            rnn_states_actor=h0_a,
            rnn_states_critic=h0_c,
        )
        counters = {k: steps[k].sum() for k in steps
                    if k.startswith("shoot_") or k == "done_count"}
        return carry, batch, counters

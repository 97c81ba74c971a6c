"""MAPPO policy: decentralized actor + CENTRALIZED critic.

Parity with the reference `algorithms/mappo/ppo_policy.py:7-68`: identical to
the PPO policy except the critic consumes the centralized observation
(`cent_obs` / share_obs) - the concatenation of the whole ego team's
observations. The reference ships this but never wires it to a runner
(SURVEY.md S2 A4m); here `runner/mappo.py` actually trains with it.
"""
from __future__ import annotations

from typing import Optional

import jax

from .. import networks as nets
from ..rl_config import RLConfig
from ..utils.distributions import DiagGaussian


class MAPPOPolicy:
    def __init__(self, cfg: RLConfig, obs_dim: int, share_obs_dim: int,
                 act_dim: int):
        self.cfg = cfg
        self.spec = nets.NetSpec.from_config(cfg, obs_dim, act_dim)
        self.cent_spec = nets.NetSpec.from_config(cfg, share_obs_dim, act_dim)

    def init_params(self, key: jax.Array) -> dict:
        k_a, k_c = jax.random.split(key)
        return {"actor": nets.init_actor(k_a, self.spec),
                "critic": nets.init_critic(k_c, self.cent_spec)}

    def init_rnn_states(self, n: int):
        h = nets.init_rnn_state(n, self.spec)
        return h, h

    def get_actions(self, params, cent_obs, obs, h_actor, h_critic, masks,
                    key: jax.Array):
        mean, log_std, h_actor = nets.actor_step(params["actor"], self.spec,
                                                 obs, h_actor, masks)
        dist = DiagGaussian(mean, log_std)
        actions = dist.sample(key)
        logp = dist.log_prob(actions)
        values, h_critic = nets.critic_step(params["critic"], self.cent_spec,
                                            cent_obs, h_critic, masks)
        return values, actions, logp, h_actor, h_critic

    def get_values(self, params, cent_obs, h_critic, masks):
        values, _ = nets.critic_step(params["critic"], self.cent_spec,
                                     cent_obs, h_critic, masks)
        return values

    def act(self, params, obs, h_actor, masks, key: Optional[jax.Array] = None,
            deterministic: bool = True):
        mean, log_std, h_actor = nets.actor_step(params["actor"], self.spec,
                                                 obs, h_actor, masks)
        if deterministic:
            return mean, h_actor
        return DiagGaussian(mean, log_std).sample(key), h_actor

    def evaluate_actions(self, params, cent_obs, obs, h0_actor, h0_critic,
                         actions, masks):
        mean, log_std, _ = nets.actor_seq(params["actor"], self.spec, obs,
                                          h0_actor, masks)
        dist = DiagGaussian(mean, log_std)
        values, _ = nets.critic_seq(params["critic"], self.cent_spec,
                                    cent_obs, h0_critic, masks)
        return values, dist.log_prob(actions), dist.entropy()

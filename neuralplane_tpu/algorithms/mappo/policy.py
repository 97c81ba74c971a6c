"""MAPPO policy: decentralized actor + CENTRALIZED critic.

Parity with the reference `algorithms/mappo/ppo_policy.py:7-68`: identical to
the PPO policy except the critic consumes the centralized observation
(`cent_obs` / share_obs) - the concatenation of the whole ego team's
observations. The reference ships this but never wires it to a runner
(SURVEY.md S2 A4m); here `runner/mappo.py` actually trains with it.

The actor side is literally the PPO actor (composed, not duplicated), so
every action space the PPO policy supports - Box/DiagGaussian plus the
Discrete / MultiDiscrete / ShootTuple heads in `algorithms/heads.py` -
works under the centralized critic too. One deliberate beyond-reference
extension: the reference's MAPPO actor drops `use_prior`
(`mappo/ppo_actor.py` has no shoot-prior branch), which would make its own
shoot head untrainable under MAPPO; we keep the prior available.
"""
from __future__ import annotations

from typing import Optional

import jax

from .. import networks as nets
from ..ppo.policy import PPOPolicy
from ..rl_config import RLConfig


class MAPPOPolicy:
    def __init__(self, cfg: RLConfig, obs_dim: int, share_obs_dim: int,
                 act_dim: int = None, act_space=None, prior_slots=(11, 13)):
        self.cfg = cfg
        # actor (and its action-space dispatch) is the PPO policy's; only
        # its critic spec is replaced by the centralized one below
        self._pp = PPOPolicy(cfg, obs_dim, act_dim, act_space,
                             prior_slots=prior_slots)
        self.spec = self._pp.spec
        self.act_space = self._pp.act_space
        self.cent_spec = nets.NetSpec.from_config(cfg, share_obs_dim,
                                                  self.act_space.dim)

    def init_params(self, key: jax.Array) -> dict:
        k_a, k_c = jax.random.split(key)
        return {"actor": self._pp.init_actor_params(k_a),
                "critic": nets.init_critic(k_c, self.cent_spec)}

    def init_rnn_states(self, n: int):
        h = nets.init_rnn_state(n, self.spec)
        return h, h

    def get_actions(self, params, cent_obs, obs, h_actor, h_critic, masks,
                    key: jax.Array):
        dist, h_actor = self._pp._dist_step(params, obs, h_actor, masks)
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
        dist, h_actor = self._pp._dist_step(params, obs, h_actor, masks)
        if deterministic:
            return dist.mode(), h_actor
        return dist.sample(key), h_actor

    def evaluate_actions(self, params, cent_obs, obs, h0_actor, h0_critic,
                         actions, masks):
        dist = self._pp._dist_seq(params, obs, h0_actor, masks)
        values, _ = nets.critic_seq(params["critic"], self.cent_spec,
                                    cent_obs, h0_critic, masks)
        return values, dist.log_prob(actions), dist.entropy()

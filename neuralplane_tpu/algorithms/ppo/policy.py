"""PPO policy: actor + critic params with pure forward methods.

Functional counterpart of the reference `PPOPolicy`
(`algorithms/ppo/ppo_policy.py:6-68`): the same five entry points
(get_actions / get_values / evaluate_actions / act / copy), but params are an
explicit pytree argument and sampling takes an explicit PRNG key, so every
method jits and shards cleanly. The joint Adam over actor+critic lives in
PPOTrainer (reference keeps it on the policy; here optimizer state belongs to
the training state, which makes checkpoint/resume cover it - a gap in the
reference, SURVEY.md S5 checkpoint note).

Action spaces: Box (DiagGaussian, the control/combat default) uses the
fused actor in networks.py; Discrete / MultiBinary / MultiDiscrete /
ShootTuple use the generic heads in algorithms/heads.py, including the
reference's Beta-prior missile-shoot logic when cfg.use_prior is set
(`ppo_actor.py:41-49`).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .. import networks as nets
from ..rl_config import RLConfig
from ..utils.distributions import DiagGaussian
from ..utils.spaces import Box, ShootTuple


class PPOPolicy:
    """Static config holder; all methods are pure functions of (params, ...)."""

    def __init__(self, cfg: RLConfig, obs_dim: int, act_dim: int = None,
                 act_space=None, prior_slots=(11, 13)):
        self.cfg = cfg
        self.act_space = act_space if act_space is not None else Box((act_dim,))
        self.is_box = isinstance(self.act_space, Box)
        self.spec = nets.NetSpec.from_config(cfg, obs_dim,
                                             self.act_space.dim)
        if not self.is_box:
            from ..heads import build_head
            self.head = build_head(self.act_space, cfg.gain)
        self.use_prior = cfg.use_prior and isinstance(self.act_space,
                                                      ShootTuple)
        # (AO, R) obs slot indices feeding the Beta launch prior — layout-
        # dependent (1v1: 11/13; team: nearest-enemy block offsets), so
        # runners thread the env's `shoot_prior_slots` through here
        self.prior_slots = tuple(prior_slots)

    # ---- lifecycle ----
    def init_actor_params(self, key: jax.Array) -> dict:
        """Actor-side params alone (MAPPOPolicy composes this actor with
        its own centralized critic)."""
        if self.is_box:
            return nets.init_actor(key, self.spec)
        k_trunk, k_mlp, k_head = jax.random.split(key, 3)
        actor = {"trunk": nets._trunk_init(k_trunk, self.spec)}
        d_in = self.spec.trunk_out
        if self.spec.act_hidden_sizes:
            actor["act_mlp"] = nets._mlp_init(k_mlp, d_in,
                                              self.spec.act_hidden_sizes,
                                              self.spec.activation)
            d_in = self.spec.act_hidden_sizes[-1]
        actor["head"] = self.head.init(k_head, d_in)
        return actor

    def init_params(self, key: jax.Array) -> dict:
        k_a, k_c = jax.random.split(key)
        return {"actor": self.init_actor_params(k_a),
                "critic": nets.init_critic(k_c, self.spec)}

    def init_rnn_states(self, n: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = nets.init_rnn_state(n, self.spec)
        return h, h

    # ---- distribution construction ----
    def _prior_kwargs(self, obs: jnp.ndarray) -> dict:
        if not self.use_prior:
            return {}
        from ..heads import shoot_priors
        alpha0, beta0 = shoot_priors(obs, *self.prior_slots)
        return {"alpha0": alpha0, "beta0": beta0}

    def _dist_step(self, params: dict, obs, h, masks):
        if self.is_box:
            mean, log_std, h = nets.actor_step(params["actor"], self.spec,
                                               obs, h, masks)
            return DiagGaussian(mean, log_std), h
        p = params["actor"]
        feat, h = nets._trunk_step(p["trunk"], self.spec, obs, h, masks)
        if self.spec.act_hidden_sizes:
            feat = nets._mlp(p["act_mlp"], feat, self.spec.activation)
        return self.head.dist(p["head"], feat, **self._prior_kwargs(obs)), h

    def _dist_seq(self, params: dict, obs, h0, masks):
        if self.is_box:
            mean, log_std, _ = nets.actor_seq(params["actor"], self.spec,
                                              obs, h0, masks)
            return DiagGaussian(mean, log_std)
        p = params["actor"]
        feat, _ = nets._trunk_seq(p["trunk"], self.spec, obs, h0, masks)
        if self.spec.act_hidden_sizes:
            feat = nets._mlp(p["act_mlp"], feat, self.spec.activation)
        return self.head.dist(p["head"], feat, **self._prior_kwargs(obs))

    # ---- rollout ----
    def get_actions(self, params: dict, obs: jnp.ndarray, h_actor: jnp.ndarray,
                    h_critic: jnp.ndarray, masks: jnp.ndarray, key: jax.Array):
        """Returns (values, actions, action_log_probs, h_actor, h_critic)."""
        dist, h_actor = self._dist_step(params, obs, h_actor, masks)
        actions = dist.sample(key)
        logp = dist.log_prob(actions)
        values, h_critic = nets.critic_step(
            params["critic"], self.spec, obs, h_critic, masks)
        return values, actions, logp, h_actor, h_critic

    def get_values(self, params: dict, obs: jnp.ndarray,
                   h_critic: jnp.ndarray, masks: jnp.ndarray) -> jnp.ndarray:
        values, _ = nets.critic_step(params["critic"], self.spec, obs,
                                     h_critic, masks)
        return values

    def act(self, params: dict, obs: jnp.ndarray, h_actor: jnp.ndarray,
            masks: jnp.ndarray, key: Optional[jax.Array] = None,
            deterministic: bool = True):
        """Returns (actions, h_actor); deterministic -> distribution mode."""
        dist, h_actor = self._dist_step(params, obs, h_actor, masks)
        if deterministic:
            return dist.mode(), h_actor
        return dist.sample(key), h_actor

    # ---- training (sequence mode over recurrent chunks) ----
    def evaluate_actions(self, params: dict, obs: jnp.ndarray,
                         h0_actor: jnp.ndarray, h0_critic: jnp.ndarray,
                         actions: jnp.ndarray, masks: jnp.ndarray):
        """Chunk arrays are [L, N, ...]; h0 are [N, layers, hidden].

        Returns (values, action_log_probs, dist_entropy), each [L, N, 1].
        """
        dist = self._dist_seq(params, obs, h0_actor, masks)
        logp = dist.log_prob(actions)
        entropy = dist.entropy()
        values, _ = nets.critic_seq(params["critic"], self.spec, obs,
                                    h0_critic, masks)
        return values, logp, entropy

"""PPO policy: actor + critic params with pure forward methods.

Functional counterpart of the reference `PPOPolicy`
(`algorithms/ppo/ppo_policy.py:6-68`): the same five entry points
(get_actions / get_values / evaluate_actions / act / copy), but params are an
explicit pytree argument and sampling takes an explicit PRNG key, so every
method jits and shards cleanly. The joint Adam over actor+critic lives in
PPOTrainer (reference keeps it on the policy; here optimizer state belongs to
the training state, which makes checkpoint/resume cover it - a gap in the
reference, SURVEY.md S5 checkpoint note).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .. import networks as nets
from ..rl_config import RLConfig
from ..utils.distributions import DiagGaussian


class PPOPolicy:
    """Static config holder; all methods are pure functions of (params, ...)."""

    def __init__(self, cfg: RLConfig, obs_dim: int, act_dim: int):
        self.cfg = cfg
        self.spec = nets.NetSpec.from_config(cfg, obs_dim, act_dim)

    # ---- lifecycle ----
    def init_params(self, key: jax.Array) -> dict:
        k_a, k_c = jax.random.split(key)
        return {"actor": nets.init_actor(k_a, self.spec),
                "critic": nets.init_critic(k_c, self.spec)}

    def init_rnn_states(self, n: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = nets.init_rnn_state(n, self.spec)
        return h, h

    # ---- rollout ----
    def get_actions(self, params: dict, obs: jnp.ndarray, h_actor: jnp.ndarray,
                    h_critic: jnp.ndarray, masks: jnp.ndarray, key: jax.Array):
        """Returns (values, actions, action_log_probs, h_actor, h_critic)."""
        mean, log_std, h_actor = nets.actor_step(
            params["actor"], self.spec, obs, h_actor, masks)
        dist = DiagGaussian(mean, log_std)
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
        mean, log_std, h_actor = nets.actor_step(
            params["actor"], self.spec, obs, h_actor, masks)
        if deterministic:
            return mean, h_actor
        return DiagGaussian(mean, log_std).sample(key), h_actor

    # ---- training (sequence mode over recurrent chunks) ----
    def evaluate_actions(self, params: dict, obs: jnp.ndarray,
                         h0_actor: jnp.ndarray, h0_critic: jnp.ndarray,
                         actions: jnp.ndarray, masks: jnp.ndarray):
        """Chunk arrays are [L, N, ...]; h0 are [N, layers, hidden].

        Returns (values, action_log_probs, dist_entropy), each [L, N, 1].
        """
        mean, log_std, _ = nets.actor_seq(params["actor"], self.spec, obs,
                                          h0_actor, masks)
        dist = DiagGaussian(mean, log_std)
        logp = dist.log_prob(actions)
        entropy = dist.entropy()
        values, _ = nets.critic_seq(params["critic"], self.spec, obs,
                                    h0_critic, masks)
        return values, logp, entropy

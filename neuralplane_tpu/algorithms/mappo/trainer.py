"""MAPPO trainer: PPO losses over shared-buffer chunks with active-mask
entropy weighting.

Parity with the reference `algorithms/mappo/ppo_trainer.py:29-43` +
`SharedReplayBuffer` (`algorithms/utils/buffer.py:277-456`): the rollout
batch adds share_obs and active_masks; the clipped-surrogate/value losses
are unchanged and only the entropy term is active-mask weighted (the
reference's ACT evaluate_actions weights entropy, act.py:162-166, and the
surrogate is left unweighted).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
from flax import struct

from ..ppo.buffer import RolloutBatch, make_chunks
from ..ppo.trainer import PPOTrainer
from ..rl_config import RLConfig
from .policy import MAPPOPolicy


@struct.dataclass
class SharedRolloutBatch(RolloutBatch):
    share_obs: jnp.ndarray     # [T+1, N, share_obs_dim]
    active_masks: jnp.ndarray  # [T+1, N, 1] - 1 while the agent is alive


class MAPPOTrainer(PPOTrainer):
    def __init__(self, cfg: RLConfig, policy: MAPPOPolicy):
        super().__init__(cfg, policy)

    def _chunk_arrays(self, batch: SharedRolloutBatch, returns, advantages
                      ) -> Tuple:
        L = self.cfg.data_chunk_length
        base = make_chunks(batch, returns, advantages, L)
        T, N = batch.actions.shape[:2]

        def to_chunks(x):
            x = jnp.swapaxes(x, 0, 1)
            return x.reshape(N * (T // L), L, *x.shape[2:])
        share_obs = to_chunks(batch.share_obs[:-1])
        active = to_chunks(batch.active_masks[:-1])
        # keep (..., h0_actor, h0_critic) last - trainer convention
        return base[:7] + (share_obs, active) + base[7:]

    def _loss(self, params: dict, sample: Tuple) -> Tuple[jnp.ndarray, Dict]:
        cfg = self.cfg
        (obs, actions, masks, old_logp, advs, rets, vpreds, share_obs,
         active, h0_actor, h0_critic) = sample
        values, logp, entropy = self.policy.evaluate_actions(
            params, share_obs, obs, h0_actor, h0_critic, actions, masks)

        ratio = jnp.exp(logp - old_logp)
        surr1 = ratio * advs
        surr2 = jnp.clip(ratio, 1.0 - cfg.clip_param,
                         1.0 + cfg.clip_param) * advs
        policy_loss = -jnp.minimum(surr1, surr2).mean()

        if cfg.use_clipped_value_loss:
            v_clip = vpreds + jnp.clip(values - vpreds, -cfg.clip_param,
                                       cfg.clip_param)
            value_loss = 0.5 * jnp.maximum((values - rets) ** 2,
                                           (v_clip - rets) ** 2).mean()
        else:
            value_loss = 0.5 * ((rets - values) ** 2).mean()

        entropy_loss = -(entropy * active).sum() / jnp.maximum(active.sum(),
                                                               1.0)
        loss = (policy_loss + value_loss * cfg.value_loss_coef
                + entropy_loss * cfg.entropy_coef)
        return loss, {"policy_loss": policy_loss, "value_loss": value_loss,
                      "policy_entropy_loss": entropy_loss,
                      "ratio": ratio.mean()}

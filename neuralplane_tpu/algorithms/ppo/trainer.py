"""PPO trainer: the full update (GAE -> chunk -> epochs x minibatches) as one
jitted XLA program.

Loss parity with the reference `PPOTrainer.ppo_update`
(`algorithms/ppo/ppo_trainer.py:27-75`): clipped surrogate, optional clipped
value loss (0.5 * max(mse, clipped-mse)), entropy bonus, joint Adam over
actor+critic with separate per-network global-norm clipping. The reference's
per-epoch Python generator + per-minibatch backward become a
`lax.scan(epochs) { permute; lax.scan(minibatches) { grad + apply } }` - no
host round trips between minibatches.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..rl_config import RLConfig
from .buffer import RolloutBatch, compute_advantages, compute_returns, make_chunks
from .policy import PPOPolicy


@struct.dataclass
class TrainState:
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray  # int32 update counter


def _global_norm(tree) -> jnp.ndarray:
    return optax.global_norm(tree)


class PPOTrainer:
    def __init__(self, cfg: RLConfig, policy: PPOPolicy):
        self.cfg = cfg
        self.policy = policy
        self.tx = optax.adam(cfg.lr)

    def init_state(self, params: dict) -> TrainState:
        return TrainState(params=params, opt_state=self.tx.init(params),
                          step=jnp.zeros((), jnp.int32))

    # ---- loss over one recurrent-chunk minibatch ([L, N, ...] layout) ----
    def _loss(self, params: dict, sample: Tuple) -> Tuple[jnp.ndarray, Dict]:
        cfg = self.cfg
        (obs, actions, masks, old_logp, advs, rets, vpreds,
         h0_actor, h0_critic) = sample
        values, logp, entropy = self.policy.evaluate_actions(
            params, obs, h0_actor, h0_critic, actions, masks)

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

        entropy_loss = -entropy.mean()
        loss = (policy_loss + value_loss * cfg.value_loss_coef
                + entropy_loss * cfg.entropy_coef)
        metrics = {"policy_loss": policy_loss, "value_loss": value_loss,
                   "policy_entropy_loss": entropy_loss,
                   "ratio": ratio.mean()}
        return loss, metrics

    def _update_minibatch(self, state: TrainState, sample) -> Tuple[TrainState, Dict]:
        cfg = self.cfg
        grads, metrics = jax.grad(self._loss, has_aux=True)(state.params, sample)
        a_norm, c_norm = _global_norm(grads["actor"]), _global_norm(grads["critic"])
        if cfg.use_max_grad_norm:
            # clip actor/critic separately (ppo_trainer.py:67-69)
            a_scale = jnp.minimum(1.0, cfg.max_grad_norm / (a_norm + 1e-12))
            c_scale = jnp.minimum(1.0, cfg.max_grad_norm / (c_norm + 1e-12))
            grads = {"actor": jax.tree_util.tree_map(lambda g: g * a_scale,
                                                     grads["actor"]),
                     "critic": jax.tree_util.tree_map(lambda g: g * c_scale,
                                                      grads["critic"])}
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {**metrics, "actor_grad_norm": a_norm,
                   "critic_grad_norm": c_norm}
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), metrics

    def _chunk_arrays(self, batch, returns, advantages) -> Tuple:
        """Chunked training arrays; by convention the LAST TWO entries are
        per-chunk initial rnn states (no time axis). Subclasses (MAPPO)
        extend this tuple."""
        return make_chunks(batch, returns, advantages, self.cfg.data_chunk_length)

    # ---- full update ----
    @functools.partial(jax.jit, static_argnums=0)
    def train(self, state: TrainState, batch: RolloutBatch, key: jax.Array
              ) -> Tuple[TrainState, Dict]:
        """One PPO update from a rollout batch; returns epoch-averaged metrics."""
        cfg = self.cfg
        returns = compute_returns(batch, cfg.gamma, cfg.gae_lambda,
                                  cfg.use_gae, cfg.use_proper_time_limits)
        advantages = compute_advantages(returns, batch.value_preds)
        chunks = self._chunk_arrays(batch, returns, advantages)

        num_chunks = chunks[0].shape[0]
        mb_size = num_chunks // cfg.num_mini_batch
        used = mb_size * cfg.num_mini_batch
        n_h0 = len(chunks) - 2  # entries >= n_h0 are initial rnn states

        def gather_mb(idx):
            """Chunk rows [mb, L, ...] -> time-major [L, mb, ...]; h0 stays [mb,...]."""
            out = []
            for i, arr in enumerate(chunks):
                sel = jnp.take(arr, idx, axis=0)
                out.append(sel if i >= n_h0 else jnp.swapaxes(sel, 0, 1))
            return tuple(out)

        def epoch_body(state, epoch_key):
            perm = jax.random.permutation(epoch_key, num_chunks)[:used]
            # sort WITHIN each minibatch: the loss is a mean over the
            # minibatch, so row order is irrelevant, but monotone indices
            # turn the chunk gathers from random HBM access into
            # quasi-sequential reads (the gather was ~5 ms/minibatch at
            # the 2v2 production config). The random PARTITION into
            # minibatches is unchanged.
            mb_idx = jnp.sort(perm.reshape(cfg.num_mini_batch, mb_size),
                              axis=1)

            def mb_body(state, idx):
                return self._update_minibatch(state, gather_mb(idx))
            state, metrics = jax.lax.scan(mb_body, state, mb_idx)
            return state, jax.tree_util.tree_map(jnp.mean, metrics)

        epoch_keys = jax.random.split(key, cfg.ppo_epoch)
        state, metrics = jax.lax.scan(epoch_body, state, epoch_keys)
        return state, jax.tree_util.tree_map(jnp.mean, metrics)

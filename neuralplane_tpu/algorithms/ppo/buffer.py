"""On-device rollout storage, GAE, and recurrent chunking.

The reference keeps its rollout in a host-side numpy ring buffer and computes
GAE with a Python loop over T (`algorithms/utils/buffer.py:27-274`), paying a
device->host->device round trip every step and at every update. Here the
rollout batch is an on-device pytree produced directly by the collector's
`lax.scan`, GAE is a reverse `lax.scan`, and the recurrent-chunk minibatch
"generator" is a pure gather by permuted indices - the whole PPO update jits
into one XLA program.

Index convention (parity with the reference buffer docstrings):
  obs[t]            observation the policy saw at step t        (T+1 entries)
  masks[t]          1 - done_env[t-1]: obs[t] begins a fresh episode if 0
  bad_masks[t]      1 - bad_done_env[t-1] (proper-time-limits variant)
  actions/rewards/action_log_probs[t]   step-t data              (T entries)
  value_preds[t]    V(obs[t])                                    (T+1 entries)
  rnn_states_*[t]   hidden state *input* to step t               (T entries)
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RolloutBatch:
    obs: jnp.ndarray                # [T+1, N, obs_dim]
    actions: jnp.ndarray            # [T, N, act_dim]
    rewards: jnp.ndarray            # [T, N, 1]
    masks: jnp.ndarray              # [T+1, N, 1]
    bad_masks: jnp.ndarray          # [T+1, N, 1]
    action_log_probs: jnp.ndarray   # [T, N, 1]
    value_preds: jnp.ndarray        # [T+1, N, 1]  (V(obs[T]) = bootstrap)
    rnn_states_actor: jnp.ndarray   # [T, N, L, H], or [T/chunk, N, L, H]
    rnn_states_critic: jnp.ndarray  # (chunk-start inputs only - make_chunks
                                    #  accepts both layouts)


def compute_returns(batch: RolloutBatch, gamma: float, gae_lambda: float,
                    use_gae: bool = True,
                    use_proper_time_limits: bool = False) -> jnp.ndarray:
    """Returns [T, N, 1]; reverse scan replacing the reference's numpy loop
    (`buffer.py:139-173`), all four variants included."""
    rewards, values = batch.rewards, batch.value_preds
    masks, bad_masks = batch.masks, batch.bad_masks
    T = rewards.shape[0]

    if use_gae:
        def body(gae, t):
            delta = (rewards[t] + gamma * values[t + 1] * masks[t + 1]
                     - values[t])
            gae = delta + gamma * gae_lambda * masks[t + 1] * gae
            if use_proper_time_limits:
                gae = gae * bad_masks[t + 1]
            return gae, gae + values[t]
        _, returns = jax.lax.scan(body, jnp.zeros_like(rewards[0]),
                                  jnp.arange(T), reverse=True)
        return returns

    def body(ret, t):
        ret = ret * gamma * masks[t + 1] + rewards[t]
        if use_proper_time_limits:
            ret = (ret * bad_masks[t + 1]
                   + (1.0 - bad_masks[t + 1]) * values[t])
        return ret, ret
    _, returns = jax.lax.scan(body, values[-1], jnp.arange(T), reverse=True)
    return returns


def compute_advantages(returns: jnp.ndarray, value_preds: jnp.ndarray
                       ) -> jnp.ndarray:
    """Whole-buffer-normalized advantages (`buffer.py:74-80`)."""
    adv = returns - value_preds[:-1]
    return (adv - adv.mean()) / (adv.std() + 1e-5)


def make_chunks(batch: RolloutBatch, returns: jnp.ndarray,
                advantages: jnp.ndarray, chunk_length: int) -> Tuple:
    """Split [T, N, ...] arrays into C = N*T//L recurrent chunks of length L.

    Pure-reshape equivalent of `ReplayBuffer.recurrent_generator`'s _cast +
    slicing (`buffer.py:175-274`): agent-major sequences cut into contiguous
    length-L windows; per-chunk initial rnn state is the stored *input* state
    of the chunk's first step. Requires T % L == 0 (the launch configs satisfy
    this; the reference silently drops the remainder instead).

    Returns (obs, actions, masks, old_logp, advantages, returns, value_preds)
    each [C, L, ...] plus (h0_actor, h0_critic) each [C, L_gru, H].
    """
    T, N = batch.actions.shape[:2]
    if T % chunk_length != 0:
        raise ValueError(f"buffer_size {T} must be divisible by "
                         f"data_chunk_length {chunk_length}")

    def to_chunks(x):  # [T, N, ...] -> [C, L, ...]
        x = jnp.swapaxes(x, 0, 1)                       # [N, T, ...]
        return x.reshape(N * (T // chunk_length), chunk_length, *x.shape[2:])

    obs = to_chunks(batch.obs[:-1])
    actions = to_chunks(batch.actions)
    masks = to_chunks(batch.masks[:-1])
    old_logp = to_chunks(batch.action_log_probs)
    advs = to_chunks(advantages)
    rets = to_chunks(returns)
    vpreds = to_chunks(batch.value_preds[:-1])

    def h0_chunks(h):
        if h.shape[0] == T // chunk_length:
            # already subsampled to chunk starts ([T/L, N, L_gru, H] - the
            # f16sim collect records h only at chunk boundaries, saving
            # (L-1)/L of the dominant rollout-buffer allocation); same
            # chunk ordering as to_chunks(...)[:, 0]
            h = jnp.swapaxes(h, 0, 1)
            return h.reshape(N * (T // chunk_length), *h.shape[2:])
        return to_chunks(h)[:, 0]

    h0_actor = h0_chunks(batch.rnn_states_actor)
    h0_critic = h0_chunks(batch.rnn_states_critic)
    return obs, actions, masks, old_logp, advs, rets, vpreds, h0_actor, h0_critic

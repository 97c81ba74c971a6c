"""PPO math tests: GAE vs a numpy reference loop, chunk layout, trainer step."""
import jax
import jax.numpy as jnp
import numpy as np

from neuralplane_tpu.algorithms.ppo.buffer import (
    RolloutBatch, compute_advantages, compute_returns, make_chunks)
from neuralplane_tpu.algorithms.ppo.policy import PPOPolicy
from neuralplane_tpu.algorithms.ppo.trainer import PPOTrainer
from neuralplane_tpu.algorithms.rl_config import RLConfig


def _random_batch(key, T=8, N=6, obs_dim=5, act_dim=3, L_gru=1, H=8):
    ks = jax.random.split(key, 12)
    masks = (jax.random.uniform(ks[0], (T + 1, N, 1)) > 0.2).astype(jnp.float32)
    bad = (jax.random.uniform(ks[1], (T + 1, N, 1)) > 0.1).astype(jnp.float32)
    return RolloutBatch(
        obs=jax.random.normal(ks[2], (T + 1, N, obs_dim)),
        actions=jax.random.normal(ks[3], (T, N, act_dim)) * 0.1,
        rewards=jax.random.normal(ks[4], (T, N, 1)),
        masks=masks, bad_masks=bad,
        action_log_probs=jax.random.normal(ks[5], (T, N, 1)) * 0.1,
        value_preds=jax.random.normal(ks[6], (T + 1, N, 1)),
        rnn_states_actor=jax.random.normal(ks[7], (T, N, L_gru, H)),
        rnn_states_critic=jax.random.normal(ks[8], (T, N, L_gru, H)),
    )


def _gae_numpy(rewards, values, masks, bad_masks, gamma, lam, proper):
    """Literal port of the reference loop (buffer.py:139-173) for testing."""
    T = rewards.shape[0]
    returns = np.zeros_like(rewards)
    gae = 0.0
    for t in reversed(range(T)):
        delta = rewards[t] + gamma * values[t + 1] * masks[t + 1] - values[t]
        gae = delta + gamma * lam * masks[t + 1] * gae
        if proper:
            gae = gae * bad_masks[t + 1]
        returns[t] = gae + values[t]
    return returns


def test_gae_matches_reference_loop():
    batch = _random_batch(jax.random.PRNGKey(0))
    for proper in (False, True):
        ours = compute_returns(batch, 0.99, 0.95, True, proper)
        ref = _gae_numpy(np.asarray(batch.rewards),
                         np.asarray(batch.value_preds),
                         np.asarray(batch.masks), np.asarray(batch.bad_masks),
                         0.99, 0.95, proper)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-5)


def test_discounted_returns_no_gae():
    batch = _random_batch(jax.random.PRNGKey(1))
    ours = compute_returns(batch, 0.99, 0.95, use_gae=False)
    rewards = np.asarray(batch.rewards)
    values = np.asarray(batch.value_preds)
    masks = np.asarray(batch.masks)
    T = rewards.shape[0]
    ref = np.zeros((T + 1, *rewards.shape[1:]), np.float32)
    ref[-1] = values[-1]
    for t in reversed(range(T)):
        ref[t] = ref[t + 1] * 0.99 * masks[t + 1] + rewards[t]
    np.testing.assert_allclose(np.asarray(ours), ref[:-1], rtol=1e-5, atol=1e-5)


def test_chunk_layout():
    """Chunks must be contiguous per-agent time windows with the right h0
    (reference recurrent_generator semantics, buffer.py:175-274)."""
    T, N, L = 8, 3, 4
    batch = _random_batch(jax.random.PRNGKey(2), T=T, N=N)
    returns = compute_returns(batch, 0.99, 0.95)
    advs = compute_advantages(returns, batch.value_preds)
    obs, actions, masks, old_logp, a, r, v, h0a, h0c = make_chunks(
        batch, returns, advs, L)
    C = N * T // L
    assert obs.shape[:2] == (C, L)
    # chunk c covers agent c // (T//L), window (c % (T//L)) * L
    for c in range(C):
        agent = c // (T // L)
        t0 = (c % (T // L)) * L
        np.testing.assert_array_equal(np.asarray(obs[c]),
                                      np.asarray(batch.obs[t0:t0 + L, agent]))
        np.testing.assert_array_equal(
            np.asarray(h0a[c]), np.asarray(batch.rnn_states_actor[t0, agent]))


def test_trainer_step_runs_and_improves_value():
    """One train() call returns finite metrics and reduces value error on a
    fixed batch (sanity that gradients flow through the recurrent chunks)."""
    cfg = RLConfig(hidden_sizes=(16,), act_hidden_sizes=(8,),
                   recurrent_hidden_size=8, recurrent_hidden_layers=1,
                   data_chunk_length=4, ppo_epoch=4, num_mini_batch=2,
                   lr=1e-3, buffer_size=8)
    obs_dim, act_dim = 5, 3
    policy = PPOPolicy(cfg, obs_dim, act_dim)
    trainer = PPOTrainer(cfg, policy)
    params = policy.init_params(jax.random.PRNGKey(0))
    state = trainer.init_state(params)

    batch = _random_batch(jax.random.PRNGKey(3), T=8, N=8, obs_dim=obs_dim,
                          act_dim=act_dim, H=8)

    def value_err(params):
        returns = compute_returns(batch, cfg.gamma, cfg.gae_lambda)
        v, _, _ = policy.evaluate_actions(
            params, batch.obs[:-1], batch.rnn_states_actor[0],
            batch.rnn_states_critic[0], batch.actions, batch.masks[:-1])
        return float(((returns - v) ** 2).mean())

    err0 = value_err(state.params)
    for i in range(5):
        state, metrics = trainer.train(state, batch, jax.random.PRNGKey(10 + i))
    err1 = value_err(state.params)

    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"non-finite metric {k}"
    assert err1 < err0, f"value error did not improve: {err0} -> {err1}"

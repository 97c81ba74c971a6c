"""Policy export (serving artifact) tests.

The exported StableHLO actor must (a) reproduce the live policy's
deterministic actions exactly, (b) carry GRU state across calls, (c) accept
ANY batch size from one artifact (symbolic batch), and (d) load WITHOUT the
policy object - bytes in, callable out.
"""
import jax
import jax.numpy as jnp
import numpy as np

from neuralplane_tpu.algorithms.ppo import PPOPolicy
from neuralplane_tpu.algorithms.rl_config import RLConfig
from neuralplane_tpu.utils.export import export_actor, load_actor


def test_exported_actor_matches_policy():
    cfg = RLConfig(hidden_sizes=(16,), act_hidden_sizes=(8,),
                   recurrent_hidden_size=8)
    policy = PPOPolicy(cfg, obs_dim=22, act_dim=4)
    params = policy.init_params(jax.random.PRNGKey(0))
    blob = export_actor(policy, params)
    assert isinstance(blob, bytes) and len(blob) > 0

    infer = load_actor(blob)
    for n in (1, 5, 64):            # one artifact, any fleet size
        obs = jax.random.normal(jax.random.PRNGKey(n), (n, 22))
        h, _ = policy.init_rnn_states(n)
        mask = jnp.ones((n, 1), jnp.float32)

        a_ref, h_ref = policy.act(params, obs, h, mask, deterministic=True)
        a_exp, h_exp = infer(obs, h, mask)
        np.testing.assert_allclose(np.asarray(a_exp), np.asarray(a_ref),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(h_exp), np.asarray(h_ref),
                                   rtol=1e-6, atol=1e-6)

    # recurrence carries: two chained calls == policy two chained calls
    n = 3
    obs1 = jax.random.normal(jax.random.PRNGKey(7), (n, 22))
    obs2 = jax.random.normal(jax.random.PRNGKey(8), (n, 22))
    h, _ = policy.init_rnn_states(n)
    mask = jnp.ones((n, 1), jnp.float32)
    _, h1 = policy.act(params, obs1, h, mask, deterministic=True)
    a2_ref, _ = policy.act(params, obs2, h1, mask, deterministic=True)
    _, h1e = infer(obs1, h, mask)
    a2_exp, _ = infer(obs2, h1e, mask)
    np.testing.assert_allclose(np.asarray(a2_exp), np.asarray(a2_ref),
                               rtol=1e-6, atol=1e-6)


def test_exported_shoot_actor():
    """The discrete ShootTuple head (incl. the Beta launch prior, which
    reads obs slots 11/13 inside the traced fn) exports and reproduces the
    live deterministic actions at any batch size."""
    from neuralplane_tpu.algorithms.utils.spaces import ShootTuple

    cfg = RLConfig(hidden_sizes=(16,), act_hidden_sizes=(8,),
                   recurrent_hidden_size=8, use_prior=True)
    policy = PPOPolicy(cfg, obs_dim=18,
                       act_space=ShootTuple((30, 41, 41, 41)))
    params = policy.init_params(jax.random.PRNGKey(1))
    infer = load_actor(export_actor(policy, params))
    for n in (1, 17):
        obs = jax.random.normal(jax.random.PRNGKey(n), (n, 18))
        h, _ = policy.init_rnn_states(n)
        mask = jnp.ones((n, 1), jnp.float32)
        a_ref, _ = policy.act(params, obs, h, mask, deterministic=True)
        a_exp, _ = infer(obs, h, mask)
        np.testing.assert_allclose(np.asarray(a_exp), np.asarray(a_ref))

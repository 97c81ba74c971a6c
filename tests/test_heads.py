"""Action-head tests: every reference action-space type samples/evaluates."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralplane_tpu.algorithms.heads import build_head, shoot_priors
from neuralplane_tpu.algorithms.ppo import PPOPolicy
from neuralplane_tpu.algorithms.rl_config import RLConfig
from neuralplane_tpu.algorithms.utils.spaces import (Box, Discrete,
                                                     MultiBinary,
                                                     MultiDiscrete,
                                                     ShootTuple)

CFG = RLConfig(hidden_sizes=(16,), act_hidden_sizes=(8,),
               recurrent_hidden_size=8, recurrent_hidden_layers=1)


@pytest.mark.parametrize("space,act_check", [
    (Discrete(5), lambda a: (a.shape == (6, 1)
                             and (np.asarray(a) < 5).all())),
    (MultiDiscrete((3, 4, 2)), lambda a: a.shape == (6, 3)),
    (MultiBinary(4), lambda a: (a.shape == (6, 4)
                                and set(np.unique(np.asarray(a))) <= {0.0, 1.0})),
    (ShootTuple((3, 3, 3)), lambda a: a.shape == (6, 4)),
])
def test_policy_all_action_spaces(space, act_check):
    policy = PPOPolicy(CFG, obs_dim=15, act_space=space)
    params = policy.init_params(jax.random.PRNGKey(0))
    n = 6
    obs = jax.random.normal(jax.random.PRNGKey(1), (n, 15))
    h_a, h_c = policy.init_rnn_states(n)
    masks = jnp.ones((n, 1))
    values, actions, logp, h_a2, h_c2 = policy.get_actions(
        params, obs, h_a, h_c, masks, jax.random.PRNGKey(2))
    assert act_check(actions), actions.shape
    assert logp.shape == (n, 1) and np.isfinite(np.asarray(logp)).all()
    assert values.shape == (n, 1)

    # deterministic act
    a_det, _ = policy.act(params, obs, h_a, masks, deterministic=True)
    assert a_det.shape == actions.shape

    # training-path evaluation over a chunk
    L = 3
    obs_seq = jax.random.normal(jax.random.PRNGKey(3), (L, n, 15))
    acts_seq = jnp.stack([actions] * L)
    v, lp, ent = policy.evaluate_actions(params, obs_seq, h_a, h_c,
                                         acts_seq, jnp.ones((L, n, 1)))
    assert lp.shape == (L, n, 1) and np.isfinite(np.asarray(lp)).all()
    assert np.isfinite(np.asarray(ent)).all()


def test_box_path_unchanged():
    """The Box fast path must be identical whether built from act_dim or
    an explicit Box space."""
    p1 = PPOPolicy(CFG, obs_dim=10, act_dim=4)
    p2 = PPOPolicy(CFG, obs_dim=10, act_space=Box((4,)))
    params = p1.init_params(jax.random.PRNGKey(0))
    obs = jax.random.normal(jax.random.PRNGKey(1), (3, 10))
    h, _ = p1.init_rnn_states(3)
    m = jnp.ones((3, 1))
    a1, _ = p1.act(params, obs, h, m)
    a2, _ = p2.act(params, obs, h, m)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_shoot_prior_bands():
    """Prior pseudo-counts follow the reference's distance/angle bands
    (ppo_actor.py:41-49)."""
    obs = jnp.zeros((3, 15))
    obs = obs.at[:, 11].set(jnp.deg2rad(jnp.array([10.0, 30.0, 60.0])))
    obs = obs.at[:, 13].set(jnp.array([0.5, 1.0, 1.5]))  # 5km, 10km, 15km
    alpha0, beta0 = shoot_priors(obs)
    np.testing.assert_allclose(np.asarray(alpha0)[:, 0], [10.0, 6.0, 3.0])
    np.testing.assert_allclose(np.asarray(beta0)[:, 0], [3.0, 6.0, 10.0])


def test_multidiscrete_logprob_consistency():
    head = build_head(MultiDiscrete((3, 4)), gain=0.01)
    params = head.init(jax.random.PRNGKey(0), 8)
    feat = jax.random.normal(jax.random.PRNGKey(1), (5, 8))
    dist = head.dist(params, feat)
    a = dist.sample(jax.random.PRNGKey(2))
    lp = dist.log_prob(a)
    # log-prob of sampled action == sum of per-dim categorical log-probs
    manual = sum(d.log_prob(a[:, i:i + 1]) for i, d in enumerate(dist.dists))
    np.testing.assert_allclose(np.asarray(lp), np.asarray(manual), rtol=1e-6)
    assert (np.asarray(dist.entropy()) > 0).all()

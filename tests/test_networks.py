"""Network-layer tests: GRU chunk/step equivalence, mask resets, heads."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralplane_tpu.algorithms import networks as nets
from neuralplane_tpu.algorithms.rl_config import RLConfig
from neuralplane_tpu.algorithms.utils.distributions import DiagGaussian

CFG = RLConfig(hidden_sizes=(32, 32), act_hidden_sizes=(16,),
               recurrent_hidden_size=24, recurrent_hidden_layers=2)
SPEC = nets.NetSpec.from_config(CFG, obs_dim=10, act_dim=4)


@pytest.fixture(scope="module")
def params():
    key = jax.random.PRNGKey(0)
    return {"actor": nets.init_actor(key, SPEC),
            "critic": nets.init_critic(jax.random.PRNGKey(1), SPEC)}


def test_actor_shapes(params):
    n = 7
    obs = jax.random.normal(jax.random.PRNGKey(2), (n, 10))
    h = nets.init_rnn_state(n, SPEC)
    mask = jnp.ones((n, 1))
    mean, log_std, h2 = nets.actor_step(params["actor"], SPEC, obs, h, mask)
    assert mean.shape == (n, 4) and log_std.shape == (4,)
    assert h2.shape == (n, 2, 24)
    assert jnp.all(jnp.abs(mean) <= 1.0)  # tanh-squashed MuNet


def test_seq_equals_stepwise(params):
    """actor_seq over [T, N] must equal T sequential actor_step calls,
    including mid-sequence mask resets (the reference GRU's has_zeros
    segment-splitting semantics, gru.py:36-70)."""
    T, n = 6, 3
    key = jax.random.PRNGKey(3)
    obs = jax.random.normal(key, (T, n, 10))
    masks = jnp.ones((T, n, 1)).at[2, 1].set(0.0).at[4, 0].set(0.0)
    h0 = jax.random.normal(jax.random.PRNGKey(4), (n, 2, 24))

    mean_seq, _, hT_seq = nets.actor_seq(params["actor"], SPEC, obs, h0, masks)

    h = h0
    means = []
    for t in range(T):
        m, _, h = nets.actor_step(params["actor"], SPEC, obs[t], h, masks[t])
        means.append(m)
    np.testing.assert_allclose(np.asarray(mean_seq), np.asarray(jnp.stack(means)),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hT_seq), np.asarray(h), rtol=1e-5,
                               atol=1e-5)


def test_mask_reset_forgets_history(params):
    """With mask=0 at step t, output at t must not depend on earlier inputs."""
    n = 2
    obs1 = jax.random.normal(jax.random.PRNGKey(5), (n, 10))
    obs2 = jax.random.normal(jax.random.PRNGKey(6), (n, 10))
    h0 = nets.init_rnn_state(n, SPEC)
    ones = jnp.ones((n, 1))

    # path A: run obs1 then obs2 with reset mask
    _, _, h = nets.actor_step(params["actor"], SPEC, obs1, h0, ones)
    mean_a, _, _ = nets.actor_step(params["actor"], SPEC, obs2, h,
                                   jnp.zeros((n, 1)))
    # path B: fresh state directly on obs2
    mean_b, _, _ = nets.actor_step(params["actor"], SPEC, obs2, h0, ones)
    np.testing.assert_allclose(np.asarray(mean_a), np.asarray(mean_b),
                               rtol=1e-6, atol=1e-6)


def test_min_log_std_floor(params):
    """min_log_std clamps the Gaussian head's learnable log_std (the
    beyond-reference exploration floor); the default config is an exact
    identity (reference behavior)."""
    import dataclasses
    n = 5
    obs = jax.random.normal(jax.random.PRNGKey(3), (n, 10))
    h = nets.init_rnn_state(n, SPEC)
    mask = jnp.ones((n, 1))
    collapsed = dict(params["actor"], log_std=jnp.full((4,), -12.0))

    # default: no floor -> collapsed log_std passes through untouched
    _, log_std, _ = nets.actor_step(collapsed, SPEC, obs, h, mask)
    assert np.allclose(np.asarray(log_std), -12.0)

    spec_floor = nets.NetSpec.from_config(
        dataclasses.replace(CFG, min_log_std=-2.3), obs_dim=10, act_dim=4)
    _, log_std, _ = nets.actor_step(collapsed, spec_floor, obs, h, mask)
    assert np.allclose(np.asarray(log_std), -2.3)
    # values above the floor are untouched
    _, log_std, _ = nets.actor_step(params["actor"], spec_floor, obs, h, mask)
    assert np.allclose(np.asarray(log_std), 0.0)


def test_critic_value_shape(params):
    n = 5
    obs = jax.random.normal(jax.random.PRNGKey(7), (n, 10))
    h = nets.init_rnn_state(n, SPEC)
    v, h2 = nets.critic_step(params["critic"], SPEC, obs, h, jnp.ones((n, 1)))
    assert v.shape == (n, 1)


def test_diag_gaussian_logprob_entropy():
    mean = jnp.array([[0.0, 1.0]])
    log_std = jnp.array([0.0, jnp.log(2.0)])
    dist = DiagGaussian(mean, log_std)
    # log N(0|0,1) + log N(1|1,2)
    expect = -0.5 * np.log(2 * np.pi) + (-0.5 * np.log(2 * np.pi) - np.log(2.0))
    np.testing.assert_allclose(float(dist.log_prob(mean)[0, 0]), expect,
                               rtol=1e-5)
    expect_h = (0.5 * (1 + np.log(2 * np.pi))) * 2 + np.log(2.0)
    np.testing.assert_allclose(float(dist.entropy()[0, 0]), expect_h, rtol=1e-5)


def test_gru_matches_torch():
    """Our torch-convention GRU cell must match torch.nn.GRU numerically."""
    torch = pytest.importorskip("torch")
    d_in, hidden, layers, n = 10, 24, 2, 3
    p = nets._gru_init(jax.random.PRNGKey(8), d_in, hidden, layers)

    gru = torch.nn.GRU(d_in, hidden, layers)
    with torch.no_grad():
        for i, layer in enumerate(p["layers"]):
            getattr(gru, f"weight_ih_l{i}").copy_(
                torch.tensor(np.asarray(layer["w_ih"]).T))
            getattr(gru, f"weight_hh_l{i}").copy_(
                torch.tensor(np.asarray(layer["w_hh"]).T))
            getattr(gru, f"bias_ih_l{i}").copy_(
                torch.tensor(np.asarray(layer["b_ih"])))
            getattr(gru, f"bias_hh_l{i}").copy_(
                torch.tensor(np.asarray(layer["b_hh"])))

    x = np.random.default_rng(0).standard_normal((n, d_in)).astype(np.float32)
    h0 = np.random.default_rng(1).standard_normal(
        (layers, n, hidden)).astype(np.float32)
    with torch.no_grad():
        out_t, h_t = gru(torch.tensor(x).unsqueeze(0), torch.tensor(h0))

    # ours: h layout [N, L, H]
    _, h_j = nets._gru_step(p, jnp.asarray(x),
                            jnp.asarray(h0.transpose(1, 0, 2)),
                            jnp.ones((n, 1)))
    np.testing.assert_allclose(np.asarray(h_j).transpose(1, 0, 2),
                               h_t.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_j)[:, -1], out_t[0].numpy(),
                               rtol=1e-4, atol=1e-5)


def test_remat_save_dots_same_values_and_grads(params):
    """remat_save_dots only changes WHAT the BPTT backward stores, never
    values or gradients (NetSpec.remat_save_dots)."""
    import dataclasses
    spec_dots = dataclasses.replace(SPEC, remat_save_dots=True)
    T, n = 6, 5
    obs = jax.random.normal(jax.random.PRNGKey(9), (T, n, 10))
    masks = jnp.ones((T, n, 1))
    h0 = nets.init_rnn_state(n, SPEC)

    def loss(p, spec):
        mean, log_std, _ = nets.actor_seq(p, spec, obs, h0, masks)
        return (mean ** 2).sum() + log_std.sum()

    l0, g0 = jax.value_and_grad(lambda p: loss(p, SPEC))(params["actor"])
    l1, g1 = jax.value_and_grad(lambda p: loss(p, spec_dots))(params["actor"])
    assert float(l0) == pytest.approx(float(l1), rel=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        g0, g1)

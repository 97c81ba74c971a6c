"""Multi-device data-parallel training tests on the 8-device CPU mesh.

Validates the framework's parallelism model (SURVEY.md S2 P1-P3): env state
and rollout sharded over the 'dp' axis, policy replicated, gradients
all-reduced by XLA inside the jitted train step - the capability the
reference (single-GPU, one big batch) never had.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralplane_tpu.algorithms.rl_config import RLConfig
from neuralplane_tpu.envs import ControlEnv
from neuralplane_tpu.parallel import make_mesh, shard_env_state
from neuralplane_tpu.runner import F16SimRunner

pytestmark = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs 8 virtual devices")


def _sharded_on_dp(x) -> bool:
    s = x.sharding
    return getattr(s, "spec", None) is not None and s.spec and \
        s.spec[0] == "dp"


def test_sharded_collect_and_train(tmp_path):
    mesh = make_mesh()
    cfg = RLConfig(buffer_size=8, data_chunk_length=4, ppo_epoch=2,
                   num_mini_batch=1, hidden_sizes=(16,), act_hidden_sizes=(8,),
                   recurrent_hidden_size=8)
    env = ControlEnv(num_envs=16, config="heading")
    runner = F16SimRunner(env, cfg, run_dir=str(tmp_path), mesh=mesh)

    carry = runner._shard_carry(runner.init_carry(jax.random.PRNGKey(0)))
    assert _sharded_on_dp(carry.env_state.model.s)
    assert _sharded_on_dp(carry.obs)

    carry, batch, _ = runner.collect(runner.train_state.params, carry)
    # rollout arrays come out sharded on the batch axis (axis 1 of [T, N, d])
    assert np.isfinite(np.asarray(batch.obs)).all()
    # params stay replicated after a sharded train step
    metrics = runner.train(batch)
    for k, v in metrics.items():
        assert np.isfinite(v), k
    leaf = jax.tree_util.tree_leaves(runner.train_state.params)[0]
    assert leaf.sharding.is_fully_replicated

    # numerical parity: sharded vs single-device training must agree
    runner2 = F16SimRunner(env, cfg, run_dir=str(tmp_path / "s"))
    runner2.key = runner.key
    carry2, batch2, _ = runner2.collect(runner2.train_state.params,
                                        runner2.init_carry(
                                            jax.random.PRNGKey(0)))
    np.testing.assert_allclose(np.asarray(batch.rewards),
                               np.asarray(batch2.rewards), rtol=2e-4,
                               atol=2e-5)


def test_env_state_shard_roundtrip():
    mesh = make_mesh()
    env = ControlEnv(num_envs=16, config="heading")
    state, obs = env.reset(jax.random.PRNGKey(0))
    sharded = shard_env_state(state, mesh)
    assert _sharded_on_dp(sharded.model.s)
    # stepping a sharded state keeps it sharded and correct
    # (env.step donates its state arg; copy since state/sharded may share
    # replicated leaves like the PRNG key)
    state_copy = jax.tree.map(jnp.array, state)
    state2, out = env.step(sharded, jnp.zeros((env.n, 4)))
    ref_state, ref_out = env.step(state_copy, jnp.zeros((env.n, 4)))
    np.testing.assert_allclose(np.asarray(out.obs), np.asarray(ref_out.obs),
                               rtol=2e-4, atol=2e-5)


def test_selfplay_sharded_collect(tmp_path):
    from neuralplane_tpu.envs import SingleCombatEnv
    from neuralplane_tpu.runner import SelfplayRunner
    mesh = make_mesh()
    cfg = RLConfig(buffer_size=4, data_chunk_length=2, ppo_epoch=1,
                   num_mini_batch=1, hidden_sizes=(8,), act_hidden_sizes=(),
                   recurrent_hidden_size=4, save_interval=100)
    env = SingleCombatEnv(num_envs=8)  # n=16, n_ego=8: both divide 8 devices
    runner = SelfplayRunner(env, cfg, run_dir=str(tmp_path), mesh=mesh)
    carry = shard_env_state(runner.init_carry(jax.random.PRNGKey(0)), mesh)
    assert _sharded_on_dp(carry.env_state.model.s)
    assert _sharded_on_dp(carry.ego_obs)
    carry, batch, _ = runner.collect(runner.train_state.params,
                                     runner.opponent_params, carry)
    metrics = runner.train(batch)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k


def test_mappo_multiplecombat_sharded(tmp_path):
    """nvn team combat + MAPPO centralized critic, data-parallel over the
    mesh — the BASELINE.json "MultipleCombat nvn MAPPO sharded over >=2
    hosts" configuration, exercised on the 8-virtual-device fake cluster."""
    from neuralplane_tpu.envs import MultipleCombatEnv
    from neuralplane_tpu.runner import MAPPOSelfplayRunner
    mesh = make_mesh()
    cfg = RLConfig(buffer_size=4, data_chunk_length=2, ppo_epoch=1,
                   num_mini_batch=1, hidden_sizes=(8,), act_hidden_sizes=(),
                   recurrent_hidden_size=4, n_choose_opponents=1,
                   save_interval=100)
    env = MultipleCombatEnv(num_envs=4)  # 4 envs x 2v2 -> n=16, n_ego=8
    runner = MAPPOSelfplayRunner(env, cfg, run_dir=str(tmp_path), mesh=mesh)
    carry = shard_env_state(runner.init_carry(jax.random.PRNGKey(0)), mesh)
    assert _sharded_on_dp(carry.env_state.model.s)
    carry, batch, _ = runner.collect(runner.train_state.params,
                                     runner.opponent_params, carry)
    assert batch.share_obs.shape[-1] == 2 * env.num_observation
    metrics = runner.train(batch)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # the centralized-critic params stay replicated after the sharded update
    leaf = jax.tree_util.tree_leaves(runner.train_state.params)[0]
    assert leaf.sharding.is_fully_replicated


def _step_n(env, state, action, n_steps):
    """Step n times, returning (final state, last out); copies the input
    state first (env.step donates its argument)."""
    state = jax.tree.map(jnp.array, state)
    out = None
    for _ in range(n_steps):
        state, out = env.step(state, action)
    return state, out


def test_shoot_env_sharded_parity():
    """Weapon-layer sharding: the [n, K] missile slots (pos/vel/active/age),
    ammo and cooldown must step identically sharded vs single-device —
    dryrun-only coverage upgraded to asserted parity (evadable variant, so
    the graded-fuse path is the one exercised)."""
    from neuralplane_tpu.envs import SingleCombatShootEnv
    mesh = make_mesh()
    env = SingleCombatShootEnv(num_envs=8, config="selfplay_shoot_evadable")
    state, _ = env.reset(jax.random.PRNGKey(0))
    fire = jnp.concatenate([jnp.full((env.n, 4), 20.0),
                            jnp.ones((env.n, 1))], axis=1)

    sharded0 = shard_env_state(jax.tree.map(jnp.array, state), mesh)
    assert _sharded_on_dp(sharded0.missiles.pos)
    assert _sharded_on_dp(sharded0.ammo)
    sh, sh_out = _step_n(env, sharded0, fire, 6)
    ref, ref_out = _step_n(env, state, fire, 6)

    assert int(ref.missiles.active.sum()) > 0, "no missile in the air"
    np.testing.assert_array_equal(np.asarray(sh.missiles.active),
                                  np.asarray(ref.missiles.active))
    np.testing.assert_allclose(np.asarray(sh.missiles.pos),
                               np.asarray(ref.missiles.pos),
                               rtol=2e-4, atol=2e-3)
    np.testing.assert_array_equal(np.asarray(sh.ammo), np.asarray(ref.ammo))
    np.testing.assert_allclose(np.asarray(sh.cooldown),
                               np.asarray(ref.cooldown), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sh_out.obs),
                               np.asarray(ref_out.obs), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(sh_out.reward),
                               np.asarray(ref_out.reward), rtol=2e-4,
                               atol=2e-4)
    # stepped state stays sharded on dp
    assert _sharded_on_dp(sh.missiles.pos)


def test_team_shoot_mappo_sharded(tmp_path):
    """MultipleCombatShootEnv (missile slots + locked-victim indices) under
    the MAPPO runner on the mesh: sharded==single parity for the weapon
    state plus a finite sharded train step."""
    from neuralplane_tpu.envs import MultipleCombatShootEnv
    from neuralplane_tpu.runner import MAPPOSelfplayRunner
    mesh = make_mesh()
    env = MultipleCombatShootEnv(num_envs=4)  # 4 envs x 2v2 -> n=16
    state, _ = env.reset(jax.random.PRNGKey(1))
    fire = jnp.concatenate([jnp.full((env.n, 4), 20.0),
                            jnp.ones((env.n, 1))], axis=1)
    sharded0 = shard_env_state(jax.tree.map(jnp.array, state), mesh)
    assert _sharded_on_dp(sharded0.missile_target)
    sh, _ = _step_n(env, sharded0, fire, 6)
    ref, _ = _step_n(env, state, fire, 6)
    assert int(ref.missiles.active.sum()) > 0
    np.testing.assert_array_equal(np.asarray(sh.missile_target),
                                  np.asarray(ref.missile_target))
    np.testing.assert_array_equal(np.asarray(sh.missiles.active),
                                  np.asarray(ref.missiles.active))
    np.testing.assert_allclose(np.asarray(sh.blood), np.asarray(ref.blood),
                               rtol=2e-4, atol=2e-3)

    cfg = RLConfig(buffer_size=4, data_chunk_length=2, ppo_epoch=1,
                   num_mini_batch=1, hidden_sizes=(8,), act_hidden_sizes=(),
                   recurrent_hidden_size=4, n_choose_opponents=1,
                   use_prior=True, save_interval=100)
    runner = MAPPOSelfplayRunner(env, cfg, run_dir=str(tmp_path), mesh=mesh)
    # layout-aware Beta prior threads through to the composed PPO actor
    assert runner.policy._pp.prior_slots == env.shoot_prior_slots
    carry = shard_env_state(runner.init_carry(jax.random.PRNGKey(2)), mesh)
    carry, batch, _ = runner.collect(runner.train_state.params,
                                     runner.opponent_params, carry)
    metrics = runner.train(batch)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k

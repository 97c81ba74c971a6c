"""End-to-end runner test: collect + train on the heading env (tiny sizes)."""
import jax
import jax.numpy as jnp
import numpy as np

from neuralplane_tpu.algorithms.rl_config import RLConfig
from neuralplane_tpu.envs import ControlEnv
from neuralplane_tpu.runner import F16SimRunner


def test_collect_and_train(tmp_path):
    cfg = RLConfig(buffer_size=8, data_chunk_length=4, ppo_epoch=2,
                   num_mini_batch=1, hidden_sizes=(16,), act_hidden_sizes=(8,),
                   recurrent_hidden_size=8, n_rollout_threads=4,
                   num_env_steps=8 * 4, log_interval=1, save_interval=10)
    env = ControlEnv(num_envs=4, config="heading")
    runner = F16SimRunner(env, cfg, run_dir=str(tmp_path))

    carry = runner.init_carry(jax.random.PRNGKey(0))
    carry, batch, (done_count, counters) = runner.collect(
        runner.train_state.params, carry)
    # per-condition on-device termination counters surface through collect
    assert any(k.startswith("termination/") for k in counters)

    T, n = cfg.buffer_size, env.n
    assert batch.obs.shape == (T + 1, n, env.num_observation)
    assert batch.actions.shape == (T, n, env.num_actions)
    assert batch.value_preds.shape == (T + 1, n, 1)
    assert np.isfinite(np.asarray(batch.obs)).all()
    assert np.isfinite(np.asarray(batch.rewards)).all()

    metrics = runner.train(batch)
    for k, v in metrics.items():
        assert np.isfinite(v), f"non-finite {k}"

    # masks are 1 - done_env of the PREVIOUS step (parity with insert())
    assert np.all((np.asarray(batch.masks) == 0) | (np.asarray(batch.masks) == 1))


def test_checkpoint_roundtrip(tmp_path):
    cfg = RLConfig(buffer_size=4, data_chunk_length=2, ppo_epoch=1,
                   hidden_sizes=(8,), act_hidden_sizes=(),
                   recurrent_hidden_size=4)
    env = ControlEnv(num_envs=2, config="heading")
    runner = F16SimRunner(env, cfg, run_dir=str(tmp_path / "a"))
    path = runner.save("latest")

    runner2 = F16SimRunner(env, cfg, run_dir=str(tmp_path / "b"),
                           model_dir=path)
    for a, b in zip(jax.tree_util.tree_leaves(runner.train_state.params),
                    jax.tree_util.tree_leaves(runner2.train_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eval_runs(tmp_path):
    cfg = RLConfig(buffer_size=4, data_chunk_length=2, hidden_sizes=(8,),
                   act_hidden_sizes=(), recurrent_hidden_size=4)
    env = ControlEnv(num_envs=2, config="heading")
    runner = F16SimRunner(env, cfg, run_dir=str(tmp_path))
    out = runner.eval(num_steps=8)
    assert np.isfinite(out["eval_average_episode_rewards"])


def test_render_index_resolution(tmp_path):
    """--render-index/--render-opponent-index resolve pool entries inside a
    run dir (reference config.py:284-285 semantics)."""
    from neuralplane_tpu.scripts.render import _resolve_pool_ckpt
    (tmp_path / "actor_3.pkl").write_bytes(b"x")
    (tmp_path / "state_latest.pkl").write_bytes(b"x")
    assert _resolve_pool_ckpt(str(tmp_path), "3").endswith("actor_3.pkl")
    assert _resolve_pool_ckpt(str(tmp_path),
                              "latest").endswith("state_latest.pkl")
    import pytest as _pytest
    with _pytest.raises(FileNotFoundError):
        _resolve_pool_ckpt(str(tmp_path), "99")

"""PlanningEnv (hierarchical control) + MAPPO runner tests."""
import jax
import jax.numpy as jnp
import numpy as np

from neuralplane_tpu.algorithms.rl_config import RLConfig
from neuralplane_tpu.envs import MultipleCombatEnv, PlanningEnv
from neuralplane_tpu.runner import MAPPOSelfplayRunner


def test_planning_env_inner_loop():
    env = PlanningEnv(num_envs=2)
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (2, 22)
    assert env.num_actions == 3
    state, out = env.step(state, jnp.zeros((env.n, 3)))
    # 50 low-level steps per high-level step (planning_env.py:153)
    assert (np.asarray(state.env.step_count) == 50).all()
    assert np.isfinite(np.asarray(out.obs)).all()
    assert np.isfinite(np.asarray(out.reward)).all()


def test_planning_env_frozen_rows_roll_back():
    env = PlanningEnv(num_envs=2)
    state, _ = env.reset(jax.random.PRNGKey(1))
    # poison one row's flags: after the next step its state must have been
    # frozen during the inner loop, then auto-reset at the following step
    state = state.replace(env=state.env.replace(
        bad_done=state.env.bad_done.at[0].set(True)))
    state2, _ = env.step(state, jnp.zeros((env.n, 3)))
    # row 0 was auto-reset at the top of step, so it flew 50 fresh steps
    assert int(state2.env.step_count[0]) == 50
    assert np.isfinite(np.asarray(state2.env.model.s)).all()


def test_mappo_runner_collect_train(tmp_path):
    cfg = RLConfig(buffer_size=8, data_chunk_length=4, ppo_epoch=2,
                   num_mini_batch=1, hidden_sizes=(16,), act_hidden_sizes=(8,),
                   recurrent_hidden_size=8, n_choose_opponents=1,
                   save_interval=100, log_interval=1)
    env = MultipleCombatEnv(num_envs=2)  # 2v2
    runner = MAPPOSelfplayRunner(env, cfg, run_dir=str(tmp_path))
    carry = runner.init_carry(jax.random.PRNGKey(0))
    carry, batch, _ = runner.collect(runner.train_state.params,
                                     runner.opponent_params, carry)
    # centralized obs = 2 ego agents x 15 dims
    assert batch.share_obs.shape == (9, runner.n_ego, 60)
    assert batch.active_masks.shape == (9, runner.n_ego, 1)
    metrics = runner.train(batch)
    for k, v in metrics.items():
        assert np.isfinite(v), f"non-finite {k}"

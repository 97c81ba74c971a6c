"""Combat env + self-play runner tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralplane_tpu.algorithms.rl_config import RLConfig
from neuralplane_tpu.algorithms.selfplay import choose_opponent, elo_update
from neuralplane_tpu.envs import MultipleCombatEnv, SingleCombatEnv
from neuralplane_tpu.runner import SelfplayRunner


def test_combat_obs_shape_and_symmetry():
    env = SingleCombatEnv(num_envs=3)
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (6, 15)
    assert np.isfinite(np.asarray(obs)).all()
    o = np.asarray(obs)
    # paired slots: delta_altitude of ego == -delta_altitude of its enemy
    np.testing.assert_allclose(o[0::2, 10], -o[1::2, 10], atol=1e-5)
    # relative distance identical within a pair
    np.testing.assert_allclose(o[0::2, 13], o[1::2, 13], rtol=1e-5)
    # AO/TA complementarity: AO_enm == pi - TA_ego
    np.testing.assert_allclose(o[1::2, 11], np.pi - o[0::2, 12], atol=1e-5)


def test_combat_step_blood_and_reset():
    env = SingleCombatEnv(num_envs=2)
    state, obs = env.reset(jax.random.PRNGKey(1))
    for _ in range(10):
        state, out = env.step(state, jnp.zeros((env.n, 4)))
    assert np.isfinite(np.asarray(out.obs)).all()
    assert np.isfinite(np.asarray(out.reward)).all()
    # posture reward is 0.01 * orientation * range, bounded
    assert (np.abs(np.asarray(out.reward)) < 1.0).all()
    assert (np.asarray(state.blood) <= 100.0).all()
    assert (np.asarray(state.step_count) == 10).all()

    # force a shutdown -> whole env group resets next step
    state = state.replace(blood=state.blood.at[0].set(-1.0))
    state, out = env.step(state, jnp.zeros((env.n, 4)))
    state2, _ = env.step(state, jnp.zeros((env.n, 4)))
    assert int(state2.step_count[0]) == 1  # group 0 was reset
    assert float(state2.blood[0]) == 100.0
    assert int(state2.step_count[2]) == 12  # group 1 kept flying


def test_symmetric_side_flag_option():
    """symmetric_side_flag=True hands every agent its OWN-convention side
    flag (obs slot 14): identical on ego rows, and on enemy rows equal to
    what that agent would compute as ego - i.e. the flag the pair (enm,
    ego) produces on ITS ego row. Default config must keep the reference
    role-swapped convention (singlecombat_env.py:118-125)."""
    import dataclasses
    from neuralplane_tpu.utils.config import load_config

    cfg_sym = dataclasses.replace(load_config("selfplay"),
                                  symmetric_side_flag=True)
    env_ref = SingleCombatEnv(num_envs=4)
    env_sym = SingleCombatEnv(num_envs=4, config=cfg_sym)

    state, obs_ref = env_ref.reset(jax.random.PRNGKey(7))
    xdot = env_ref.model.extended_state(state.model)
    obs_sym = env_sym._obs(state, xdot)
    o_ref, o_sym = np.asarray(obs_ref), np.asarray(obs_sym)
    # everything except the side flag identical; ego rows fully identical
    np.testing.assert_allclose(o_ref[:, :14], o_sym[:, :14], atol=1e-6)
    np.testing.assert_allclose(o_ref[0::2, 14], o_sym[0::2, 14])
    # enemy rows under the symmetric convention = own-convention cross:
    # sign(v_enm x (pos_ego - pos_enm)) on the horizontal plane
    s = np.asarray(state.model.s)
    v = np.asarray(xdot[:, :3])
    dpos = s[0::2, :3] - s[1::2, :3]          # ego - enm
    own = np.sign(v[1::2, 0] * dpos[:, 1] - v[1::2, 1] * dpos[:, 0])
    np.testing.assert_allclose(o_sym[1::2, 14], own)
    # and the reference convention role-swaps it (ego velocity instead)
    swapped = np.sign(v[0::2, 0] * dpos[:, 1] - v[0::2, 1] * dpos[:, 0])
    np.testing.assert_allclose(o_ref[1::2, 14], swapped)


def test_multiple_combat_runs():
    env = MultipleCombatEnv(num_envs=2)  # 2v2 -> 8 agents
    state, obs = env.reset(jax.random.PRNGKey(2))
    # team layout: 9 ego + 7 teammate + 2x7 enemies (nvn redesign)
    assert obs.shape == (8, 30)
    state, out = env.step(state, jnp.zeros((env.n, 4)))
    assert np.isfinite(np.asarray(out.obs)).all()


def test_selfplay_algorithms():
    rng = np.random.default_rng(0)
    pool = {"0": 1000.0, "1": 1040.0, "2": 960.0}
    assert choose_opponent("sp", pool, rng) == "2"  # latest key
    picks = {choose_opponent("fsp", pool, rng) for _ in range(50)}
    assert picks == set(pool)
    pick = choose_opponent("pfsp", pool, rng)
    assert pick in pool

    ego, opp = elo_update(1000.0, np.array([1000.0]), np.array([500.0]),
                          np.array([100.0]))
    assert ego > 1000.0 and opp[0] < 1000.0  # ego won -> gains ELO
    assert ego - 1000.0 == pytest.approx(1000.0 - opp[0])  # zero-sum

    # standard-ELO asymmetry (the reference formula inverts this,
    # selfplay_F16sim_runner.py:229-233): a favorite's expected win pays
    # little; the same favorite LOSING an upset costs a lot
    fav_win, _ = elo_update(1400.0, np.array([1000.0]),
                            np.array([500.0]), np.array([100.0]))
    fav_lose, _ = elo_update(1400.0, np.array([1000.0]),
                             np.array([100.0]), np.array([500.0]))
    assert 0.0 < fav_win - 1400.0 < 5.0       # ~ +2.9
    assert -32.0 < fav_lose - 1400.0 < -25.0  # ~ -29


def test_selfplay_runner_collect_train(tmp_path):
    cfg = RLConfig(buffer_size=8, data_chunk_length=4, ppo_epoch=2,
                   num_mini_batch=1, hidden_sizes=(16,), act_hidden_sizes=(8,),
                   recurrent_hidden_size=8, n_choose_opponents=1,
                   num_env_steps=8 * 4, save_interval=100, log_interval=1)
    env = SingleCombatEnv(num_envs=4)
    runner = SelfplayRunner(env, cfg, run_dir=str(tmp_path))
    carry = runner.init_carry(jax.random.PRNGKey(0))
    carry, batch, _ = runner.collect(runner.train_state.params,
                                     runner.opponent_params, carry)
    assert batch.obs.shape == (9, runner.n_ego, env.num_observation)
    assert np.isfinite(np.asarray(batch.obs)).all()
    metrics = runner.train(batch)
    for k, v in metrics.items():
        assert np.isfinite(v), f"non-finite {k}"

    # pool snapshot + opponent re-sampling work end to end
    runner._save_pool_entry("1")
    names = runner.reset_opponent()
    assert len(names) == 1 and all(n in runner.policy_pool for n in names)

    out = runner.eval_elo(num_steps=8)
    assert np.isfinite(out["latest_elo"])


def test_eval_elo_per_episode_protocol(tmp_path, monkeypatch):
    """ELO eval compares PER-EPISODE average rewards over completed
    episodes (reference `selfplay_F16sim_runner.py:197-228`), not slice
    sums: with a horizon too short for any episode to complete, the match
    must score as a tie (rating unchanged) rather than comparing partial
    cumulative sums."""
    import neuralplane_tpu.runner.selfplay as rsp
    captured = {}
    orig = rsp.elo_update

    def spy(ego_elo, opp_elo, ego_rew, opp_rew, **kw):
        captured.update(ego=np.asarray(ego_rew), opp=np.asarray(opp_rew),
                        kw=kw)
        return orig(ego_elo, opp_elo, ego_rew, opp_rew, **kw)
    monkeypatch.setattr(rsp, "elo_update", spy)

    cfg = RLConfig(buffer_size=8, data_chunk_length=4, ppo_epoch=1,
                   num_mini_batch=1, hidden_sizes=(16,),
                   act_hidden_sizes=(8,), recurrent_hidden_size=8,
                   n_choose_opponents=1, num_env_steps=8,
                   save_interval=100, log_interval=1, elo_tie_band=1.0)
    env = SingleCombatEnv(num_envs=4)
    runner = SelfplayRunner(env, cfg, run_dir=str(tmp_path))
    out = runner.eval_elo(num_steps=4)
    # 4 steps: no combat episode can complete -> zero episodes, zero
    # per-episode averages, tie, rating unchanged
    assert out["eval_episodes_ended"] == 0.0
    assert captured["ego"] == pytest.approx(0.0)
    assert captured["opp"] == pytest.approx(0.0)
    assert captured["kw"]["tie_band"] == 1.0
    assert out["latest_elo"] == 1000.0


def test_eval_elo_honors_eval_env(tmp_path):
    """ELO eval plays on the dedicated eval env (reference evaluates on
    eval_envs, `selfplay_F16sim_runner.py:156-241`): with an eval env of a
    DIFFERENT num_envs than training, eval_elo must size its split/slice
    helpers from the eval env and leave the training env untouched."""
    cfg = RLConfig(buffer_size=8, data_chunk_length=4, ppo_epoch=1,
                   num_mini_batch=1, hidden_sizes=(16,),
                   act_hidden_sizes=(8,), recurrent_hidden_size=8,
                   n_choose_opponents=1, num_env_steps=8,
                   save_interval=100, log_interval=1, elo_tie_band=1.0)
    env = SingleCombatEnv(num_envs=4)
    eval_env = SingleCombatEnv(num_envs=2)
    runner = SelfplayRunner(env, cfg, run_dir=str(tmp_path),
                            eval_env=eval_env)
    out = runner.eval_elo(num_steps=6)
    assert np.isfinite(out["latest_elo"])
    # training rollout still shaped by the training env afterwards
    carry = runner.init_carry(jax.random.PRNGKey(0))
    carry, batch, _ = runner.collect(runner.train_state.params,
                                     runner.opponent_params, carry)
    assert batch.obs.shape[1] == env.num_envs * env.num_agents // 2


def test_eval_elo_stochastic_protocol(tmp_path):
    """--eval-stochastic (beyond reference) samples BOTH sides in ELO eval
    matches; the deterministic default is the reference protocol. Both
    protocols must run end-to-end on the same config shape."""
    cfg = RLConfig(buffer_size=8, data_chunk_length=4, ppo_epoch=1,
                   num_mini_batch=1, hidden_sizes=(16,),
                   act_hidden_sizes=(8,), recurrent_hidden_size=8,
                   n_choose_opponents=1, num_env_steps=8,
                   save_interval=100, log_interval=1, elo_tie_band=1.0,
                   eval_stochastic=True)
    env = SingleCombatEnv(num_envs=4)
    runner = SelfplayRunner(env, cfg, run_dir=str(tmp_path))
    out = runner.eval_elo(num_steps=8)
    assert np.isfinite(out["latest_elo"])

    det = SelfplayRunner(env, cfg.replace(eval_stochastic=False),
                         run_dir=str(tmp_path / "det"))
    out_det = det.eval_elo(num_steps=8)
    assert np.isfinite(out_det["latest_elo"])


def test_selfplay_pool_survives_resume(tmp_path):
    """Supervisor leg restarts must not lose the opponent pool: a runner
    resumed with --model-dir imports the previous run's actor_*.pkl entries
    and continues pool numbering after them."""
    cfg = RLConfig(buffer_size=8, data_chunk_length=4, ppo_epoch=1,
                   num_mini_batch=1, hidden_sizes=(16,),
                   act_hidden_sizes=(8,), recurrent_hidden_size=8,
                   n_choose_opponents=1, num_env_steps=8,
                   save_interval=100, log_interval=1)
    env = SingleCombatEnv(num_envs=2)
    r1 = SelfplayRunner(env, cfg, run_dir=str(tmp_path / "leg0"))
    r1._save_pool_entry("1")
    r1._save_pool_entry("2")
    # ELO state accrued during leg 0: the ego rating and per-entry pool
    # ratings must survive the restart (they drive PFSP's strength-weighted
    # sampling), not re-enter flattened at init_elo
    r1.latest_elo = 1234.5
    r1.policy_pool["1"] = 987.0
    r1.policy_pool["2"] = 1111.0
    ckpt = r1.save("latest")

    r2 = SelfplayRunner(env, cfg, run_dir=str(tmp_path / "leg1"),
                        model_dir=ckpt)
    assert set(r2.policy_pool) >= {"0", "1", "2"}
    assert r2._next_pool_name() == "3"
    assert r2.latest_elo == 1234.5
    assert r2.policy_pool["1"] == 987.0
    assert r2.policy_pool["2"] == 1111.0
    # imported entries are loadable for opponent stacking
    r2.opponent_params = r2._stack_opponents(["1"])
    out = r2.eval_elo(num_steps=4)
    assert np.isfinite(out["latest_elo"])

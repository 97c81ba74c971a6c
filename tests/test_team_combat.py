"""nvn team-combat unit tests vs hand-computed 2v2 geometry.

The reference's MultipleCombatEnv never implemented team obs/reward (its own
`todo: 仅适用于1v1` at `envs/multiplecombat_env.py:67`); this suite pins down
the team game this framework implements instead: all-pairs geometry equal to
the pairwise reference helpers, the 9+7*(h-1)+7*h obs layout against
hand-computed values, nearest-alive-threat damage, mid-episode death
(frozen state, zeroed blocks, active flags, masked terminations), and the
team-wipe win/lose split.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralplane_tpu.envs import MultipleCombatEnv
from neuralplane_tpu.utils.math import (distance_fn, get2d_AO_TA_R,
                                        get_AO_TA_R, orientation_fn,
                                        orientation_reward, range_reward)

FT = 0.3048


@pytest.fixture(scope="module")
def env():
    return MultipleCombatEnv(num_envs=2)


def test_all_pairs_matches_pairwise_reference_helper(env):
    """[E,m,m] all-pairs geometry == get_AO_TA_R evaluated pair by pair."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    E, m = 2, env.num_agents
    pos = jax.random.uniform(k1, (E, m, 3), minval=-5000, maxval=5000)
    vel = jax.random.uniform(k2, (E, m, 3), minval=-500, maxval=500)
    for planar in (False, True):
        fn = get2d_AO_TA_R if planar else get_AO_TA_R
        AO, TA, R, side = env._all_pairs(pos, vel, planar=planar)
        for e in range(E):
            for i in range(m):
                for j in range(m):
                    if i == j:
                        continue
                    ao, ta, r, sd = fn(pos[e, i][None], pos[e, j][None],
                                       vel[e, i][None], vel[e, j][None],
                                       return_side=True)
                    np.testing.assert_allclose(AO[e, i, j], ao[0],
                                               rtol=1e-4, atol=1e-5)
                    np.testing.assert_allclose(TA[e, i, j], ta[0],
                                               rtol=1e-4, atol=1e-5)
                    np.testing.assert_allclose(R[e, i, j], r[0], rtol=1e-4)
                    np.testing.assert_allclose(side[e, i, j], sd[0])


def _crafted_state(env, positions, vts, headings):
    """Reset, then pin group-0 aircraft to hand-chosen (npos, epos, alt),
    vt and heading; zero roll/pitch/alpha/beta so body x-velocity == vt."""
    state, _ = env.reset(jax.random.PRNGKey(0))
    s = np.asarray(state.model.s).copy()
    for i, (p, vt, psi) in enumerate(zip(positions, vts, headings)):
        s[i, 0:3] = p
        s[i, 3:6] = [0.0, 0.0, psi]
        s[i, 6:9] = [vt, 0.0, 0.0]
        s[i, 9:12] = 0.0
    return state.replace(model=state.model.replace(s=jnp.asarray(s)))


def test_team_obs_layout_hand_computed(env):
    """2v2 obs blocks against hand-computed geometry: ego 9, teammate 7,
    enemies 7+7 nearest-first."""
    h = env.half
    assert env.num_observation == 9 + 7 * (h - 1) + 7 * h == 30
    # group 0: a0/a1 = ego team, a2/a3 = enemies. a2 is a0's NEAREST enemy.
    pos = [(0.0, 0.0, 10000.0), (0.0, 2000.0, 10500.0),
           (5000.0, 0.0, 10000.0), (20000.0, 0.0, 12000.0)]
    vts = [1000.0, 1100.0, 1050.0, 900.0]
    psis = [0.0, 0.0, np.pi, np.pi]       # ego north, enemies south
    state = _crafted_state(env, pos, vts, psis)
    xdot = env.model.extended_state(state.model)
    obs = np.asarray(env._obs(state, xdot)).reshape(env.num_envs,
                                                    env.num_agents, -1)
    o0 = obs[0, 0]
    # ego block (singlecombat_env.py:89-99 normalizations)
    np.testing.assert_allclose(o0[0], 10000.0 * FT / 5000.0, rtol=1e-5)
    np.testing.assert_allclose(o0[1:5], [0.0, 1.0, 0.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(o0[5], 1000.0 * FT / 340.0, rtol=1e-4)
    np.testing.assert_allclose(o0[8], 1000.0 * FT / 340.0, rtol=1e-5)

    vel = np.asarray(xdot[:, :3])         # ENU ground velocity
    # teammate block: a1 (delta_vx uses BODY x-velocity, = vt here)
    ao, ta, r, sd = get2d_AO_TA_R(jnp.asarray(pos[0])[None],
                                  jnp.asarray(pos[1])[None],
                                  jnp.asarray(vel[0])[None],
                                  jnp.asarray(vel[1])[None],
                                  return_side=True)
    expect_mate = [(1100.0 - 1000.0) * FT / 340.0,
                   (10500.0 - 10000.0) * FT / 1000.0,
                   float(ao[0]), float(ta[0]),
                   float(r[0]) * FT / 10000.0, float(sd[0]), 1.0]
    np.testing.assert_allclose(o0[9:16], expect_mate, rtol=1e-4, atol=1e-5)

    # enemy blocks: nearest first -> a2 (R=5000) then a3
    ao2, ta2, r2, sd2 = get2d_AO_TA_R(jnp.asarray(pos[0])[None],
                                      jnp.asarray(pos[2])[None],
                                      jnp.asarray(vel[0])[None],
                                      jnp.asarray(vel[2])[None],
                                      return_side=True)
    expect_e1 = [(1050.0 - 1000.0) * FT / 340.0, 0.0,
                 float(ao2[0]), float(ta2[0]),
                 float(r2[0]) * FT / 10000.0, float(sd2[0]), 1.0]
    np.testing.assert_allclose(o0[16:23], expect_e1, rtol=1e-4, atol=1e-5)
    # a0 flies north straight at a2 flying south at it: AO=0, TA=pi
    np.testing.assert_allclose(o0[18], 0.0, atol=1e-3)
    np.testing.assert_allclose(o0[19], np.pi, atol=1e-3)
    # second enemy block is a3: delta_alt = +2000 ft
    np.testing.assert_allclose(o0[23], (900.0 - 1000.0) * FT / 340.0,
                               rtol=1e-4)
    np.testing.assert_allclose(o0[24], 2000.0 * FT / 1000.0, rtol=1e-4)
    np.testing.assert_allclose(o0[29], 1.0)


def test_nearest_threat_damage_and_team_reward(env):
    """a0 nose-on 500 ft behind a2: only a2 takes damage in group 0; both
    ego agents share one team reward, both enemies share another."""
    pos = [(0.0, 0.0, 10000.0), (0.0, 8000.0, 10000.0),
           (500.0, 0.0, 10000.0), (20000.0, 8000.0, 10000.0)]
    vts = [1000.0, 1000.0, 1000.0, 1000.0]
    psis = [0.0, 0.0, 0.0, 0.0]           # all north: a0 chases a2
    state = _crafted_state(env, pos, vts, psis)
    state, out = env.step(state, jnp.zeros((env.n, 4)))
    blood = np.asarray(state.blood)
    # a2 is hit (nose-on inside 1 km: orientation_fn≈1 * distance_fn=1)
    assert blood[2] < 99.5
    # nobody else in group 0 is within 3 km of a threat
    np.testing.assert_allclose(blood[[0, 1, 3]], 100.0)
    rew = np.asarray(out.reward)
    assert rew[0] == rew[1] and rew[2] == rew[3]
    # attacker team's posture (nose-on, close) beats the victim team's
    assert rew[0] > rew[2]
    assert not bool(np.asarray(out.done | out.bad_done)[:4].any())


def test_death_freezes_agent_and_masks_terminations(env):
    pos = [(0.0, 0.0, 10000.0), (0.0, 8000.0, 10000.0),
           (9000.0, 0.0, 10000.0), (20000.0, 8000.0, 10000.0)]
    state = _crafted_state(env, pos, [1000.0] * 4, [0.0] * 4)
    # kill a1 and park its corpse BELOW the altitude limit
    s = np.asarray(state.model.s).copy()
    s[1, 2] = 1000.0
    state = state.replace(model=state.model.replace(s=jnp.asarray(s)),
                          blood=state.blood.at[1].set(0.0))
    s_dead = np.asarray(state.model.s[1]).copy()
    state, out = env.step(state, jnp.zeros((env.n, 4)))
    # frozen exactly where it died; low-altitude does NOT fire for a corpse
    np.testing.assert_allclose(np.asarray(state.model.s[1]), s_dead)
    assert not bool(np.asarray(out.bad_done)[:4].any())
    assert np.asarray(out.active)[:4].tolist() == [1.0, 0.0, 1.0, 1.0]
    # obs: a0's teammate block zeroed with alive=0
    o0 = np.asarray(out.obs).reshape(env.num_envs, env.num_agents, -1)[0, 0]
    np.testing.assert_allclose(o0[9:16], 0.0, atol=1e-6)

    # wipe the ego team -> losers bad_done, winners done, +-200 event
    state = state.replace(blood=state.blood.at[0].set(0.0))
    state, out = env.step(state, jnp.zeros((env.n, 4)))
    assert np.asarray(out.bad_done)[:2].all()
    assert np.asarray(out.done)[2:4].all()
    rew = np.asarray(out.reward)
    assert rew[0] < -190 and rew[2] > 190
    # group 1 untouched
    assert not bool(np.asarray(out.done | out.bad_done)[4:].any())


def test_group_reset_revives_team(env):
    state, _ = env.reset(jax.random.PRNGKey(1))
    state = state.replace(blood=state.blood.at[0].set(0.0),
                          is_done=state.is_done.at[0].set(True))
    state, out = env.step(state, jnp.zeros((env.n, 4)))
    # masked group reset restored full blood before stepping
    assert float(state.blood[0]) > 0.0
    assert np.asarray(out.active)[:4].tolist() == [1.0] * 4


def test_single_combat_unchanged():
    """The 1v1 env keeps its 15-dim obs and pairwise semantics."""
    from neuralplane_tpu.envs import SingleCombatEnv
    env = SingleCombatEnv(num_envs=2)
    assert env.num_observation == 15
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (4, 15)
    _, out = env.step(state, jnp.zeros((4, 4)))
    assert out.obs.shape == (4, 15) and out.active is None


def test_vec_wrapper_over_team_env():
    """The GPUVecEnv-analogue host wrapper speaks the [N, M, dim] contract
    over the team env too (reference wraps combat envs the same way,
    `scripts/train/train_F16sim.py:23-54`)."""
    from neuralplane_tpu.envs.wrappers import GymVecEnv
    env = MultipleCombatEnv(num_envs=2)
    vec = GymVecEnv(env, seed=0)
    obs = vec.reset()
    assert obs.shape == (2, 4, env.num_observation)
    out = vec.step(np.zeros((2, 4, 4), np.float32))
    obs, reward, done, bad_done, exceed, info = out
    assert obs.shape == (2, 4, env.num_observation)
    assert reward.shape == (2, 4, 1) or reward.shape == (2, 4)
    assert np.isfinite(obs).all()


def test_mappo_active_masks_record_death(tmp_path):
    """A mid-episode death must appear as active_masks = 0 for that agent
    in the collected MAPPO batch (SharedReplayBuffer active_masks
    semantics) while the env group keeps running."""
    from neuralplane_tpu.algorithms.rl_config import RLConfig
    from neuralplane_tpu.runner import MAPPOSelfplayRunner

    cfg = RLConfig(buffer_size=4, data_chunk_length=4, ppo_epoch=1,
                   num_mini_batch=1, hidden_sizes=(16,),
                   act_hidden_sizes=(8,), recurrent_hidden_size=8,
                   n_choose_opponents=1)
    env = MultipleCombatEnv(num_envs=2)
    runner = MAPPOSelfplayRunner(env, cfg, run_dir=str(tmp_path))
    carry = runner.init_carry(jax.random.PRNGKey(0))
    # place group 0 far from any termination, then kill ego agent 1
    pos = [(0.0, 0.0, 10000.0), (0.0, 8000.0, 10000.0),
           (9000.0, 0.0, 10000.0), (20000.0, 8000.0, 10000.0)]
    s = np.asarray(carry.env_state.model.s).copy()
    for i, p in enumerate(pos):
        s[i, 0:3] = p
        s[i, 3:6] = 0.0
        s[i, 6:9] = [1000.0, 0.0, 0.0]
        s[i, 9:12] = 0.0
    env_state = carry.env_state.replace(
        model=carry.env_state.model.replace(s=jnp.asarray(s)),
        blood=carry.env_state.blood.at[1].set(0.0))
    carry = carry.replace(env_state=env_state)

    carry, batch, _ = runner.collect(runner.train_state.params,
                                     runner.opponent_params, carry)
    am = np.asarray(batch.active_masks)     # [T+1, n_ego, 1]
    # ego agent index 1 of group 0 is dead from step 1 onward (step 0's
    # active_masks predate the kill becoming visible)
    assert am[0, 1, 0] == 1.0
    assert (am[1:, 1, 0] == 0.0).all()
    # everyone else stays active (their groups hit no termination)
    assert am[:, 0, 0].all() and am[:, 2:, 0].all()
    # the trainer consumes the batch without issue
    metrics = runner.train(batch)
    for k, v in metrics.items():
        assert np.isfinite(v), k


def test_ladder_probe_head_to_head(tmp_path):
    """The evidence tool (tools/ladder_probe.py) runs a full head-to-head
    and returns per-episode averages + decisive win counts, under both the
    deterministic reference protocol and the behavioral (stochastic) one."""
    import importlib.util
    import os
    from neuralplane_tpu.algorithms.ppo import PPOPolicy
    from neuralplane_tpu.algorithms.rl_config import RLConfig
    from neuralplane_tpu.utils.checkpoint import save_pytree

    spec = importlib.util.spec_from_file_location(
        "ladder_probe", os.path.join(os.path.dirname(__file__), "..",
                                     "tools", "ladder_probe.py"))
    lp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(lp)

    cfg = RLConfig(hidden_sizes=(16,), act_hidden_sizes=(8,),
                   recurrent_hidden_size=8)
    env = MultipleCombatEnv(num_envs=2)
    policy = PPOPolicy(cfg, env.num_observation, env.num_actions)
    p1 = policy.init_params(jax.random.PRNGKey(1))["actor"]
    p2 = policy.init_params(jax.random.PRNGKey(2))["actor"]
    save_pytree(str(tmp_path / "actor_a.pkl"), p1)

    for proto in ("none", "both"):
        e, o, ends, ew, ow = lp.head_to_head(
            env, policy, p1, p2, steps=20, key=jax.random.PRNGKey(0),
            stochastic=proto)
        for v in (e, o, ends, ew, ow):
            assert np.isfinite(v)
        assert ew >= 0 and ow >= 0
    # checkpoint resolution path
    loaded = lp.load_actor(str(tmp_path), "a")
    assert jax.tree_util.tree_structure(loaded) == \
        jax.tree_util.tree_structure(p1)


def test_ladder_probe_shoot_env():
    """head_to_head drives the ShootTuple head envs (1v1 + team missiles)."""
    import importlib.util
    import os
    from neuralplane_tpu.algorithms.ppo import PPOPolicy
    from neuralplane_tpu.algorithms.rl_config import RLConfig
    from neuralplane_tpu.envs import MultipleCombatShootEnv

    spec = importlib.util.spec_from_file_location(
        "ladder_probe", os.path.join(os.path.dirname(__file__), "..",
                                     "tools", "ladder_probe.py"))
    lp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(lp)

    cfg = RLConfig(hidden_sizes=(16,), act_hidden_sizes=(8,),
                   recurrent_hidden_size=8, use_prior=True)
    env = MultipleCombatShootEnv(num_envs=2)
    policy = PPOPolicy(cfg, env.num_observation, env.num_actions,
                       act_space=env.action_space)
    p1 = policy.init_params(jax.random.PRNGKey(1))["actor"]
    p2 = policy.init_params(jax.random.PRNGKey(2))["actor"]
    e, o, ends, ew, ow = lp.head_to_head(
        env, policy, p1, p2, steps=15, key=jax.random.PRNGKey(0),
        stochastic="both")
    for v in (e, o, ends, ew, ow):
        assert np.isfinite(v)


# ---------- 3v3: the nvn machinery beyond the 2v2 instantiation ----------

@pytest.fixture(scope="module")
def env3():
    return MultipleCombatEnv(num_envs=2, config="multiple_selfplay_3v3")


def test_3v3_obs_layout_hand_computed(env3):
    """h=3 obs blocks against hand-computed geometry: ego 9, teammates
    7+7 (fixed within-team order), enemies 7+7+7 nearest-alive-first —
    the generic 9+7*(h-1)+7*h layout beyond the 2v2 case it was built
    on (reference's nvn claim, `envs/multiplecombat_env.py:24-271`,
    realized at a second team size)."""
    h = env3.half
    assert h == 3 and env3.num_agents == 6
    assert env3.num_observation == 9 + 7 * (h - 1) + 7 * h == 44
    # group 0: a0-a2 ego team (north), a3-a5 enemies (south).
    # Distances from a0: a3 = 5000, a4 ~ 12041, a5 ~ 20100 -> order 3,4,5.
    pos = [(0.0, 0.0, 10000.0), (0.0, 2000.0, 10500.0),
           (0.0, -3000.0, 9800.0),
           (5000.0, 0.0, 10000.0), (12000.0, 0.0, 11000.0),
           (20000.0, 0.0, 12000.0)]
    vts = [1000.0, 1100.0, 1200.0, 1050.0, 950.0, 900.0]
    psis = [0.0, 0.0, 0.0, np.pi, np.pi, np.pi]
    state = _crafted_state(env3, pos, vts, psis)
    xdot = env3.model.extended_state(state.model)
    obs = np.asarray(env3._obs(state, xdot)).reshape(env3.num_envs,
                                                     env3.num_agents, -1)
    o0 = obs[0, 0]
    # ego block
    np.testing.assert_allclose(o0[0], 10000.0 * FT / 5000.0, rtol=1e-5)
    np.testing.assert_allclose(o0[5], 1000.0 * FT / 340.0, rtol=1e-4)

    vel = np.asarray(xdot[:, :3])

    def block(j, dvx_vt, dalt_ft):
        ao, ta, r, sd = get2d_AO_TA_R(jnp.asarray(pos[0])[None],
                                      jnp.asarray(pos[j])[None],
                                      jnp.asarray(vel[0])[None],
                                      jnp.asarray(vel[j])[None],
                                      return_side=True)
        return [dvx_vt * FT / 340.0, dalt_ft * FT / 1000.0,
                float(ao[0]), float(ta[0]), float(r[0]) * FT / 10000.0,
                float(sd[0]), 1.0]

    # teammate blocks in fixed within-team order: a1 then a2
    np.testing.assert_allclose(o0[9:16], block(1, 100.0, 500.0),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(o0[16:23], block(2, 200.0, -200.0),
                               rtol=1e-4, atol=1e-5)
    # enemy blocks nearest-first: a3, a4, a5
    np.testing.assert_allclose(o0[23:30], block(3, 50.0, 0.0),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(o0[30:37], block(4, -50.0, 1000.0),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(o0[37:44], block(5, -100.0, 2000.0),
                               rtol=1e-4, atol=1e-5)
    # a0 nose-on at a3 flying straight at it: AO=0, TA=pi
    np.testing.assert_allclose(o0[25], 0.0, atol=1e-3)
    np.testing.assert_allclose(o0[26], np.pi, atol=1e-3)


def test_3v3_team_reward_shared_and_wipe_events(env3):
    """All three teammates share one reward; wiping a 3-agent team raises
    the +-200 split for all six."""
    pos = [(0.0, 0.0, 10000.0), (0.0, 8000.0, 10000.0),
           (0.0, -8000.0, 10000.0),
           (500.0, 0.0, 10000.0), (20000.0, 8000.0, 10000.0),
           (20000.0, -8000.0, 10000.0)]
    state = _crafted_state(env3, pos, [1000.0] * 6, [0.0] * 6)
    state, out = env3.step(state, jnp.zeros((env3.n, 4)))
    rew = np.asarray(out.reward)
    assert rew[0] == rew[1] == rew[2]
    assert rew[3] == rew[4] == rew[5]
    # a0 chases a3 nose-on from 500 ft: only a3 bleeds
    blood = np.asarray(state.blood)
    assert blood[3] < 99.5
    np.testing.assert_allclose(blood[[0, 1, 2, 4, 5]], 100.0)

    # wipe the whole ego team -> losers bad_done, winners done, +-200
    state = state.replace(blood=state.blood.at[:3].set(0.0))
    state, out = env3.step(state, jnp.zeros((env3.n, 4)))
    assert np.asarray(out.bad_done)[:3].all()
    assert np.asarray(out.done)[3:6].all()
    rew = np.asarray(out.reward)
    assert (rew[:3] < -190).all() and (rew[3:6] > 190).all()
    # group 1 untouched
    assert not bool(np.asarray(out.done | out.bad_done)[6:].any())


def test_3v3_partial_death_keeps_game_running(env3):
    """One dead enemy: its blocks zero out, actives drop, episode continues
    (no team-wipe), and the nearest-ENEMY sort skips the corpse."""
    pos = [(0.0, 0.0, 10000.0), (0.0, 8000.0, 10000.0),
           (0.0, -8000.0, 10000.0),
           (5000.0, 0.0, 10000.0), (12000.0, 0.0, 10000.0),
           (20000.0, 0.0, 10000.0)]
    state = _crafted_state(env3, pos, [1000.0] * 6, [0.0] * 6)
    # kill a3 - a0's nearest enemy becomes a4
    state = state.replace(blood=state.blood.at[3].set(0.0))
    state, out = env3.step(state, jnp.zeros((env3.n, 4)))
    assert np.asarray(out.active)[:6].tolist() == [1, 1, 1, 0, 1, 1]
    assert not bool(np.asarray(out.done | out.bad_done)[:6].any())
    o0 = np.asarray(out.obs).reshape(env3.num_envs, env3.num_agents,
                                     -1)[0, 0]
    # first enemy block is now the ALIVE a4 (R ~ 12000 ft shrinking), and
    # the dead a3's zeroed block sorts to the LAST enemy slot
    assert 1.0 < o0[27] / (FT / 10.0) < 13000.0 * FT / 10000.0 / (FT / 10.0)
    np.testing.assert_allclose(o0[37:44], 0.0, atol=1e-6)


def test_3v3_mappo_trains(tmp_path):
    """MAPPO + centralized critic over the 3v3 game: collect+train finite,
    share_obs = 3 x 44."""
    from neuralplane_tpu.algorithms.rl_config import RLConfig
    from neuralplane_tpu.runner import MAPPOSelfplayRunner

    cfg = RLConfig(buffer_size=4, data_chunk_length=2, ppo_epoch=1,
                   num_mini_batch=1, hidden_sizes=(16,),
                   act_hidden_sizes=(8,), recurrent_hidden_size=8,
                   n_choose_opponents=1)
    env = MultipleCombatEnv(num_envs=2, config="multiple_selfplay_3v3")
    runner = MAPPOSelfplayRunner(env, cfg, run_dir=str(tmp_path))
    carry = runner.init_carry(jax.random.PRNGKey(0))
    carry, batch, _ = runner.collect(runner.train_state.params,
                                     runner.opponent_params, carry)
    assert batch.share_obs.shape[-1] == 3 * env.num_observation
    metrics = runner.train(batch)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k


def test_3v3_shoot_env_contract_and_train(tmp_path):
    """The weapon layer is team-size generic too: 3v3 missiles lock the
    nearest alive enemy, prior slots key on the first enemy block (obs
    44+3, enemy block at 9+7*2), and MAPPO trains on it."""
    from neuralplane_tpu.algorithms.rl_config import RLConfig
    from neuralplane_tpu.envs import MultipleCombatShootEnv
    from neuralplane_tpu.runner import MAPPOSelfplayRunner

    env = MultipleCombatShootEnv(num_envs=2,
                                 config="multiple_selfplay_shoot_3v3")
    assert env.num_observation == 47
    assert env.shoot_prior_slots == (25, 27)
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (env.n, 47)
    fire = jnp.concatenate([jnp.full((env.n, 4), 20.0),
                            jnp.ones((env.n, 1))], axis=1)
    launches = 0
    for _ in range(4):
        state, out = env.step(state, fire)
        launches += int(out.info["shoot/launches"])
    assert launches > 0
    assert np.isfinite(np.asarray(out.obs)).all()

    cfg = RLConfig(buffer_size=4, data_chunk_length=2, ppo_epoch=1,
                   num_mini_batch=1, hidden_sizes=(16,),
                   act_hidden_sizes=(8,), recurrent_hidden_size=8,
                   n_choose_opponents=1, use_prior=True)
    runner = MAPPOSelfplayRunner(env, cfg, run_dir=str(tmp_path))
    assert runner.policy._pp.prior_slots == (25, 27)
    carry = runner.init_carry(jax.random.PRNGKey(1))
    carry, batch, _ = runner.collect(runner.train_state.params,
                                     runner.opponent_params, carry)
    metrics = runner.train(batch)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k

"""Missile kinematics + shoot-combat env (envs/combat_shoot.py).

The reference has the ShootTuple policy head (`algorithms/utils/act.py:39-53`)
but no env that exposes it; these tests cover the environment side we add:
PN guidance, segment hit test, launch gating, obs extension, and the full
selfplay-PPO integration with the Beta-prior (`ppo_actor.py:41-49`).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralplane_tpu.envs import SingleCombatShootEnv
from neuralplane_tpu.ops.missile import (clear_missiles, init_missiles,
                                         launch_missiles, segment_min_dist,
                                         step_missiles)

MISSILE_KW = dict(dt=0.1, speed=2600.0, nav_gain=3.0, g_max=30.0,
                  duration=30.0, hit_radius=300.0)


# ---------- ops/missile.py ----------

def test_segment_min_dist_matches_bruteforce():
    rng = np.random.default_rng(0)
    rel_pos = jnp.asarray(rng.normal(size=(32, 3)) * 1000.0, jnp.float32)
    rel_vel = jnp.asarray(rng.normal(size=(32, 3)) * 500.0, jnp.float32)
    dt = 0.1
    got = segment_min_dist(rel_pos, rel_vel, dt)
    ts = np.linspace(0.0, dt, 2001)
    pts = (np.asarray(rel_pos)[:, None, :]
           + ts[None, :, None] * np.asarray(rel_vel)[:, None, :])
    want = np.linalg.norm(pts, axis=-1).min(axis=1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=0.5)


def test_pn_missile_hits_crossing_target():
    """A PN missile launched 90 degrees off a crossing target converges."""
    m = init_missiles(1, 1)
    # shooter at origin flying north; target 8000 ft north, crossing east
    m = launch_missiles(m, jnp.zeros(1, jnp.int32), jnp.ones(1, bool),
                        jnp.zeros((1, 3)),
                        jnp.asarray([[1000.0, 0.0, 0.0]]), speed=2600.0)
    t_pos = jnp.asarray([[8000.0, 0.0, 0.0]])
    t_vel = jnp.asarray([[0.0, 900.0, 0.0]])
    hit_step = None
    ranges = []
    for i in range(120):
        t_pos = t_pos + t_vel * MISSILE_KW["dt"]
        m, hits, _ = step_missiles(m, t_pos, t_vel, **MISSILE_KW)
        ranges.append(float(jnp.linalg.norm(t_pos[0] - m.pos[0, 0])))
        if bool(hits[0, 0]):
            hit_step = i
            break
    assert hit_step is not None, f"never hit; closest {min(ranges):.0f} ft"
    assert not bool(m.active[0, 0])  # hit missiles deactivate


def test_missile_expires_and_g_limit_defeats_impossible_turn():
    """A target directly BEHIND the launch direction at close range forces a
    reversal the g-clamp cannot complete instantly; the missile must not
    teleport (finite turn rate) and must die at `duration`."""
    m = init_missiles(1, 1)
    m = launch_missiles(m, jnp.zeros(1, jnp.int32), jnp.ones(1, bool),
                        jnp.zeros((1, 3)),
                        jnp.asarray([[2600.0, 0.0, 0.0]]), speed=2600.0)
    t_pos = jnp.asarray([[-500.0, 0.0, 0.0]])   # 500 ft behind, outside kill radius
    t_vel = jnp.zeros((1, 3))
    m2, hits, _ = step_missiles(m, t_pos, t_vel, **MISSILE_KW)
    assert not bool(hits[0, 0])
    # velocity rotation in one step is bounded by a_max*dt / v
    dv = jnp.linalg.norm(m2.vel[0, 0] - m.vel[0, 0])
    assert float(dv) <= 30.0 * 32.175 * 0.1 + 1e-3
    # expiry
    for _ in range(301):
        m, _, _ = step_missiles(m, jnp.asarray([[1e7, 1e7, 0.0]]),
                             jnp.zeros((1, 3)), **MISSILE_KW)
    assert not bool(m.active[0, 0])


def test_launch_slots_and_clear():
    m = init_missiles(2, 3)
    for slot in range(3):
        m = launch_missiles(m, jnp.full(2, slot, jnp.int32),
                            jnp.asarray([True, False]),
                            jnp.zeros((2, 3)), jnp.ones((2, 3)), speed=100.0)
    assert m.active.tolist() == [[True, True, True], [False, False, False]]
    m = clear_missiles(m, jnp.asarray([True, False]))
    assert not bool(m.active.any())


# ---------- env ----------

@pytest.fixture(scope="module")
def env():
    return SingleCombatShootEnv(num_envs=4)


def _nose_on(env, state, rng_ft=12000.0, lateral=5000.0):
    """Place every pairing nose-on inside the WEZ: ego k northbound at the
    origin row, its opponent southbound rng_ft ahead (AO = 0 both ways)."""
    m = env.num_agents
    h = m // 2
    s = np.asarray(state.model.s).copy()
    for e in range(env.num_envs):
        for k in range(h):
            i, j = e * m + k, e * m + h + k
            s[i, :3] = [0.0, k * lateral, 19500.0]
            s[j, :3] = [rng_ft, k * lateral, 19500.0]
            s[i, 5], s[j, 5] = 0.0, np.pi
            s[i, 6] = s[j, 6] = 1000.0
            s[i, 3] = s[i, 4] = s[j, 3] = s[j, 4] = 0.0
    sj = jnp.asarray(s)
    return state.replace(model=state.model.replace(s=sj, recent_s=sj))


def test_shoot_env_contract(env):
    assert env.num_observation == 18
    assert env.num_actions == 5
    assert env.action_space.nvec == (30, 41, 41, 41)
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (env.n, 18)
    # fresh episode: full ammo, no alert
    np.testing.assert_allclose(np.asarray(obs[:, 15]), 1.0)
    np.testing.assert_allclose(np.asarray(obs[:, 16]), 0.0)
    assert int(state.ammo.sum()) == env.n * env.config.max_missiles


def test_decode_bins(env):
    a = jnp.asarray([[0.0, 0.0, 40.0, 20.0, 0.0]])
    demands, fire = env._decode(a)
    np.testing.assert_allclose(
        np.asarray(demands[0]), [-1.0, -1.0, 1.0, 0.0], atol=1e-6)
    assert not bool(fire[0])
    assert bool(env._decode(jnp.asarray([[0, 0, 0, 0, 1.0]]))[1][0])


def test_launch_gating_and_obs_alert(env):
    state, _ = env.reset(jax.random.PRNGKey(1))
    state = _nose_on(env, state)
    fire_all = jnp.concatenate(
        [jnp.full((env.n, 4), 20.0), jnp.ones((env.n, 1))], axis=1)
    state, out = env.step(state, fire_all)
    assert int(out.info["shoot/launches"]) == env.n       # all in WEZ: fire
    state, out = env.step(state, fire_all)
    assert int(out.info["shoot/launches"]) == 0           # cooldown blocks
    assert int(state.ammo[0]) == env.config.max_missiles - 1
    # incoming alert is up for everyone (opponent's missile inbound)
    np.testing.assert_allclose(np.asarray(out.obs[:, 16]), 1.0)
    assert (np.asarray(out.obs[:, 17]) > 0).all()
    # ammo fraction reflects the launch
    np.testing.assert_allclose(np.asarray(out.obs[:, 15]), 0.75)


def test_wez_gate_blocks_out_of_envelope_launches(env):
    """Tail-aspect (AO ~ pi) and beyond-range launches stay on the rail."""
    state, _ = env.reset(jax.random.PRNGKey(7))
    fire_all = jnp.concatenate(
        [jnp.full((env.n, 4), 20.0), jnp.ones((env.n, 1))], axis=1)
    # both fly north in trail: the leader's AO to the chaser is pi
    state_t = _nose_on(env, state)
    s = np.asarray(state_t.model.s).copy()
    s[1::2, 5] = 0.0                     # opponents turn northbound too
    sj = jnp.asarray(s)
    state_t = state_t.replace(model=state_t.model.replace(s=sj, recent_s=sj))
    _, out = env.step(state_t, fire_all)
    assert int(out.info["shoot/launches"]) == env.num_envs  # chasers only
    # nose-on but outside wez_max_range
    state_f = _nose_on(env, state, rng_ft=30000.0)
    _, out = env.step(state_f, fire_all)
    assert int(out.info["shoot/launches"]) == 0


def test_missile_hit_drains_blood_and_reward_cost(env):
    """Drive until a hit lands; blood must drop by missile_damage and the
    shutdown termination must fire for the victim's episode."""
    state, _ = env.reset(jax.random.PRNGKey(2))
    state = _nose_on(env, state)
    fire_all = jnp.concatenate(
        [jnp.full((env.n, 4), 20.0), jnp.ones((env.n, 1))], axis=1)
    no_fire = fire_all.at[:, 4].set(0.0)

    copy = jax.tree.map(jnp.copy, state)
    state, out = env.step(state, fire_all)
    # launch cost shows up in the reward
    r_fire = np.asarray(out.reward)
    state2, out2 = env.step(copy, no_fire)
    assert (r_fire <= np.asarray(out2.reward) + 1e-5).all()

    hits_total = 0
    for _ in range(200):
        state, out = env.step(state, fire_all)
        hits_total += int(out.info["shoot/hits"])
        if hits_total and int(out.info["termination/shutdown"]) > 0:
            break
    assert hits_total > 0, "no missile ever connected"
    assert int(out.info["termination/shutdown"]) > 0


def test_masked_reset_restores_missile_state(env):
    state, _ = env.reset(jax.random.PRNGKey(3))
    state = _nose_on(env, state)
    fire_all = jnp.concatenate(
        [jnp.full((env.n, 4), 20.0), jnp.ones((env.n, 1))], axis=1)
    no_fire = fire_all.at[:, 4].set(0.0)
    state, _ = env.step(state, fire_all)
    assert int(state.missiles.active.sum()) == env.n
    assert int(state.ammo.max()) == env.config.max_missiles - 1
    # force done on every group -> next step's masked reset rearms everyone
    state = state.replace(is_done=jnp.ones(env.n, bool))
    state, out = env.step(state, no_fire)
    assert int(state.ammo.min()) == env.config.max_missiles
    assert int(state.missiles.active.sum()) == 0
    np.testing.assert_allclose(np.asarray(out.obs[:, 15]), 1.0)


def test_selfplay_ppo_trains_on_shoot_env(tmp_path):
    """Full integration: ShootTuple head + Beta prior + selfplay runner."""
    from neuralplane_tpu.scripts.train import main
    main(["--env-name", "SingleCombatShoot",
          "--scenario-name", "selfplay_shoot",
          "--use-selfplay", "--use-prior", "--selfplay-algorithm", "fsp",
          "--n-choose-opponents", "1", "--n-rollout-threads", "4",
          "--num-env-steps", "60", "--buffer-size", "10",
          "--num-mini-batch", "1", "--ppo-epoch", "1",
          "--data-chunk-length", "5", "--log-interval", "1",
          "--save-interval", "1", "--hidden-size", "32",
          "--recurrent-hidden-size", "32",
          "--run-dir", str(tmp_path / "run")])
    lines = (tmp_path / "run" / "metrics.jsonl").read_text().strip()
    assert lines, "no metrics logged"


# ---------- team game (MultipleCombatShootEnv) ----------

from neuralplane_tpu.envs import MultipleCombatShootEnv


@pytest.fixture(scope="module")
def tenv():
    return MultipleCombatShootEnv(num_envs=2)


def _copy(state):
    return jax.tree.map(jnp.copy, state)


def _team_actions(env, fire_mask):
    """Neutral discrete demands + per-agent fire bits [n]."""
    a = jnp.concatenate([
        jnp.tile(jnp.array([[15.0, 20.0, 20.0, 20.0]]), (env.n, 1)),
        jnp.asarray(fire_mask, jnp.float32)[:, None]], axis=1)
    return a


def test_team_shoot_contract(tenv):
    # 2v2 team layout (9 + 7 + 14 = 30) + 3 missile dims
    assert tenv.num_observation == 33
    assert tenv.action_space.nvec == (30, 41, 41, 41)
    state, obs = tenv.reset(jax.random.PRNGKey(0))
    assert obs.shape == (tenv.n, 33)
    np.testing.assert_allclose(np.asarray(obs[:, 30]), 1.0)  # ammo frac
    np.testing.assert_allclose(np.asarray(obs[:, 31]), 0.0)  # no alert


def test_team_lock_nearest_alive_and_hit(tenv):
    """Missile locks the nearest ALIVE enemy at launch and kills it."""
    state, _ = tenv.reset(jax.random.PRNGKey(1))
    m = tenv.num_agents
    # group 0: ego 0 at origin northbound; enemy 2 head-on at 12000 ft
    # (outside the 3 km gun-damage range), enemy 3 far away
    s = np.asarray(state.model.s).copy()
    for i, (npos, head) in enumerate([(0.0, 0.0), (-3000.0, 0.0),
                                      (12000.0, np.pi), (80000.0, np.pi)]):
        s[i, 0], s[i, 1], s[i, 2] = npos, 0.0, 19500.0
        s[i, 5], s[i, 6] = head, 1000.0
        s[i, 3] = s[i, 4] = 0.0
    state = state.replace(model=state.model.replace(
        s=jnp.asarray(s), recent_s=jnp.asarray(s)))

    fire0 = np.zeros(tenv.n); fire0[0] = 1.0
    state, out = tenv.step(_copy(state), _team_actions(tenv, fire0))
    assert int(out.info["shoot/launches"]) == 1
    assert int(state.missile_target[0, 0]) == 2   # nearest alive enemy
    hits = 0
    no_fire = _team_actions(tenv, np.zeros(tenv.n))
    for _ in range(400):
        state, out = tenv.step(state, no_fire)
        hits += int(out.info["shoot/hits"])
        if hits:
            break
    assert hits == 1, "locked missile never connected"
    blood = np.asarray(state.blood)
    assert blood[2] <= 0.0                         # victim killed
    assert blood[3] > 50.0                         # wingman untouched
    # enemy-team wipe requires BOTH enemies dead - episode continues
    assert not bool(out.done[0])


def test_team_dead_cannot_fire_and_corpse_takes_no_damage(tenv):
    from neuralplane_tpu.ops.missile import launch_missiles
    state, _ = tenv.reset(jax.random.PRNGKey(2))
    state = _nose_on(tenv, state)   # everyone in WEZ of its facing partner
    # kill agent 0 of every group; everyone tries to fire
    blood = np.asarray(state.blood).copy()
    blood[0::tenv.num_agents] = 0.0
    state = state.replace(blood=jnp.asarray(blood))
    state, out = tenv.step(_copy(state), _team_actions(tenv, np.ones(tenv.n)))
    assert int(out.info["shoot/launches"]) == tenv.n - tenv.num_envs

    # an active missile 100 ft from a DEAD victim connects for no damage
    state2, _ = tenv.reset(jax.random.PRNGKey(3))
    blood = np.asarray(state2.blood).copy()
    blood[2] = 0.0                                 # corpse
    victim_pos = np.asarray(state2.model.s[2, :3])
    mis = launch_missiles(
        state2.missiles, jnp.zeros(tenv.n, jnp.int32),
        jnp.arange(tenv.n) == 0,
        jnp.asarray(victim_pos - np.array([100.0, 0.0, 0.0]))[None, :]
        * jnp.ones((tenv.n, 1)),
        jnp.asarray([[2600.0, 0.0, 0.0]]) * jnp.ones((tenv.n, 1)),
        speed=2600.0)
    state2 = state2.replace(
        blood=jnp.asarray(blood), missiles=mis,
        missile_target=state2.missile_target.at[0, 0].set(2))
    state2, out2 = tenv.step(_copy(state2),
                             _team_actions(tenv, np.zeros(tenv.n)))
    assert int(out2.info["shoot/hits"]) == 0
    assert float(state2.blood[2]) == 0.0


def test_team_shoot_cost_is_team_shared(tenv):
    state, _ = tenv.reset(jax.random.PRNGKey(4))
    state = _nose_on(tenv, state)
    fire0 = np.zeros(tenv.n); fire0[0] = 1.0
    _, out_f = tenv.step(_copy(state), _team_actions(tenv, fire0))
    _, out_n = tenv.step(_copy(state), _team_actions(tenv, np.zeros(tenv.n)))
    diff = np.asarray(out_n.reward - out_f.reward).reshape(
        tenv.num_envs, tenv.num_agents)
    cost = tenv.config.missile_shoot_cost / tenv.half
    np.testing.assert_allclose(diff[0, :2], cost, atol=1e-5)  # ego team pays
    np.testing.assert_allclose(diff[0, 2:], 0.0, atol=1e-5)   # enemies don't
    np.testing.assert_allclose(diff[1], 0.0, atol=1e-5)       # other group


def test_team_shoot_mappo_trains(tmp_path):
    """Full integration: ShootTuple head + centralized critic + selfplay."""
    from neuralplane_tpu.scripts.train import main
    main(["--env-name", "MultipleCombatShoot",
          "--scenario-name", "multiple_selfplay_shoot",
          "--algorithm-name", "mappo",
          "--use-selfplay", "--use-prior", "--selfplay-algorithm", "fsp",
          "--n-choose-opponents", "1", "--n-rollout-threads", "2",
          "--num-env-steps", "40", "--buffer-size", "10",
          "--num-mini-batch", "1", "--ppo-epoch", "1",
          "--data-chunk-length", "5", "--log-interval", "1",
          "--save-interval", "1", "--hidden-size", "32",
          "--recurrent-hidden-size", "32",
          "--run-dir", str(tmp_path / "run")])
    lines = (tmp_path / "run" / "metrics.jsonl").read_text().strip()
    assert lines, "no metrics logged"


def test_pn_g_limit_sets_evadability():
    """Chase kinematics behind the WEZ design choice (REPORT): a 12 g
    missile runs down even a max-rate breaking target, while at ~5 g a
    hard level break JUST defeats the 200 ft kill radius — margins too
    thin to hang the skill gradient on, hence the WEZ posture game."""
    def chase(g_max, breaking):
        m = init_missiles(1, 1)
        m = launch_missiles(m, jnp.zeros(1, jnp.int32), jnp.ones(1, bool),
                            jnp.zeros((1, 3)),
                            jnp.asarray([[1000.0, 0.0, 0.0]]), speed=2000.0)
        tpos = np.array([12000.0, 0.0, 0.0])
        tvel = np.array([-1000.0, 0.0, 0.0])      # head-on
        dt = 0.02
        for _ in range(int(20.0 / dt)):
            d = np.linalg.norm(np.asarray(m.pos[0, 0]) - tpos)
            if breaking and d < 8000.0:           # alerted: 5 g level break
                w = 5.0 * 32.17 / 1000.0
                c, s = np.cos(w * dt), np.sin(w * dt)
                tvel = np.array([tvel[0] * c - tvel[1] * s,
                                 tvel[0] * s + tvel[1] * c, 0.0])
            tpos = tpos + tvel * dt
            m, hits, _ = step_missiles(
                m, jnp.asarray(tpos)[None], jnp.asarray(tvel)[None],
                dt=dt, speed=2000.0, nav_gain=3.0, g_max=g_max,
                duration=20.0, hit_radius=200.0)
            if bool(hits[0, 0]):
                return True
            if not bool(m.active[0, 0]):
                return False
        return False

    assert chase(12.0, breaking=False)
    assert chase(12.0, breaking=True)     # shipped missile: unavoidable
    assert chase(5.0, breaking=False)     # still lethal vs the oblivious
    assert not chase(5.0, breaking=True)  # a reacting target survives


# ---------- graded proximity fuse / evadable game ----------

def test_graded_fuse_pk_ramp_and_cpa_timing():
    """Straight-line flyby (nav_gain 0 isolates the fuse): detonation fires
    at the closest point of approach with pk ramping 1 -> 0 across the
    [hit_radius, fuse_outer] envelope, and NOT earlier while the missile is
    still closing through the outer shell."""
    kw = dict(dt=0.1, speed=2000.0, nav_gain=0.0, g_max=0.0,
              duration=30.0, hit_radius=100.0, fuse_outer=400.0)

    def flyby(off):
        m = init_missiles(1, 1)
        m = launch_missiles(m, jnp.zeros(1, jnp.int32), jnp.ones(1, bool),
                            jnp.zeros((1, 3)),
                            jnp.asarray([[2000.0, 0.0, 0.0]]), speed=2000.0)
        t_pos = jnp.asarray([[1000.0, float(off), 0.0]])
        t_vel = jnp.zeros((1, 3))
        events = []
        for i in range(12):
            m, hits, pk = step_missiles(m, t_pos, t_vel, **kw)
            if bool(hits[0, 0]):
                events.append((i, float(pk[0, 0])))
        return events, m

    # inside the always-lethal radius: pk = 1
    ev, m = flyby(50.0)
    assert len(ev) == 1 and ev[0][1] == pytest.approx(1.0)
    assert not bool(m.active[0, 0])
    # mid-envelope CPA: one detonation, exactly at the linear-ramp pk
    ev, m = flyby(250.0)
    assert len(ev) == 1
    assert ev[0][1] == pytest.approx((400.0 - 250.0) / 300.0, abs=1e-4)
    assert not bool(m.active[0, 0])
    # beyond the envelope: never detonates, keeps flying
    ev, m = flyby(600.0)
    assert not ev and bool(m.active[0, 0])


def test_graded_fuse_break_turn_earns_pk_reduction():
    """The design target of the evadable game: with the g_max=5 missile an
    immediate hard break off a max-WEZ launch beats the fuse entirely,
    while an oblivious target takes pk ~ 1 (chase kinematics, calibrated
    for selfplay_shoot_evadable.yaml)."""
    kw = dict(dt=0.1, speed=2000.0, nav_gain=3.0, g_max=5.0,
              duration=20.0, hit_radius=100.0, fuse_outer=400.0)

    def chase(break_g):
        m = init_missiles(1, 1)
        m = launch_missiles(m, jnp.zeros(1, jnp.int32), jnp.ones(1, bool),
                            jnp.zeros((1, 3)),
                            jnp.asarray([[1000.0, 0.0, 0.0]]), speed=2000.0)
        tpos = np.array([12000.0, 0.0, 0.0])
        tvel = np.array([-1000.0, 0.0, 0.0])     # head-on, then break
        dt = 0.1
        pk_tot = 0.0
        for _ in range(int(20.0 / dt)):
            if break_g > 0:
                w = break_g * 32.17 / np.linalg.norm(tvel)
                c, s = np.cos(w * dt), np.sin(w * dt)
                tvel = np.array([tvel[0] * c - tvel[1] * s,
                                 tvel[0] * s + tvel[1] * c, 0.0])
            tpos = tpos + tvel * dt
            m, hits, pk = step_missiles(
                m, jnp.asarray(tpos)[None], jnp.asarray(tvel)[None], **kw)
            pk_tot += float(pk[0, 0])
            if not bool(m.active[0, 0]):
                break
        return pk_tot

    assert chase(0.0) > 0.95          # oblivious: full kill
    assert chase(5.0) < 0.1           # immediate 5 g break: defeated


def test_evadable_env_threat_obs_bearing_and_closure():
    env_e = SingleCombatShootEnv(num_envs=2,
                                 config="selfplay_shoot_evadable")
    assert env_e.num_observation == 21
    state, obs = env_e.reset(jax.random.PRNGKey(0))
    assert obs.shape == (env_e.n, 21)
    # no missiles in the air: threat block zeroed
    np.testing.assert_allclose(np.asarray(obs[:, 18:21]), 0.0)

    state = _nose_on(env_e, state)
    fire_all = jnp.concatenate(
        [jnp.full((env_e.n, 4), 20.0), jnp.ones((env_e.n, 1))], axis=1)
    state, out = env_e.step(state, fire_all)
    assert int(out.info["shoot/launches"]) == env_e.n
    # nose-on duel: each agent's incoming missile approaches from dead
    # ahead -> relative bearing ~ 0 (sin ~ 0, cos ~ 1), closing fast
    obs = np.asarray(out.obs)
    assert (obs[:, 16] == 1.0).all()              # alert up
    np.testing.assert_allclose(obs[:, 18], 0.0, atol=0.1)   # sin(brg)
    assert (obs[:, 19] > 0.9).all()                          # cos(brg)
    # closure ~ (missile speed + own speed) in mach, clearly positive
    assert (obs[:, 20] > 1.0).all()


def test_shoot_kill_event_rewards():
    """Shutdown win/lose rides the reward at the EventDrivenReward +-200
    scale (previously only documented): drive a pairing to a kill and check
    the winner/loser reward split."""
    e = SingleCombatShootEnv(num_envs=1)
    state, _ = e.reset(jax.random.PRNGKey(5))
    state = _nose_on(e, state, rng_ft=2500.0)   # inside gun-damage range
    # hand the fight its outcome: victim (odd row) enters the step with
    # blood that the posture damage will finish off
    state = state.replace(blood=jnp.asarray([100.0, 1e-4]))
    no_fire = jnp.full((e.n, 4), 20.0)
    no_fire = jnp.concatenate([no_fire, jnp.zeros((e.n, 1))], axis=1)
    state, out = e.step(state, no_fire)
    r = np.asarray(out.reward)
    assert r[0] > 150.0, f"winner reward {r[0]}"
    assert r[1] < -150.0, f"loser reward {r[1]}"
    assert bool(out.done[0]) and bool(out.bad_done[1])


def test_blood_shaping_rewards_damage_diff():
    """With blood_shaping on, a pk-weighted missile hit moves the shooter's
    reward up and the victim's down by 0.1 * damage."""
    from neuralplane_tpu.utils.config import load_config
    cfg = load_config("selfplay_shoot_evadable")
    e = SingleCombatShootEnv(num_envs=1, config=cfg)
    state, _ = e.reset(jax.random.PRNGKey(6))
    state = _nose_on(e, state, rng_ft=6000.0)
    fire = jnp.concatenate(
        [jnp.full((e.n, 4), 20.0), jnp.ones((e.n, 1))], axis=1)
    # ego fires, opponent holds: asymmetric damage stream
    act = fire.at[1, 4].set(0.0)
    got_hit = False
    for _ in range(120):
        state, out = e.step(state, act)
        if int(out.info["shoot/hits"]) > 0:
            got_hit = True
            r = np.asarray(out.reward)
            assert r[0] > r[1] + 1.0, f"no shaping split: {r}"
            break
        if bool(np.asarray(out.done | out.bad_done).any()):
            break
    assert got_hit, "ego's missile never connected"


def test_team_prior_slots_point_at_lock_target():
    """The Beta launch prior must key on the nearest-ENEMY AO/R in the team
    layout (enemy block at 9 + 7*(h-1)), not the 1v1 slots 11/13 (teammate
    geometry there)."""
    from neuralplane_tpu.envs import MultipleCombatShootEnv
    tenv = MultipleCombatShootEnv(num_envs=1)
    h = tenv.half
    enemy0 = 9 + 7 * (h - 1)
    assert tenv.shoot_prior_slots == (enemy0 + 2, enemy0 + 4)
    e1 = SingleCombatShootEnv(num_envs=1)
    assert e1.shoot_prior_slots == (11, 13)

    # slots select the intended columns end-to-end through shoot_priors
    from neuralplane_tpu.algorithms.heads import shoot_priors
    obs = jnp.zeros((3, tenv.num_observation))
    obs = obs.at[:, enemy0 + 2].set(jnp.deg2rad(10.0))   # AO: in-WEZ
    obs = obs.at[:, enemy0 + 4].set(0.5)                 # R = 5 km
    a0, b0 = shoot_priors(obs, *tenv.shoot_prior_slots)
    np.testing.assert_allclose(np.asarray(a0[:, 0]), 10.0)  # close -> eager
    np.testing.assert_allclose(np.asarray(b0[:, 0]), 3.0)   # on-nose


def test_team_evadable_threat_obs():
    """The team game carries the same per-agent threat block as the 1v1
    evadable game (bearing/closure of the nearest missile LOCKED on me):
    obs 30 -> 36 at 2v2, bearing ~ dead ahead in a nose-on mutual volley."""
    from neuralplane_tpu.envs import MultipleCombatShootEnv
    tenv = MultipleCombatShootEnv(num_envs=2,
                                  config="multiple_selfplay_shoot_evadable")
    assert tenv.num_observation == 30 + 6
    state, obs = tenv.reset(jax.random.PRNGKey(0))
    assert obs.shape == (tenv.n, 36)
    np.testing.assert_allclose(np.asarray(obs[:, 33:36]), 0.0)  # no alert

    state = _nose_on(tenv, state)
    fire_all = jnp.concatenate(
        [jnp.full((tenv.n, 4), 20.0), jnp.ones((tenv.n, 1))], axis=1)
    state, out = tenv.step(state, fire_all)
    assert int(out.info["shoot/launches"]) == tenv.n
    o = np.asarray(out.obs)
    assert (o[:, 31] == 1.0).all()                 # alert up for everyone
    np.testing.assert_allclose(o[:, 33], 0.0, atol=0.15)   # sin(rel brg)
    assert (o[:, 34] > 0.85).all()                 # cos(rel brg): ahead
    assert (o[:, 35] > 1.0).all()                  # closing > mach 1
    assert np.isfinite(o).all()


def test_team_evadable_graded_damage():
    """pk-weighted warhead in the team game: drive a volley to detonation
    and check blood drains by a NON-quantized amount (graded pk), with
    counters consistent."""
    from neuralplane_tpu.envs import MultipleCombatShootEnv
    tenv = MultipleCombatShootEnv(num_envs=2,
                                  config="multiple_selfplay_shoot_evadable")
    state, _ = tenv.reset(jax.random.PRNGKey(1))
    state = _nose_on(tenv, state, rng_ft=9000.0)
    fire_all = jnp.concatenate(
        [jnp.full((tenv.n, 4), 20.0), jnp.ones((tenv.n, 1))], axis=1)
    hits = 0
    # team env runs 1 FDM substep per step (dt 0.02): a 9000 ft nose-on
    # closure at ~3000 ft/s needs ~150 steps to reach the fuse
    for _ in range(300):
        state, out = tenv.step(state, fire_all)
        hits += int(out.info["shoot/hits"])
        if hits > 0:
            break
    assert hits > 0, "no detonation in a nose-on volley"
    blood = np.asarray(state.blood)
    assert blood.min() < 100.0 - 1.0   # someone took real missile damage

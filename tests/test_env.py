"""Environment contract + semantics tests (port/extension of the reference's
test_env.py smoke test, plus the state-machine properties SURVEY.md S7 calls
out as subtle: auto-reset, target-resample-on-done, flag accumulation)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralplane_tpu.envs import ControlEnv, GymVecEnv


@pytest.fixture(scope="module")
def env():
    return ControlEnv(num_envs=16, config="heading")


def test_reset_shapes_and_ranges(env):
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (16, 22)
    s = np.asarray(state.model.s)
    assert ((s[:, 2] >= 19000) & (s[:, 2] <= 20000)).all()      # altitude init
    assert ((s[:, 6] >= 1000) & (s[:, 6] <= 1200)).all()        # vt init
    assert (np.asarray(state.model.u)[:, 0] == 2000.0).all()    # init thrust
    assert not np.asarray(state.is_done).any()
    # heading target = heading + 2pi/3 wrapped
    tgt = np.asarray(state.task.target_heading)
    np.testing.assert_allclose(tgt, 2 * np.pi / 3, atol=1e-5)


def test_step_contract(env):
    state, obs = env.reset(jax.random.PRNGKey(1))
    action = jnp.zeros((16, 4))
    state, out = env.step(state, action)
    assert out.obs.shape == (16, 22)
    assert out.reward.shape == (16,)
    assert out.done.dtype == jnp.bool_
    assert int(state.step_count[0]) == 1
    assert bool(jnp.all(jnp.isfinite(out.obs)))
    assert bool(jnp.all(jnp.isfinite(out.reward)))


def test_autoreset_after_bad_done(env):
    """Force a bad_done (dive into the ground) and check masked re-init."""
    state, _ = env.reset(jax.random.PRNGKey(2))
    # drop half the fleet below the altitude limit
    s = state.model.s.at[:8, 2].set(1000.0)
    state = state.replace(model=state.model.replace(s=s))
    action = jnp.zeros((16, 4))
    state, out = env.step(state, action)
    assert bool(out.bad_done[:8].all())
    assert not bool(out.bad_done[8:].any())
    # next step auto-resets those rows: altitude back in init range, count zero
    state2, _ = env.step(state, action)
    alt = np.asarray(state2.model.s[:8, 2])
    assert ((alt > 18500) & (alt < 20500)).all()
    assert (np.asarray(state2.step_count[:8]) == 1).all()
    assert (np.asarray(state2.step_count[8:]) == 2).all()


def test_reward_includes_event_bonus(env):
    state, _ = env.reset(jax.random.PRNGKey(3))
    s = state.model.s.at[:4, 2].set(1000.0)
    state = state.replace(model=state.model.replace(s=s))
    _, out = env.step(state, jnp.zeros((16, 4)))
    # bad rows get the -200 event penalty added to the (small) tracking term
    assert np.asarray(out.reward[:4]).max() < -150
    assert np.asarray(out.reward[4:]).min() > -150


def test_trajectory_stays_finite(env):
    """200 random-action steps never produce NaN/Inf in state or outputs."""
    state, _ = env.reset(jax.random.PRNGKey(4))
    key = jax.random.PRNGKey(5)

    def body(carry, _):
        state, key = carry
        key, ka = jax.random.split(key)
        action = jax.random.uniform(ka, (16, 4), minval=-0.3, maxval=0.3)
        state, out = env.step(state, action)
        return (state, key), (out.reward, out.obs)

    (state, _), (rewards, obs) = jax.lax.scan(body, (state, key), None, length=200)
    assert bool(jnp.isfinite(rewards).all())
    assert bool(jnp.isfinite(obs).all())
    assert bool(jnp.isfinite(state.model.s).all())


def test_control_and_tracking_tasks():
    for scenario in ("control", "tracking"):
        env = ControlEnv(num_envs=4, config=scenario)
        state, obs = env.reset(jax.random.PRNGKey(0))
        assert obs.shape == (4, 22)
        n_act = env.num_actions
        state, out = env.step(state, jnp.zeros((4, n_act)))
        assert bool(jnp.isfinite(out.obs).all()), scenario


def test_uav_model_env():
    env = ControlEnv(num_envs=4, config="tracking", model="UAV")
    state, obs = env.reset(jax.random.PRNGKey(0))
    state, out = env.step(state, jnp.zeros((4, 3)))
    assert bool(jnp.isfinite(out.obs).all())


def test_gym_vec_env_smoke():
    """Port of the reference smoke test (test_env.py:11-33): random actions
    until any done flag fires."""
    venv = GymVecEnv(ControlEnv(num_envs=8, config="heading"), seed=0)
    obs = venv.reset()
    assert obs.shape == (8, 1, 22)
    rng = np.random.default_rng(0)
    fired = False
    for _ in range(50):
        actions = rng.uniform(-1, 1, (8, 1, 4)).astype(np.float32)
        obs, reward, done, bad, exceed, info = venv.step(actions)
        assert obs.shape == (8, 1, 22)
        assert reward.shape == (8, 1, 1)
        if done.any() or bad.any():
            fired = True
            break
    # random full-range actions drive the F-16 out of envelope quickly
    assert fired


def test_goal_reached_resets_row_and_resamples_target():
    """is_done (goal reached) triggers the same masked full-row reset as
    bad_done - model state re-inits AND the task target resamples (the
    reference's env_base.py:83-97 semantics; UnreachHeading 'done' docs say
    'resample' but the code resets the whole row - we mirror the code)."""
    env = ControlEnv(num_envs=3, config="tracking")  # random targets
    state, _ = env.reset(jax.random.PRNGKey(0))
    for _ in range(3):
        state, out = env.step(state, jnp.zeros((env.n, env.num_actions)))
    old_target = np.asarray(state.task.target_npos).copy()
    old_count = np.asarray(state.step_count).copy()
    assert (old_count > 0).all()

    state = state.replace(is_done=state.is_done.at[1].set(True))
    state2, _ = env.step(state, jnp.zeros((env.n, env.num_actions)))
    new_count = np.asarray(state2.step_count)
    assert new_count[1] == 1          # row 1 reset then stepped once
    assert new_count[0] == old_count[0] + 1
    new_target = np.asarray(state2.task.target_npos)
    assert new_target[1] != old_target[1]      # resampled
    np.testing.assert_allclose(new_target[0], old_target[0])  # untouched

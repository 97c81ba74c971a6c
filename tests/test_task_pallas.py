"""Fused task kernel (ops/task_pallas.py): interpret-mode equivalence.

The fused TPU step (_step_fused) must produce the same observations,
rewards, flags, and info counters as the portable XLA step for every task
variant - same key, same actions, same initial state. Run with the Pallas
interpreter on CPU; the only tolerated difference is the bf16-multiplicand
drift of the dynamics kernel itself, which is eliminated here by driving
task_step_pallas directly with a shared (stacked-path) state/xdot.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from neuralplane_tpu.envs import ControlEnv


@pytest.fixture()
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        lambda *a, **k: orig(*a, **{**k, "interpret": True}))


@pytest.mark.parametrize("scenario", ["heading", "control", "tracking"])
def test_fused_task_layer_matches_xla(interpret_pallas, scenario):
    from neuralplane_tpu.ops.task_pallas import COND_NAMES, task_step_pallas

    n = 70  # not a tile multiple: exercises padding + masked counts
    env = ControlEnv(num_envs=n, config=scenario, model="F16",
                     aero_backend="stacked")
    key = jax.random.PRNGKey(3)
    state, _ = env.reset(key)
    # advance a few steps with varied actions so flags/targets are non-trivial
    for i in range(3):
        a = jax.random.uniform(jax.random.PRNGKey(10 + i),
                               (n, env.num_actions), minval=-1.0, maxval=1.0)
        state, _ = env.step(state, a)

    # one more step's internals, shared by both paths
    state = env._masked_reset(state)
    a = jax.random.uniform(jax.random.PRNGKey(99), (n, env.num_actions),
                           minval=-1.0, maxval=1.0)
    mstate, xdot = env.model.update_with_xdot(state.model, a)
    step_count = state.step_count + 1

    # XLA task layer
    k_obs = jax.random.split(state.key)[1]
    obs_ref = env.task.get_obs(env.model, mstate, state.task, k_obs)
    done_ref, bad_ref, exceed_ref, info_ref = env.task.get_termination(
        env.model, mstate, xdot, step_count, state.task)
    reward_ref = env.task.get_reward(env.model, mstate, state.task,
                                     done_ref, bad_ref)

    # fused kernel (interpret mode), tile smaller than n
    obs, done, bad, reward, counts = task_step_pallas(
        env.task.kernel_variant, env.config, mstate.s, mstate.u, xdot,
        env.task.kernel_targets(state.task), step_count, tile=32)
    from neuralplane_tpu.envs.tasks.base import add_sensor_noise
    obs = add_sensor_noise(obs, k_obs, env.config.noise_scale)

    np.testing.assert_allclose(np.asarray(obs), np.asarray(obs_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(done), np.asarray(done_ref))
    np.testing.assert_array_equal(np.asarray(bad), np.asarray(bad_ref))
    assert not bool(exceed_ref.any())
    np.testing.assert_allclose(np.asarray(reward), np.asarray(reward_ref),
                               rtol=1e-4, atol=1e-4)
    for i, nm in enumerate(COND_NAMES[env.task.kernel_variant]):
        assert int(counts[i]) == int(info_ref[f"termination/{nm}"]), nm


# The whole-step fused path (reset+lag+dynamics+Euler+task in one kernel)
# is pinned by tests/test_step_pallas.py.

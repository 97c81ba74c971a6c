"""Whole-step kernel (ops/step_pallas.py): interpret-mode equivalence.

The fused TPU step (Env._step_fused: reset select + actuator lag + nlplant
+ Euler + task layer in one kernel) must match the portable step exactly -
same key, same actions, same initial state - when both sides use the same
grouped (bf16) aero weights, because every floating-point operation outside
the shared dynamics kernel is replicated with the same operands. Supersedes
the old partial-fusion test (dynamics kernel + separate task kernel).
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
def test_fused_step_matches_portable(interpret_pallas, scenario, monkeypatch):
    import neuralplane_tpu.ops.step_pallas as sp
    monkeypatch.setattr(sp, "TILE", 32)  # n=70: padding + masked counts

    n = 70
    env = ControlEnv(num_envs=n, config=scenario, model="F16",
                     aero_backend="pallas")
    assert env._task_kernel
    # in-kernel obs noise needs the TPU hardware PRNG (absent in interpret
    # mode) and is a different stream by design; both sides use XLA noise
    import dataclasses
    env.config = dataclasses.replace(env.config, kernel_obs_noise=False, kernel_reset_draws=False)
    env_ref = ControlEnv(num_envs=n, config=scenario, model="F16",
                         aero_backend="pallas")
    env_ref._task_kernel = False

    state, obs0 = env.reset(jax.random.PRNGKey(3))
    # a few warm-up steps so flags/targets/resets become non-trivial
    for i in range(4):
        a = jax.random.uniform(jax.random.PRNGKey(10 + i),
                               (n, env.num_actions), minval=-1.0, maxval=1.0)
        # portable path wants the agent-major F16State (FM carries no
        # recent_*); copy leaves so donation of `state` can't alias it
        from neuralplane_tpu.models.f16 import from_fm
        ref_state = jax.tree.map(
            jnp.array, state.replace(model=from_fm(state.model)))
        state, out = env._step_fused(state, a)
        ref_state, out_ref = env_ref.step(ref_state, a)

        np.testing.assert_allclose(np.asarray(out.obs),
                                   np.asarray(out_ref.obs),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(out.reward),
                                   np.asarray(out_ref.reward),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(out.done),
                                      np.asarray(out_ref.done))
        np.testing.assert_array_equal(np.asarray(out.bad_done),
                                      np.asarray(out_ref.bad_done))
        np.testing.assert_allclose(np.asarray(state.model.s),
                                   np.asarray(ref_state.model.s),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(state.model.u),
                                   np.asarray(ref_state.model.u),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(state.step_count),
                                      np.asarray(ref_state.step_count))
        # targets resampled identically (same k_task draws)
        for t_f, t_r in zip(env.task.kernel_targets(state.task),
                            env_ref.task.kernel_targets(ref_state.task)):
            np.testing.assert_allclose(np.asarray(t_f), np.asarray(t_r),
                                       rtol=1e-6, atol=1e-6)
        for k, v in out.info.items():
            assert int(v) == int(out_ref.info[k].astype(jnp.int32)), k
        # keep keys in lockstep for the next iteration (they advance the
        # same way; this is just an explicit assertion of that)
        np.testing.assert_array_equal(np.asarray(state.key),
                                      np.asarray(ref_state.key))


def test_fused_step_resets_flagged_rows(interpret_pallas):
    """Rows flagged done get re-initialized inside the kernel: altitude
    back in the init band, controls at init_T, step_count restarted."""
    n = 16
    env = ControlEnv(num_envs=n, config="heading", model="F16",
                     aero_backend="pallas")
    import dataclasses
    env.config = dataclasses.replace(env.config, kernel_obs_noise=False, kernel_reset_draws=False)
    state, _ = env.reset(jax.random.PRNGKey(0))
    state = state.replace(
        bad_done=jnp.arange(n) % 2 == 0,
        step_count=jnp.full((n,), 57, jnp.int32))
    flagged = np.asarray(state.bad_done)
    a = jnp.zeros((n, env.num_actions), jnp.float32)
    state, _ = env._step_fused(state, a)
    alt = np.asarray(state.model.s[:, 2])
    sc = np.asarray(state.step_count)
    cfg = env.config
    assert (alt[flagged] >= cfg.min_altitude - 50).all()
    assert (alt[flagged] <= cfg.max_altitude + 50).all()
    assert (sc[flagged] == 1).all()
    assert (sc[~flagged] == 58).all()


def test_resample_targets_matches_reset_from_init():
    """The in-kernel target resample (_resample_targets) is pure jnp math;
    fed the same uniforms it must reproduce each task's reset_from_init
    exactly (the kernel_reset_draws path only changes WHERE the uniforms
    come from, never the formulas)."""
    from neuralplane_tpu.envs import ControlEnv
    from neuralplane_tpu.ops.step_pallas import reset_consts, _resample_targets

    n = 256
    key = jax.random.PRNGKey(11)
    du = jax.random.uniform(key, (8, n))
    for scenario in ("heading", "control", "tracking"):
        env = ControlEnv(num_envs=n, config=scenario, model="F16",
                         aero_backend="stacked")
        cfg = env.config
        rc = reset_consts(cfg, env.task.kernel_variant)
        alt_init = rc["min_alt"] + du[0] * (rc["max_alt"] - rc["min_alt"])
        vt_init = rc["min_vt"] + du[1] * (rc["max_vt"] - rc["min_vt"])
        got = _resample_targets(env.task.kernel_variant, rc, du,
                                alt_init, vt_init)

        # reference: reset_from_init with a mocked uniform stream returning
        # the same du rows in draw order
        import neuralplane_tpu.envs.tasks.heading as th
        draws = iter([du[2], du[3], du[4]])
        orig_uniform = jax.random.uniform

        def fake_uniform(k, shape=(), **kw):
            if shape == (n,) and not kw:  # task resample draws are unit-range
                return next(draws)
            return orig_uniform(k, shape, **kw)

        mask = jnp.ones(n, dtype=bool)
        tstate0 = env.task.init_state(n)
        jax.random.uniform = fake_uniform
        try:
            ts = env.task.reset_from_init(tstate0, mask, alt_init, vt_init,
                                          jax.random.PRNGKey(0))
        finally:
            jax.random.uniform = orig_uniform
        want = env.task.kernel_targets(ts)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-5, atol=1e-3)
        # roundtrip: state_from_kernel_targets inverts kernel_targets
        ts2 = env.task.state_from_kernel_targets(*want)
        for g, w in zip(env.task.kernel_targets(ts2), want):
            assert g is w

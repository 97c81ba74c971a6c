"""Validate the in-kernel reset draws + target resample
(ops/step_pallas.reset_consts/_resample_targets, EnvConfig.kernel_reset_draws)
on real TPU hardware.

The kernel path draws the auto-reset init uniforms (altitude, vt) and the
task target resample from the TPU hardware PRNG, which interpret-mode CPU
tests cannot execute, so the checks run here:

1. masked semantics: rows whose flags are clear keep their targets bit-exact
   across a step; flagged rows land inside the configured init/target ranges.
2. draw consistency: on the heading task with the reference's fixed
   increments, the resampled targets are exact functions of the SAME init
   draws the state restarted from (target_alt = alt_init + 1000,
   target_vt = vt_init, target_heading = wrap_PI(2pi/3)) - checked through
   one Euler step of drift.
3. distributional parity vs the portable XLA path (kernel_reset_draws=False,
   same config): KS distance of the resampled target marginals over a
   full-reset batch, per task variant.

Usage: python tools/validate_kernel_draws.py [--n 65536]
"""
import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ks_distance(a, b):
    import numpy as np
    xs = np.sort(np.concatenate([a, b]))
    ca = np.searchsorted(np.sort(a), xs, side="right") / a.size
    cb = np.searchsorted(np.sort(b), xs, side="right") / b.size
    return float(np.abs(ca - cb).max())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=65536)
    args = ap.parse_args()

    from neuralplane_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from neuralplane_tpu.envs import ControlEnv
    from neuralplane_tpu.utils.math import wrap_PI

    ok = True
    for scenario in ("heading", "control", "tracking"):
        env = ControlEnv(num_envs=args.n, config=scenario, model="F16")
        assert env._task_kernel and env.config.kernel_reset_draws
        env_ref = ControlEnv(num_envs=args.n, config=scenario, model="F16")
        env_ref.config = dataclasses.replace(env_ref.config,
                                             kernel_reset_draws=False)
        cfg = env.config
        a = jnp.zeros((env.n, env.num_actions))

        # --- full-reset batch: every row resamples on the first step ---
        state, _ = env.reset(jax.random.PRNGKey(0))
        state1, _ = env.step(jax.tree.map(jnp.array, state), a)
        sref, _ = env_ref.reset(jax.random.PRNGKey(0))
        sref1, _ = env_ref.step(sref, a)

        # reset() already resamples every row once (through the portable
        # code on both envs), so force an in-step resample of EVERY row by
        # setting all done flags before the next step:
        state_f = state1.replace(
            is_done=jnp.ones(env.n, bool),
            bad_done=jnp.zeros(env.n, bool),
            exceed_time_limit=jnp.zeros(env.n, bool))
        sref_f = sref1.replace(
            is_done=jnp.ones(env.n, bool),
            bad_done=jnp.zeros(env.n, bool),
            exceed_time_limit=jnp.zeros(env.n, bool))
        state2, _ = env.step(state_f, a)
        sref2, _ = env_ref.step(sref_f, a)
        t_k = [np.asarray(t) for t in env.task.kernel_targets(state2.task)]
        t_r = [np.asarray(t) for t in env_ref.task.kernel_targets(sref2.task)]
        s2 = np.asarray(state2.model.s)

        # 3. KS distance of each target marginal vs the portable draws
        ks = [ks_distance(t_k[i], t_r[i]) for i in range(3)]
        ks_ok = all(d < 0.02 for d in ks)
        # 1. ranges (loose: one Euler step of drift on alt/vt-coupled targets)
        if scenario == "heading":
            rng_ok = (
                (t_k[0] > cfg.min_altitude + 1000 - 50).all()
                and (t_k[0] < cfg.max_altitude + 1000 + 50).all()
                and np.allclose(t_k[1], wrap_PI(jnp.zeros(env.n)
                                                + 2 * np.pi / 3), atol=1e-6)
                and (t_k[2] > cfg.min_vt - 50).all()
                and (t_k[2] < cfg.max_vt + 50).all())
            # 2. draw consistency: target_alt - (post-step alt - dt*climb)
            # == 1000 up to one Euler step; vt likewise
            d_alt = t_k[0] - s2[:, 2]
            d_vt = t_k[2] - s2[:, 6]
            cons_ok = (np.abs(d_alt - 1000).max() < 30
                       and np.abs(d_vt).max() < 30)
        elif scenario == "control":
            rng_ok = (
                (np.abs(t_k[0]) <= cfg.max_pitch_increment + 1e-6).all()
                and (np.abs(t_k[1]) <= cfg.max_heading_increment + 1e-6).all()
                and (t_k[2] > cfg.min_vt - cfg.max_velocities_u_increment
                     - 50).all()
                and (t_k[2] < cfg.max_vt + cfg.max_velocities_u_increment
                     + 50).all())
            cons_ok = True
        else:  # tracking: point on a sphere sector around the init position
            dist = np.sqrt(t_k[0] ** 2 + t_k[1] ** 2
                           + (t_k[2] - s2[:, 2]) ** 2)
            rng_ok = ((dist > cfg.min_distance - 100).all()
                      and (dist < cfg.max_distance + 100).all())
            cons_ok = True

        # masked semantics: no flags -> targets bit-exact across a step
        state3, _ = env.step(jax.tree.map(jnp.array, state2), a)
        frozen = ~(np.asarray(state2.is_done) | np.asarray(state2.bad_done)
                   | np.asarray(state2.exceed_time_limit))
        t3 = [np.asarray(t) for t in env.task.kernel_targets(state3.task)]
        keep_ok = all((t3[i][frozen] == t_k[i][frozen]).all()
                      for i in range(3))

        line_ok = ks_ok and rng_ok and cons_ok and keep_ok
        ok &= line_ok
        print(f"{scenario:9s} KS={['%.4f' % d for d in ks]} range={rng_ok} "
              f"consistency={cons_ok} masked-keep={keep_ok} "
              f"{'OK' if line_ok else 'FAIL'}")

    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

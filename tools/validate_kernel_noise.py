"""Validate the in-kernel obs sensor noise (ops/step_pallas._obs_noise_rows)
on real TPU hardware.

The kernel path draws noise from the TPU hardware PRNG (Box-Muller over
mantissa-filled uniforms), which interpret-mode CPU tests cannot execute, so
the distributional check runs here: obs noise does not feed back into the
state, so two envs differing ONLY in noise config follow identical state
trajectories under the same key, and their obs difference is exactly the
noise sample. Checks N(0, noise_scale) moments per step and independence
across steps.

Usage: python tools/validate_kernel_noise.py [--n 8192] [--steps 8]
"""
import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()

    from neuralplane_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from neuralplane_tpu.envs import ControlEnv

    env_k = ControlEnv(num_envs=args.n, config="heading", model="F16")
    assert env_k._task_kernel and env_k.config.kernel_obs_noise
    env_0 = ControlEnv(num_envs=args.n, config="heading", model="F16")
    env_0.config = dataclasses.replace(env_0.config, noise_scale=0.0)

    scale = float(env_k.config.noise_scale)
    sk, _ = env_k.reset(jax.random.PRNGKey(0))
    s0, _ = env_0.reset(jax.random.PRNGKey(0))
    a = jnp.zeros((env_k.n, env_k.num_actions))
    prev = None
    ok = True
    for t in range(args.steps):
        sk, ok_out = env_k.step(sk, a)
        s0, o0_out = env_0.step(s0, a)
        noise = np.asarray(ok_out.obs) - np.asarray(o0_out.obs)
        mu, sd = noise.mean(), noise.std()
        kurt = ((noise - mu) ** 4).mean() / (noise.var() ** 2)
        corr = 0.0
        if prev is not None:
            corr = float(np.corrcoef(noise.ravel(), prev.ravel())[0, 1])
        prev = noise
        line_ok = (abs(mu) < 3 * scale / np.sqrt(noise.size)
                   and abs(sd / scale - 1) < 0.02
                   and abs(kurt - 3) < 0.1 and abs(corr) < 0.01)
        ok &= line_ok
        print(f"step {t}: mean {mu:+.2e} std {sd:.5f} (want {scale}) "
              f"kurtosis {kurt:.3f} step-corr {corr:+.4f} "
              f"{'OK' if line_ok else 'FAIL'}")
        # states must stay in lockstep (noise never feeds back)
        np.testing.assert_allclose(np.asarray(sk.model.s),
                                   np.asarray(s0.model.s), rtol=0, atol=0)
    print("PASS" if ok else "FAIL")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()

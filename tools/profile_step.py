"""Per-stage device timing of the env step at large n.

Times each stage of ControlEnv.step in isolation (aero kernel, full
nlplant, model.update, obs, termination, reward, masked reset, full step)
so HBM-layout / fusion regressions show up as stage-level numbers rather
than one opaque step time. Run on the real TPU:

    python tools/profile_step.py --n 1000000 --iters 30
"""
from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from neuralplane_tpu.utils.cache import enable_persistent_cache
from neuralplane_tpu.utils.profiling import time_fn, trace


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--trace-dir", default=None,
                   help="also capture a jax.profiler trace of the full step")
    args = p.parse_args()
    enable_persistent_cache()

    from neuralplane_tpu.envs import ControlEnv
    from neuralplane_tpu.ops.dynamics import nlplant_f16
    from neuralplane_tpu.ops.aero import aero_coeffs_t

    n = args.n
    env = ControlEnv(num_envs=n, config="heading", model="F16")
    key = jax.random.PRNGKey(0)
    state, obs = env.reset(key)
    action = jnp.tile(jnp.array([[1.0, 0.0, 0.0, 0.0]], jnp.float32), (n, 1))
    state, out = env.step(state, action)  # settle into steady-state shapes
    jax.block_until_ready(state)

    w = env.model.weights
    s, u = state.model.s, state.model.u
    alpha = s[:, 7] * 180.0 / jnp.pi
    beta = s[:, 8] * 180.0 / jnp.pi
    el = u[:, 1]
    jax.block_until_ready((alpha, beta, el))

    rows = []

    def stage(name, fn, *a):
        jfn = jax.jit(fn)
        r = time_fn(jfn, *a, iters=args.iters, warmup=2)
        rows.append((name, r["mean_s"]))
        print(f"{name:28s} {r['mean_s']*1e3:8.3f} ms")

    stage("aero_query (kernel)",
          lambda al, be, e: aero_coeffs_t(w, al, be, e), alpha, beta, el)
    stage("nlplant (aero+forces)",
          lambda s_, u_: nlplant_f16(w, s_, u_), s, u)
    stage("model.update (u-lag+integ)",
          lambda ms, a: env.model.update_with_xdot(ms, a),
          state.model, action)
    # obs / termination / reward each need xdot or keys
    _, xdot = jax.jit(env.model.update_with_xdot)(state.model, action)
    jax.block_until_ready(xdot)
    k_obs = jax.random.PRNGKey(1)
    stage("task.get_obs",
          lambda ms, ts, k: env.task.get_obs(env.model, ms, ts, k),
          state.model, state.task, k_obs)
    stage("task.get_termination",
          lambda ms, xd, sc, ts: env.task.get_termination(
              env.model, ms, xd, sc, ts),
          state.model, xdot, state.step_count, state.task)
    done = state.is_done
    stage("task.get_reward",
          lambda ms, ts, d, b: env.task.get_reward(env.model, ms, ts, d, b),
          state.model, state.task, done, done)
    stage("masked_reset", env._masked_reset, state)
    stage("FULL step", functools.partial(env.step), state, action)

    total_stages = sum(t for nm, t in rows[:-1] if nm != "aero_query (kernel)"
                       and nm != "nlplant (aero+forces)")
    print(f"\nsum(update+obs+term+reward+reset) = {total_stages*1e3:.3f} ms")

    if args.trace_dir:
        step = jax.jit(env.step)
        st = state
        with trace(args.trace_dir):
            for _ in range(5):
                st, _ = step(st, action)
            jax.block_until_ready(st)
        print("trace written to", args.trace_dir)


if __name__ == "__main__":
    main()

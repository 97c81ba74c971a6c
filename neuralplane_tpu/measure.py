"""Throughput measurement harness (the reference measure_env.py equivalent).

Times the full env step (auto-reset + dynamics + obs + termination + reward)
at agent counts n = 10^0 .. 10^6, reporting wall time for 500 steps and
per-step latency, plus device memory when available. Timing uses
block_until_ready on the final state, and mirrors the reference protocol
(`envs/measure_env.py:65-78`): a host loop around one compiled step with a
fixed near-trim action, after a warmup step that triggers compilation.
"""
from __future__ import annotations

import time
from typing import Dict, List

import jax
import jax.numpy as jnp

from .envs import ControlEnv


def measure_env_step(n: int, steps: int = 500, scenario: str = "heading",
                     model: str = "F16", aero_backend: str = "auto") -> Dict:
    """Wall-time `steps` env steps at batch size n. Returns timing dict."""
    env = ControlEnv(num_envs=n, config=scenario, model=model,
                     aero_backend=aero_backend)
    state, _ = env.reset(jax.random.PRNGKey(0))
    # near-trim action: full throttle command, neutral surfaces (the reference
    # passes raw INIT_U controls which clamp to ~[1, 0, 0, 0]).
    action = jnp.tile(jnp.array([[1.0, 0.0, 0.0, 0.0]], dtype=jnp.float32), (env.n, 1))

    # warmup/compile
    state, out = env.step(state, action)
    jax.block_until_ready(state)

    t0 = time.perf_counter()
    for _ in range(steps):
        state, out = env.step(state, action)
    jax.block_until_ready(state)
    elapsed = time.perf_counter() - t0

    # allocator stats when the runtime exposes them (the axon relay does
    # not: memory_stats() is None there); the analytic resident footprint
    # (env state + obs + aero weights nbytes — a lower bound: the small
    # non-obs StepOutput fields are excluded) is always reported so the
    # memory column of the benchmark never goes missing
    mem_mb = float("nan")
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats and "bytes_in_use" in stats:
            mem_mb = stats["bytes_in_use"] / 1024 ** 2
    except Exception:
        pass
    leaves = (jax.tree_util.tree_leaves(state)
              + jax.tree_util.tree_leaves(out.obs)
              + jax.tree_util.tree_leaves(env.model.weights))
    resident_mb = sum(x.nbytes for x in leaves) / 1024 ** 2

    return {
        "n": n,
        "steps": steps,
        "elapsed_s": elapsed,
        "s_per_step": elapsed / steps,
        "agent_steps_per_s": n * steps / elapsed,
        "device_mem_mb": mem_mb,
        "resident_state_mb": resident_mb,
    }


def measure_sweep(max_exp: int = 6, steps: int = 500) -> List[Dict]:
    return [measure_env_step(10 ** e, steps=steps) for e in range(max_exp + 1)]


def measure_combat_step(n: int, steps: int = 500, env_name: str = "SingleCombat",
                        aero_backend: str = "auto") -> Dict:
    """Wall-time the combat-family env step at ~n total agents.

    Same protocol as measure_env_step, but for the 4 combat envs: gun 1v1
    (5 PID+FDM substeps per env step, `singlecombat_env.py:244-261`), team
    nvn (1 substep + all-pairs geometry), and their missile variants
    (+ [n, K] weapon layer, with the shoot bit held HIGH so launch gating /
    PN flight / hit tests are all exercised). n is rounded down to a whole
    number of env groups.
    """
    from .envs import (MultipleCombatEnv, MultipleCombatShootEnv,
                       SingleCombatEnv, SingleCombatShootEnv)
    cls, cfg_name, shoot = {
        "SingleCombat": (SingleCombatEnv, "selfplay", False),
        "SingleCombatShoot": (SingleCombatShootEnv, "selfplay_shoot", True),
        "MultipleCombat": (MultipleCombatEnv, "multiple_selfplay", False),
        "MultipleCombatShoot": (MultipleCombatShootEnv,
                                "multiple_selfplay_shoot", True),
    }[env_name]
    kw = {} if env_name.startswith("Multiple") else \
        {"aero_backend": aero_backend}
    probe = cls(num_envs=1, config=cfg_name, **kw)
    num_envs = max(1, n // probe.num_agents)
    env = cls(num_envs=num_envs, config=cfg_name, **kw)
    if shoot:
        # mid-bin demands + shoot bit high: worst-case weapon-layer work
        action = jnp.tile(
            jnp.array([[20.0, 20.0, 20.0, 20.0, 1.0]], jnp.float32),
            (env.n, 1))
    else:
        action = jnp.tile(jnp.array([[1.0, 0.0, 0.0, 0.0]], jnp.float32),
                          (env.n, 1))
    state, _ = env.reset(jax.random.PRNGKey(0))
    state, out = env.step(state, action)        # warmup/compile
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, out = env.step(state, action)
    jax.block_until_ready(state)
    elapsed = time.perf_counter() - t0
    return {
        "env": env_name,
        "n": env.n,
        "num_envs": num_envs,
        "steps": steps,
        "elapsed_s": elapsed,
        "s_per_step": elapsed / steps,
        "agent_steps_per_s": env.n * steps / elapsed,
        "inner_fdm_steps": env.inner_steps,
    }


def measure_combat_sweep(max_exp: int = 6, steps: int = 200):
    """Combat + shoot rows at n = 10^1 .. 10^max_exp total agents.

    A generator (one yield per finished row) so callers can stream rows
    out as they land — the sweep compiles 4 env classes x max_exp batch
    shapes, minutes each cold through the TPU relay, and a buffered list
    would lose everything to a mid-sweep timeout or relay wedge.
    """
    for env_name in ("SingleCombat", "SingleCombatShoot",
                     "MultipleCombat", "MultipleCombatShoot"):
        for e in range(1, max_exp + 1):
            yield measure_combat_step(10 ** e, steps=steps,
                                      env_name=env_name)

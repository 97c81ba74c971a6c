"""Whole-env-step Pallas kernel: masked reset + actuator lag + nlplant +
Euler + the full task layer in ONE pass over VMEM-resident tiles.

After the nlplant and task kernels, the remaining XLA glue at n=10^6 was
still ~1 ms of full-batch HBM round-trips: the masked reset select on
[n,12]/[n,5] (~0.3 ms), the actuator lag, the Euler add (~0.25 ms), and the
xdot [16,n] write + re-read between the two kernels (~0.15 ms). This kernel
absorbs all of it: per grid tile it

  1. reset-selects the state/control rows for rows flagged done last step
     (init values: alt/vt from pre-drawn uniforms, everything else zero,
     thrust init_T - models/f16.py:reset, reference F16_model.py:33-45),
  2. applies the actuator first-order lag u <- 0.9u + 0.1*clip(a)*scale
     (F16_model.py:51-62),
  3. evaluates the 43 aero surrogates + force/moment build-up
     (ops/aero_pallas.aero_coeff_rows + ops/dynamics.nlplant_core),
  4. integrates s' = s + dt*xdot (Euler, the reference default),
  5. runs the task layer (22-slot obs, 6 terminations, reward, per-tile
     counts - ops/task_pallas.task_rows) at (s', u', xdot),

and writes only the final products; xdot never touches HBM.

The target resample that logically happens between (1) and (5) stays in
XLA because it only needs the INIT values of reset rows (reset rows always
restart from alt=alt_init, vt=vt_init, heading/pitch/npos/epos=0), so each
task's `reset_from_init` computes post-reset targets from the same uniform
draws without materializing the post-reset state
(envs/tasks/{heading,control,tracking}.py).

Semantics equal the portable step path by construction; pinned by
tests/test_step_pallas.py (interpret mode, grouped weights on both sides).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .aero import IDX
from . import aero_pallas
from .aero_pallas import (G, GroupedAeroWeightsT, N_S, N_U, N_XD, OUT, TILE,
                          WIDE, aero_coeff_rows)
from .dynamics import R2D, nlplant_core
from .task_pallas import (N_CND, N_OBS, task_consts, task_rows,
                          write_task_outputs)

# actuator scales (models/f16.py, reference F16_model.py:53-56)
THRUST_SCALE = 0.225 * 76300.0 / 0.3048
SURFACE_SCALE = 45.0
N_ACT = 4
N_UO = 8  # 5 control rows, sublane-padded


def _uniform_rows(rows: int, tile: int):
    """[rows, tile] U[0,1) from the TPU hardware PRNG (mantissa fill).
    The generator must already be seeded (pltpu.prng_seed); successive
    calls continue the stream."""
    bits = pltpu.bitcast(pltpu.prng_random_bits((rows, tile)), jnp.uint32)
    # uniform [1,2) via mantissa fill, then shift to [0,1)
    return pltpu.bitcast((bits >> 9) | jnp.uint32(0x3F800000),
                         jnp.float32) - 1.0


def _obs_noise_rows(tile: int, noise_scale: float):
    """In-kernel sensor noise: hardware PRNG bits -> Box-Muller normals.

    24 uniform rows pair into 24 normal rows (12 radii x cos/sin); the
    first 22 perturb the observation. Distribution matches the portable
    path's jax.random.normal * noise_scale (tasks/base.add_sensor_noise);
    the stream differs (documented in EnvConfig.kernel_obs_noise)."""
    u = _uniform_rows(N_OBS, tile)
    half = N_OBS // 2
    r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u[:half], 1e-7)))
    th = (2.0 * np.pi) * u[half:]
    return jnp.concatenate([r * jnp.cos(th), r * jnp.sin(th)],
                           axis=0) * noise_scale


def reset_consts(cfg, variant: str) -> dict:
    """Config scalars for the in-kernel init draws + target resample
    (EnvConfig.kernel_reset_draws). Formulas mirror models/f16.py:reset and
    tasks/{heading,control,tracking}.reset_from_init exactly; only the
    uniform stream differs (hardware PRNG instead of threefry)."""
    rc = {
        "min_alt": float(cfg.min_altitude), "max_alt": float(cfg.max_altitude),
        "min_vt": float(cfg.min_vt), "max_vt": float(cfg.max_vt),
    }
    if variant == "heading":
        rc["random_inc"] = bool(cfg.heading_random_increments)
        rc["max_hdg_inc"] = float(cfg.max_heading_increment)
        rc["max_alt_inc"] = float(cfg.max_altitude_increment)
        rc["max_vu_inc"] = float(cfg.max_velocities_u_increment)
    elif variant == "control":
        rc["max_pitch_inc"] = float(cfg.max_pitch_increment)
        rc["max_hdg_inc"] = float(cfg.max_heading_increment)
        rc["max_vu_inc"] = float(cfg.max_velocities_u_increment)
    elif variant == "tracking":
        rc["min_dist"] = float(cfg.min_distance)
        rc["max_dist"] = float(cfg.max_distance)
    return rc


def _resample_targets(variant: str, rc: dict, du, alt_init, vt_init):
    """Post-reset targets from the in-kernel uniform rows du[2:5].
    Mirrors tasks/{heading,control,tracking}.reset_from_init."""
    from .task_pallas import _wrap_pi
    if variant == "heading":
        if rc["random_inc"]:
            d_hdg = (du[2] - 0.5) * 2.0 * rc["max_hdg_inc"]
            d_alt = (du[3] - 0.5) * 2.0 * rc["max_alt_inc"]
            d_vt = (du[4] - 0.5) * 2.0 * rc["max_vu_inc"]
        else:  # reference fixed increments (heading_task.py:60-69)
            d_hdg = 2.0 * np.pi / 3.0
            d_alt = 1000.0
            d_vt = 0.0
        return (alt_init + d_alt, _wrap_pi(jnp.zeros_like(alt_init) + d_hdg),
                vt_init + d_vt)
    if variant == "control":
        d_pitch = (du[2] - 0.5) * 2.0 * rc["max_pitch_inc"]
        d_hdg = (du[3] - 0.5) * 2.0 * rc["max_hdg_inc"]
        d_vt = (du[4] - 0.5) * 2.0 * rc["max_vu_inc"]
        return (_wrap_pi(d_pitch), _wrap_pi(d_hdg), vt_init + d_vt)
    # tracking: point on a sphere sector (tracking_task.py:57-71)
    dist = du[2] * (rc["max_dist"] - rc["min_dist"]) + rc["min_dist"]
    th1 = du[3] * (np.pi / 3.0) - np.pi / 6.0
    th2 = du[4] * (np.pi / 3.0) - np.pi / 6.0
    return (dist * jnp.cos(th1) * jnp.cos(th2),
            dist * jnp.cos(th1) * jnp.sin(th2),
            alt_init + dist * jnp.sin(th1))


def _step_kernel(s_ref, u_ref, act_ref, msk_ref, *rest,
                 variant: str, consts: dict, rconsts: dict, dt: float,
                 init_T: float, n: int, tile: int, hidden_bf16: bool,
                 distilled: bool, noise_scale: float, reset_draws: bool):
    # rest = [alt, vt (unless reset_draws)] + [tg0, tg1, tg2, sc]
    #        + [seed (SMEM, if noise or draws)] + weight refs (8)
    #        + 7 output refs [+ tg0/1/2 outs, if reset_draws]
    #        (+ h3 scratch, grouped only)
    if not reset_draws:
        alt_ref, vt_ref, rest = rest[0], rest[1], rest[2:]
    tg0_ref, tg1_ref, tg2_ref, sc_ref = rest[:4]
    rest = rest[4:]
    if noise_scale > 0.0 or reset_draws:
        seed_ref, rest = rest[0], rest[1:]
        # two seed words (Mosaic's prng_set_seed_32 limit), ~2^62 distinct
        # streams: two 31-bit host draws, tile id folded into the second.
        # A single word + tile id would birthday-collide across
        # (step, tile) pairs over long runs (~1.2e8 streams drawn from
        # 2^31 at n=10^6), replaying a tile's noise/reset draws.
        pltpu.prng_seed(seed_ref[0], seed_ref[1] + pl.program_id(0))
    w_refs = rest[:8]
    outs = rest[8:]
    (s_out, u_out, obs_ref, done_ref, bad_ref, rew_ref,
     cnt_ref) = outs[:7]
    outs = outs[7:]
    if reset_draws:
        tg_outs, outs = outs[:3], outs[3:]
    if not distilled:
        h3_scratch = outs[0]
    m = msk_ref[...] != 0.0

    # 0. init draws + target resample, in-kernel (hardware PRNG) when
    #    enabled: rows 0/1 are the alt/vt init uniforms, rows 2-4 the task
    #    resample draws (EnvConfig.kernel_reset_draws)
    if reset_draws:
        du = _uniform_rows(8, tile)
        alt_init = rconsts["min_alt"] + du[0] * (rconsts["max_alt"]
                                                 - rconsts["min_alt"])
        vt_init = rconsts["min_vt"] + du[1] * (rconsts["max_vt"]
                                               - rconsts["min_vt"])
        t_new = _resample_targets(variant, rconsts, du, alt_init, vt_init)
        tr = tuple(jnp.where(m, t_new[i], (tg0_ref[...], tg1_ref[...],
                                           tg2_ref[...])[i])
                   for i in range(3))
        for i in range(3):
            tg_outs[i][...] = tr[i]
    else:
        alt_init, vt_init = alt_ref[...], vt_ref[...]
        tr = (tg0_ref[...], tg1_ref[...], tg2_ref[...])

    # 1. masked reset select (rows restart from the init state)
    s_rows = []
    for i in range(N_S):
        cur = s_ref[i, :]
        if i == 2:
            s_rows.append(jnp.where(m, alt_init, cur))
        elif i == 6:
            s_rows.append(jnp.where(m, vt_init, cur))
        else:
            s_rows.append(jnp.where(m, 0.0, cur))

    # 2. actuator first-order lag on the post-reset control
    u_prev = [jnp.where(m, init_T, u_ref[0, :])] \
        + [jnp.where(m, 0.0, u_ref[i, :]) for i in (1, 2, 3)]
    scales = (THRUST_SCALE, SURFACE_SCALE, SURFACE_SCALE, SURFACE_SCALE)
    u_rows = [0.9 * u_prev[i]
              + 0.1 * jnp.clip(act_ref[i, :], -1.0, 1.0) * scales[i]
              for i in range(N_ACT)]
    u_rows.append(jnp.zeros_like(u_rows[0]))  # lef pinned to 0

    # 3. state derivative at (post-reset s, lagged u)
    if distilled:
        from .aero_pallas import distilled_coeff_rows, distilled_feature_rows
        ft = distilled_feature_rows(s_rows[7] * R2D, s_rows[8] * R2D,
                                    u_rows[1])
        c = distilled_coeff_rows(ft, *w_refs, hidden_bf16)
    else:
        xt = jnp.stack([s_rows[7] * R2D, s_rows[8] * R2D,
                        u_rows[1]]).astype(jnp.bfloat16)
        c = aero_coeff_rows(xt, *w_refs, h3_scratch, hidden_bf16)
    xd = nlplant_core(tuple(s_rows), tuple(u_rows), lambda nm: c[IDX[nm]])

    # 4. Euler integration
    s_new = [s_rows[i] + dt * xd[i] for i in range(N_S)]

    # 5. task layer at the post-update state with the step-start xdot
    obs_rows, done, bad, reward, conds = task_rows(
        variant, consts, s_new, u_rows, xd, tr, sc_ref[...])
    if noise_scale > 0.0:
        noise = _obs_noise_rows(tile, noise_scale)
        obs_rows = [obs_rows[i] + noise[i] for i in range(len(obs_rows))]

    zeros = jnp.zeros_like(s_new[0])
    s_out[:] = jnp.stack(s_new + [zeros] * (N_XD - N_S))
    u_out[:] = jnp.stack(u_rows + [zeros] * (N_UO - N_U))
    write_task_outputs(obs_rows, done, bad, reward, conds, n, tile,
                       obs_ref, done_ref, bad_ref, rew_ref, cnt_ref)


def env_step_pallas(variant: str, cfg, gw_t: GroupedAeroWeightsT,
                    sf: jnp.ndarray, uf: jnp.ndarray, action4: jnp.ndarray,
                    reset_mask: jnp.ndarray, alt_init: jnp.ndarray,
                    vt_init: jnp.ndarray, targets: Tuple,
                    step_count: jnp.ndarray, tile: int | None = None,
                    hidden_bf16: bool = True,
                    noise_seed: Optional[jnp.ndarray] = None,
                    noise_scale: float = 0.0,
                    reset_draws: bool = False):
    """Fused env step. Inputs are the PRE-reset state/control in the
    feature-major padded layout (sf [16,n], uf [8,n] - models/f16.py
    F16StateFM; the kernel's native tile layout, so the previous step's
    outputs feed back with zero re-layout work), this step's action
    ([n,4], unclipped), the done mask from last step, pre-drawn init
    uniforms, POST-resample targets, and the post-reset step_count (already
    `where(mask, 0, sc) + 1`). Returns (sf' [16,n], uf' [8,n], obs [n,22],
    done bool[n], bad bool[n], reward f32[n], counts f32[6]).

    With noise_seed (int32 [2], two independent seed words) + noise_scale
    > 0, sensor noise is drawn
    in-kernel from the TPU hardware PRNG (_obs_noise_rows; NOT available in
    interpret mode) and the returned obs is already noisy; otherwise obs is
    noiseless and the caller adds XLA noise (tasks/base.add_sensor_noise).

    With reset_draws=True (requires noise_seed), the alt/vt init uniforms
    AND the task target resample also run in-kernel from the hardware PRNG
    (EnvConfig.kernel_reset_draws): alt_init/vt_init args are ignored (pass
    None), `targets` must be the PRE-resample targets, and the return tuple
    gains the post-resample targets (t0, t1, t2) at the end."""
    import functools

    n = sf.shape[1]
    kernel_noise = noise_seed is not None and noise_scale > 0.0
    distilled = type(gw_t).__name__ == "DistilledAeroWeightsT"
    if tile is None:
        # module globals, so tests can monkeypatch them. The distilled
        # backend's VMEM footprint is ~5x smaller (no [G*WIDE, tile]
        # activation scratch), so larger tiles fit and amortize better
        # (TPU sweep: 8192 -> 3.87 ms/step vs 4.35 at 2048; 16384 OOMs).
        tile = aero_pallas.DISTILLED_TILE if distilled else TILE
    # a block equal to the full array is always legal (Mosaic requirement:
    # lane dim divisible by 128 OR equal to the array dim), so small batches
    # run as a single whole-array block
    tile = min(tile, n)
    grid = -(-n // tile)

    if reset_draws:
        assert noise_seed is not None, "reset_draws needs a PRNG seed"
    kernel = functools.partial(
        _step_kernel, variant=variant, consts=task_consts(cfg),
        rconsts=reset_consts(cfg, variant) if reset_draws else {},
        dt=float(cfg.dt), init_T=float(cfg.init_state.init_T), n=n,
        tile=tile, hidden_bf16=hidden_bf16, distilled=distilled,
        noise_scale=float(noise_scale) if kernel_noise else 0.0,
        reset_draws=reset_draws)

    row = lambda i: (0, i)
    vec = lambda i: (i,)
    const = lambda i: (0, 0)
    const3 = lambda i: (0, 0, 0)
    act_t = action4.T
    # init uniforms / targets stay separate [n] vectors: stacking them into
    # [2,n]/[3,n] blocks cost ~0.2 ms of reshape+pad fusions per step at 10^6

    if distilled:
        from .aero_pallas import distilled_weight_specs
        weight_specs = distilled_weight_specs(*gw_t.W1.shape)
        scratch_shapes = []
    else:
        weight_specs = [
            pl.BlockSpec((G, WIDE, 3), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, WIDE), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, WIDE, WIDE), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, WIDE), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, WIDE, WIDE), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, WIDE), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((OUT, G * WIDE), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((OUT,), lambda i: (0,), memory_space=pltpu.VMEM),
        ]
        scratch_shapes = [pltpu.VMEM((G * WIDE, tile), jnp.bfloat16)]

    seed_specs = []
    seed_args = ()
    if kernel_noise or reset_draws:
        seed_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
        seed_args = (noise_seed.astype(jnp.int32),)

    vspec = pl.BlockSpec((tile,), vec, memory_space=pltpu.VMEM)
    initdraw_specs = [] if reset_draws else [vspec, vspec]
    initdraw_args = () if reset_draws else (alt_init, vt_init)
    tgt_out_specs = [vspec] * 3 if reset_draws else []
    tgt_out_shapes = ([jax.ShapeDtypeStruct((n,), jnp.float32)] * 3
                      if reset_draws else [])

    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((N_XD, tile), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((N_UO, tile), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((N_ACT, tile), row, memory_space=pltpu.VMEM),
            vspec,
            *initdraw_specs,
            vspec,
            vspec,
            vspec,
            vspec,
            *seed_specs,
            *weight_specs,
        ],
        out_specs=[
            pl.BlockSpec((N_XD, tile), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((N_UO, tile), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((N_OBS, tile), row, memory_space=pltpu.VMEM),
            vspec,
            vspec,
            vspec,
            pl.BlockSpec((N_CND, 128), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            *tgt_out_specs,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N_XD, n), jnp.float32),
            jax.ShapeDtypeStruct((N_UO, n), jnp.float32),
            jax.ShapeDtypeStruct((N_OBS, n), jnp.float32),
            jax.ShapeDtypeStruct((n,), jnp.float32),
            jax.ShapeDtypeStruct((n,), jnp.float32),
            jax.ShapeDtypeStruct((n,), jnp.float32),
            jax.ShapeDtypeStruct((N_CND, grid * 128), jnp.float32),
            *tgt_out_shapes,
        ],
        scratch_shapes=scratch_shapes,
    )(sf, uf, act_t, reset_mask.astype(jnp.float32),
      *initdraw_args, targets[0], targets[1], targets[2],
      step_count.astype(jnp.int32), *seed_args, *gw_t)

    sf_new, uf_new, obs_t, done_f, bad_f, reward, counts = outs[:7]
    # lane 0 of each tile's replicated count block (see task_pallas.py note)
    tile_counts = counts.reshape(N_CND, grid, 128)[:6, :, 0]
    base = (sf_new, uf_new, obs_t[:22].T,
            done_f > 0.5, bad_f > 0.5, reward, tile_counts.sum(axis=1))
    return base + tuple(outs[7:10]) if reset_draws else base

"""Fused Pallas TPU kernel for the 43-surrogate aero query.

Why: the stacked-einsum path (ops/aero.py) materializes [43, n, 20]
activations in HBM - ~3.4 GB per layer at n = 10^6 - so the aero query is
HBM-bandwidth bound (~34 GB of traffic per env step). This kernel keeps all
activations in VMEM: HBM traffic drops to the [n,3] input + [n,43] output
(~0.2 GB).

How: the 43 nets are lane-packed into G=8 groups of S=6, padded to the
128-lane tile width (6 nets x 20 hidden = 120 -> 128). Within a group the
layer-2/3 weights form a block-diagonal [128,128] matrix, so each layer is
ONE exactly-tile-shaped MXU matmul [T,128] @ [128,128] instead of 43 tiny
[T,20] @ [20,20] contractions. Layer-3 activations for all groups land in a
[T, G*128] VMEM scratch at aligned 128-lane offsets, and the 43 outputs come
from a single wide block-diagonal [G*128, 64] matmul - no narrow lane writes
anywhere. The zero padding costs ~10x redundant FLOPs, but the exact query
is only 57.6 kFLOP/row - locality and lane alignment dominate, not FLOPs.

Multiplies are bf16 with f32 accumulation - the same arithmetic XLA's
default matmul precision uses on the stacked path (verified equal max error
against a float64 oracle).

Grid: 1-D over row tiles of T=2048; weight specs use constant index maps so
they stay VMEM-resident across tiles (~1.1 MB total).

No custom VJP: the dynamics are never differentiated through (PPO treats
the simulator as a black box); the stacked path remains for any future
gradient-based use and for CPU/GPU.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .aero import AeroWeights, K, IDX
from .buildup import B_SPAN, CBAR, coeff_buildup

S = 6                      # nets per group
G = -(-K // S)             # 8 groups (43 padded to 48 net slots)
WIDE = 128                 # lane-padded group width (6 x 20 = 120 -> 128)
OUT = 64                   # lane-padded output width (48 -> 64)
TILE = 2048                # rows per grid step (grouped 43-net kernels)
DISTILLED_TILE = 8192      # rows per grid step, distilled backend (its VMEM
#                            footprint is ~5x smaller; TPU-swept optimum)


class GroupedAeroWeights(NamedTuple):
    W1: jnp.ndarray  # [G, 3, WIDE]
    b1: jnp.ndarray  # [G, WIDE]
    W2: jnp.ndarray  # [G, WIDE, WIDE]   block-diagonal per group
    b2: jnp.ndarray  # [G, WIDE]
    W3: jnp.ndarray  # [G, WIDE, WIDE]   block-diagonal (60 cols used)
    b3: jnp.ndarray  # [G, WIDE]
    W4: jnp.ndarray  # [G*WIDE, OUT]     block-diagonal output columns
    b4: jnp.ndarray  # [OUT]


def pack_grouped(w: AeroWeights, dtype=jnp.float32) -> GroupedAeroWeights:
    """Lane-pack stacked [K, ...] weights into aligned block-diagonal form."""
    W1 = np.zeros((G, 3, WIDE), np.float32)
    b1 = np.zeros((G, WIDE), np.float32)
    W2 = np.zeros((G, WIDE, WIDE), np.float32)
    b2 = np.zeros((G, WIDE), np.float32)
    W3 = np.zeros((G, WIDE, WIDE), np.float32)
    b3 = np.zeros((G, WIDE), np.float32)
    W4 = np.zeros((G * WIDE, OUT), np.float32)
    b4 = np.zeros((OUT,), np.float32)
    w_np = jax.device_get(w)
    for k in range(K):
        g, s = divmod(k, S)
        h1 = slice(s * 20, (s + 1) * 20)
        h3 = slice(s * 10, (s + 1) * 10)
        W1[g, :, h1] = w_np.W1[k]
        b1[g, h1] = w_np.b1[k]
        W2[g, h1, h1] = w_np.W2[k]
        b2[g, h1] = w_np.b2[k]
        W3[g, h1, h3] = w_np.W3[k]
        b3[g, h3] = w_np.b3[k]
        W4[g * WIDE + s * 10:g * WIDE + (s + 1) * 10, k] = w_np.W4[k]
        b4[k] = w_np.b4[k]
    # weights ship pre-cast to bf16 (multiplicand precision); biases stay
    # f32 (they add into the f32 accumulators)
    return GroupedAeroWeights(
        W1=jnp.asarray(W1, jnp.bfloat16), b1=jnp.asarray(b1),
        W2=jnp.asarray(W2, jnp.bfloat16), b2=jnp.asarray(b2),
        W3=jnp.asarray(W3, jnp.bfloat16), b3=jnp.asarray(b3),
        W4=jnp.asarray(W4, jnp.bfloat16), b4=jnp.asarray(b4))


class GroupedAeroWeightsT(NamedTuple):
    """Feature-major (transposed) weights for the left-multiplying kernel."""
    W1: jnp.ndarray  # [G, WIDE, 3]
    b1: jnp.ndarray
    W2: jnp.ndarray  # [G, WIDE, WIDE]
    b2: jnp.ndarray
    W3: jnp.ndarray  # [G, WIDE, WIDE]
    b3: jnp.ndarray
    W4: jnp.ndarray  # [OUT, G*WIDE]
    b4: jnp.ndarray


def pack_grouped_t(w: AeroWeights) -> GroupedAeroWeightsT:
    """Feature-major (transposed) packing for the left-multiplying kernel:
    every weight is stored W^T so activations stay [features, T] end to end
    and the coefficient-major output needs NO transpose anywhere. This is
    the production TPU path: measured 6.9 ms vs 10.0 ms (row-major kernel)
    vs 25 ms (stacked XLA) per 10^6-agent eval - the row-major kernel's
    per-tile [T,64]->[64,T] output relayout was its remaining bottleneck."""
    g = pack_grouped(w)
    return GroupedAeroWeightsT(
        W1=jnp.swapaxes(g.W1, 1, 2), b1=g.b1,
        W2=jnp.swapaxes(g.W2, 1, 2), b2=g.b2,
        W3=jnp.swapaxes(g.W3, 1, 2), b3=g.b3,
        W4=g.W4.T, b4=g.b4)


def _aero_kernel_t(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                   w4_ref, b4_ref, out_ref, h3_scratch):
    """Feature-major: h = W^T @ h, activations [features, T]."""
    bf = jnp.bfloat16
    xt = x_ref[:].astype(bf)  # [3, T] (input arrives pre-transposed)
    for g in range(G):
        h = jnp.maximum(jnp.dot(w1_ref[g], xt,
                                preferred_element_type=jnp.float32)
                        + b1_ref[g][:, None], 0.0)
        h = jnp.maximum(jnp.dot(w2_ref[g], h.astype(bf),
                                preferred_element_type=jnp.float32)
                        + b2_ref[g][:, None], 0.0)
        h = jnp.maximum(jnp.dot(w3_ref[g], h.astype(bf),
                                preferred_element_type=jnp.float32)
                        + b3_ref[g][:, None], 0.0)
        h3_scratch[g * WIDE:(g + 1) * WIDE, :] = h.astype(bf)
    out_ref[:] = jnp.dot(w4_ref[:], h3_scratch[:],
                         preferred_element_type=jnp.float32) \
        + b4_ref[:][:, None]


def _aero_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                 w4_ref, b4_ref, out_ref, h3_scratch):
    bf = jnp.bfloat16
    x = x_ref[:].astype(bf)  # [T, 3]
    for g in range(G):  # static unroll: 8 groups x 3 aligned matmuls
        h = jnp.maximum(jnp.dot(x, w1_ref[g],
                                preferred_element_type=jnp.float32)
                        + b1_ref[g], 0.0)
        h = jnp.maximum(jnp.dot(h.astype(bf), w2_ref[g],
                                preferred_element_type=jnp.float32)
                        + b2_ref[g], 0.0)
        h = jnp.maximum(jnp.dot(h.astype(bf), w3_ref[g],
                                preferred_element_type=jnp.float32)
                        + b3_ref[g], 0.0)
        h3_scratch[:, g * WIDE:(g + 1) * WIDE] = h.astype(bf)
    # one wide block-diagonal output matmul -> all 43 coefficients, emitted
    # COEFFICIENT-MAJOR [OUT, T]: the transpose happens here in VMEM, where
    # it is a cheap relayout - doing it in XLA on the full [n, OUT] output
    # costs ~16 GB of strided HBM traffic per eval at n=10^6
    y = jnp.dot(h3_scratch[:], w4_ref[:],
                preferred_element_type=jnp.float32) + b4_ref[:]
    out_ref[:] = y.T


@functools.partial(jax.jit, static_argnames=("tile",))
def aero_coeffs_pallas_t(gw: GroupedAeroWeights, alpha_deg, beta_deg, el_deg,
                         tile: int = TILE) -> jnp.ndarray:
    """Fused aero query, coefficient-major: [K, n] rows in AERO_NAMES order."""
    n = alpha_deg.shape[0]
    x = jnp.stack([alpha_deg, beta_deg, el_deg], axis=-1)  # [n, 3]
    tile = min(tile, n)  # tile == n when small: block equals the array dim (legal)
    n_pad = -(-n // tile) * tile
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))

    const = lambda i: (0, 0)          # weights: same block every grid step
    const3 = lambda i: (0, 0, 0)
    out = pl.pallas_call(
        _aero_kernel,
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 3, WIDE), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, WIDE), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, WIDE, WIDE), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, WIDE), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, WIDE, WIDE), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, WIDE), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((G * WIDE, OUT), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((OUT,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((OUT, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((OUT, n_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile, G * WIDE), jnp.bfloat16)],
    )(x, *gw)
    return out[:K, :n]


def aero_coeffs_pallas(gw: GroupedAeroWeights, alpha_deg, beta_deg, el_deg,
                       tile: int = TILE) -> jnp.ndarray:
    """Row-major convenience wrapper -> [n, K] (transpose outside the
    kernel; prefer aero_coeffs_pallas_t in hot paths)."""
    return aero_coeffs_pallas_t(gw, alpha_deg, beta_deg, el_deg, tile).T


@functools.partial(jax.jit, static_argnames=("tile",))
def aero_coeffs_pallas_ft(gw_t: GroupedAeroWeightsT, alpha_deg, beta_deg,
                          el_deg, tile: int = TILE) -> jnp.ndarray:
    """Feature-major fused query -> [K, n]. `gw_t` from pack_grouped_t.

    Identical math to aero_coeffs_pallas_t but with every matmul
    left-multiplied so activations live as [features, T] tiles - no
    in-kernel output transpose (the [T,64]->[64,T] relayout per tile
    dominated the row-major kernel's runtime)."""
    n = alpha_deg.shape[0]
    x = jnp.stack([alpha_deg, beta_deg, el_deg], axis=0)  # [3, n]
    tile = min(tile, n)  # tile == n when small: block equals the array dim (legal)
    n_pad = -(-n // tile) * tile
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n)))

    const = lambda i: (0, 0)
    const3 = lambda i: (0, 0, 0)
    out = pl.pallas_call(
        _aero_kernel_t,
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((3, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, WIDE, 3), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, WIDE), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, WIDE, WIDE), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, WIDE), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, WIDE, WIDE), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, WIDE), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((OUT, G * WIDE), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((OUT,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((OUT, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((OUT, n_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((G * WIDE, tile), jnp.bfloat16)],
    )(x, *gw_t)
    return out[:K, :n]


# --- fused surrogate query + total-coefficient build-up ---
#
# Emitting all 43 raw coefficients costs a [64, n] HBM write (~256 MB at
# n=10^6) that XLA immediately re-reads for the build-up (~4.5 ms of
# elementwise fusions at n=10^6, measured). Folding the build-up into the
# kernel shrinks the output to the six totals ([8, n] padded, 32 MB) and
# runs the ~50 elementwise combine ops on VPU lane vectors that are already
# VMEM-resident. The build-up arithmetic itself is shared with the XLA path
# (ops/buildup.py) for single-source parity.

N_FEATS = 10  # alpha beta el dlef dail drud P Q R inv_2v
TOT = 8       # 6 totals, sublane-padded to 8


def _aero_totals_kernel_t(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref,
                          b3_ref, w4_ref, b4_ref, out_ref, h3_scratch):
    bf = jnp.bfloat16
    xt = x_ref[0:3, :].astype(bf)  # [3, T] alpha/beta/el, feature-major
    for g in range(G):
        h = jnp.maximum(jnp.dot(w1_ref[g], xt,
                                preferred_element_type=jnp.float32)
                        + b1_ref[g][:, None], 0.0)
        h = jnp.maximum(jnp.dot(w2_ref[g], h.astype(bf),
                                preferred_element_type=jnp.float32)
                        + b2_ref[g][:, None], 0.0)
        h = jnp.maximum(jnp.dot(w3_ref[g], h.astype(bf),
                                preferred_element_type=jnp.float32)
                        + b3_ref[g][:, None], 0.0)
        h3_scratch[g * WIDE:(g + 1) * WIDE, :] = h.astype(bf)
    c = jnp.dot(w4_ref[:], h3_scratch[:],
                preferred_element_type=jnp.float32) + b4_ref[:][:, None]

    beta_deg = x_ref[1, :]
    dlef, dail, drud = x_ref[3, :], x_ref[4, :], x_ref[5, :]
    P, Q, R = x_ref[6, :], x_ref[7, :], x_ref[8, :]
    inv_2v = x_ref[9, :]
    totals = coeff_buildup(
        lambda name: c[IDX[name]], dlef=dlef, dail=dail, drud=drud,
        P=P, Q=Q, R=R, beta_deg=beta_deg,
        half_cbar_v=CBAR * inv_2v, half_b_v=B_SPAN * inv_2v)
    zeros = jnp.zeros_like(totals[0])
    out_ref[:] = jnp.stack(list(totals) + [zeros] * (TOT - len(totals)))


@functools.partial(jax.jit, static_argnames=("tile",))
def aero_totals_pallas_ft(gw_t: GroupedAeroWeightsT, feats: jnp.ndarray,
                          tile: int = TILE) -> jnp.ndarray:
    """Fused query + build-up. `feats` is the feature-major [N_FEATS, n]
    stack (alpha_deg, beta_deg, el_deg, dlef, dail, drud, P, Q, R,
    1/(2*vt)); returns [6, n] = (Cx, Cy, Cz, Cl, Cm, Cn) totals."""
    n = feats.shape[1]
    tile = min(tile, n)  # tile == n when small: block equals the array dim (legal)
    n_pad = -(-n // tile) * tile
    if n_pad != n:
        feats = jnp.pad(feats, ((0, 0), (0, n_pad - n)))

    const = lambda i: (0, 0)
    const3 = lambda i: (0, 0, 0)
    out = pl.pallas_call(
        _aero_totals_kernel_t,
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((N_FEATS, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, WIDE, 3), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, WIDE), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, WIDE, WIDE), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, WIDE), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, WIDE, WIDE), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, WIDE), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((OUT, G * WIDE), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((OUT,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TOT, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TOT, n_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((G * WIDE, tile), jnp.bfloat16)],
    )(feats, *gw_t)
    return out[:6, :n]


# --- whole-nlplant kernel: xdot = f(s, u) in one fused Pallas call ---
#
# Column slices of a [n,12] TPU array read at ~1/8 HBM bandwidth (the
# feature dim lives in sublanes), and XLA materializes the per-feature
# intermediates as 1-sublane [n,1] buffers - measured ~4.5 ms of slow loop
# fusions per nlplant at n=10^6 even with the build-up fused. Moving the
# ENTIRE state-derivative computation (navigation + atmosphere + force +
# moment equations, ops/dynamics.py:nlplant_core) into the kernel leaves
# XLA nothing but full-tile [n,12] reads/writes. s.T / u.T at the call
# boundary are layout bitcasts (the [n,12] physical layout already has n
# in lanes), not data movement.

N_S = 12
N_U = 5
N_XD = 16  # 12 xdot rows, sublane-padded to 16


def aero_coeff_rows(xt, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                    w4_ref, b4_ref, h3_scratch, hidden_bf16: bool = True):
    """In-kernel aero surrogate sweep: xt [3, T] bf16 -> c [OUT, T] f32.

    Shared by the nlplant kernel below and the whole-env-step kernel
    (ops/step_pallas.py). h3_scratch: [G*WIDE, T] bf16 VMEM scratch."""
    bf = jnp.bfloat16
    if hidden_bf16:
        # Matmuls keep f32 accumulation (Mosaic on v5e rejects bf16 acc:
        # "Expected matmul acc to be 32-bit"), but the accumulator is cast
        # to bf16 ONCE and the bias-add + relu chain runs packed-bf16 on
        # the VPU (2x lane throughput). The hidden activations were rounded
        # to bf16 before each matmul anyway; rounding the pre-bias value too
        # keeps xdot R^2 >= 0.9997 per row vs the f32 oracle (envelope-wide,
        # n=4096; the f32-elementwise path is 0.99995) - both orders of
        # magnitude inside the reference's own R^2 > 0.97 surrogate gate.
        # Worth ~0.27 ms/step at n=10^6 (26.3x -> 27.2x baseline).
        for g in range(G):
            h = jnp.maximum(jnp.dot(w1_ref[g], xt,
                                    preferred_element_type=jnp.float32)
                            .astype(bf) + b1_ref[g][:, None].astype(bf), 0.0)
            h = jnp.maximum(jnp.dot(w2_ref[g], h,
                                    preferred_element_type=jnp.float32)
                            .astype(bf) + b2_ref[g][:, None].astype(bf), 0.0)
            h = jnp.maximum(jnp.dot(w3_ref[g], h,
                                    preferred_element_type=jnp.float32)
                            .astype(bf) + b3_ref[g][:, None].astype(bf), 0.0)
            h3_scratch[g * WIDE:(g + 1) * WIDE, :] = h
    else:
        for g in range(G):
            h = jnp.maximum(jnp.dot(w1_ref[g], xt,
                                    preferred_element_type=jnp.float32)
                            + b1_ref[g][:, None], 0.0)
            h = jnp.maximum(jnp.dot(w2_ref[g], h.astype(bf),
                                    preferred_element_type=jnp.float32)
                            + b2_ref[g][:, None], 0.0)
            h = jnp.maximum(jnp.dot(w3_ref[g], h.astype(bf),
                                    preferred_element_type=jnp.float32)
                            + b3_ref[g][:, None], 0.0)
            h3_scratch[g * WIDE:(g + 1) * WIDE, :] = h.astype(bf)
    return jnp.dot(w4_ref[:], h3_scratch[:],
                   preferred_element_type=jnp.float32) + b4_ref[:][:, None]


def _xdot_kernel(s_ref, u_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref,
                 b3_ref, w4_ref, b4_ref, out_ref, h3_scratch,
                 *, hidden_bf16: bool = True):
    from .dynamics import R2D, nlplant_core
    alpha_deg = s_ref[7, :] * R2D
    beta_deg = s_ref[8, :] * R2D
    el = u_ref[1, :]
    xt = jnp.stack([alpha_deg, beta_deg, el]).astype(jnp.bfloat16)  # [3, T]
    c = aero_coeff_rows(xt, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                        w4_ref, b4_ref, h3_scratch, hidden_bf16)

    sv = tuple(s_ref[i, :] for i in range(N_S))
    uv = tuple(u_ref[i, :] for i in range(N_U))
    xd = nlplant_core(sv, uv, lambda name: c[IDX[name]])
    zeros = jnp.zeros_like(xd[0])
    out_ref[:] = jnp.stack(xd + [zeros] * (N_XD - len(xd)))


@functools.partial(jax.jit, static_argnames=("tile", "hidden_bf16"))
def nlplant_pallas_ft(gw_t: GroupedAeroWeightsT, s: jnp.ndarray,
                      u: jnp.ndarray, tile: int = TILE,
                      hidden_bf16: bool = True) -> jnp.ndarray:
    """Fused F-16 state derivative: s [n,12], u [n,5] -> xdot [n,12].

    No host-side batch padding: Mosaic masks the trailing partial block
    (lanes past n never reach HBM; garbage there stays lane-local since
    the matmuls contract over features, not batch). Padding [12,n] inputs
    to a tile multiple cost ~0.5 ms of pad/slice traffic at n=10^6."""
    n = s.shape[0]
    s_t, u_t = s.T, u.T
    tile = min(tile, n)  # tile == n when small: block equals the array dim (legal)

    const = lambda i: (0, 0)
    const3 = lambda i: (0, 0, 0)
    out = pl.pallas_call(
        functools.partial(_xdot_kernel, hidden_bf16=hidden_bf16),
        grid=(-(-n // tile),),
        in_specs=[
            pl.BlockSpec((N_S, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_U, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, WIDE, 3), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, WIDE), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, WIDE, WIDE), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, WIDE), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, WIDE, WIDE), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((G, WIDE), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((OUT, G * WIDE), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((OUT,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N_XD, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_XD, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((G * WIDE, tile), jnp.bfloat16)],
    )(s_t, u_t, *gw_t)
    return out[:N_S].T


# --- distilled consolidated surrogate (surrogates/distill.py) ---
#
# One shared-trunk [3 -> H -> H -> 43] net replaces the 43-net ensemble at
# R^2 >= gate vs that ensemble (see surrogates/distill.py docstring for the
# fidelity argument). ~50 kFLOP/row at H=128 vs ~600 kFLOP/row for the
# block-diagonal grouped kernel - the MXU work drops ~12x. The net runs in
# z-scored output space; the raw coefficients come from one [OUT,T] FMA
# with the per-coefficient out_std/out_mean, so small-magnitude
# coefficients (e.g. delta_Cnbeta ~ 1e-3) are not drowned by bf16 rounding
# of the SHARED hidden activations.

_DISTILLED_PATH = None  # resolved lazily next to data/f16_aero.npz


class DistilledAeroWeightsT(NamedTuple):
    """Feature-major distilled-trunk weights (left-multiply convention)."""
    W1: jnp.ndarray   # [H, F]   bf16
    b1: jnp.ndarray   # [H]      f32
    W2: jnp.ndarray   # [H, H]   bf16
    b2: jnp.ndarray   # [H]      f32
    W3: jnp.ndarray   # [OUT, H+F] bf16 (z-space, rows in AERO_NAMES order;
    #                   reads [hidden ; hinge features] - the skip part)
    b3: jnp.ndarray   # [OUT]    f32
    out_mean: jnp.ndarray  # [OUT] f32
    out_std: jnp.ndarray   # [OUT] f32


@functools.lru_cache(maxsize=2)
def _load_distilled_np(path: str):
    with np.load(path) as z:
        names = [str(n) for n in z["names"]]
        from .aero import AERO_NAMES
        from ..surrogates import distill
        assert tuple(names) == AERO_NAMES, \
            "f16_aero_distilled.npz order mismatch - re-run scripts/distill_aero.py"
        # the kernel rebuilds the hinge features from the module constants -
        # pin that they match what the net was trained with
        for key, ref in (("alpha_knots", distill.ALPHA_KNOTS),
                         ("beta_knots", distill.BETA_KNOTS),
                         ("el_knots", distill.EL_KNOTS),
                         ("in_scale", distill.IN_SCALE),
                         ("in_mean", distill.IN_MEAN)):
            assert np.allclose(z[key], ref), \
                f"f16_aero_distilled.npz {key} mismatch - re-run distillation"
        return {k: z[k] for k in ("W1", "b1", "W2", "b2", "W3", "b3",
                                  "out_mean", "out_std")}


def _default_distilled_path() -> str:
    import os
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "f16_aero_distilled.npz")


def distilled_npz_present() -> bool:
    import os
    return os.path.exists(_default_distilled_path())


def load_distilled_t(path: str | None = None) -> DistilledAeroWeightsT:
    if path is None:
        path = _default_distilled_path()
    r = _load_distilled_np(path)
    bf = jnp.bfloat16
    return DistilledAeroWeightsT(
        W1=jnp.asarray(r["W1"], bf), b1=jnp.asarray(r["b1"]),
        W2=jnp.asarray(r["W2"], bf), b2=jnp.asarray(r["b2"]),
        W3=jnp.asarray(r["W3"], bf), b3=jnp.asarray(r["b3"]),
        out_mean=jnp.asarray(r["out_mean"]), out_std=jnp.asarray(r["out_std"]))


def distilled_feature_rows(alpha_deg, beta_deg, el):
    """In-kernel hinge featurization: three [T] rows -> [F, T] bf16.

    Must mirror surrogates/distill.featurize exactly (the loader asserts
    the knot constants match the npz). All ops are [T] lane-vector VPU
    work with baked scalar knots - a few dozen relu/scale ops."""
    from ..surrogates.distill import (ALPHA_KNOTS, BETA_KNOTS, EL_KNOTS,
                                      IN_MEAN, IN_SCALE)
    rows = [(alpha_deg - float(IN_MEAN[0])) / float(IN_SCALE[0]),
            beta_deg / float(IN_SCALE[1]),
            el / float(IN_SCALE[2])]
    rows += [jnp.maximum(alpha_deg - float(k), 0.0) / float(IN_SCALE[0])
             for k in ALPHA_KNOTS]
    rows += [jnp.maximum(beta_deg - float(k), 0.0) / float(IN_SCALE[1])
             for k in BETA_KNOTS]
    rows += [jnp.maximum(el - float(k), 0.0) / float(IN_SCALE[2])
             for k in EL_KNOTS]
    return jnp.stack(rows).astype(jnp.bfloat16)


def distilled_coeff_rows(ft, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                         mu_ref, sd_ref, hidden_bf16: bool = True):
    """In-kernel distilled sweep: ft [F, T] bf16 features -> c [OUT, T] f32
    raw coefficients (z-space net + per-row un-scaling FMA)."""
    bf = jnp.bfloat16
    f32 = jnp.float32
    if hidden_bf16:
        h = jnp.maximum(jnp.dot(w1_ref[:], ft, preferred_element_type=f32)
                        .astype(bf) + b1_ref[:][:, None].astype(bf), 0.0)
        h = jnp.maximum(jnp.dot(w2_ref[:], h, preferred_element_type=f32)
                        .astype(bf) + b2_ref[:][:, None].astype(bf), 0.0)
    else:
        h = jnp.maximum(jnp.dot(w1_ref[:], ft, preferred_element_type=f32)
                        + b1_ref[:][:, None], 0.0)
        h = jnp.maximum(jnp.dot(w2_ref[:], h.astype(bf),
                                preferred_element_type=f32)
                        + b2_ref[:][:, None], 0.0)
        h = h.astype(bf)
    hx = jnp.concatenate([h, ft], axis=0)  # [H+F, T]: skip connection
    z = jnp.dot(w3_ref[:], hx, preferred_element_type=f32) + b3_ref[:][:, None]
    return z * sd_ref[:][:, None] + mu_ref[:][:, None]


def distilled_weight_specs(H: int, F: int):
    """BlockSpecs for the 8 DistilledAeroWeightsT leaves (VMEM-resident)."""
    const = lambda i: (0, 0)
    vec = lambda i: (0,)
    return [
        pl.BlockSpec((H, F), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((H,), vec, memory_space=pltpu.VMEM),
        pl.BlockSpec((H, H), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((H,), vec, memory_space=pltpu.VMEM),
        pl.BlockSpec((OUT, H + F), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((OUT,), vec, memory_space=pltpu.VMEM),
        pl.BlockSpec((OUT,), vec, memory_space=pltpu.VMEM),
        pl.BlockSpec((OUT,), vec, memory_space=pltpu.VMEM),
    ]


def _xdot_kernel_distilled(s_ref, u_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                           w3_ref, b3_ref, mu_ref, sd_ref, out_ref,
                           *, hidden_bf16: bool = True):
    from .dynamics import R2D, nlplant_core
    ft = distilled_feature_rows(s_ref[7, :] * R2D, s_ref[8, :] * R2D,
                                u_ref[1, :])
    c = distilled_coeff_rows(ft, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref,
                             b3_ref, mu_ref, sd_ref, hidden_bf16)
    sv = tuple(s_ref[i, :] for i in range(N_S))
    uv = tuple(u_ref[i, :] for i in range(N_U))
    xd = nlplant_core(sv, uv, lambda name: c[IDX[name]])
    zeros = jnp.zeros_like(xd[0])
    out_ref[:] = jnp.stack(xd + [zeros] * (N_XD - len(xd)))


@functools.partial(jax.jit, static_argnames=("tile", "hidden_bf16"))
def nlplant_pallas_distilled(dw: DistilledAeroWeightsT, s: jnp.ndarray,
                             u: jnp.ndarray, tile: int | None = None,
                             hidden_bf16: bool = True) -> jnp.ndarray:
    """Distilled-backend twin of nlplant_pallas_ft."""
    n = s.shape[0]
    tile = min(tile or DISTILLED_TILE, n)  # tile == n when small: legal full-dim block
    H, F = dw.W1.shape
    out = pl.pallas_call(
        functools.partial(_xdot_kernel_distilled, hidden_bf16=hidden_bf16),
        grid=(-(-n // tile),),
        in_specs=[
            pl.BlockSpec((N_S, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_U, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            *distilled_weight_specs(H, F),
        ],
        out_specs=pl.BlockSpec((N_XD, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_XD, n), jnp.float32),
    )(s.T, u.T, *dw)
    return out[:N_S].T

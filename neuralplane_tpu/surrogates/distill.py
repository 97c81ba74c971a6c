"""Consolidated ("distilled") aero surrogate: ONE shared-trunk MLP that
reproduces all 43 per-coefficient surrogates at once.

Why: the reference evaluates 43 independent tiny MLPs (arch [3,20,10,1],
`hifi_F16_AeroData.py:44-129`); even lane-packed into 8 block-diagonal
groups of 128 (ops/aero_pallas.py) that costs ~660 kFLOP per agent-step,
>90% of it multiplying padding zeros - the price of putting 20-wide nets on
a 128-wide MXU. All 43 coefficients are smooth functions of the SAME three
inputs (alpha_deg, beta_deg, el_deg), so a single shared trunk
[feat -> H -> H] with a [43, H+feat] readout (hinge-feature skip) represents
them with ~200 kFLOP per agent-step at H=256 (3x less MXU work, 4x less VPU
relu work) and one relu chain instead of 24.

This is a fidelity-gated speed path, not a replacement of the parity
surrogates: the distillation TARGET is the reference's own 43-net ensemble
(the stacked f32 oracle), trained far past the reference's own acceptance
bar (its MLPs gate at R^2 > 0.97 vs the NASA tables,
`example/train_model/train_model.py:163,229-232`; we gate the distilled
net at R^2 >= 0.9995 vs the ensemble on the operational envelope). The
43-net path stays the default parity backend; `aero_backend="distilled"`
opts in.

Training samples concentrate on the table domain (alpha [-20,90] deg,
beta [-30,30], el [-25,25] - mean_std.csv ranges) with a 20% margin-box
mix so mild extrapolation also matches the ensemble's (linear, relu)
extrapolation behavior.

Output scaling: trained in per-coefficient z-space, then the inverse
scaling is FOLDED into the last layer so the kernel emits raw coefficients
with no extra work.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.aero import AERO_NAMES, AeroWeights, K, aero_coeffs

# operational envelope (degrees) - the NASA table domain
CORE_LO = np.array([-20.0, -30.0, -25.0], np.float32)
CORE_HI = np.array([90.0, 30.0, 25.0], np.float32)
# extended box for extrapolation agreement
EXT_LO = np.array([-45.0, -45.0, -40.0], np.float32)
EXT_HI = np.array([120.0, 45.0, 40.0], np.float32)

OUT_PAD = 64  # kernel output width (matches ops/aero_pallas.OUT)


class DistilledParams(NamedTuple):
    """Raw trainable params, f32, math convention y = W @ x + b.

    The output layer reads the CONCATENATION [h2 ; features] (W3 is
    [K, H+F]): the hinge features are the exact 1-D piecewise-linear basis,
    so every coefficient that depends on a single input (all 18 damping
    derivatives are alpha-only, eta_el is el-only) is representable by the
    skip part directly at knot resolution, and the trunk only has to learn
    the 2-D/3-D cross terms."""
    W1: jnp.ndarray  # [H, F]
    b1: jnp.ndarray  # [H]
    W2: jnp.ndarray  # [H, H]
    b2: jnp.ndarray  # [H]
    W3: jnp.ndarray  # [K, H + F]
    b3: jnp.ndarray  # [K]


# Hinge-feature knots. The targets are (approximately) piecewise-multilinear
# on the NASA table grids - plain relu trunks fit that badly from raw
# coordinates, but relu(x - knot) hinges ARE the 1-D piecewise-linear basis,
# so the trunk only has to learn cross-terms. Uniform knots slightly denser
# than the table grids (alpha 20 pts, beta 19, el 5) work as well as the
# exact breakpoints and keep the kernel constant-friendly.
ALPHA_KNOTS = np.linspace(-20.0, 90.0, 45, dtype=np.float32)[1:-1]
BETA_KNOTS = np.linspace(-30.0, 30.0, 17, dtype=np.float32)[1:-1]
EL_KNOTS = np.linspace(-25.0, 25.0, 9, dtype=np.float32)[1:-1]
N_FEAT = 3 + len(ALPHA_KNOTS) + len(BETA_KNOTS) + len(EL_KNOTS)
# input scaling for the raw coords (z-ish, mean_std.csv ranges)
IN_SCALE = np.array([35.0, 18.0, 15.0], np.float32)
IN_MEAN = np.array([35.0, 0.0, 0.0], np.float32)


def featurize(x: jnp.ndarray) -> jnp.ndarray:
    """[n, 3] raw degrees -> [n, F] trunk features (scaled coords + hinges).

    The TPU kernel computes the identical rows in-kernel
    (ops/aero_pallas.distilled_feature_rows)."""
    a, b, e = x[:, 0], x[:, 1], x[:, 2]
    cols = [(a - IN_MEAN[0]) / IN_SCALE[0], b / IN_SCALE[1], e / IN_SCALE[2]]
    cols += [jax.nn.relu(a - k) / IN_SCALE[0] for k in ALPHA_KNOTS]
    cols += [jax.nn.relu(b - k) / IN_SCALE[1] for k in BETA_KNOTS]
    cols += [jax.nn.relu(e - k) / IN_SCALE[2] for k in EL_KNOTS]
    return jnp.stack(cols, axis=1)


def init_params(key: jax.Array, hidden: int = 128) -> DistilledParams:
    k1, k2, k3 = jax.random.split(key, 3)
    he = lambda k, shape, fan: jax.random.normal(k, shape) * np.sqrt(2.0 / fan)
    return DistilledParams(
        W1=he(k1, (hidden, N_FEAT), N_FEAT), b1=jnp.zeros(hidden),
        W2=he(k2, (hidden, hidden), hidden), b2=jnp.zeros(hidden),
        W3=he(k3, (K, hidden + N_FEAT), hidden), b3=jnp.zeros(K))


def forward(p: DistilledParams, x: jnp.ndarray) -> jnp.ndarray:
    """x [n, 3] raw degrees -> [n, K] z-scored coefficient predictions."""
    f = featurize(x)
    h = jax.nn.relu(f @ p.W1.T + p.b1)
    h = jax.nn.relu(h @ p.W2.T + p.b2)
    return jnp.concatenate([h, f], axis=1) @ p.W3.T + p.b3


def sample_inputs(key: jax.Array, n: int, core_frac: float = 0.8):
    """Mixture of core-envelope and extended-box uniform samples, [n,3] deg."""
    k1, k2, k3 = jax.random.split(key, 3)
    core = jax.random.uniform(k1, (n, 3), minval=CORE_LO, maxval=CORE_HI)
    ext = jax.random.uniform(k2, (n, 3), minval=EXT_LO, maxval=EXT_HI)
    pick = jax.random.uniform(k3, (n, 1)) < core_frac
    return jnp.where(pick, core, ext)


def oracle_coeffs(w43: AeroWeights, x: jnp.ndarray) -> jnp.ndarray:
    """The stacked f32 ensemble (distillation target): [n, 3] -> [n, K]."""
    return aero_coeffs(w43, x[:, 0], x[:, 1], x[:, 2])


# loss upweighting for the alpha-only damping derivatives (rows 6-14 and
# 21-29 of AERO_NAMES): they multiply the body rates in the moment
# equations, so their relative error dominates the P/Q/R xdot rows that
# gate acceptance (xdot_fidelity); the base z-MSE underweights them.
_DAMPING_ROWS = tuple(range(6, 15)) + tuple(range(21, 30))


def coeff_loss_weights() -> np.ndarray:
    w = np.ones(K, np.float32)
    w[list(_DAMPING_ROWS)] = 4.0
    return w


# Build-up auxiliary loss. Per-coefficient z-MSE lets small errors spread
# across a coefficient group add constructively where the dynamics actually
# read them - the six body-axis totals of ops/buildup.coeff_buildup
# (group-substitution diagnosis: oracle-Cl-group lifts the P_dot R2 from
# 0.9985 to 1.0 while no single member moves it; the Cm total also contains
# the PRODUCT Cm*eta_el, invisible to any per-coefficient loss). So the fit
# penalizes the totals themselves, evaluated at dlef = 1 (the framework
# pins lef = 0, reference F16_model.py:56 scales the lef channel by zero)
# with the rate/actuator multipliers sampled per example from the
# operational ranges.


def _buildup_totals(coeffs_raw: jnp.ndarray, beta_deg: jnp.ndarray,
                    mults: jnp.ndarray) -> jnp.ndarray:
    """[n, K] raw coefficients -> [n, 6] body-axis totals at dlef=1.

    mults: [n, 6] = (P, Q, R, inv_2v, dail, drud) sampled per example."""
    from ..ops.aero import IDX
    from ..ops.buildup import B_SPAN, CBAR, coeff_buildup
    P, Q, R, inv_2v, dail, drud = (mults[:, i] for i in range(6))
    get = lambda nm: coeffs_raw[:, IDX[nm]]
    totals = coeff_buildup(get, dlef=jnp.ones_like(P), dail=dail, drud=drud,
                           P=P, Q=Q, R=R, beta_deg=beta_deg,
                           half_cbar_v=CBAR * inv_2v,
                           half_b_v=B_SPAN * inv_2v)
    return jnp.stack(totals, axis=1)


def sample_buildup_mults(key: jax.Array, n: int) -> jnp.ndarray:
    """(P, Q, R, inv_2v, dail, drud) draws covering the operational ranges
    (rates +-2 rad/s, vt 300-1500 ft/s, full aileron/rudder throw)."""
    k1, k2, k3 = jax.random.split(key, 3)
    pqr = jax.random.uniform(k1, (n, 3), minval=-2.0, maxval=2.0)
    vt = jax.random.uniform(k2, (n, 1), minval=300.0, maxval=1500.0)
    ad = jax.random.uniform(k3, (n, 2), minval=-1.0, maxval=1.0)
    return jnp.concatenate([pqr, 1.0 / (2.0 * vt), ad], axis=1)


def fit(w43: AeroWeights, hidden: int = 128, steps: int = 20000,
        batch: int = 65536, lr: float = 3e-3, seed: int = 0,
        log_every: int = 2000, log_fn=print, ema_decay: float = 0.999
        ) -> Tuple[DistilledParams, np.ndarray, np.ndarray]:
    """Distill the 43-net ensemble into one trunk.

    Returns (params_in_z_space, out_mean [K], out_std [K]); the returned
    params are the EMA (Polyak average, decay `ema_decay`) of the training
    trajectory, which removes end-of-run minibatch noise from the shipped
    weights (measured neutral-to-slightly-positive on xdot R^2; hidden=192
    scores 0.99945 with or without EMA - capacity-limited, which is why the
    shipped npz stays at hidden=256). Set ema_decay=0 to return the raw
    final step."""
    import optax

    key = jax.random.PRNGKey(seed)
    # output scaling from a large core-domain sample
    k0, key = jax.random.split(key)
    xs = sample_inputs(k0, 1 << 18, core_frac=1.0)
    ys = oracle_coeffs(w43, xs)
    mean = jnp.mean(ys, axis=0)
    std = jnp.std(ys, axis=0) + 1e-6
    lw = jnp.asarray(coeff_loss_weights())
    # build-up aux normalization: std of each oracle body-axis total
    km, k0 = jax.random.split(k0)
    tot_std = jnp.std(
        _buildup_totals(ys, xs[:, 1], sample_buildup_mults(km, xs.shape[0])),
        axis=0) + 1e-6

    params = init_params(key, hidden)
    sched = optax.cosine_decay_schedule(lr, steps, alpha=1e-2)
    opt = optax.adam(sched)
    opt_state = opt.init(params)

    # bias-corrected EMA: accumulate from zero and divide by (1 - d^t) at
    # the end, so short fits are not dominated by the random init
    ema = jax.tree.map(jnp.zeros_like, params)

    @jax.jit
    def step(params, ema, opt_state, key):
        k1, k2, key = jax.random.split(key, 3)
        x = sample_inputs(k1, batch)
        y_raw = oracle_coeffs(w43, x)
        y = (y_raw - mean) / std
        mults = sample_buildup_mults(k2, batch)
        y_tot = _buildup_totals(y_raw, x[:, 1], mults)

        def loss_fn(p):
            z = forward(p, x)
            err = z - y
            # body-axis-total error: the combination the dynamics consume
            # (includes the Cm*eta_el product and cg-shift couplings)
            p_tot = _buildup_totals(z * std + mean, x[:, 1], mults)
            tot_err = (p_tot - y_tot) / tot_std
            return (jnp.mean(err * err * lw)
                    + 4.0 * jnp.mean(tot_err * tot_err))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        ema = jax.tree.map(
            lambda e, p: ema_decay * e + (1.0 - ema_decay) * p, ema, params)
        return params, ema, opt_state, key, loss

    for i in range(steps):
        params, ema, opt_state, key, loss = step(params, ema, opt_state, key)
        if log_every and (i % log_every == 0 or i == steps - 1):
            log_fn(f"distill step {i}: z-mse {float(loss):.3e}")
    if ema_decay:
        corr = 1.0 - ema_decay ** steps
        out = jax.tree.map(lambda e: e / corr, ema)
    else:
        out = params
    return out, np.asarray(mean), np.asarray(std)


def evaluate(w43: AeroWeights, p: DistilledParams, mean: np.ndarray,
             std: np.ndarray, n: int = 1 << 18, seed: int = 123,
             quantized: bool = True) -> dict:
    """Held-out fidelity vs the ensemble on the core envelope.

    The net stays in z-space (outputs un-scaled by mean/std afterwards, as
    the kernel does with a per-row FMA) so small-variance coefficients are
    not drowned by bf16 rounding of the SHARED hidden activations.
    quantized=True evaluates with bf16 weights/activations - what the TPU
    kernel computes - so the gate covers quantization too."""
    x = sample_inputs(jax.random.PRNGKey(seed), n, core_frac=1.0)
    y = np.asarray(oracle_coeffs(w43, x))
    if quantized:
        z = quantized_coeffs_z(p, x)
    else:
        z = forward(p, x)
    yp = np.asarray(z) * std + mean
    err = yp - y
    var = y.var(axis=0) + 1e-12
    r2 = 1.0 - err.var(axis=0) / var
    return {
        "r2": r2,
        "r2_min": float(r2.min()),
        "worst": AERO_NAMES[int(np.argmin(r2))],
        "mae": np.abs(err).mean(axis=0),
        "max_abs": np.abs(err).max(axis=0),
    }


def quantized_coeffs_z(p: DistilledParams, x: jnp.ndarray) -> jnp.ndarray:
    """bf16-quantized net exactly as the TPU kernel computes it:
    f32 hinge features -> bf16 cast -> bf16 matmuls (f32 accum) ->
    [n, K] z-space outputs."""
    bf = jnp.bfloat16
    f32 = jnp.float32
    f = featurize(x).astype(bf)
    W1, b1 = jnp.asarray(p.W1, bf), p.b1
    W2, b2 = jnp.asarray(p.W2, bf), p.b2
    W3, b3 = jnp.asarray(p.W3, bf), p.b3
    # f32 accumulators cast to bf16 once, exactly as the kernel does; the
    # final matmul KEEPS the f32 accumulator (no bf16 rounding of z)
    mm = lambda a, b: jnp.matmul(a, b, preferred_element_type=f32)
    h = jax.nn.relu(mm(f, W1.T).astype(bf) + b1[None, :].astype(bf))
    h = jax.nn.relu(mm(h, W2.T).astype(bf) + b2[None, :].astype(bf))
    return mm(jnp.concatenate([h, f], axis=1), W3.T) + b3[None, :]


def quantized_coeffs(p: DistilledParams, mean: np.ndarray, std: np.ndarray,
                     alpha_deg, beta_deg, el_deg) -> jnp.ndarray:
    """Raw-coefficient rows [K, n] (AERO_NAMES order), quantized path."""
    x = jnp.stack([alpha_deg, beta_deg, el_deg], axis=1)
    z = quantized_coeffs_z(p, x)
    return (z * jnp.asarray(std)[None, :] + jnp.asarray(mean)[None, :]).T


def xdot_fidelity(w43: AeroWeights, p: DistilledParams, mean: np.ndarray,
                  std: np.ndarray, n: int = 8192, seed: int = 7) -> dict:
    """THE acceptance gate: per-row R^2 of the full state derivative with
    the quantized distilled surrogate vs the f32 43-net oracle, over random
    envelope states. The bf16 grouped kernel (the current TPU default)
    measures R^2 >= 0.9997 per row on the same protocol - the distilled
    backend must be comparable for drop-in use."""
    from ..ops.aero import IDX
    from ..ops.dynamics import nlplant_core

    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 8)
    s = jnp.zeros((n, 12))
    s = s.at[:, 2].set(jax.random.uniform(ks[0], (n,), minval=3000., maxval=30000.))
    s = s.at[:, 3].set(jax.random.uniform(ks[1], (n,), minval=-1., maxval=1.))
    s = s.at[:, 4].set(jax.random.uniform(ks[2], (n,), minval=-0.5, maxval=0.5))
    s = s.at[:, 5].set(jax.random.uniform(ks[3], (n,), minval=-3., maxval=3.))
    s = s.at[:, 6].set(jax.random.uniform(ks[4], (n,), minval=300., maxval=1500.))
    s = s.at[:, 7].set(jax.random.uniform(ks[5], (n,), minval=-0.3, maxval=0.7))
    s = s.at[:, 8].set(jax.random.uniform(ks[6], (n,), minval=-0.4, maxval=0.4))
    s = s.at[:, 9:12].set(jax.random.uniform(ks[7], (n, 3), minval=-1., maxval=1.))
    u = jnp.zeros((n, 5))
    u = u.at[:, 0].set(5000.).at[:, 1].set(2.0).at[:, 2].set(-1.0).at[:, 3].set(0.5)

    sv = tuple(s[:, i] for i in range(12))
    uv = tuple(u[:, i] for i in range(5))
    R2D = 180.0 / np.pi
    c = quantized_coeffs(p, mean, std, sv[7] * R2D, sv[8] * R2D, uv[1])
    xd = np.stack(nlplant_core(sv, uv, lambda nm: c[IDX[nm]]), axis=1)
    from ..ops.dynamics import nlplant_f16
    xd_o = np.asarray(nlplant_f16(w43, s, u))
    err = xd - xd_o
    var = xd_o.var(axis=0) + 1e-12
    r2 = 1.0 - err.var(axis=0) / var
    return {"xdot_r2": r2, "xdot_r2_min": float(r2.min())}


def to_npz(path: str, p: DistilledParams, mean: np.ndarray, std: np.ndarray,
           meta: dict) -> None:
    """Save kernel-ready weights: z-space net + per-coefficient out_mean /
    out_std, W3/b3/mean/std padded to OUT_PAD rows in AERO_NAMES order
    (matching ops/aero_pallas.IDX). f32 on disk; cast to bf16 at pack time."""
    H = p.W3.shape[1]
    W3 = np.zeros((OUT_PAD, H), np.float32)
    b3 = np.zeros(OUT_PAD, np.float32)
    mu = np.zeros(OUT_PAD, np.float32)
    sd = np.ones(OUT_PAD, np.float32)
    W3[:K] = np.asarray(p.W3)
    b3[:K] = np.asarray(p.b3)
    mu[:K] = np.asarray(mean)
    sd[:K] = np.asarray(std)
    np.savez(path,
             W1=np.asarray(p.W1), b1=np.asarray(p.b1),
             W2=np.asarray(p.W2), b2=np.asarray(p.b2),
             W3=W3, b3=b3, out_mean=mu, out_std=sd,
             alpha_knots=ALPHA_KNOTS, beta_knots=BETA_KNOTS,
             el_knots=EL_KNOTS, in_scale=IN_SCALE, in_mean=IN_MEAN,
             names=np.array(AERO_NAMES),
             r2_vs_ensemble=np.asarray(meta.get("r2", [])),
             xdot_r2=np.asarray(meta.get("xdot_r2", [])),
             hidden=np.int32(p.W1.shape[0]))

"""Actor/critic networks as explicit parameter pytrees + pure apply functions.

TPU-first re-design of the reference's nn.Module stack
(`algorithms/utils/{mlp,gru,act}.py`, `algorithms/ppo/{ppo_actor,ppo_critic}.py`):
parameters are plain nested dicts of jnp arrays (trivially jit/vmap/scan/pjit
compatible, checkpointable as a pytree), and every forward pass is a pure
function. The recurrent trunk's chunked-BPTT path is a `lax.scan` with a
per-step `h * mask` reset - mathematically identical to the reference GRU's
`has_zeros` segment splitting (`algorithms/utils/gru.py:36-70`), because
within a segment all masks are 1, but with no host-side nonzero() sync.

Architecture parity:
  MLPBase: [Dense -> act -> LayerNorm] per hidden size, optional input
           LayerNorm (`mlp.py:6-51`)
  GRULayer: num_layers stacked GRU cells (torch gate convention) + output
            LayerNorm (`gru.py:5-76`)
  ACTLayer: optional MLP, then DiagGaussian head = tanh-squashed mean Dense
            (orthogonal gain 0.01) + state-independent learnable log_std
            (`act.py:9-53`, `distributions.py:76-104`)
  Critic:   same trunk, optional MLP, scalar value Dense (`ppo_critic.py:9-50`)

Hidden-state layout matches the reference: [N, num_layers, hidden_size].
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from .rl_config import RLConfig

Params = Dict[str, Any]

_ACTIVATIONS = {
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    "leaky_relu": jax.nn.leaky_relu,
    "elu": jax.nn.elu,
}


@dataclasses.dataclass(frozen=True)
class NetSpec:
    """Static network shape info derived from (RLConfig, obs_dim, act_dim)."""
    obs_dim: int
    act_dim: int
    hidden_sizes: Tuple[int, ...]
    act_hidden_sizes: Tuple[int, ...]
    activation: str
    use_feature_normalization: bool
    use_recurrent_policy: bool
    recurrent_hidden_size: int
    recurrent_hidden_layers: int
    gain: float
    # exploration floor on the learnable log_std (beyond reference: its
    # Gaussian can collapse under a long entropy-bonus anneal — measured in
    # results/mappo_2v2, entropy ≈ -49 by 1.5e9 steps. None = no floor,
    # exact reference behavior).
    min_log_std: float = -1e9
    # BPTT remat policy: False = full remat (recompute the whole GRU cell
    # per timestep in the backward - minimal memory, the safe default for
    # the 3000x3000-scale control workloads); True = save the two gate
    # matmul outputs per step (jax.checkpoint_policies dots) and recompute
    # only elementwise ops - ~2 extra [L, mb, 3H] residuals per trunk,
    # measurably faster PPO updates at combat-training scale. Identical
    # values and gradients either way.
    remat_save_dots: bool = False

    @staticmethod
    def from_config(cfg: RLConfig, obs_dim: int, act_dim: int) -> "NetSpec":
        return NetSpec(
            obs_dim=obs_dim, act_dim=act_dim,
            hidden_sizes=tuple(cfg.hidden_sizes),
            act_hidden_sizes=tuple(cfg.act_hidden_sizes),
            activation=cfg.activation,
            use_feature_normalization=cfg.use_feature_normalization,
            use_recurrent_policy=cfg.use_recurrent_policy,
            recurrent_hidden_size=cfg.recurrent_hidden_size,
            recurrent_hidden_layers=cfg.recurrent_hidden_layers,
            gain=cfg.gain,
            min_log_std=(-1e9 if cfg.min_log_std is None
                         else float(cfg.min_log_std)),
            remat_save_dots=getattr(cfg, "remat_save_dots", False),
        )

    @property
    def trunk_out(self) -> int:
        if self.use_recurrent_policy:
            return self.recurrent_hidden_size
        return self.hidden_sizes[-1] if self.hidden_sizes else self.obs_dim


# ---------------------------------------------------------------- init utils

def _orthogonal(key: jax.Array, shape: Tuple[int, int], gain: float) -> jnp.ndarray:
    return gain * jax.nn.initializers.orthogonal()(key, shape, jnp.float32)


def _dense_init(key: jax.Array, d_in: int, d_out: int, gain: float) -> Params:
    return {"w": _orthogonal(key, (d_in, d_out), gain),
            "b": jnp.zeros((d_out,), jnp.float32)}


def _ln_init(dim: int) -> Params:
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def _mlp_init(key: jax.Array, d_in: int, sizes: Tuple[int, ...],
              activation: str) -> Params:
    # hidden layers use orthogonal sqrt(2) (standard PPO practice; the
    # reference leaves torch's default kaiming-uniform - an intentional,
    # documented deviation, not a behavior change of consequence)
    gain = jnp.sqrt(2.0).item() if activation != "tanh" else 5.0 / 3.0
    layers = []
    for size in sizes:
        key, k = jax.random.split(key)
        layers.append({"dense": _dense_init(k, d_in, size, gain),
                       "ln": _ln_init(size)})
        d_in = size
    return {"layers": layers}


def _gru_init(key: jax.Array, d_in: int, hidden: int, num_layers: int) -> Params:
    """Torch-convention GRU: gates ordered (reset, update, new)."""
    layers = []
    bound = 1.0 / jnp.sqrt(hidden).item()
    for _ in range(num_layers):
        key, k1, k2, k3, k4 = jax.random.split(key, 5)
        layers.append({
            "w_ih": jax.random.uniform(k1, (d_in, 3 * hidden), jnp.float32,
                                       -bound, bound),
            "w_hh": jax.random.uniform(k2, (hidden, 3 * hidden), jnp.float32,
                                       -bound, bound),
            "b_ih": jax.random.uniform(k3, (3 * hidden,), jnp.float32,
                                       -bound, bound),
            "b_hh": jax.random.uniform(k4, (3 * hidden,), jnp.float32,
                                       -bound, bound),
        })
        d_in = hidden
    return {"layers": layers, "ln": _ln_init(hidden)}


# ------------------------------------------------------------- apply: pieces

def _dense(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return x @ p["w"] + p["b"]


def _layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _mlp(p: Params, x: jnp.ndarray, activation: str) -> jnp.ndarray:
    act = _ACTIVATIONS[activation]
    for layer in p["layers"]:
        x = _layer_norm(layer["ln"], act(_dense(layer["dense"], x)))
    return x


def _gru_cell(p: Params, h: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """One torch-convention GRU cell step. h: [N, H], x: [N, D]."""
    gi = x @ p["w_ih"] + p["b_ih"]
    gh = h @ p["w_hh"] + p["b_hh"]
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def _gru_step(p: Params, x: jnp.ndarray, h: jnp.ndarray, mask: jnp.ndarray
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single time step through stacked cells. h: [N, L, H], mask: [N, 1]."""
    h = h * mask[:, None, :]  # zero hidden state at episode starts
    new_h = []
    for i, layer in enumerate(p["layers"]):
        hi = _gru_cell(layer, h[:, i], x)
        new_h.append(hi)
        x = hi
    return _layer_norm(p["ln"], x), jnp.stack(new_h, axis=1)


# ------------------------------------------------------------- trunk (shared)

def _trunk_init(key: jax.Array, spec: NetSpec) -> Params:
    k_fn, k_mlp, k_gru = jax.random.split(key, 3)
    p: Params = {}
    if spec.use_feature_normalization:
        p["feature_norm"] = _ln_init(spec.obs_dim)
    p["base"] = _mlp_init(k_mlp, spec.obs_dim, spec.hidden_sizes, spec.activation)
    if spec.use_recurrent_policy:
        d_in = spec.hidden_sizes[-1] if spec.hidden_sizes else spec.obs_dim
        p["gru"] = _gru_init(k_gru, d_in, spec.recurrent_hidden_size,
                             spec.recurrent_hidden_layers)
    return p


def _trunk_step(p: Params, spec: NetSpec, obs: jnp.ndarray, h: jnp.ndarray,
                mask: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    x = obs
    if spec.use_feature_normalization:
        x = _layer_norm(p["feature_norm"], x)
    x = _mlp(p["base"], x, spec.activation)
    if spec.use_recurrent_policy:
        x, h = _gru_step(p["gru"], x, h, mask)
    return x, h


def _trunk_seq(p: Params, spec: NetSpec, obs: jnp.ndarray, h0: jnp.ndarray,
               masks: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    if not spec.use_recurrent_policy:
        x = obs
        if spec.use_feature_normalization:
            x = _layer_norm(p["feature_norm"], x)
        return _mlp(p["base"], x, spec.activation), h0

    # Recurrent path: the feedforward base runs ONCE over the whole
    # [T, N, obs] block (one large MXU-friendly matmul per layer instead of
    # T small ones inside the scan - and, with remat, instead of 2T: the
    # rematerialized backward used to recompute the base per timestep too).
    # Only the truly sequential GRU cell is scanned, with a rematerialized
    # body: without remat, the BPTT backward keeps every per-timestep/
    # per-gate activation alive at once ([T, N, H] x ~20 tensors - 33+ GB
    # at the reference's 3000x3000 control workload, OOMing a 16 GB chip);
    # jax.checkpoint recomputes them per timestep in the backward instead,
    # storing only the [N, layers, H] carries and the base features (which
    # are the scan's xs, stored either way). Same values, same gradients.
    x = obs
    if spec.use_feature_normalization:
        x = _layer_norm(p["feature_norm"], x)
    x = _mlp(p["base"], x, spec.activation)

    def body(h, inp):
        feat, m = inp
        y, h = _gru_step(p["gru"], feat, h, m)
        return h, y

    remat = (jax.checkpoint(
        body, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
        if spec.remat_save_dots else jax.checkpoint(body))
    hT, ys = jax.lax.scan(remat, h0, (x, masks))
    return ys, hT


# -------------------------------------------------------------------- actor

def init_actor(key: jax.Array, spec: NetSpec) -> Params:
    k_trunk, k_act, k_mu = jax.random.split(key, 3)
    p = {"trunk": _trunk_init(k_trunk, spec)}
    d_in = spec.trunk_out
    if spec.act_hidden_sizes:
        p["act_mlp"] = _mlp_init(k_act, d_in, spec.act_hidden_sizes,
                                 spec.activation)
        d_in = spec.act_hidden_sizes[-1]
    p["mu"] = _dense_init(k_mu, d_in, spec.act_dim, spec.gain)
    p["log_std"] = jnp.zeros((spec.act_dim,), jnp.float32)
    return p


def _actor_head(p: Params, spec: NetSpec, feat: jnp.ndarray
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    if spec.act_hidden_sizes:
        feat = _mlp(p["act_mlp"], feat, spec.activation)
    mean = jnp.tanh(_dense(p["mu"], feat))  # MuNet tanh squash
    # exploration floor (identity at the -1e9 default): the gradient
    # through a clamped log_std is zero, so the entropy bonus stops
    # fighting the floor instead of oscillating against it
    return mean, jnp.maximum(p["log_std"], spec.min_log_std)


def actor_step(p: Params, spec: NetSpec, obs: jnp.ndarray, h: jnp.ndarray,
               mask: jnp.ndarray):
    """Rollout-time forward. Returns (mean, log_std, new_h)."""
    feat, h = _trunk_step(p["trunk"], spec, obs, h, mask)
    mean, log_std = _actor_head(p, spec, feat)
    return mean, log_std, h


def actor_seq(p: Params, spec: NetSpec, obs: jnp.ndarray, h0: jnp.ndarray,
              masks: jnp.ndarray):
    """Training-time chunk forward. obs: [T, N, D]. Returns (mean, log_std, hT)."""
    feat, hT = _trunk_seq(p["trunk"], spec, obs, h0, masks)
    mean, log_std = _actor_head(p, spec, feat)
    return mean, log_std, hT


# -------------------------------------------------------------------- critic

def init_critic(key: jax.Array, spec: NetSpec) -> Params:
    k_trunk, k_act, k_v = jax.random.split(key, 3)
    p = {"trunk": _trunk_init(k_trunk, spec)}
    d_in = spec.trunk_out
    if spec.act_hidden_sizes:
        p["act_mlp"] = _mlp_init(k_act, d_in, spec.act_hidden_sizes,
                                 spec.activation)
        d_in = spec.act_hidden_sizes[-1]
    # reference value head keeps torch default init; we use orthogonal gain 1
    p["value"] = _dense_init(k_v, d_in, 1, 1.0)
    return p


def _critic_head(p: Params, spec: NetSpec, feat: jnp.ndarray) -> jnp.ndarray:
    if spec.act_hidden_sizes:
        feat = _mlp(p["act_mlp"], feat, spec.activation)
    return _dense(p["value"], feat)


def critic_step(p: Params, spec: NetSpec, obs: jnp.ndarray, h: jnp.ndarray,
                mask: jnp.ndarray):
    feat, h = _trunk_step(p["trunk"], spec, obs, h, mask)
    return _critic_head(p, spec, feat), h


def critic_seq(p: Params, spec: NetSpec, obs: jnp.ndarray, h0: jnp.ndarray,
               masks: jnp.ndarray):
    feat, hT = _trunk_seq(p["trunk"], spec, obs, h0, masks)
    return _critic_head(p, spec, feat), hT


def init_rnn_state(n: int, spec: NetSpec) -> jnp.ndarray:
    return jnp.zeros((n, spec.recurrent_hidden_layers,
                      spec.recurrent_hidden_size), jnp.float32)

"""JAX surrogate training: fit one MLP per aero coefficient table.

Re-implements the reference pipeline (`example/train_model/train_model.py:
146-238`) TPU-first: the whole epoch (shuffle -> minibatch -> grad -> SGD)
is a single jitted lax.scan, recipe preserved - L1 loss, SGD lr 0.006 with
momentum 0.9 + weight decay 5e-4, lr drops to 5e-3/1e-3/5e-4 at epochs
500/750/900, batch 32, keep the best model by test R^2 with a 0.97
acceptance gate.

`assemble_stacked_weights` pads the trained nets to the framework's common
[3 -> 20 -> 20 -> 10 -> 1] architecture with normalization folded in
(identical scheme to tools/convert_aero_weights.py) and writes an
`f16_aero.npz` consumable by `ops.aero.load_aero_weights` - closing the
loop: tables -> surrogates -> flight dynamics without any torch dependency.
"""
from __future__ import annotations

import os
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .tables import AeroTable, load_tables

HIDDEN = (20, 10)


def _init_mlp(key: jax.Array, in_dim: int,
              hidden: Sequence[int] = HIDDEN) -> list:
    dims = [in_dim, *hidden, 1]
    layers = []
    for i in range(len(dims) - 1):
        key, k = jax.random.split(key)
        bound = 1.0 / np.sqrt(dims[i])
        layers.append({
            "w": jax.random.uniform(k, (dims[i], dims[i + 1]), jnp.float32,
                                    -bound, bound),
            "b": jnp.zeros((dims[i + 1],), jnp.float32)})
    return layers


def _mlp_apply(params: list, x: jnp.ndarray) -> jnp.ndarray:
    for layer in params[:-1]:
        x = jax.nn.relu(x @ layer["w"] + layer["b"])
    return x @ params[-1]["w"] + params[-1]["b"]


def _r2(y: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    ss_res = jnp.sum((y - pred) ** 2)
    ss_tot = jnp.sum((y - y.mean()) ** 2)
    return 1.0 - ss_res / jnp.maximum(ss_tot, 1e-12)


def _lr_schedule(epoch: jnp.ndarray) -> jnp.ndarray:
    """0.006 -> 5e-3 @500 -> 1e-3 @750 -> 5e-4 @900 (train_model.py:134-143)."""
    return jnp.where(epoch < 500, 6e-3,
                     jnp.where(epoch < 750, 5e-3,
                               jnp.where(epoch < 900, 1e-3, 5e-4)))


def train_surrogate(table: AeroTable, key: jax.Array, epochs: int = 1000,
                    batch_size: int = 32, subdivide: int = 3,
                    r2_gate: float = 0.97, hidden: Sequence[int] = HIDDEN
                    ) -> Dict:
    """Train one surrogate; returns dict with params (on z-scored inputs/
    outputs), normalization stats, and train/test R^2."""
    points, targets = table.dense_grid(subdivide)
    x_mean, x_std = points.mean(0), points.std(0) + 1e-12
    y_mean, y_std = targets.mean(), targets.std() + 1e-12
    X = ((points - x_mean) / x_std).astype(np.float32)
    Y = (((targets - y_mean) / y_std)[:, None]).astype(np.float32)

    # 80/20 shuffled split (train_model.py:147)
    rng = np.random.default_rng(np.asarray(jax.random.key_data(key))[-1])
    perm = rng.permutation(len(X))
    n_test = max(1, len(X) // 5)
    test_idx, train_idx = perm[:n_test], perm[n_test:]
    Xtr, Ytr = jnp.asarray(X[train_idx]), jnp.asarray(Y[train_idx])
    Xte, Yte = jnp.asarray(X[test_idx]), jnp.asarray(Y[test_idx])

    n_train = len(train_idx)
    n_batches = max(1, n_train // batch_size)
    used = n_batches * batch_size

    params = _init_mlp(key, X.shape[1], hidden)
    tx = optax.chain(optax.add_decayed_weights(5e-4),
                     optax.sgd(learning_rate=1.0, momentum=0.9))
    opt_state = tx.init(params)

    def loss_fn(p, xb, yb):
        return jnp.abs(_mlp_apply(p, xb) - yb).mean()

    @jax.jit
    def epoch_step(carry, epoch):
        params, opt_state, ekey, best_params, best_r2 = carry
        ekey, k = jax.random.split(ekey)
        order = jax.random.permutation(k, n_train)[:used].reshape(
            n_batches, batch_size)
        lr = _lr_schedule(epoch)

        def mb(carry, idx):
            params, opt_state = carry
            grads = jax.grad(loss_fn)(params, Xtr[idx], Ytr[idx])
            updates, opt_state = tx.update(grads, opt_state, params)
            updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
            return (optax.apply_updates(params, updates), opt_state), None
        (params, opt_state), _ = jax.lax.scan(mb, (params, opt_state), order)

        test_r2 = _r2(Yte, _mlp_apply(params, Xte))
        better = test_r2 > best_r2
        best_params = jax.tree_util.tree_map(
            lambda new, old: jnp.where(better, new, old), params, best_params)
        best_r2 = jnp.maximum(best_r2, test_r2)
        return (params, opt_state, ekey, best_params, best_r2), test_r2

    carry = (params, opt_state, key, params, jnp.float32(-jnp.inf))
    carry, _ = jax.lax.scan(epoch_step, carry, jnp.arange(epochs))
    _, _, _, best_params, best_r2 = carry

    best_r2 = float(best_r2)
    return {
        "name": table.name, "params": jax.device_get(best_params),
        "input_keys": table.input_keys,
        "x_mean": x_mean, "x_std": x_std,
        "y_mean": float(y_mean), "y_std": float(y_std),
        "test_r2": best_r2, "passed": best_r2 > r2_gate,
    }


def train_all(data_dir: str, names: Sequence[str] = None, seed: int = 0,
              **kwargs) -> Dict[str, Dict]:
    tables = load_tables(data_dir, names)
    out = {}
    for i, (name, table) in enumerate(tables.items()):
        out[name] = train_surrogate(table, jax.random.PRNGKey(seed + i),
                                    **kwargs)
        print(f"{name}: test R^2 = {out[name]['test_r2']:.4f} "
              f"({'PASS' if out[name]['passed'] else 'FAIL'})")
    return out


# ---------------------------------------------------------------- stacking

H1, H2, H3 = 20, 20, 10


def _pad_layers(result: Dict) -> Tuple[np.ndarray, ...]:
    """Pad one trained net to [3 -> H1 -> H2 -> H3 -> 1] with z-scoring
    folded into layers 1/4 (same exact-padding scheme as
    tools/convert_aero_weights.py: zero input columns for missing raw
    inputs, identity hidden layer insertion, zero-padded widths)."""
    params = result["params"]
    keys = result["input_keys"]
    x_mean, x_std = np.asarray(result["x_mean"]), np.asarray(result["x_std"])
    y_mean, y_std = result["y_mean"], result["y_std"]
    col_of = {"alpha": 0, "beta": 1, "el": 2}

    # layer 1 with normalization fold: z = (raw - mu) / sigma
    w1 = np.asarray(params[0]["w"])  # [in, h1]
    b1 = np.asarray(params[0]["b"])
    W1 = np.zeros((3, H1), np.float64)
    b1_f = b1.astype(np.float64).copy()
    for i, k in enumerate(keys):
        W1[col_of[k], :w1.shape[1]] = w1[i] / x_std[i]
        b1_f[:w1.shape[1]] -= w1[i] * x_mean[i] / x_std[i]
    B1 = np.zeros(H1); B1[:len(b1_f)] = b1_f

    if len(params) == 3:  # [in,20,10,1]: insert identity layer 2
        W2 = np.zeros((H1, H2)); np.fill_diagonal(W2, 1.0)
        B2 = np.zeros(H2)
        w3, b3 = np.asarray(params[1]["w"]), np.asarray(params[1]["b"])
        wo, bo = np.asarray(params[2]["w"]), np.asarray(params[2]["b"])
    else:  # [in,20,20,10,1]
        w2, b2 = np.asarray(params[1]["w"]), np.asarray(params[1]["b"])
        W2 = np.zeros((H1, H2)); W2[:w2.shape[0], :w2.shape[1]] = w2
        B2 = np.zeros(H2); B2[:len(b2)] = b2
        w3, b3 = np.asarray(params[2]["w"]), np.asarray(params[2]["b"])
        wo, bo = np.asarray(params[3]["w"]), np.asarray(params[3]["b"])

    W3 = np.zeros((H2, H3)); W3[:w3.shape[0], :w3.shape[1]] = w3
    B3 = np.zeros(H3); B3[:len(b3)] = b3
    # output layer with un-scaling fold: y = z * y_std + y_mean
    W4 = np.zeros(H3); W4[:wo.shape[0]] = wo[:, 0] * y_std
    B4 = float(bo[0]) * y_std + y_mean
    return W1, B1, W2, B2, W3, B3, W4, B4


def assemble_stacked_weights(results: Dict[str, Dict], out_path: str) -> None:
    """Write an f16_aero.npz in ops.aero's stacked AeroWeights layout."""
    from ..ops.aero import AERO_NAMES
    stacks = {k: [] for k in ("W1", "b1", "W2", "b2", "W3", "b3", "W4", "b4")}
    for name in AERO_NAMES:
        W1, B1, W2, B2, W3, B3, W4, B4 = _pad_layers(results[name])
        for k, v in zip(stacks, (W1, B1, W2, B2, W3, B3, W4, B4)):
            stacks[k].append(v)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    np.savez(out_path, names=np.array(AERO_NAMES),
             **{k: np.stack(v).astype(np.float32) for k, v in stacks.items()})

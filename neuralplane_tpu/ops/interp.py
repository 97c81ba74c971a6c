"""Batched n-D multilinear table interpolation.

TPU-native equivalent of the reference's `envs/models/F16/mexndinterp.py`
(getHyperCube/getLinIndex/linearInterpolate/interpn): given d 1-D grid axes
and a value hypercube, evaluate a batch of query points by gathering the 2^d
surrounding corners and blending with product weights - all vectorized
gathers, no Python loops over the batch. This is the "honest" table path the
neural surrogates replaced (the fidelity oracle used to generate surrogate
training data, `example/train_model/train_model.py`).

Queries outside the table domain clamp to the boundary cell (the reference
raises "point lies out data grid" - clamping is the branch-free equivalent
used for data generation, where queries are always in-domain).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np


def interpn(axes: Sequence[jnp.ndarray], values: jnp.ndarray,
            points: jnp.ndarray) -> jnp.ndarray:
    """Multilinear interpolation.

    Args:
        axes: d strictly-increasing 1-D grids, axis i of length n_i.
        values: [n_0, ..., n_{d-1}] table values.
        points: [N, d] query coordinates.

    Returns:
        [N] interpolated values.
    """
    d = len(axes)
    assert values.ndim == d and points.shape[-1] == d
    values = jnp.asarray(values)
    points = jnp.asarray(points)

    idx0, frac = [], []
    for i, ax in enumerate(axes):
        ax = jnp.asarray(ax)
        n = ax.shape[0]
        x = points[:, i]
        if n == 1:
            idx0.append(jnp.zeros_like(x, dtype=jnp.int32))
            frac.append(jnp.zeros_like(x))
            continue
        j = jnp.clip(jnp.searchsorted(ax, x, side="right") - 1, 0, n - 2)
        x0 = ax[j]
        x1 = ax[j + 1]
        t = jnp.clip((x - x0) / (x1 - x0), 0.0, 1.0)
        idx0.append(j.astype(jnp.int32))
        frac.append(t)

    strides = np.ones(d, dtype=np.int64)
    for i in range(d - 2, -1, -1):
        strides[i] = strides[i + 1] * values.shape[i + 1]
    flat = values.reshape(-1)

    out = 0.0
    for corner in range(1 << d):
        lin = 0
        w = 1.0
        for i in range(d):
            hi = (corner >> i) & 1
            n = values.shape[i]
            step = jnp.where(idx0[i] + hi > n - 1, 0, hi) if n > 1 else 0
            lin = lin + (idx0[i] + step) * int(strides[i])
            w = w * jnp.where(hi, frac[i], 1.0 - frac[i])
        out = out + w * jnp.take(flat, lin)
    return out


def load_dat(path: str) -> np.ndarray:
    """Whitespace-separated .dat table file -> flat float array
    (reference `safe_read_dat`, train_model.py:51-62)."""
    with open(path, "r", encoding="utf-8") as f:
        return np.array([float(v) for v in f.read().split()])


def table_from_flat(flat: np.ndarray, axes: Sequence[np.ndarray]
                    ) -> np.ndarray:
    """Reshape a flat reference table to [n_0, ..., n_{d-1}] (axis-0-major).

    Reference layout is Fortran-order: value(i,j,k) at flat index
    i + n0*j + n0*n1*k (`mexndinterp.getLinIndex:38-48`).
    """
    dims = [len(a) for a in axes]
    return flat.reshape(dims[::-1]).transpose(range(len(dims) - 1, -1, -1))

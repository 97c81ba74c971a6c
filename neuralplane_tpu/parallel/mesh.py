"""Device mesh + sharding helpers.

The framework's parallelism model (SURVEY.md S2 P1-P3): the env/agent batch
axis is embarrassingly parallel (the only cross-agent coupling - combat
pairing - is local to an env group, so sharding on the env axis keeps it
on-shard). We shard every leading-[n] array over a 1-D 'dp' mesh axis and
replicate the (tiny) policy; PPO gradients are all-reduced by XLA via the
sharded jit. Multi-host runs extend the same mesh over
jax.distributed-initialized processes; collectives ride ICI within a host
slice and DCN across hosts.

The reference has no distributed backend at all (single GPU, one big batch);
these helpers are the TPU-native capability it lacked.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = "dp") -> Mesh:
    """1-D data-parallel mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(x, mesh: Mesh, axis_name: str = "dp", axis: int = 0):
    """Place an array with its agent axis (default: leading) sharded."""
    spec = [None] * x.ndim
    spec[axis] = axis_name
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def replicate(x, mesh: Mesh):
    """Fully replicate a pytree (policy params, etc.) over the mesh."""
    return jax.device_put(x, NamedSharding(mesh, P()))


def shard_batch_tree(tree, ns, mesh: Mesh, axis_name: str = "dp"):
    """Shard every leaf on its first axis whose size is in `ns` (int or
    tuple); replicate the rest (PRNG keys, scalars). Handles both
    agent-major [n, d] leaves (axis 0) and the fused-step path's
    feature-major [rows, n] leaves (axis 1 - models/f16.py F16StateFM)."""
    ns = (ns,) if isinstance(ns, int) else tuple(ns)

    def place(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1:
            # among axes whose size is a batch size, shard the LARGEST
            # (ties -> the last axis): feature-row axes of FM leaves (8/16
            # rows) can collide with tiny test batch sizes, and the agent
            # axis is always the bigger one of the two
            cands = [(dim, ax) for ax, dim in enumerate(leaf.shape)
                     if dim in ns]
            if cands:
                _, ax = max(cands)
                return shard_batch(leaf, mesh, axis_name, axis=ax)
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(place, tree)


def shard_env_state(state, mesh: Mesh, axis_name: str = "dp"):
    """Shard an env-state or rollout-carry pytree on its agent-batch axis.

    Selfplay carries hold both full-batch [n] env-state leaves and
    ego-half [n/2] rollout leaves; both shard on the same dp axis.
    """
    if hasattr(state, "step_count"):
        n = state.step_count.shape[0]
    elif hasattr(state, "env_state"):
        n = state.env_state.step_count.shape[0]
    else:
        raise ValueError("cannot infer batch size; use shard_batch_tree")
    return shard_batch_tree(state, (n, n // 2), mesh, axis_name)

"""Checkpoint save/restore for training state pytrees.

Improves on the reference's actor/critic-only `torch.save`
(`runner/F16sim_runner.py:223-229`, `runner/base_runner.py:91-101`): the full
TrainState (params + optimizer state + update counter) and the rollout PRNG
key are saved, so resume is exact. Format: a pickle of the pytree with
leaves pulled to host numpy (dependency-free, version-stable).
"""
from __future__ import annotations

import os
import pickle
from typing import Any

import jax


def save_pytree(path: str, tree: Any) -> None:
    """Atomic write (tmp + rename): the kill-and-restart recovery for
    stalled TPU runs (CLAUDE.md) depends on state_latest.pkl never being a
    half-written pickle, even if the kill lands mid-save."""
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    host_tree = jax.device_get(tree)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(host_tree, f)
    os.replace(tmp, path)


def load_pytree(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)

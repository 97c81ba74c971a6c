"""Policy export for serving: trained actor -> portable StableHLO artifact.

The reference has no deployment story beyond torch checkpoints that require
the full training codebase to load (`runner/base_runner.py:91-101`). This
module exports the deterministic inference step of a trained actor -
`(obs, h, mask) -> (action, h')` with the parameters BAKED IN as constants -
to a serialized `jax.export` artifact (StableHLO + calling convention).
A consumer deserializes and calls it with zero knowledge of this framework:
no param pytrees, no policy classes, no Python model code. The artifact is
retarget-checked by XLA at load (CPU/GPU/TPU), making it the hand-off
format between training (this repo) and a serving fleet.

Batch size is exported SYMBOLIC ("b"), so one artifact serves any fleet
size. The GRU hidden state is an explicit input/output - serving infra
carries it per aircraft, exactly like the env runners do.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import export as jexport


def export_actor(policy, params: dict) -> bytes:
    """Serialize the deterministic actor step with params folded in.

    Args:
        policy: a PPOPolicy/MAPPOPolicy (anything exposing `act` and
            `init_rnn_states`).
        params: full param dict (the "actor" subtree is what's baked).

    Returns:
        Serialized artifact bytes (write to disk; load with
        :func:`load_actor`).
    """
    h0, _ = policy.init_rnn_states(1)

    def infer(obs: jnp.ndarray, h: jnp.ndarray, mask: jnp.ndarray):
        a, h2 = policy.act(params, obs, h, mask, deterministic=True)
        return a, h2

    b = jexport.symbolic_shape("b")[0]
    obs_spec = jax.ShapeDtypeStruct((b, policy.spec.obs_dim), jnp.float32)
    h_spec = jax.ShapeDtypeStruct((b,) + tuple(h0.shape[1:]), h0.dtype)
    mask_spec = jax.ShapeDtypeStruct((b, 1), jnp.float32)
    exp = jexport.export(jax.jit(infer))(obs_spec, h_spec, mask_spec)
    return bytes(exp.serialize())


def load_actor(blob: bytes):
    """Deserialize an exported actor into a callable
    `(obs[b,obs], h[b,L,H], mask[b,1]) -> (action[b,act], h'[b,L,H])`."""
    exp = jexport.deserialize(blob)

    @functools.wraps(exp.call)
    def call(obs, h, mask) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return exp.call(jnp.asarray(obs, jnp.float32), h,
                        jnp.asarray(mask, jnp.float32))
    return call

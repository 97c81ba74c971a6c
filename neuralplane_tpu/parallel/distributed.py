"""Multi-host initialization + mesh construction.

The reference has no distributed backend at all (SURVEY.md S2 P2/P3); this
is the TPU-native capability it lacked. On a TPU pod slice each host runs
the same program; `init_distributed()` wires them into one JAX process
group, and `make_global_mesh()` builds a 1-D data-parallel mesh over every
chip in the slice. Env state shards over it (the env step is embarrassingly
parallel across agents - combat pairing stays on-shard because the env axis
is what shards); PPO gradients all-reduce over ICI within hosts and DCN
across them, inserted by XLA from the sharded jit.

Deterministic per-agent randomness across any mesh shape comes from the
key-per-step fold_in discipline the envs already use - resharding does not
change sampled trajectories (verified by the sharding parity tests).
"""
from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh

from .mesh import make_mesh


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed (no-op on a single process).

    On TPU pods with standard env vars every argument auto-detects; pass
    them explicitly for CPU/GPU clusters or tests.
    """
    if num_processes is not None and num_processes <= 1:
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def make_global_mesh(axis_name: str = "dp") -> Mesh:
    """1-D mesh over every device in the (possibly multi-host) job."""
    return make_mesh(jax.devices(), axis_name=axis_name)

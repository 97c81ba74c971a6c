"""NeuralPlane-TPU: a TPU-native massively-parallel flight-dynamics + RL framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of NeuralPlane
(NeurIPS 2024 D&B): batched 6-DOF fixed-wing flight dynamics with neural
aerodynamic surrogates, gym-style control/planning/combat tasks, a PPO/MAPPO
recurrent actor-critic stack, a classical PID/TECS/L1 controller suite, and
ACMI rendering - expressed as pure functions over pytree state, jit-compiled
into fused XLA programs, and sharded over TPU meshes via jax.sharding.

Key design inversions vs. the torch reference:
  - env/model/task state is one immutable pytree; ``step`` is a pure function
  - the 43 aero-surrogate MLPs run as ONE stacked batched computation
    (exact zero/identity padding to a common architecture), optionally as a
    fused Pallas kernel, instead of 43 sequential module calls
  - rollout-collect-train stays on device end to end (lax.scan), eliminating
    the reference's per-step host<->device round trip
  - scaling past one chip shards the agent-batch axis over a jax mesh
"""

__version__ = "0.1.0"

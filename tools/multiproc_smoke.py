"""Multi-process jax.distributed smoke worker: the fake-cluster substitute.

SURVEY.md §4 prescribes validating the multi-host path with
`jax.distributed` over CPU device meshes. This worker is one process of that
fake cluster: N processes x 4 virtual CPU devices each form one global mesh,
`parallel.init_distributed` wires them together, and the standard sharded
PPO collect+train (the same F16SimRunner path the sharding tests cover
single-process) runs over the GLOBAL mesh — env batch sharded across
processes, params replicated, gradients all-reduced across process
boundaries by XLA (this is what rides DCN on a real multi-host pod).

Each process writes scalar summaries to --out; the driver (or
tests/test_distributed.py) compares them across processes and against a
single-process run of the same workload.

Usage (one line per process):
  python tools/multiproc_smoke.py --num-processes 2 --process-id 0 \
      --coordinator localhost:12355 --out /tmp/p0.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys

# Must precede any jax import: 4 virtual CPU devices per process.
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# env-var JAX_PLATFORMS is ignored here (sitecustomize pins the TPU
# platform); the config update is the reliable way to force CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--coordinator", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--num-envs", type=int, default=16)
    p.add_argument("--buffer-size", type=int, default=8)
    p.add_argument("--env-name", default="Control",
                   choices=["Control", "MultipleCombat",
                            "MultipleCombatShoot"],
                   help="MultipleCombat runs the team-MAPPO stack: combat "
                   "groups shard whole (env-axis), so the team game needs "
                   "no cross-process traffic either; MultipleCombatShoot "
                   "adds the weapon layer ([n, K] missile slots + locked-"
                   "victim indices) to the same sharding contract")
    args = p.parse_args()

    from neuralplane_tpu.parallel import init_distributed, make_global_mesh
    init_distributed(coordinator_address=args.coordinator,
                     num_processes=args.num_processes,
                     process_id=args.process_id)
    assert jax.process_count() == args.num_processes
    assert jax.local_device_count() == 4

    import jax.numpy as jnp  # noqa: F401
    from neuralplane_tpu.algorithms.rl_config import RLConfig
    from neuralplane_tpu.parallel import shard_env_state

    mesh = make_global_mesh()
    cfg = RLConfig(buffer_size=args.buffer_size, data_chunk_length=4,
                   ppo_epoch=2, num_mini_batch=1, hidden_sizes=(16,),
                   act_hidden_sizes=(8,), recurrent_hidden_size=8,
                   n_choose_opponents=1)
    run_dir = os.path.join(os.path.dirname(args.out),
                           f"run_p{args.process_id}")
    if args.env_name in ("MultipleCombat", "MultipleCombatShoot"):
        from neuralplane_tpu.envs import (MultipleCombatEnv,
                                          MultipleCombatShootEnv)
        from neuralplane_tpu.runner import MAPPOSelfplayRunner
        env_cls = (MultipleCombatShootEnv
                   if args.env_name == "MultipleCombatShoot"
                   else MultipleCombatEnv)
        env = env_cls(num_envs=args.num_envs)
        runner = MAPPOSelfplayRunner(env, cfg, run_dir=run_dir, mesh=mesh)
        carry = shard_env_state(runner.init_carry(jax.random.PRNGKey(0)),
                                mesh)
        carry, batch, counters = runner.collect(
            runner.train_state.params, runner.opponent_params, carry)
        done_count = counters["done_count"]
    else:
        from neuralplane_tpu.envs import ControlEnv
        from neuralplane_tpu.runner import F16SimRunner
        env = ControlEnv(num_envs=args.num_envs, config="heading")
        runner = F16SimRunner(env, cfg, run_dir=run_dir, mesh=mesh)
        carry = runner._shard_carry(runner.init_carry(jax.random.PRNGKey(0)))
        carry, batch, (done_count, _) = runner.collect(
            runner.train_state.params, carry)
    metrics = runner.train(batch)

    # scalar reductions are replicated -> addressable on every process
    summary = {
        "process_id": args.process_id,
        "process_count": jax.process_count(),
        "global_devices": jax.device_count(),
        "reward_sum": float(batch.rewards.sum()),
        "obs_abs_sum": float(jnp.abs(batch.obs).sum()),
        "done_count": float(done_count),
        "metrics": {k: float(v) for k, v in metrics.items()},
    }
    with open(args.out, "w") as f:
        json.dump(summary, f)
    print("OK", json.dumps(summary))


if __name__ == "__main__":
    main()

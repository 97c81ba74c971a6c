"""Export a trained actor checkpoint to a serving artifact.

  python -m neuralplane_tpu.scripts.export \
      --checkpoint runs/<stamp>/checkpoints/state_latest.pkl \
      --obs-dim 22 --act-dim 4 --out actor.stablehlo

The artifact is a serialized `jax.export` module (StableHLO + calling
convention) with the actor parameters baked in and a SYMBOLIC batch
dimension - a serving process deserializes it with `jax.export.deserialize`
(or `neuralplane_tpu.utils.export.load_actor`) and calls
`(obs[b,obs], h[b,L,H], mask[b,1]) -> (action[b,act], h'[b,L,H])` at any b,
on any backend XLA retargets to. No framework code needed at serve time.
"""
from __future__ import annotations

import argparse


def main(argv=None) -> None:
    p = argparse.ArgumentParser("neuralplane_tpu.export")
    p.add_argument("--checkpoint", required=True,
                   help="state_*.pkl or actor_*.pkl from a training run")
    p.add_argument("--out", required=True, help="artifact output path")
    p.add_argument("--obs-dim", type=int, required=True)
    p.add_argument("--act-dim", type=int, default=4)
    p.add_argument("--hidden-size", default="128 128")
    p.add_argument("--act-hidden-size", default="128 128")
    p.add_argument("--recurrent-hidden-size", type=int, default=128)
    args = p.parse_args(argv)

    import jax

    from ..algorithms.ppo import PPOPolicy
    from ..algorithms.rl_config import RLConfig
    from ..utils.checkpoint import load_pytree
    from ..utils.export import export_actor

    cfg = RLConfig(
        hidden_sizes=tuple(int(x) for x in args.hidden_size.split()),
        act_hidden_sizes=tuple(int(x) for x in args.act_hidden_size.split()),
        recurrent_hidden_size=args.recurrent_hidden_size)
    policy = PPOPolicy(cfg, args.obs_dim, args.act_dim)

    blob = load_pytree(args.checkpoint)
    if isinstance(blob, dict) and "train_state" in blob:
        params = blob["train_state"].params
    elif isinstance(blob, dict) and "actor" in blob:
        params = blob
    else:
        params = {"actor": blob}
    params = jax.tree_util.tree_map(jax.numpy.asarray, params)

    artifact = export_actor(policy, params)
    with open(args.out, "wb") as f:
        f.write(artifact)
    print(f"wrote {args.out} ({len(artifact)} bytes, obs={args.obs_dim}, "
          f"act={args.act_dim}, batch=symbolic)")


if __name__ == "__main__":
    main()

"""Per-shot kill-probability probe: does a trained policy EVADE missiles?

The decisive defensive-skill measurement for the evadable-missile game
(selfplay_shoot_evadable): pit two actors in the 1v1 shoot env and report,
for each side, missiles fired and the summed pk they delivered — the ratio
is the per-shot kill probability AGAINST the other side (a missile that
never detonates contributes 0). A policy that learned to break incoming
shots shows a LOWER Pk-against than a random-init defender under the same
attacker.

Usage:
  python tools/pk_probe.py --cpu --ckpt-dir runs/shoot_evadable/leg_0/checkpoints \
      --ego 78 --opponent random --scenario selfplay_shoot_evadable \
      --num-envs 256 --steps 3000 --stochastic both
`--opponent random` uses a fresh random-init actor; any pool name works too.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp


def run_match(env, policy, ego_actor, opp_actor, steps, key,
              stochastic=True):
    """Scan a head-to-head; returns per-side weapon totals + outcomes."""
    from neuralplane_tpu.runner.selfplay import team_merge, team_split
    import functools
    num_envs, m = env.num_envs, env.num_agents
    half = m // 2
    n_ego = num_envs * half
    split = functools.partial(team_split, env)
    merge = functools.partial(team_merge, env)

    env_state, obs = env.reset(key)
    ego_obs, opp_obs = split(obs)
    h_e, _ = policy.init_rnn_states(n_ego)
    ones = jnp.ones((n_ego, 1), jnp.float32)

    @jax.jit
    def run(pe, po, env_state, ego_obs, opp_obs, key):
        zero = jnp.zeros((), jnp.float32)
        totals0 = dict(ego_fired=zero, opp_fired=zero, pk_by_ego=zero,
                       pk_by_opp=zero, ego_wins=zero, opp_wins=zero,
                       episodes=zero)
        carry0 = (env_state, ego_obs, opp_obs, h_e, jnp.zeros_like(h_e),
                  ones, key, totals0)

        def body(c, _):
            env_state, e_obs, o_obs, he, ho, masks, k, tot = c
            k, k1, k2 = jax.random.split(k, 3)
            a_e, he = policy.act({"actor": pe}, e_obs, he, masks,
                                 key=k1, deterministic=not stochastic)
            a_o, ho = policy.act({"actor": po}, o_obs, ho, masks,
                                 key=k2, deterministic=not stochastic)
            env_state, out = env.step(env_state, merge(a_e, a_o))
            fire_e, fire_o = split(out.info["shoot/fire_vec"][:, None])
            pk_e, pk_o = split(out.info["shoot/pk_dealt_vec"][:, None])
            e_done, o_done = split(out.done[:, None])
            reset_env = out.done | out.bad_done | out.exceed_time_limit
            per_env = jnp.any(reset_env.reshape(num_envs, m), axis=1)
            reset = jnp.repeat(per_env, half)[:, None].astype(jnp.float32)
            keep = (1.0 - reset)[:, :, None]
            tot = dict(
                ego_fired=tot["ego_fired"] + fire_e.sum(),
                opp_fired=tot["opp_fired"] + fire_o.sum(),
                pk_by_ego=tot["pk_by_ego"] + pk_e.sum(),
                pk_by_opp=tot["pk_by_opp"] + pk_o.sum(),
                ego_wins=tot["ego_wins"]
                + (e_done & reset.astype(bool)).sum(),
                opp_wins=tot["opp_wins"]
                + (o_done & reset.astype(bool)).sum(),
                episodes=tot["episodes"] + per_env.sum())
            e_obs, o_obs = split(out.obs)
            c = (env_state, e_obs, o_obs, he * keep, ho * keep,
                 1.0 - reset, k, tot)
            return c, None

        c, _ = jax.lax.scan(body, carry0, None, length=steps)
        return c[-1]

    tot = run(ego_actor, opp_actor, env_state, ego_obs, opp_obs, key)
    tot = {k: float(v) for k, v in tot.items()}
    tot["pk_against_ego"] = tot["pk_by_opp"] / max(tot["opp_fired"], 1.0)
    tot["pk_against_opp"] = tot["pk_by_ego"] / max(tot["ego_fired"], 1.0)
    return tot


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt-dir", required=True)
    p.add_argument("--ego", default="latest")
    p.add_argument("--opponent", default="random",
                   help="'random' = fresh random-init actor, else a pool "
                   "checkpoint name")
    p.add_argument("--scenario", default="selfplay_shoot_evadable")
    p.add_argument("--env", default="SingleCombatShoot",
                   choices=["SingleCombatShoot", "MultipleCombatShoot"],
                   help="team probe: MultipleCombatShoot + a multiple_* "
                   "scenario measures TEAM evasion (per-side Pk from the "
                   "same fire_vec/pk_dealt_vec contract)")
    p.add_argument("--num-envs", type=int, default=256)
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--use-prior", action="store_true")
    p.add_argument("--stochastic", default="both", choices=["none", "both"])
    p.add_argument("--hidden-size", default="128 128")
    p.add_argument("--act-hidden-size", default="128 128")
    p.add_argument("--recurrent-hidden-size", type=int, default=128)
    args = p.parse_args()

    from neuralplane_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    from neuralplane_tpu.algorithms.ppo import PPOPolicy
    from neuralplane_tpu.algorithms.rl_config import RLConfig
    from neuralplane_tpu.envs import (MultipleCombatShootEnv,
                                      SingleCombatShootEnv)

    env_cls = (MultipleCombatShootEnv if args.env == "MultipleCombatShoot"
               else SingleCombatShootEnv)
    env = env_cls(num_envs=args.num_envs, config=args.scenario)
    cfg = RLConfig(
        hidden_sizes=tuple(int(x) for x in args.hidden_size.split()),
        act_hidden_sizes=tuple(int(x) for x in args.act_hidden_size.split()),
        recurrent_hidden_size=args.recurrent_hidden_size,
        use_prior=args.use_prior)
    policy = PPOPolicy(cfg, env.num_observation, env.num_actions,
                       act_space=env.action_space,
                       prior_slots=env.shoot_prior_slots)

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ladder_probe",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "ladder_probe.py"))
    lp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(lp)
    load_actor = lp.load_actor  # same checkpoint resolution rules
    ego = load_actor(args.ckpt_dir, args.ego)
    if args.opponent == "random":
        opp = policy.init_actor_params(jax.random.PRNGKey(args.seed + 99))
    else:
        opp = load_actor(args.ckpt_dir, args.opponent)

    tot = run_match(env, policy, ego, opp, args.steps,
                    jax.random.PRNGKey(args.seed),
                    stochastic=args.stochastic == "both")
    tot.update(ego=args.ego, opponent=args.opponent,
               scenario=args.scenario)
    print(json.dumps(tot))


if __name__ == "__main__":
    main()

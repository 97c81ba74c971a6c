"""Skill-vs-age ladder probe: final policy vs single historical checkpoints.

The decisive self-play evidence (results/selfplay/REPORT.md): honest ELO
ladders plateau once FSP draws recent comparable selves, so skill growth is
demonstrated by pitting the FINAL policy head-to-head against individual
historical pool checkpoints and reporting the per-episode average reward
diff (final − opponent) — the reference's eval protocol
(`runner/selfplay_F16sim_runner.py:197-228`) with an explicit opponent.

Works for both the 1v1 SingleCombatEnv and the nvn team MultipleCombatEnv
(ego team plays the final actor, enemy team the historical one). Actor
params load from a run's checkpoints dir (actor_<ep>.pkl pool entries or
state_latest.pkl full saves).

Usage:
  python tools/ladder_probe.py --ckpt-dir runs/x/checkpoints \
      --opponents 1 10 50 200 latest --num-envs 200 --steps 2000 \
      --env MultipleCombat --scenario multiple_selfplay
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# --cpu must take effect before any jax use (env-var JAX_PLATFORMS is
# ignored here: the sitecustomize pins the TPU platform). CPU probes are
# the safe option while a training run owns the TPU (strict serial rule).
if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np


def load_actor(ckpt_dir: str, name: str) -> dict:
    """Resolve + load one actor param tree (same resolution as the render
    CLI's --render-index)."""
    from neuralplane_tpu.scripts.render import _resolve_pool_ckpt
    from neuralplane_tpu.utils.checkpoint import load_pytree
    blob = load_pytree(_resolve_pool_ckpt(ckpt_dir, name))
    if isinstance(blob, dict) and "train_state" in blob:
        blob = blob["train_state"].params["actor"]
    elif isinstance(blob, dict) and "actor" in blob:
        blob = blob["actor"]
    return jax.tree_util.tree_map(jnp.asarray, blob)


#: one compiled match program per (env, policy, steps, protocol): every
#: opponent rung reuses it (both param trees are traced arguments), so the
#: ladder compiles the 2000-step scan ONCE instead of once per rung
#: (minutes each through the relay)
_RUN_CACHE: dict = {}


def head_to_head(env, policy, ego_actor: dict, opp_actor: dict,
                 steps: int, key: jax.Array, stochastic: str = "none"):
    """Head-to-head match; returns (ego per-episode avg, opp per-episode
    avg, episodes ended, ego wins, opp wins) following the reference
    per-episode protocol (`selfplay_F16sim_runner.py:197-228`).

    stochastic: "none" = both deterministic (the reference eval protocol);
    "both" = both SAMPLE actions — the training-time behavioral matchup
    (an untrained checkpoint's deterministic mode is a degenerate
    straight-line flyer; its stochastic policy is what self-play actually
    trained against)."""
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

    sample = stochastic == "both"

    cache_key = (id(env), id(policy), steps, sample)
    cached = _RUN_CACHE.get(cache_key)

    @jax.jit
    def run(pe, po, env_state, ego_obs, opp_obs, key):
        zero = jnp.zeros((n_ego, 1), jnp.float32)
        carry0 = (env_state, ego_obs, opp_obs, h_e, jnp.zeros_like(h_e),
                  ones, zero, zero, key)

        def body(c, _):
            env_state, e_obs, o_obs, he, ho, masks, cum_e, cum_o, k = c
            k, k1, k2 = jax.random.split(k, 3)
            a_e, he = policy.act({"actor": pe}, e_obs, he, masks,
                                 key=k1, deterministic=not sample)
            a_o, ho = policy.act({"actor": po}, o_obs, ho, masks,
                                 key=k2, deterministic=not sample)
            env_state, out = env.step(env_state, merge(a_e, a_o))
            reset_env = out.done | out.bad_done | out.exceed_time_limit
            per_env = jnp.any(reset_env.reshape(num_envs, m), axis=1)
            reset = jnp.repeat(per_env, half)[:, None].astype(jnp.float32)
            keep = (1.0 - reset)[:, :, None]
            e_obs, o_obs = split(out.obs)
            e_rew, o_rew = split(out.reward[:, None])
            cum_e, cum_o = cum_e + e_rew, cum_o + o_rew
            # decisive outcomes at episode end: `done` fires on the side
            # that wiped/outlived the other (shutdown win; 1v1 pairwise
            # rule at h=1), `bad_done` on the side that died/violated
            e_done, o_done = split(out.done[:, None])
            e_bad, o_bad = split(out.bad_done[:, None])
            e_win = jnp.any((e_done & reset.astype(bool)).reshape(
                num_envs, half), axis=1).astype(jnp.float32)
            o_win = jnp.any((o_done & reset.astype(bool)).reshape(
                num_envs, half), axis=1).astype(jnp.float32)
            emit = (cum_e * reset, cum_o * reset, reset, e_win, o_win)
            c = (env_state, e_obs, o_obs, he * keep, ho * keep,
                 1.0 - reset, cum_e * (1 - reset), cum_o * (1 - reset), k)
            return c, emit

        _, (ee, eo, resets, ew, ow) = jax.lax.scan(body, carry0, None,
                                                   length=steps)
        ends = resets.sum() / half
        denom = jnp.maximum(resets.sum(), 1.0)
        return (ee.sum() / denom, eo.sum() / denom, ends,
                ew.sum(), ow.sum())

    if cached is None:
        _RUN_CACHE[cache_key] = cached = run
    e, o, ends, ew, ow = cached(ego_actor, opp_actor, env_state, ego_obs,
                                opp_obs, key)
    return float(e), float(o), float(ends), float(ew), float(ow)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt-dir", required=True)
    p.add_argument("--final", default="latest",
                   help="checkpoint name of the FINAL policy")
    p.add_argument("--opponents", nargs="+", required=True,
                   help="historical checkpoint names (pool episode numbers)")
    p.add_argument("--env", default="MultipleCombat",
                   choices=["SingleCombat", "MultipleCombat",
                            "SingleCombatShoot", "MultipleCombatShoot"])
    p.add_argument("--use-prior", action="store_true",
                   help="apply the Beta shoot prior (match training)")
    p.add_argument("--scenario", default=None)
    p.add_argument("--num-envs", type=int, default=200)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tie-band", type=float, default=50.0)
    p.add_argument("--stochastic", default="none", choices=["none", "both"],
                   help="'both' = sampled actions (training-time behavioral "
                   "matchup); 'none' = the reference deterministic protocol")
    p.add_argument("--opp-ckpt-dir", default=None,
                   help="load OPPONENTS from a different run's checkpoint "
                   "dir (cross-run head-to-heads, e.g. FSP vs PFSP finals)")
    p.add_argument("--both-sides", action="store_true",
                   help="also play each match with the sides swapped and "
                   "report the orientation-summed row. The reference obs "
                   "convention hands the odd-row side its role-swapped "
                   "side flag (singlecombat_env.py:118-125), which costs a "
                   "fine-maneuvering policy a measurable home advantage "
                   "(~2.5:1 in an evadable-game mirror); summing both "
                   "orientations cancels it")
    p.add_argument("--symmetric-side", action="store_true",
                   help="play on an env with symmetric_side_flag=True "
                   "(every agent reads obs slot 14 in its own convention; "
                   "see utils/config.py) - the ablation knob for the "
                   "home-advantage root cause")
    # network shape must match the checkpoints (train CLI defaults)
    p.add_argument("--hidden-size", default="128 128")
    p.add_argument("--act-hidden-size", default="128 128")
    p.add_argument("--recurrent-hidden-size", type=int, default=128)
    args = p.parse_args()

    from neuralplane_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    from neuralplane_tpu.algorithms.ppo import PPOPolicy
    from neuralplane_tpu.algorithms.rl_config import RLConfig
    from neuralplane_tpu.envs import (MultipleCombatEnv,
                                      MultipleCombatShootEnv,
                                      SingleCombatEnv, SingleCombatShootEnv)

    env_cls, default_scn = {
        "SingleCombat": (SingleCombatEnv, "selfplay"),
        "SingleCombatShoot": (SingleCombatShootEnv, "selfplay_shoot"),
        "MultipleCombat": (MultipleCombatEnv, "multiple_selfplay"),
        "MultipleCombatShoot": (MultipleCombatShootEnv,
                                "multiple_selfplay_shoot"),
    }[args.env]
    env_config = args.scenario or default_scn
    if args.symmetric_side:
        import dataclasses
        from neuralplane_tpu.utils.config import load_config
        env_config = dataclasses.replace(load_config(env_config),
                                         symmetric_side_flag=True)
    env = env_cls(num_envs=args.num_envs, config=env_config)
    cfg = RLConfig(
        hidden_sizes=tuple(int(x) for x in args.hidden_size.split()),
        act_hidden_sizes=tuple(int(x) for x in args.act_hidden_size.split()),
        recurrent_hidden_size=args.recurrent_hidden_size,
        use_prior=args.use_prior)
    # layout-aware Beta-prior slots: the team envs' AO/R live at different
    # obs offsets than the 1v1's (11, 13) - same threading the runners do
    # (the round-4 ADVICE catch, runner/base.py:58-62)
    policy = PPOPolicy(cfg, env.num_observation, env.num_actions,
                       act_space=getattr(env, "action_space", None),
                       prior_slots=getattr(env, "shoot_prior_slots",
                                           (11, 13)))
    final = load_actor(args.ckpt_dir, args.final)

    rows = []
    for name in args.opponents:
        opp = load_actor(args.opp_ckpt_dir or args.ckpt_dir, name)
        e, o, ends, ew, ow = head_to_head(env, policy, final, opp,
                                          args.steps,
                                          jax.random.PRNGKey(args.seed),
                                          stochastic=args.stochastic)
        if args.both_sides:
            # swapped orientation: the FINAL policy plays the odd rows;
            # summing both cancels the obs-convention home advantage
            o2, e2, ends2, ow2, ew2 = head_to_head(
                env, policy, opp, final, args.steps,
                jax.random.PRNGKey(args.seed + 1),
                stochastic=args.stochastic)
            e = (e * ends + e2 * ends2) / (ends + ends2)
            o = (o * ends + o2 * ends2) / (ends + ends2)
            ends, ew, ow = ends + ends2, ew + ew2, ow + ow2
        diff = e - o
        verdict = ("WIN" if diff > args.tie_band
                   else "LOSS" if diff < -args.tie_band else "tie")
        row = {"opponent": name, "ego_avg": round(e, 3),
               "opp_avg": round(o, 3), "diff": round(diff, 3),
               "episodes": ends, "ego_wins": ew, "opp_wins": ow,
               "verdict": verdict}
        rows.append(row)
        print(json.dumps(row))
    print(json.dumps({"ladder": rows}))


if __name__ == "__main__":
    main()

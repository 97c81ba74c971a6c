"""Self-play combat runner: opponent pool, ELO, on-device rollouts.

Re-design of the reference `SelfplayJSBSimRunner`
(`runner/selfplay_F16sim_runner.py:21-324`). Layout: each env group holds
M agents, the first M/2 are the trainee ("ego") team and the last M/2 are
driven by frozen opponent policies from a checkpoint pool. Opponents are
represented as a STACKED param pytree [K, ...] and evaluated with a vmap
over pool slices of the env batch - no Python-side model swapping inside
the rollout (SURVEY.md S7 hard-parts note).

The ELO ladder, SP/FSP/PFSP opponent sampling, and pool persistence follow
the reference semantics (ELO K=32, reward-diff win bands, per-episode pool
snapshots).
"""
from __future__ import annotations

import functools
import logging
import os
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..algorithms.ppo.buffer import RolloutBatch
from ..algorithms.rl_config import RLConfig
from ..algorithms.selfplay import (choose_opponent, elo_update,
                                   elo_update_scored)
from ..utils.checkpoint import load_pytree, save_pytree
from .base import Runner


def team_split(env, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Flat [n, ...] -> (ego [n/2, ...], opp [n/2, ...]) team halves for any
    combat env (first half of each group = ego team)."""
    ne, m = env.num_envs, env.num_agents
    h = m // 2
    g = x.reshape(ne, m, *x.shape[1:])
    return (g[:, :h].reshape(ne * h, *x.shape[1:]),
            g[:, h:].reshape(ne * h, *x.shape[1:]))


def team_merge(env, ego: jnp.ndarray, opp: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`team_split`."""
    ne, m = env.num_envs, env.num_agents
    h = m // 2
    e = ego.reshape(ne, h, *ego.shape[1:])
    o = opp.reshape(ne, h, *opp.shape[1:])
    return jnp.concatenate([e, o], axis=1).reshape(ne * m, *ego.shape[1:])


def pool_slices(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """[n_ego, ...] -> [k, n_ego/k, ...] opponent-pool slices."""
    return x.reshape(k, x.shape[0] // k, *x.shape[1:])


@struct.dataclass
class SelfplayCarry:
    env_state: object
    ego_obs: jnp.ndarray       # [n_ego, obs]
    opp_obs: jnp.ndarray       # [n_opp, obs]
    h_actor: jnp.ndarray       # ego actor hidden [n_ego, L, H]
    h_critic: jnp.ndarray
    h_opp: jnp.ndarray         # opponent actor hidden [n_opp, L, H]
    ego_masks: jnp.ndarray     # [n_ego, 1]
    opp_masks: jnp.ndarray     # [n_opp, 1]
    bad_masks: jnp.ndarray     # [n_ego, 1]
    key: jax.Array
    # per-agent liveness AT the upcoming obs (MAPPO SharedReplayBuffer
    # active_masks semantics); None for the plain PPO selfplay runner
    active_masks: Optional[jnp.ndarray] = None


class SelfplayRunner(Runner):
    """PPO + frozen-opponent pool on the combat envs."""

    def __init__(self, env, cfg: RLConfig, run_dir: str = "runs/selfplay",
                 eval_env=None, model_dir: Optional[str] = None,
                 use_tensorboard: bool = False, mesh=None):
        super().__init__(env, cfg, run_dir, eval_env, model_dir,
                         use_tensorboard)
        # Data-parallel mesh: env state + ego rollout sharded on 'dp',
        # policy/opponent params replicated (see parallel/mesh.py).
        self.mesh = mesh
        if mesh is not None:
            from ..parallel import replicate
            self.train_state = replicate(self.train_state, mesh)
        self.num_envs = env.num_envs
        self.num_agents = env.num_agents
        self.half = self.num_agents // 2
        self.n_ego = env.num_envs * self.half
        self.num_opponents = max(1, cfg.n_choose_opponents)
        assert env.num_envs % self.num_opponents == 0, (
            "num_envs must divide evenly into opponent slices")
        self.rng = np.random.default_rng(cfg.seed)
        self.latest_elo = cfg.init_elo
        self.policy_pool: Dict[str, float] = {}
        # Resuming (e.g. a supervisor leg restart): import the previous
        # run's opponent pool so FSP/PFSP keep their historical diversity -
        # without this a mid-run restart silently degrades self-play to
        # playing only the resumed policy. Pool ELO ratings + latest_elo
        # ride in the full-state checkpoint (_extra_state), so PFSP's
        # strength-weighted sampling and the ego rating survive restarts;
        # entries without a saved rating re-enter at the current rating.
        restored = getattr(self, "_restored_extras", {}).get("selfplay", {})
        self.latest_elo = float(restored.get("latest_elo", self.latest_elo))
        self._restored_ratings: Dict[str, float] = {
            k: float(v) for k, v in restored.get("policy_pool", {}).items()}
        if model_dir is not None:
            self._import_pool(os.path.dirname(os.path.abspath(model_dir)))
        if not self.policy_pool:
            # fresh run: seed the pool with the initial policy
            self._save_pool_entry("0")
        newest = max(self.policy_pool,
                     key=lambda n: int(n) if n.isdigit() else -1)
        self.opponent_params = self._stack_opponents(
            [newest] * self.num_opponents)

    # ---- persistence (pool ratings + ego ELO ride in the checkpoint) ----
    def _extra_state(self) -> Dict:
        return {"selfplay": {"latest_elo": float(self.latest_elo),
                             "policy_pool": {k: float(v) for k, v
                                             in self.policy_pool.items()}}}

    # ---- pool management ----
    def _pool_path(self, name: str) -> str:
        return os.path.join(self.save_dir, f"actor_{name}.pkl")

    def _import_pool(self, src_dir: str) -> None:
        """Copy a previous run's actor_*.pkl pool into this run's pool."""
        import shutil
        if not os.path.isdir(src_dir):
            return
        for fname in sorted(os.listdir(src_dir)):
            if not (fname.startswith("actor_") and fname.endswith(".pkl")):
                continue
            name = fname[len("actor_"):-len(".pkl")]
            dst = self._pool_path(name)
            if os.path.abspath(os.path.join(src_dir, fname)) != \
                    os.path.abspath(dst):
                shutil.copy(os.path.join(src_dir, fname), dst)
            # checkpointed rating when the resumed state has one; current
            # rating only for entries the checkpoint never rated
            self.policy_pool[name] = self._restored_ratings.get(
                name, self.latest_elo)
        if self.policy_pool:
            logging.info("Imported %d pool entries from %s",
                         len(self.policy_pool), src_dir)

    def _next_pool_name(self) -> str:
        nums = [int(n) for n in self.policy_pool if n.isdigit()]
        return str(max(nums) + 1 if nums else 0)

    def _save_pool_entry(self, name: str) -> None:
        save_pytree(self._pool_path(name), self.train_state.params["actor"])
        self.policy_pool[name] = self.latest_elo

    def _stack_opponents(self, names) -> dict:
        trees = [jax.tree_util.tree_map(jnp.asarray,
                                        load_pytree(self._pool_path(n)))
                 for n in names]
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)

    def reset_opponent(self) -> list:
        """Re-sample opponents per SP/FSP/PFSP (reference :257-277)."""
        names = [choose_opponent(self.cfg.selfplay_algorithm,
                                 self.policy_pool, self.rng)
                 for _ in range(self.num_opponents)]
        self.opponent_params = self._stack_opponents(names)
        logging.info("Choose opponents %s for training", names)
        return names

    # ---- ego/opponent split helpers (flat [n] <-> teams) ----
    def _split(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return team_split(self.env, x)

    def _merge(self, ego: jnp.ndarray, opp: jnp.ndarray) -> jnp.ndarray:
        return team_merge(self.env, ego, opp)

    def _opp_slices(self, x: jnp.ndarray) -> jnp.ndarray:
        return pool_slices(x, self.num_opponents)

    # ---- rollout ----
    def init_carry(self, key: jax.Array) -> SelfplayCarry:
        k_reset, k_roll = jax.random.split(key)
        env_state, obs = self.env.reset(k_reset)
        ego_obs, opp_obs = self._split(obs)
        h_a, h_c = self.policy.init_rnn_states(self.n_ego)
        ones = jnp.ones((self.n_ego, 1), jnp.float32)
        return SelfplayCarry(env_state=env_state, ego_obs=ego_obs,
                             opp_obs=opp_obs, h_actor=h_a, h_critic=h_c,
                             h_opp=jnp.zeros_like(h_a), ego_masks=ones,
                             opp_masks=ones, bad_masks=ones, key=k_roll)

    def _collect_step(self, params: dict, opp_params: dict,
                      carry: SelfplayCarry):
        key, k_act, k_opp = jax.random.split(carry.key, 3)
        values, actions, logp, h_a, h_c = self.policy.get_actions(
            params, carry.ego_obs, carry.h_actor, carry.h_critic,
            carry.ego_masks, k_act)

        # frozen opponents: vmap one actor over K stacked param sets
        def opp_act(p, obs, h, m, k):
            # pool entries store only the actor subtree
            return self.policy.act({"actor": p}, obs, h, m, key=k,
                                   deterministic=False)
        opp_actions, h_opp = jax.vmap(opp_act)(
            opp_params, self._opp_slices(carry.opp_obs),
            self._opp_slices(carry.h_opp), self._opp_slices(carry.opp_masks),
            jax.random.split(k_opp, self.num_opponents))
        opp_actions = opp_actions.reshape(self.n_ego, -1)
        h_opp = h_opp.reshape(carry.h_opp.shape)

        env_state, out = self.env.step(carry.env_state,
                                       self._merge(actions, opp_actions))

        # per-env flag reductions over ALL agents (reference insert():142-152)
        def env_any(x):
            per_env = jnp.any(x.reshape(self.num_envs, self.num_agents),
                              axis=1)
            return jnp.repeat(per_env, self.half)[:, None]
        dones_env = env_any(out.done)
        bad_env = env_any(out.bad_done)
        reset_env = env_any(out.done | out.bad_done | out.exceed_time_limit)
        next_masks = 1.0 - dones_env.astype(jnp.float32)
        next_bad = 1.0 - bad_env.astype(jnp.float32)
        keep = (1.0 - reset_env.astype(jnp.float32))[:, :, None]
        h_a, h_c, h_opp = h_a * keep, h_c * keep, h_opp * keep

        ego_obs, opp_obs = self._split(out.obs)
        ego_rew, opp_rew = self._split(out.reward[:, None])
        step_data = dict(
            obs=carry.ego_obs, actions=actions, rewards=ego_rew,
            opp_rewards=opp_rew,
            masks=carry.ego_masks, bad_masks=carry.bad_masks,
            action_log_probs=logp, value_preds=values,
            done_count=out.done.sum() + out.bad_done.sum(),
        )
        # weapon envs expose launch/hit counts; fold them into the scanned
        # counters so training logs carry combat activity (kills/episode)
        for k in ("shoot/launches", "shoot/hits", "shoot/pk_sum"):
            if k in out.info:
                step_data[k.replace("/", "_")] = out.info[k]
        new_carry = SelfplayCarry(
            env_state=env_state, ego_obs=ego_obs, opp_obs=opp_obs,
            h_actor=h_a, h_critic=h_c, h_opp=h_opp, ego_masks=next_masks,
            opp_masks=next_masks, bad_masks=next_bad, key=key)
        return new_carry, step_data

    @functools.partial(jax.jit, static_argnums=0)
    def collect(self, params: dict, opp_params: dict, carry: SelfplayCarry
                ) -> Tuple[SelfplayCarry, RolloutBatch, jnp.ndarray]:
        # two-level scan: rnn states recorded once per recurrent chunk (the
        # chunk-start input - all make_chunks reads; see runner/f16sim.py)
        T, L = self.cfg.buffer_size, self.cfg.data_chunk_length
        if T % L != 0:
            raise ValueError(f"buffer_size {T} % data_chunk_length {L} != 0")

        def inner(c, _):
            return self._collect_step(params, opp_params, c)

        def outer(c, _):
            h0_a, h0_c = c.h_actor, c.h_critic
            c, steps = jax.lax.scan(inner, c, None, length=L)
            return c, (steps, h0_a, h0_c)

        carry, (steps, h0_a, h0_c) = jax.lax.scan(outer, carry, None,
                                                  length=T // L)
        steps = jax.tree.map(lambda x: x.reshape((T,) + x.shape[2:]), steps)
        bootstrap = self.policy.get_values(params, carry.ego_obs,
                                           carry.h_critic, carry.ego_masks)
        batch = RolloutBatch(
            obs=jnp.concatenate([steps["obs"], carry.ego_obs[None]], axis=0),
            actions=steps["actions"], rewards=steps["rewards"],
            masks=jnp.concatenate([steps["masks"], carry.ego_masks[None]],
                                  axis=0),
            bad_masks=jnp.concatenate([steps["bad_masks"],
                                       carry.bad_masks[None]], axis=0),
            action_log_probs=steps["action_log_probs"],
            value_preds=jnp.concatenate([steps["value_preds"],
                                         bootstrap[None]], axis=0),
            rnn_states_actor=h0_a,
            rnn_states_critic=h0_c,
        )
        counters = {k: steps[k].sum() for k in steps
                    if k.startswith("shoot_") or k == "done_count"}
        return carry, batch, counters

    # ---- evaluation vs pool + ELO (reference :133-241) ----
    def eval_elo(self, num_steps: Optional[int] = None) -> Dict[str, float]:
        # ELO matches play on the dedicated eval env when one is provided
        # (reference evaluates on eval_envs, selfplay_F16sim_runner.py:
        # 156-241), falling back to the training env. All split/slice
        # helpers below are sized from the env being evaluated, so eval_env
        # may have a different num_envs than training.
        env = self.eval_env if self.eval_env is not None else self.env
        steps = num_steps or env.config.max_steps
        num_envs, num_agents = env.num_envs, env.num_agents
        half = num_agents // 2
        n_ego = num_envs * half
        K = self.num_opponents
        # whole env GROUPS must map to one opponent each, or a single match
        # would mix two pool policies and split its reward attribution
        assert num_envs % K == 0, (
            f"eval num_envs={num_envs} must divide into {K} opponent slices")

        split = functools.partial(team_split, env)
        merge = functools.partial(team_merge, env)
        slices = functools.partial(pool_slices, k=K)

        # one compiled eval program per (env, horizon): rebuilding the jit
        # closure every eval retraces + re-looks-up the executable each time
        cache_key = (id(env), steps)
        cached = getattr(self, "_eval_run_cache", {}).get(cache_key)

        names = [choose_opponent(self.cfg.selfplay_algorithm,
                                 self.policy_pool, self.rng)
                 for _ in range(K)]
        opp_params = self._stack_opponents(names)

        k_reset, k_roll = jax.random.split(self.next_key())
        env_state, obs = env.reset(k_reset)
        ego_obs, opp_obs = split(obs)
        h_a, h_c = self.policy.init_rnn_states(n_ego)
        ones = jnp.ones((n_ego, 1), jnp.float32)
        carry = SelfplayCarry(env_state=env_state, ego_obs=ego_obs,
                              opp_obs=opp_obs, h_actor=h_a, h_critic=h_c,
                              h_opp=jnp.zeros_like(h_a), ego_masks=ones,
                              opp_masks=ones, bad_masks=ones, key=k_roll)

        # Default: deterministic play for both sides, matching the
        # reference's eval (:168-178 act(..., deterministic=True)).
        # Beyond reference (--eval-stochastic): SAMPLE both sides - the
        # behavioral matchup self-play actually trains on. On team combat
        # the deterministic protocol is near-silent (modes are straight-
        # line flyers producing ~no kill events, results/mappo_2v2), so
        # the in-training ELO ladder only moves under sampled play.
        det = not self.cfg.eval_stochastic
        # Beyond reference (--eval-event-scoring): score each completed
        # episode on DECISIVE team-wipe events from StepOutput.active
        # (win = enemy team wiped & own alive; tie on indecisive ends),
        # feeding ELO the fractional score instead of the banded mean-
        # reward W/T/L (which is near-silent on team games - see
        # RLConfig.eval_event_scoring).
        events = self.cfg.eval_event_scoring

        @jax.jit
        def _run(params, opp_params, carry):
            zero = jnp.zeros((n_ego, 1), jnp.float32)
            zero_env = jnp.zeros((num_envs,), jnp.float32)

            def body(state, _):
                c, cum_ego, cum_opp = state
                k_next, k_ego, k_opp = jax.random.split(c.key, 3)
                a_ego, h_a = self.policy.act(params, c.ego_obs, c.h_actor,
                                             c.ego_masks, key=k_ego,
                                             deterministic=det)
                a_opp, h_opp = jax.vmap(
                    lambda p, o, h, m, kk: self.policy.act(
                        {"actor": p}, o, h, m, key=kk, deterministic=det))(
                    opp_params, slices(c.opp_obs),
                    slices(c.h_opp),
                    slices(c.opp_masks),
                    jax.random.split(k_opp, K))
                a_opp = a_opp.reshape(n_ego, -1)
                env_state, out = env.step(c.env_state,
                                          merge(a_ego, a_opp))

                def per_env(x):
                    return jnp.any(x.reshape(num_envs, num_agents), axis=1)

                def rep(per):
                    return jnp.repeat(per, half)[:, None]
                done_pe = per_env(out.done)
                bad_pe = per_env(out.bad_done)
                reset_pe = per_env(out.done | out.bad_done
                                   | out.exceed_time_limit)
                dones_env, bad_env, reset_env = (rep(done_pe), rep(bad_pe),
                                                 rep(reset_pe))
                masks = 1.0 - dones_env.astype(jnp.float32)
                bad_masks = 1.0 - bad_env.astype(jnp.float32)
                keep = (1.0 - reset_env.astype(jnp.float32))[:, :, None]
                ego_obs, opp_obs = split(out.obs)
                ego_rew, opp_rew = split(out.reward[:, None])
                # per-EPISODE cumulative rewards, emitted when the env
                # group resets (reference :197-216: cumulative_rewards
                # appended at reset_env and zeroed)
                reset = reset_env.astype(jnp.float32)
                cum_ego = cum_ego + ego_rew
                cum_opp = cum_opp + opp_rew
                if events:
                    if out.active is None:
                        raise ValueError(
                            "eval_event_scoring needs a team env exposing "
                            "StepOutput.active (wipe events)")
                    act_g = out.active.reshape(num_envs, num_agents)
                    own_alive = act_g[:, :half].sum(axis=1) > 0
                    enm_alive = act_g[:, half:].sum(axis=1) > 0
                    r_pe = reset_pe.astype(jnp.float32)
                    win_pe = r_pe * (own_alive & ~enm_alive)
                    loss_pe = r_pe * (~own_alive & enm_alive)
                else:
                    r_pe = reset_pe.astype(jnp.float32)
                    win_pe = loss_pe = zero_env
                emit = (cum_ego * reset, cum_opp * reset, reset,
                        r_pe, win_pe, loss_pe)
                cum_ego = cum_ego * (1.0 - reset)
                cum_opp = cum_opp * (1.0 - reset)
                c = c.replace(env_state=env_state, ego_obs=ego_obs,
                              opp_obs=opp_obs, h_actor=h_a * keep,
                              h_opp=h_opp.reshape(c.h_opp.shape) * keep,
                              ego_masks=masks, opp_masks=masks,
                              bad_masks=bad_masks, key=k_next)
                return (c, cum_ego, cum_opp), emit
            (c, _, _), (e_ego, e_opp, resets, r_pe, win_pe, loss_pe) = \
                jax.lax.scan(body, (carry, zero, zero), None, length=steps)
            # average episode reward per pool slice over COMPLETED episodes
            # (reference :211-216: mean over the team's agents then over
            # episodes; summing emitted values and dividing by per-agent
            # reset counts is identical because resets are env-level and
            # broadcast over the half agents, so the /half cancels)
            ends = slices(resets.sum(0)).sum(axis=(1, 2))
            denom = jnp.maximum(ends, 1.0)
            ego = slices(e_ego.sum(0)).sum(axis=(1, 2)) / denom
            opp = slices(e_opp.sum(0)).sum(axis=(1, 2)) / denom
            # env axis maps contiguously onto pool slices (pool_slices
            # reshapes env-major), so per-slice event counts are reshapes
            eps_s = r_pe.sum(0).reshape(K, -1).sum(1)
            wins_s = win_pe.sum(0).reshape(K, -1).sum(1)
            losses_s = loss_pe.sum(0).reshape(K, -1).sum(1)
            return ego, opp, ends.sum() / half, eps_s, wins_s, losses_s
        if cached is None:
            if not hasattr(self, "_eval_run_cache"):
                self._eval_run_cache = {}
            self._eval_run_cache[cache_key] = cached = _run
        ego_rew, opp_rew, ends, eps_s, wins_s, losses_s = cached(
            self.train_state.params, opp_params, carry)
        ego_rew, opp_rew = np.asarray(ego_rew), np.asarray(opp_rew)
        opp_elo = np.array([self.policy_pool[n] for n in names])
        info = {}
        if events:
            eps_s, wins_s, losses_s = (np.asarray(eps_s),
                                       np.asarray(wins_s),
                                       np.asarray(losses_s))
            ties_s = eps_s - wins_s - losses_s
            s_ego = np.where(eps_s > 0,
                             (wins_s + 0.5 * ties_s) / np.maximum(eps_s, 1),
                             0.5)
            self.latest_elo, new_opp = elo_update_scored(
                self.latest_elo, opp_elo, s_ego)
            info.update(eval_wins=float(wins_s.sum()),
                        eval_losses=float(losses_s.sum()))
        else:
            self.latest_elo, new_opp = elo_update(
                self.latest_elo, opp_elo, ego_rew, opp_rew,
                tie_band=self.cfg.elo_tie_band)
        for n, e in zip(names, new_opp):
            self.policy_pool[n] = float(e)
        self.reset_opponent()
        return {"latest_elo": self.latest_elo,
                "eval_episodes_ended": float(ends), **info}

    # ---- main loop ----
    def run(self) -> Dict[str, float]:
        cfg = self.cfg
        carry = self.init_carry(self.next_key())
        steps_per_episode = cfg.buffer_size * self.n_ego
        episodes = max(1, int(cfg.num_env_steps) // steps_per_episode)
        start = time.time()
        train_infos: Dict[str, float] = {}

        if self.mesh is not None:
            from ..parallel import shard_env_state
            carry = shard_env_state(carry, self.mesh)
        for episode in range(episodes):
            carry, batch, counters = self.collect(
                self.train_state.params, self.opponent_params, carry)
            train_infos = self.train(batch)
            total = (episode + 1) * steps_per_episode

            if episode % cfg.log_interval == 0:
                ends = ((batch.masks[1:] == 0).sum()
                        + (batch.bad_masks[1:] == 0).sum())
                avg = float(batch.rewards.sum() / jnp.maximum(ends, 1))
                train_infos["average_episode_rewards"] = avg
                train_infos["fps"] = int(total / (time.time() - start))
                train_infos["latest_elo"] = self.latest_elo
                for k, v in counters.items():
                    if k.startswith("shoot_"):
                        train_infos[k] = round(float(v), 3)
                self.log_info(train_infos, total)

            if cfg.use_eval and episode % cfg.eval_interval == 0 and episode:
                self.log_info(self.eval_elo(), total)

            if episode % cfg.save_interval == 0 or episode == episodes - 1:
                self.save("latest")
                # monotone pool naming (not episode-based): resumed legs
                # continue numbering after the imported pool instead of
                # overwriting its early entries
                self._save_pool_entry(self._next_pool_name())
                # re-sample training opponents from the grown pool. Fixed
                # reference defect: the reference only calls reset_opponent
                # at the END of eval() (selfplay_F16sim_runner.py:246), so
                # without --use-eval it self-plays the initial random
                # policy forever; here the pool is live regardless of eval.
                self.reset_opponent()
        return train_infos

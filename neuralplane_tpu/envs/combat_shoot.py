"""1v1 combat with missiles: the shoot action head, end-to-end.

The reference carries a complete *policy-side* missile stack — the
Tuple(MultiDiscrete, Discrete) "shoot" action head
(`algorithms/utils/act.py:39-53`), the BetaShootBernoulli distribution
(`algorithms/utils/distributions.py:107-129`) and the `use_prior`
attack-angle/distance launch prior (`ppo_actor.py:41-49`, keyed on obs
slots 11/13) — but no in-tree environment exposes that action space, so
none of it can ever run. This env supplies the missing environment side
on top of `SingleCombatEnv`:

- **action** = ShootTuple((throttle_bins, attitude_bins x 3)) + shoot bit:
  the four discrete flight-control demands decode to the same [-1, 1]
  demands the continuous combat env consumes (throttle, roll, pitch, yaw;
  `singlecombat_env.py:244-261` smoothing/PID pipeline unchanged), and the
  trailing Bernoulli bit fires a missile;
- **missiles**: up to `max_missiles` constant-speed pure-PN missiles per
  agent (`ops/missile.py`), launched along the shooter's velocity, homing
  on the shooter's opponent, with launch gating (ammo + cooldown) and a
  continuous (segment) hit test;
- **obs** = the 15-dim 1v1 layout (slots 11/13 keep AO / R where
  `shoot_priors` expects them) + 3 appended dims:
  [ammo fraction, incoming-missile alert, nearest incoming missile range
  (10 km units, 0 when clear)];
- **reward** = the 1v1 posture shaping minus `missile_shoot_cost` per
  launch, plus the EventDrivenReward-scale +-200 on the Shutdown win/lose
  split (`event_driven_reward.py:28` scale keyed on the kill itself), plus
  an optional `blood_shaping * (damage dealt - damage taken)` dense term;
- **evadable variant** (`selfplay_shoot_evadable`): `missile_fuse_outer`
  > 0 switches the warhead to a graded proximity fuse (kill weight ramps
  from 1 inside `missile_hit_radius` to 0 at `fuse_outer`, evaluated at
  the closest point of approach — see `ops/missile.py:step_missiles`), and
  `missile_threat_obs` appends the incoming missile's bearing/closure so a
  directed break turn is representable. Together with a ~5 g missile this
  opens the defensive skill axis the 12 g Pk~1 game cannot train;
- everything stays one fused jitted step - the missile arrays are
  [n, K]-batched state fields, no host control flow.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..algorithms.utils.spaces import ShootTuple
from ..ops.missile import (MissileState, clear_missiles, init_missiles,
                           launch_missiles, step_missiles)
from ..utils.config import EnvConfig
from ..utils.math import distance_fn, orientation_fn, wrap_PI
from . import terminations as X
from .combat import FT, CombatState, MultipleCombatEnv, SingleCombatEnv
from .types import StepOutput


def decode_shoot_action(action: jnp.ndarray, nvec: jnp.ndarray
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ShootTuple [n, 5] (discrete indices + shoot bit) ->
    ([n, 4] demands in [-1, 1], fire [n] bool)."""
    idx = jnp.clip(jnp.round(action[:, :4]), 0.0, nvec - 1.0)
    demands = idx / (nvec - 1.0) * 2.0 - 1.0
    return demands, action[:, 4] > 0.5


@struct.dataclass
class ShootCombatState(CombatState):
    ammo: jnp.ndarray = None        # [n] int32 missiles remaining
    cooldown: jnp.ndarray = None    # [n] float32 s until next launch
    missiles: MissileState = None   # [n, K] slots


class SingleCombatShootEnv(SingleCombatEnv):
    """1v1 combat + missiles; action space is the reference's ShootTuple."""

    def __init__(self, num_envs: int = 1,
                 config: "str | EnvConfig" = "selfplay_shoot",
                 aero_backend: str = "auto"):
        super().__init__(num_envs, config, aero_backend)
        assert self.num_agents == 2, "shoot combat is 1v1"
        cfg = self.config
        self.action_space = ShootTuple(
            (cfg.throttle_bins,) + (cfg.attitude_bins,) * 3)
        self.num_actions = self.action_space.dim          # 4 controls + shoot
        # 15 base + [ammo, alert, range] (+ [sin brg, cos brg, closure]
        # when missile_threat_obs - needed for directed evasion)
        self.num_observation = 21 if cfg.missile_threat_obs else 18
        # AO / R slots feeding the Beta launch prior (1v1 layout keeps the
        # reference's 11/13, `ppo_actor.py:41-49`)
        self.shoot_prior_slots = (11, 13)
        self._nvec = jnp.asarray(self.action_space.nvec, jnp.float32)

    # ---- lifecycle ----
    def init_state(self, key: jax.Array) -> ShootCombatState:
        base = super().init_state(key)
        cfg = self.config
        return ShootCombatState(
            **{f.name: getattr(base, f.name)
               for f in dataclasses.fields(base)},
            ammo=jnp.full((self.n,), cfg.max_missiles, jnp.int32),
            cooldown=jnp.zeros(self.n, jnp.float32),
            missiles=init_missiles(self.n, cfg.max_missiles))

    def _reset_extras(self, state: ShootCombatState,
                      mask: jnp.ndarray) -> ShootCombatState:
        cfg = self.config
        return state.replace(
            ammo=jnp.where(mask, cfg.max_missiles, state.ammo),
            cooldown=jnp.where(mask, 0.0, state.cooldown),
            missiles=clear_missiles(state.missiles, mask))

    # ---- action decode ----
    def _decode(self, action: jnp.ndarray
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return decode_shoot_action(action, self._nvec)

    # ---- observation (15 base dims + 3 missile dims) ----
    def _obs(self, state: ShootCombatState,
             xdot: jnp.ndarray) -> jnp.ndarray:
        base = super()._obs(state, xdot)
        cfg = self.config
        opp = self._opponent_index()
        mis = state.missiles
        my_pos = state.model.s[:, :3]
        inc_pos = mis.pos[opp]                         # [n, K, 3]
        inc_act = mis.active[opp]                      # [n, K]
        rng = jnp.linalg.norm(inc_pos - my_pos[:, None, :], axis=-1)
        keyed = jnp.where(inc_act, rng, jnp.inf)
        nearest = jnp.min(keyed, axis=1)               # [n]
        alert = jnp.isfinite(nearest)
        alert_f = alert.astype(jnp.float32)
        cols = [
            state.ammo.astype(jnp.float32) / cfg.max_missiles,
            alert_f,
            jnp.where(alert, nearest, 0.0) * FT / 10000.0,
        ]
        if cfg.missile_threat_obs:
            # nearest incoming missile's bearing relative to my heading
            # (which side to break toward) + closing speed (when to break):
            # without these, evasion is unlearnable even with an evadable
            # missile - the [ammo, alert, range] block carries no direction
            slot = jnp.argmin(keyed, axis=1)           # [n]
            # nearest-threat selection as a one-hot contraction (per-row
            # dynamic gathers lower to scalar loops on TPU)
            soh = (slot[:, None]
                   == jnp.arange(keyed.shape[1])).astype(jnp.float32)
            mpos = jnp.einsum("nk,nkc->nc", soh, inc_pos)   # [n, 3]
            mvel = jnp.einsum("nk,nkc->nc", soh, mis.vel[opp])
            dpos = mpos - my_pos
            brg = jnp.arctan2(dpos[:, 1], dpos[:, 0])  # atan2(east, north)
            rel_brg = wrap_PI(brg - state.model.s[:, 5])
            # closing speed along the line of sight (ft/s, >0 = inbound)
            los_range = jnp.maximum(jnp.linalg.norm(dpos, axis=-1), 1.0)
            closure = (-jnp.sum((mvel - xdot[:, :3]) * dpos, axis=-1)
                       / los_range)
            cols += [
                jnp.sin(rel_brg) * alert_f,
                jnp.cos(rel_brg) * alert_f,
                closure * FT / 340.0 * alert_f,
            ]
        return jnp.concatenate([base, jnp.stack(cols, axis=1)], axis=1)

    # ---- step ----
    @functools.partial(jax.jit, static_argnums=0)
    def step(self, state: ShootCombatState, action: jnp.ndarray
             ) -> Tuple[ShootCombatState, StepOutput]:
        cfg = self.config
        state = self._masked_reset(state)
        demands, fire_bit = self._decode(action)

        (mstate, cst), _ = jax.lax.scan(
            self._inner_fdm(demands), (state.model, state.controller), None,
            length=self.inner_steps)

        step_count = state.step_count + 1
        xdot = self.model.extended_state(mstate)
        opp = self._opponent_index()
        dt_e = self.inner_steps * cfg.dt

        # missile flight + continuous hit test (each missile homes on its
        # shooter's opponent); pk grades the kill weight when the proximity
        # fuse is on (fuse_outer > 0), else it equals the binary hit
        missiles, hits, pk = step_missiles(
            state.missiles, mstate.s[opp, :3], xdot[opp, :3],
            dt=dt_e, speed=cfg.missile_speed, nav_gain=cfg.missile_nav_gain,
            g_max=cfg.missile_g_max, duration=cfg.missile_duration,
            hit_radius=cfg.missile_hit_radius,
            fuse_outer=cfg.missile_fuse_outer)

        # launches (WEZ + ammo + cooldown gating); the new missile first
        # flies on the NEXT step - this one it only appears on the rail
        AO, TA, R, _ = self._pair_geometry(
            state.replace(model=mstate), xdot, planar=False)
        wez = ((AO <= jnp.deg2rad(cfg.wez_max_ao_deg))
               & (R <= cfg.wez_max_range))
        fire = fire_bit & wez & (state.ammo > 0) & (state.cooldown <= 0.0)
        missiles = launch_missiles(
            missiles, cfg.max_missiles - state.ammo, fire,
            mstate.s[:, :3], xdot[:, :3], speed=cfg.missile_speed)
        ammo = state.ammo - fire.astype(jnp.int32)
        cooldown = jnp.where(fire, cfg.missile_cooldown,
                             jnp.maximum(state.cooldown - dt_e, 0.0))

        # blood: gun-style posture damage (singlecombat_env.py:263-271)
        # plus missile_damage (pk-weighted) per hit taken
        dmg = orientation_fn(AO) * distance_fn(R * FT / 1000.0)
        mis_dealt = cfg.missile_damage * pk.sum(axis=1)          # [n]
        blood = state.blood - dmg[opp] - mis_dealt[opp]

        new_state = state.replace(
            model=mstate, controller=cst, blood=blood,
            step_count=step_count, ammo=ammo, cooldown=cooldown,
            missiles=missiles)
        obs = self._obs(new_state, xdot)
        done, bad, exceed, info = self._termination(new_state, xdot)
        # reward = posture shaping - launch cost + the EventDrivenReward
        # +-200 on ANY is_done / bad_done (event_driven_reward.py:28
        # scale AND trigger set: -200 for dying by crash/overload/low-alt
        # exactly as for being shot down - otherwise terrain suicide is
        # strictly cheaper than losing, a reward-hack a losing policy
        # will find) + optional dense damage shaping
        reward = (self._reward(new_state, xdot)
                  - cfg.missile_shoot_cost * fire.astype(jnp.float32)
                  + 200.0 * done.astype(jnp.float32)
                  - 200.0 * bad.astype(jnp.float32))
        if cfg.blood_shaping:
            dealt = dmg + mis_dealt
            reward = reward + cfg.blood_shaping * (dealt - dealt[opp])
        info["shoot/launches"] = fire.sum()
        info["shoot/hits"] = hits.sum()
        # primary effectiveness counter under the graded fuse (hits counts
        # pk~0 near-miss detonations too - see the team env note)
        info["shoot/pk_sum"] = pk.sum()
        # per-agent vectors for offline analysis (tools/pk_probe.py): who
        # fired, and the pk each agent's missiles delivered this step —
        # sum(pk_dealt_vec)/sum(fire_vec) per side is the per-shot kill
        # probability AGAINST that side's opponent (expired misses count 0)
        info["shoot/fire_vec"] = fire
        info["shoot/pk_dealt_vec"] = pk.sum(axis=1)
        new_state = new_state.replace(is_done=done, bad_done=bad,
                                      exceed_time_limit=exceed)
        return new_state, StepOutput(obs=obs, reward=reward, done=done,
                                     bad_done=bad, exceed_time_limit=exceed,
                                     info=info)


@struct.dataclass
class TeamShootCombatState(CombatState):
    ammo: jnp.ndarray = None            # [n] int32
    cooldown: jnp.ndarray = None        # [n] float32 s
    missiles: MissileState = None       # [n, K] slots
    missile_target: jnp.ndarray = None  # [n, K] int32 within-group victim


class MultipleCombatShootEnv(MultipleCombatEnv):
    """nvn TEAM combat + missiles: ShootTuple action head under MAPPO.

    Extends the team game (`combat.py:MultipleCombatEnv`, the realized
    intent of `envs/multiplecombat_env.py:24-271`) with the weapon layer of
    `SingleCombatShootEnv`, via the `_split_action`/`_weapon_phase` hooks:

    - each missile LOCKS its victim at launch (nearest alive enemy, the
      same `perm[:, :, 0]` pairing the gun damage uses) and homes on the
      locked target by stored within-group index — fire-and-forget, so a
      shooter's death does not disarm missiles already in the air;
    - dead agents cannot fire; hits on already-dead victims deal/record
      no damage (no reward for shooting a corpse);
    - missile damage rides the same team accounting as gun damage: it
      drains the victim's blood (so team-wipe +-200 events score kills),
      and enters the 0.1 * (dealt - taken) shaping term;
    - the per-launch `missile_shoot_cost` is team-shared (summed over the
      team's launches / h), keeping the reward identical for teammates;
    - obs = team layout + 3 dims per agent: [ammo fraction, incoming-
      missile alert, nearest incoming range (10 km units, 0 when clear)],
      where "incoming" means active missiles whose LOCKED victim is me.
    """

    def __init__(self, num_envs: int = 1,
                 config: "str | EnvConfig" = "multiple_selfplay_shoot"):
        super().__init__(num_envs, config)
        cfg = self.config
        self.action_space = ShootTuple(
            (cfg.throttle_bins,) + (cfg.attitude_bins,) * 3)
        self.num_actions = self.action_space.dim
        # +3 missile dims; +3 more threat dims (nearest incoming missile's
        # bearing/closure) when missile_threat_obs - the team-evadable game
        self.num_observation += 6 if cfg.missile_threat_obs else 3
        # the Beta launch prior must key on the LOCK TARGET (nearest alive
        # enemy = first enemy block of the team layout), not the 1v1 slots
        # 11/13 (those are teammate geometry here): enemy block starts at
        # 9 + 7*(half-1); AO at +2, R (10 km units) at +4
        enemy0 = 9 + 7 * (self.half - 1)
        self.shoot_prior_slots = (enemy0 + 2, enemy0 + 4)
        self._nvec = jnp.asarray(self.action_space.nvec, jnp.float32)

    # ---- lifecycle ----
    def init_state(self, key: jax.Array) -> TeamShootCombatState:
        base = super().init_state(key)
        cfg = self.config
        return TeamShootCombatState(
            **{f.name: getattr(base, f.name)
               for f in dataclasses.fields(base)},
            ammo=jnp.full((self.n,), cfg.max_missiles, jnp.int32),
            cooldown=jnp.zeros(self.n, jnp.float32),
            missiles=init_missiles(self.n, cfg.max_missiles),
            missile_target=jnp.zeros((self.n, cfg.max_missiles), jnp.int32))

    def _reset_extras(self, state: TeamShootCombatState,
                      mask: jnp.ndarray) -> TeamShootCombatState:
        cfg = self.config
        return state.replace(
            ammo=jnp.where(mask, cfg.max_missiles, state.ammo),
            cooldown=jnp.where(mask, 0.0, state.cooldown),
            missiles=clear_missiles(state.missiles, mask),
            missile_target=jnp.where(mask[:, None], 0, state.missile_target))

    # ---- hooks ----
    def _split_action(self, action: jnp.ndarray):
        return decode_shoot_action(action, self._nvec)

    def _weapon_phase(self, state: TeamShootCombatState, mstate,
                      xdot: jnp.ndarray, alive_g: jnp.ndarray, fire,
                      perm, key_sorted, AO_t):
        cfg = self.config
        E, m, h = self.num_envs, self.num_agents, self.half
        n, K = self.n, cfg.max_missiles
        alive = alive_g.reshape(-1)
        dt_e = self.inner_steps * cfg.dt

        # flight toward the LOCKED victim (stored within-group index);
        # victim positions/velocities via a one-hot contraction over the
        # tiny group axis (per-row dynamic gathers lower to scalar loops
        # on TPU)
        mt_oh = (state.missile_target.reshape(E, m, K)[..., None]
                 == jnp.arange(m)).astype(jnp.float32)        # [E,m,K,m]
        pos_g = mstate.s[:, :3].reshape(E, m, 3)
        vel_g = xdot[:, :3].reshape(E, m, 3)
        tgt_pos = jnp.einsum("eikj,ejc->eikc", mt_oh,
                             pos_g).reshape(n, K, 3)
        tgt_vel = jnp.einsum("eikj,ejc->eikc", mt_oh,
                             vel_g).reshape(n, K, 3)
        missiles, hits, pk = step_missiles(
            state.missiles, tgt_pos, tgt_vel,
            dt=dt_e, speed=cfg.missile_speed, nav_gain=cfg.missile_nav_gain,
            g_max=cfg.missile_g_max, duration=cfg.missile_duration,
            hit_radius=cfg.missile_hit_radius,
            fuse_outer=cfg.missile_fuse_outer)

        # launch at the nearest alive enemy; dead agents cannot fire, and
        # the WEZ gate (|AO| / range to the candidate lock) applies.
        # AO toward the candidate lock is the step's precomputed AO_t
        # (same pairing: perm[:, :, 0]).
        target_within = perm[:, :, 0].reshape(-1)             # [n]
        has_target = jnp.isfinite(key_sorted[:, :, 0]).reshape(-1)
        AO_l = AO_t.reshape(-1)
        R_l = jnp.where(has_target, key_sorted[:, :, 0].reshape(-1),
                        jnp.inf)
        wez = ((AO_l <= jnp.deg2rad(cfg.wez_max_ao_deg))
               & (R_l <= cfg.wez_max_range))
        can = (fire & alive & has_target & wez & (state.ammo > 0)
               & (state.cooldown <= 0.0))
        slot = cfg.max_missiles - state.ammo
        missiles = launch_missiles(missiles, slot, can, mstate.s[:, :3],
                                   xdot[:, :3], speed=cfg.missile_speed)
        sel = can[:, None] & (jnp.arange(K)[None, :] == slot[:, None])
        missile_target = jnp.where(sel, target_within[:, None],
                                   state.missile_target)
        ammo = state.ammo - can.astype(jnp.int32)
        cooldown = jnp.where(can, cfg.missile_cooldown,
                             jnp.maximum(state.cooldown - dt_e, 0.0))

        # damage: one-hot over the locked victims (pre-launch targets —
        # a missile cannot hit on its launch step); corpses take nothing;
        # pk grades the warhead when the proximity fuse is on
        victim_alive = (jnp.einsum("eikj,ej->eik", mt_oh,
                                   alive_g.astype(jnp.float32))
                        > 0.5).reshape(n, K)
        eff = hits & victim_alive                             # [n, K]
        pk_eff = pk * victim_alive                            # [n, K]
        w_incoming = cfg.missile_damage * jnp.einsum(
            "eikj,eik->ej", mt_oh, pk_eff.reshape(E, m, K))   # [E, m]
        w_dealt = cfg.missile_damage * pk_eff.sum(1).reshape(E, m)

        # team-shared launch cost (reward stays identical across the team)
        fires_g = can.reshape(E, m).astype(jnp.float32)
        rows = jnp.arange(m)
        team_fire = (fires_g[:, :h].sum(1)[:, None] * (rows < h)[None, :]
                     + fires_g[:, h:].sum(1)[:, None] * (rows >= h)[None, :])
        r_adj = -cfg.missile_shoot_cost * team_fire / h

        # pk_sum is the primary effectiveness counter under the graded
        # fuse: `hits` counts every detonation incl. pk~0 defeated shots
        # (a 399 ft CPA logs as a "hit"), so evadable-run hit RATES are
        # not comparable to binary-fuse runs' - compare pk_sum/launches
        info = {"shoot/launches": can.sum(), "shoot/hits": eff.sum(),
                "shoot/pk_sum": pk_eff.sum(),
                # per-agent vectors for tools/pk_probe.py (same contract
                # as the 1v1 env): who fired, and the pk each agent's
                # missiles delivered this step
                "shoot/fire_vec": can,
                "shoot/pk_dealt_vec": pk_eff.sum(1)}
        state = state.replace(missiles=missiles, ammo=ammo,
                              cooldown=cooldown,
                              missile_target=missile_target)
        return state, w_incoming, w_dealt, r_adj, info

    # ---- observation ----
    def _team_obs(self, state: TeamShootCombatState, xdot: jnp.ndarray,
                  alive_g: jnp.ndarray, geom=None) -> jnp.ndarray:
        base = super()._team_obs(state, xdot, alive_g, geom)
        cfg = self.config
        E, m = self.num_envs, self.num_agents
        mis = state.missiles
        K = mis.active.shape[1]
        pos_g = mis.pos.reshape(E, m, K, 3)
        act_g = mis.active.reshape(E, m, K)
        tgt_g = state.missile_target.reshape(E, m, K)
        my_pos = self._group(state.model.s[:, :3])            # [E, m, 3]
        d = jnp.linalg.norm(
            pos_g[:, :, :, None, :] - my_pos[:, None, None, :, :],
            axis=-1)                                          # [E, m, K, m]
        targeting = (act_g[..., None]
                     & (tgt_g[..., None] == jnp.arange(m)[None, None, None]))
        keyed = jnp.where(targeting, d, jnp.inf)              # [E, m, K, m]
        nearest = keyed.min(axis=(1, 2))                      # [E, m]
        alert = jnp.isfinite(nearest)
        alert_f = alert.astype(jnp.float32)
        cols = [
            state.ammo.astype(jnp.float32).reshape(E, m) / cfg.max_missiles,
            alert_f,
            jnp.where(alert, nearest, 0.0) * FT / 10000.0,
        ]
        if cfg.missile_threat_obs:
            # nearest incoming missile's bearing (relative to my heading)
            # + line-of-sight closure, per victim — the same threat block
            # the 1v1 evadable game carries, so directed team breaks are
            # representable. Flatten (shooter, slot) and argmin per victim.
            kf = keyed.transpose(0, 3, 1, 2).reshape(E, m, m * K)
            slot = jnp.argmin(kf, axis=-1)                    # [E, m]
            mpos_f = pos_g.reshape(E, m * K, 3)
            mvel_f = mis.vel.reshape(E, m, K, 3).reshape(E, m * K, 3)
            # nearest-threat selection as a one-hot contraction (dynamic
            # per-row gathers lower to scalar loops on TPU)
            soh = (slot[..., None]
                   == jnp.arange(m * K)).astype(jnp.float32)  # [E,m,mK]
            mpos = jnp.einsum("evs,esc->evc", soh, mpos_f)    # [E, m, 3]
            mvel = jnp.einsum("evs,esc->evc", soh, mvel_f)
            my_vel = self._group(xdot[:, :3])                 # [E, m, 3]
            heading = self._group(state.model.s[:, 5])        # [E, m]
            dpos = mpos - my_pos
            brg = jnp.arctan2(dpos[..., 1], dpos[..., 0])
            rel_brg = wrap_PI(brg - heading)
            los_range = jnp.maximum(jnp.linalg.norm(dpos, axis=-1), 1.0)
            closure = -jnp.sum((mvel - my_vel) * dpos, axis=-1) / los_range
            cols += [
                jnp.sin(rel_brg) * alert_f,
                jnp.cos(rel_brg) * alert_f,
                closure * FT / 340.0 * alert_f,
            ]
        extra = jnp.stack(cols, axis=-1)                      # [E, m, 3|6]
        return jnp.concatenate(
            [base, extra.reshape(self.n, len(cols))], axis=1)

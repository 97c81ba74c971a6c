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
  launch; hits subtract `missile_damage` blood so the existing Shutdown
  termination (win/lose +-200 events) scores the kill;
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
from ..utils.math import distance_fn, orientation_fn
from .combat import FT, CombatState, SingleCombatEnv
from .types import StepOutput


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
        self.num_observation = 18                         # 15 + 3 missile dims
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
        """[n, 5] (discrete indices + shoot bit) -> ([n, 4] in [-1, 1],
        fire [n] bool)."""
        idx = jnp.clip(jnp.round(action[:, :4]), 0.0, self._nvec - 1.0)
        demands = idx / (self._nvec - 1.0) * 2.0 - 1.0
        return demands, action[:, 4] > 0.5

    # ---- observation (15 base dims + 3 missile dims) ----
    def _obs(self, state: ShootCombatState,
             xdot: jnp.ndarray) -> jnp.ndarray:
        base = super()._obs(state, xdot)
        cfg = self.config
        opp = self._opponent_index()
        mis = state.missiles
        inc_pos = mis.pos[opp]                         # [n, K, 3]
        inc_act = mis.active[opp]                      # [n, K]
        rng = jnp.linalg.norm(
            inc_pos - state.model.s[:, None, :3], axis=-1)
        keyed = jnp.where(inc_act, rng, jnp.inf)
        nearest = jnp.min(keyed, axis=1)               # [n]
        alert = jnp.isfinite(nearest)
        extra = jnp.stack([
            state.ammo.astype(jnp.float32) / cfg.max_missiles,
            alert.astype(jnp.float32),
            jnp.where(alert, nearest, 0.0) * FT / 10000.0,
        ], axis=1)
        return jnp.concatenate([base, extra], axis=1)

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
        # shooter's opponent)
        missiles, hits = step_missiles(
            state.missiles, mstate.s[opp, :3], xdot[opp, :3],
            dt=dt_e, speed=cfg.missile_speed, nav_gain=cfg.missile_nav_gain,
            g_max=cfg.missile_g_max, duration=cfg.missile_duration,
            hit_radius=cfg.missile_hit_radius)

        # launches (ammo + cooldown gating); the new missile first flies
        # on the NEXT step - this one it only appears on the rail
        fire = fire_bit & (state.ammo > 0) & (state.cooldown <= 0.0)
        missiles = launch_missiles(
            missiles, cfg.max_missiles - state.ammo, fire,
            mstate.s[:, :3], xdot[:, :3], speed=cfg.missile_speed)
        ammo = state.ammo - fire.astype(jnp.int32)
        cooldown = jnp.where(fire, cfg.missile_cooldown,
                             jnp.maximum(state.cooldown - dt_e, 0.0))

        # blood: gun-style posture damage (singlecombat_env.py:263-271)
        # plus missile_damage per hit taken
        AO, TA, R, _ = self._pair_geometry(
            state.replace(model=mstate), xdot, planar=False)
        dmg = orientation_fn(AO) * distance_fn(R * FT / 1000.0)
        hits_on_me = hits[opp].sum(axis=1).astype(jnp.float32)   # [n]
        blood = (state.blood - dmg[opp]
                 - cfg.missile_damage * hits_on_me)

        new_state = state.replace(
            model=mstate, controller=cst, blood=blood,
            step_count=step_count, ammo=ammo, cooldown=cooldown,
            missiles=missiles)
        obs = self._obs(new_state, xdot)
        done, bad, exceed, info = self._termination(new_state, xdot)
        reward = (self._reward(new_state, xdot)
                  - cfg.missile_shoot_cost * fire.astype(jnp.float32))
        info["shoot/launches"] = fire.sum()
        info["shoot/hits"] = hits.sum()
        new_state = new_state.replace(is_done=done, bad_done=bad,
                                      exceed_time_limit=exceed)
        return new_state, StepOutput(obs=obs, reward=reward, done=done,
                                     bad_done=bad, exceed_time_limit=exceed,
                                     info=info)

"""Self-play combat environments (1v1 and team-vs-team).

Functional re-design of the reference `SingleCombatEnv`
(`envs/singlecombat_env.py:24-321`) and `MultipleCombatEnv`
(`envs/multiplecombat_env.py:24-271`). The reference combat envs are
bit-rotted against their own BaseEnv (broken ctor contract, a
`stabilize(self.s, ...)` call that doesn't match the Controller signature,
full-reset from inside the inner loop - SURVEY.md S2 E4/E5 notes); this
implementation encodes their documented intent against the Model interface:

  step(action[n,4]) =
    env-group masked auto-reset
    -> inner_steps x { demand smoothing -> PID stabilize -> throttle lag
                       -> dynamics integrate }           (5 for 1v1, 1 nvn)
    -> 15-dim relative obs (singlecombat_env.py:66-138)
    -> posture reward = orientation(AO,TA) * range(R) * 0.01 (:140-181)
    -> blood damage orientation_fn(AO) * distance_fn(R)      (:263-271)
    -> terminations incl. Crash (pairwise distance) and Shutdown (blood<=0)

Team layout: within each env group of M agents, the first M/2 are the ego
team and the last M/2 the enemy team; agent i pairs with agent i + M/2
(for M=2 this is exactly the reference's even/odd interleave). AO/TA for the
enemy agent are computed as (pi - TA_ego, pi - AO_ego), which equals its own
aspect geometry identically; side_flag is sign-flipped (reference :118-125).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..algorithms.pid import Controller, ControllerState, flight_data
from ..models.f16 import F16Model, THRUST_SCALE
from ..ops.aero import load_aero_weights, select_aero_weights
from ..utils.config import EnvConfig, load_config
from ..utils.math import (PI, distance_fn, get2d_AO_TA_R, get_AO_TA_R,
                          orientation_fn, orientation_reward, range_reward,
                          wrap_PI)
from . import terminations as X
from .types import StepOutput

FT = 0.3048


@struct.dataclass
class CombatState:
    model: object                    # F16State
    controller: ControllerState
    blood: jnp.ndarray               # [n]
    step_count: jnp.ndarray          # [n] int32
    is_done: jnp.ndarray
    bad_done: jnp.ndarray
    exceed_time_limit: jnp.ndarray
    key: jax.Array


class SingleCombatEnv:
    """1v1 self-play combat; `MultipleCombatEnv` subclasses for nvn."""

    inner_steps = 5  # FDM steps per env step (singlecombat_env.py:244)

    def __init__(self, num_envs: int = 1, config: str | EnvConfig = "selfplay",
                 aero_backend: str = "auto"):
        self.config = config if isinstance(config, EnvConfig) else load_config(config)
        self.num_envs = num_envs
        self.num_agents = self.config.num_agents
        assert self.num_agents % 2 == 0, "combat needs an even team split"
        self.n = num_envs * self.num_agents
        # same backend selection as Env: 'auto' picks the fused Pallas
        # aero kernel (grouped/distilled) on TPU - the combat inner loop
        # runs nlplant 5x per env step, so the backend choice dominates
        self.model = F16Model(
            self.config, select_aero_weights(load_aero_weights(),
                                             aero_backend))
        self.controller = Controller(dt=self.config.dt)
        self.num_observation = self.config.num_observation  # 15
        self.num_actions = self.config.num_actions          # 4

    # --- pairing helpers ---
    def _opponent_index(self) -> jnp.ndarray:
        """Global index of each agent's paired opponent."""
        m = self.num_agents
        within = (jnp.arange(m) + m // 2) % m
        base = jnp.arange(self.num_envs)[:, None] * m
        return (base + within[None, :]).reshape(-1)

    def _ego_index(self) -> jnp.ndarray:
        """Global indices of ego-team agents (first half of each group)."""
        m = self.num_agents
        base = jnp.arange(self.num_envs)[:, None] * m
        return (base + jnp.arange(m // 2)[None, :]).reshape(-1)

    # --- lifecycle ---
    def init_state(self, key: jax.Array) -> CombatState:
        ones = jnp.ones(self.n, dtype=bool)
        return CombatState(
            model=self.model.init_state(self.n),
            controller=self.controller.init_state(self.n),
            blood=jnp.full((self.n,), self.config.max_blood, jnp.float32),
            step_count=jnp.zeros(self.n, jnp.int32),
            is_done=ones, bad_done=ones, exceed_time_limit=ones, key=key)

    def _masked_reset(self, state: CombatState) -> CombatState:
        """Whole-env-group reset of any group with a raised flag
        (`reset_done_envs`, singlecombat_env.py:207-238)."""
        cfg = self.config
        any_flag = state.is_done | state.bad_done | state.exceed_time_limit
        group = jnp.any(any_flag.reshape(self.num_envs, self.num_agents),
                        axis=1)
        mask = jnp.repeat(group, self.num_agents)

        key, k = jax.random.split(state.key)
        ks = jax.random.split(k, 5)
        n = self.n
        s_new = jnp.zeros_like(state.model.s)
        s_new = s_new.at[:, 0].set(jax.random.uniform(
            ks[0], (n,), minval=cfg.min_npos, maxval=cfg.max_npos))
        s_new = s_new.at[:, 1].set(jax.random.uniform(
            ks[1], (n,), minval=cfg.min_epos, maxval=cfg.max_epos))
        s_new = s_new.at[:, 2].set(jax.random.uniform(
            ks[2], (n,), minval=cfg.min_altitude, maxval=cfg.max_altitude))
        s_new = s_new.at[:, 5].set(jax.random.uniform(
            ks[3], (n,), minval=cfg.min_heading, maxval=cfg.max_heading))
        s_new = s_new.at[:, 6].set(jax.random.uniform(
            ks[4], (n,), minval=cfg.min_vt, maxval=cfg.max_vt))
        u_new = jnp.zeros_like(state.model.u).at[:, 0].set(cfg.init_T)

        m = mask[:, None]
        s = jnp.where(m, s_new, state.model.s)
        u = jnp.where(m, u_new, state.model.u)
        mstate = state.model.replace(
            s=s, u=u,
            recent_s=jnp.where(m, s, state.model.recent_s),
            recent_u=jnp.where(m, u, state.model.recent_u))
        zeros = jnp.zeros_like(state.is_done)
        # replace() (not a CombatState ctor) so subclass state fields
        # survive; _reset_extras is the subclass hook for them
        new = state.replace(
            model=mstate,
            controller=self.controller.reset(state.controller, mask),
            blood=jnp.where(mask, cfg.max_blood, state.blood),
            step_count=jnp.where(mask, 0, state.step_count),
            is_done=zeros, bad_done=zeros, exceed_time_limit=zeros, key=key)
        return self._reset_extras(new, mask)

    def _reset_extras(self, state: CombatState,
                      mask: jnp.ndarray) -> CombatState:
        """Subclass hook: reset extra per-agent state for masked rows."""
        return state

    @functools.partial(jax.jit, static_argnums=0)
    def reset(self, key: jax.Array) -> Tuple[CombatState, jnp.ndarray]:
        state = self._masked_reset(self.init_state(key))
        xdot = self.model.extended_state(state.model)
        return state, self._obs(state, xdot)

    # --- observation (singlecombat_env.py:66-138) ---
    def _pair_geometry(self, state: CombatState, xdot: jnp.ndarray,
                       planar: bool):
        """(AO, TA, R, side) of each agent vs its opponent; enemy-side agents
        get the reference's (pi - TA, pi - AO, R, -side) convention."""
        opp = self._opponent_index()
        pos = state.model.s[:, :3]
        vel = xdot[:, :3]
        fn = get2d_AO_TA_R if planar else get_AO_TA_R
        m = self.num_agents
        is_ego = (jnp.arange(self.n) % m) < (m // 2)
        AO, TA, R, side = fn(pos, pos[opp], vel, vel[opp], return_side=True)
        if self.config.symmetric_side_flag:
            # beyond-reference option: every agent reads the flag in its
            # OWN convention (what ego rows always get) - removes the
            # measured ~2.5:1 ego-side mirror advantage the role-swapped
            # convention causes (see utils/config.py symmetric_side_flag)
            return AO, TA, R, side
        # Enemy rows take the reference's role-swapped convention
        # (pi - TA_e, pi - AO_e, -side_e) — but because arccos(-x) =
        # pi - arccos(x) and the swapped call negates every dot product,
        # pi - TA_e == AO and pi - AO_e == TA identically; only the side
        # flag truly depends on the role: sign(v_opp x dpos) instead of
        # sign(v_ego x dpos). So one geometry pass + one cross product
        # replaces the second full evaluation.
        dpos = pos[opp] - pos
        cross_z_opp = (vel[opp][:, 0] * dpos[:, 1]
                       - vel[opp][:, 1] * dpos[:, 0])
        side = jnp.where(is_ego, side, jnp.sign(cross_z_opp))
        return AO, TA, R, side

    def _obs(self, state: CombatState, xdot: jnp.ndarray) -> jnp.ndarray:
        s = state.model.s
        opp = self._opponent_index()
        vu, vv, vw = self.model.get_velocity(state.model)
        AO, TA, R, side = self._pair_geometry(state, xdot, planar=True)
        return jnp.stack([
            s[:, 2] * FT / 5000.0,
            jnp.sin(s[:, 3]), jnp.cos(s[:, 3]),
            jnp.sin(s[:, 4]), jnp.cos(s[:, 4]),
            vu * FT / 340.0, vv * FT / 340.0, vw * FT / 340.0,
            s[:, 6] * FT / 340.0,
            (vu[opp] - vu) * FT / 340.0,
            (s[opp, 2] - s[:, 2]) * FT / 1000.0,
            AO, TA,
            R * FT / 10000.0,
            side,
        ], axis=1)

    # --- reward (singlecombat_env.py:140-181) ---
    def _reward(self, state: CombatState, xdot: jnp.ndarray) -> jnp.ndarray:
        AO, TA, R, _ = self._pair_geometry(state, xdot, planar=False)
        orient = orientation_reward(AO, TA)
        rng = range_reward(self.config.target_dist, R * FT / 1000.0)
        return 0.01 * orient * rng

    # --- termination (singlecombat_env.py:48-58) ---
    def _termination(self, state: CombatState, xdot: jnp.ndarray):
        cfg, model, mstate = self.config, self.model, state.model
        opp = self._opponent_index()
        conds = [
            ("overload", X.overload(cfg, model, mstate, xdot)),
            ("low_altitude", X.low_altitude(cfg, model, mstate)),
            ("high_speed", X.high_speed(cfg, model, mstate)),
            ("low_speed", X.low_speed(cfg, model, mstate)),
            ("extreme_state", X.extreme_state(cfg, model, mstate)),
            ("crash", X.crash(cfg, mstate.s[:, :3], mstate.s[opp, :3])),
            ("timeout", X.timeout(cfg, state.step_count)),
            ("shutdown", X.shutdown(cfg, state.blood, state.blood[opp])),
        ]
        bad = functools.reduce(jnp.logical_or, [c[0] for _, c in conds])
        done = functools.reduce(jnp.logical_or, [c[1] for _, c in conds])
        exceed = functools.reduce(jnp.logical_or, [c[2] for _, c in conds])
        info = {f"termination/{name}": (b | d | e).sum()
                for name, (b, d, e) in conds}
        return done, bad, exceed, info

    # --- inner FDM/PID loop (shared by 1v1 and nvn steps) ---
    def _inner_fdm(self, action: jnp.ndarray):
        """Scan body: demand smoothing -> PID stabilize -> throttle lag ->
        dynamics integrate (singlecombat_env.py:244-261). yaw_rate demand
        stays 0 - the rudder loop damps yaw rate (reference sets a yaw_dem
        it never consumes)."""
        def inner(carry, _):
            mstate, cst = carry
            xdot = self.model.extended_state(mstate)
            data = flight_data(self.model, mstate, xdot)
            cst = cst.replace(
                roll_dem=0.9 * cst.roll_dem + 0.1 * action[:, 1] * 4 * PI / 9,
                pitch_dem=0.9 * cst.pitch_dem + 0.1 * action[:, 2] * PI / 12,
                yaw_dem=wrap_PI(mstate.s[:, 5] + action[:, 3] * PI / 60))
            cst = self.controller.stabilize(cst, data)
            T = 0.9 * mstate.u[:, 0] + 0.1 * action[:, 0] * THRUST_SCALE
            u = jnp.stack([T, -cst.el, -cst.ail, -cst.rud,
                           jnp.zeros_like(T)], axis=1)
            mstate = self.model.raw_control_update(mstate, u)
            return (mstate, cst), None
        return inner

    # --- step ---
    @functools.partial(jax.jit, static_argnums=0)
    def step(self, state: CombatState, action: jnp.ndarray
             ) -> Tuple[CombatState, StepOutput]:
        state = self._masked_reset(state)
        action = jnp.clip(action, -1.0, 1.0)

        (mstate, cst), _ = jax.lax.scan(
            self._inner_fdm(action), (state.model, state.controller), None,
            length=self.inner_steps)

        step_count = state.step_count + 1
        xdot = self.model.extended_state(mstate)

        # blood damage (singlecombat_env.py:263-271)
        AO, TA, R, _ = self._pair_geometry(
            state.replace(model=mstate), xdot, planar=False)
        opp = self._opponent_index()
        # damage dealt BY each agent (needs its own AO): subtract from opponent
        dmg = orientation_fn(AO) * distance_fn(R * FT / 1000.0)
        blood = state.blood - dmg[opp]

        new_state = state.replace(model=mstate, controller=cst, blood=blood,
                                  step_count=step_count)
        obs = self._obs(new_state, xdot)
        done, bad, exceed, info = self._termination(new_state, xdot)
        reward = self._reward(new_state, xdot)
        new_state = new_state.replace(is_done=done, bad_done=bad,
                                      exceed_time_limit=exceed)
        return new_state, StepOutput(obs=obs, reward=reward, done=done,
                                     bad_done=bad, exceed_time_limit=exceed,
                                     info=info)


class MultipleCombatEnv(SingleCombatEnv):
    """nvn TEAM combat: the reference's unrealized intent implemented.

    `envs/multiplecombat_env.py:24-271` ships nvn plumbing whose obs/reward/
    blood still compute 1v1 pairs (its own `todo:` at :67 admits it) — with
    2v2 teams the signal is pairwise-symmetric and every self-play match
    ties. This class is the real team game its config describes:

    - **obs** ([9 + 7*(h-1) + 7*h] for team size h = num_agents/2): the 1v1
      ego block (9 dims, `singlecombat_env.py:66-138` layout) followed by a
      7-dim relative block per TEAMMATE (fixed within-team order) and per
      ENEMY (sorted nearest-alive-first): [delta_v_body_x (mh), delta_alt
      (km), AO, TA, R (10 km), side_flag, alive]. Dead blocks are zeroed
      with alive = 0.
    - **per-agent death**: blood <= 0 freezes that agent's state (no more
      flight, no damage dealt or taken, no termination triggers); the
      episode continues until a whole team is wiped. `StepOutput.active`
      carries liveness for MAPPO's active_masks.
    - **damage**: nearest-alive-threat pairing — each alive agent damages
      its closest alive enemy by orientation_fn(AO)*distance_fn(R), damage
      to one victim summing over attackers (1v1 pairing is the h=1 case).
    - **reward** (team-shared, identical for every member): mean over the
      team of alive-masked posture vs each agent's nearest alive enemy
      (the 1v1 0.01*orientation*range shaping), + 0.1/h * (team damage
      dealt - team damage taken), + the event term +-200 on a team wipe
      (EventDrivenReward scale, `event_driven_reward.py:28`).
    - **termination**: physical conditions and crash apply to ALIVE agents
      only (a frozen corpse cannot re-trigger low-altitude every step);
      shutdown becomes the team-wipe win/lose split, reducing exactly to
      the reference's pairwise rule (`shutdown.py:36-40`) at h = 1.

    Geometry is computed group-locally ([E, m, m] all-pairs on m = 4-sized
    groups), so sharding on the env axis keeps the team game on-shard.
    """

    inner_steps = 1

    def __init__(self, num_envs: int = 1,
                 config: str | EnvConfig = "multiple_selfplay"):
        super().__init__(num_envs, config)
        self.half = self.num_agents // 2
        # 9 ego dims + 7 per teammate + 7 per enemy (config's
        # num_observation is the 1v1 layout; the team layout supersedes it)
        self.num_observation = 9 + 7 * (self.half - 1) + 7 * self.half

    # ---- group-local all-pairs geometry ----
    def _group(self, x: jnp.ndarray) -> jnp.ndarray:
        return x.reshape(self.num_envs, self.num_agents, *x.shape[1:])

    def _obs(self, state: CombatState, xdot: jnp.ndarray) -> jnp.ndarray:
        """Team obs from current liveness (inherited reset() calls this)."""
        return self._team_obs(state, xdot, self._group(state.blood > 0.0))

    def _all_pairs(self, pos_g: jnp.ndarray, vel_g: jnp.ndarray,
                   planar: bool):
        """[E,m,m] AO/TA/R/side where entry (i, j) is agent i's geometry
        toward agent j (get_AO_TA_R semantics, `utils/utils.py:156-207`)."""
        if planar:
            pos_g, vel_g = pos_g[..., :2], vel_g[..., :2]
        delta = pos_g[:, None, :, :] - pos_g[:, :, None, :]   # [E,m,m,3]
        R = jnp.linalg.norm(delta, axis=-1)
        v = jnp.linalg.norm(vel_g, axis=-1)
        proj_i = jnp.einsum("eijk,eik->eij", delta, vel_g)
        AO = jnp.arccos(jnp.clip(
            proj_i / (R * v[:, :, None] + 1e-8), -1.0, 1.0))
        proj_j = jnp.einsum("eijk,ejk->eij", delta, vel_g)
        TA = jnp.arccos(jnp.clip(
            proj_j / (R * v[:, None, :] + 1e-8), -1.0, 1.0))
        cross = (vel_g[:, :, None, 0] * delta[..., 1]
                 - vel_g[:, :, None, 1] * delta[..., 0])
        return AO, TA, R, jnp.sign(cross)

    def _all_pairs_both(self, pos_g: jnp.ndarray, vel_g: jnp.ndarray):
        """Planar AND 3-D all-pairs geometry in one pass over a shared
        delta (the step used to evaluate `_all_pairs` up to four times -
        obs, damage, crash, second perm - which made the team step the
        measured HBM-bound outlier at 10^6 agents, results/bench/REPORT.md).

        Returns ((AO2, TA2, R2, side), (AO3, TA3, R3)); the side flag is
        planar by definition (z-cross of the horizontal components), which
        is also exactly what the 3-D path computed.
        """
        delta = pos_g[:, None, :, :] - pos_g[:, :, None, :]   # [E,m,m,3]
        d2 = delta[..., 0] ** 2 + delta[..., 1] ** 2
        R2 = jnp.sqrt(d2)
        R3 = jnp.sqrt(d2 + delta[..., 2] ** 2)
        v2 = jnp.sqrt(vel_g[..., 0] ** 2 + vel_g[..., 1] ** 2)
        v3 = jnp.linalg.norm(vel_g, axis=-1)

        def angles(proj_fn, R, v):
            pi = proj_fn("eik")
            AO = jnp.arccos(jnp.clip(
                pi / (R * v[:, :, None] + 1e-8), -1.0, 1.0))
            pj = proj_fn("ejk")
            TA = jnp.arccos(jnp.clip(
                pj / (R * v[:, None, :] + 1e-8), -1.0, 1.0))
            return AO, TA

        AO2, TA2 = angles(
            lambda s: jnp.einsum("eijk,%s->eij" % s, delta[..., :2],
                                 vel_g[..., :2]), R2, v2)
        AO3, TA3 = angles(
            lambda s: jnp.einsum("eijk,%s->eij" % s, delta, vel_g), R3, v3)
        cross = (vel_g[:, :, None, 0] * delta[..., 1]
                 - vel_g[:, :, None, 1] * delta[..., 0])
        return (AO2, TA2, R2, jnp.sign(cross)), (AO3, TA3, R3)

    def _team_slices(self):
        """(teammate_idx[m, h-1], enemy_idx[m, h]) static index tables."""
        m, h = self.num_agents, self.half
        mates, enemies = [], []
        for i in range(m):
            team = range(0, h) if i < h else range(h, m)
            other = range(h, m) if i < h else range(0, h)
            mates.append([j for j in team if j != i])
            enemies.append(list(other))
        return np.array(mates), np.array(enemies)

    def _nearest_enemy_perm(self, R: jnp.ndarray, alive_g: jnp.ndarray):
        """Per-agent enemy ordering, nearest ALIVE first.

        Returns [E, m, h] global-within-group enemy indices and the sort
        key ([E, m, h] masked ranges, dead enemies pushed to +inf).

        For the team sizes that exist (h <= 4) the sort is a stable
        compare-exchange (bubble) network on (key, idx) column pairs -
        pure VPU selects, no general key-value sort lowering (the
        per-agent `argsort` was flagged as part of the team env's
        HBM-heavy hot path at 10^6 agents, results/bench/REPORT.md).
        """
        h = self.half
        E = R.shape[0]
        _, enemy_idx = self._team_slices()
        eidx = jnp.asarray(enemy_idx)                       # [m, h]
        # enemy columns by PURE SLICING (the team split is static: each
        # agent's enemies are the other half) - take_along_axis lowered
        # to a TPU gather, needlessly dynamic for constant indices
        R_en = jnp.concatenate([R[:, :h, h:], R[:, h:, :h]], axis=1)
        alive_en = jnp.concatenate([
            jnp.broadcast_to(alive_g[:, None, h:], (E, h, h)),
            jnp.broadcast_to(alive_g[:, None, :h], (E, h, h))], axis=1)
        key = jnp.where(alive_en, R_en, jnp.inf)
        idx = jnp.broadcast_to(eidx[None], key.shape)
        if h <= 4:
            ks = [key[..., i] for i in range(h)]
            vs = [idx[..., i] for i in range(h)]
            # bubble network with strict-less swaps == stable sort
            for end in range(h - 1, 0, -1):
                for i in range(end):
                    swap = ks[i + 1] < ks[i]
                    ks[i], ks[i + 1] = (jnp.where(swap, ks[i + 1], ks[i]),
                                        jnp.where(swap, ks[i], ks[i + 1]))
                    vs[i], vs[i + 1] = (jnp.where(swap, vs[i + 1], vs[i]),
                                        jnp.where(swap, vs[i], vs[i + 1]))
            return jnp.stack(vs, axis=-1), jnp.stack(ks, axis=-1)
        order = jnp.argsort(key, axis=-1)                    # [E, m, h]
        perm = jnp.take_along_axis(idx, order, axis=-1)
        return perm, jnp.take_along_axis(key, order, axis=-1)

    # ---- subclass hooks (weapons) ----
    def _split_action(self, action: jnp.ndarray):
        """(flight demands [n, 4] in [-1, 1], fire bits [n] or None);
        the base team game is guns-only."""
        return jnp.clip(action, -1.0, 1.0), None

    def _weapon_phase(self, state: CombatState, mstate, xdot: jnp.ndarray,
                      alive_g: jnp.ndarray, fire, perm, key_sorted, AO_t):
        """Subclass hook between the FDM scan and blood accounting.

        `AO_t` [E, m] is each agent's angle-off toward its nearest alive
        enemy (`perm[:, :, 0]`) - precomputed by step() so the weapon WEZ
        gate doesn't re-derive it. Returns (state, extra_incoming [E, m],
        extra_dealt [E, m], reward_adjust [E, m], info dict). The base
        game has no weapons beyond the gun damage computed inline in
        step().
        """
        E, m = self.num_envs, self.num_agents
        z = jnp.zeros((E, m), jnp.float32)
        return state, z, z, z, {}

    # ---- step ----
    @functools.partial(jax.jit, static_argnums=0)
    def step(self, state: CombatState, action: jnp.ndarray
             ) -> Tuple[CombatState, StepOutput]:
        state = self._masked_reset(state)
        action, fire = self._split_action(action)
        E, m, h = self.num_envs, self.num_agents, self.half
        alive_pre = state.blood > 0.0                        # [n]

        (mstate, cst), _ = jax.lax.scan(
            self._inner_fdm(action), (state.model, state.controller), None,
            length=self.inner_steps)

        # dead agents are frozen where they died (no flight, no actuator)
        keep = alive_pre[:, None]
        mstate = mstate.replace(
            s=jnp.where(keep, mstate.s, state.model.s),
            u=jnp.where(keep, mstate.u, state.model.u))

        step_count = state.step_count + 1
        xdot = self.model.extended_state(mstate)

        pos_g = self._group(mstate.s[:, :3])
        vel_g = self._group(xdot[:, :3])
        alive_g = self._group(alive_pre)
        # ONE all-pairs geometry pass (planar + 3-D share the delta); the
        # packs are threaded through obs/termination/weapons below instead
        # of being recomputed per consumer (they were the measured
        # HBM-bound outlier at 10^6 agents, results/bench/REPORT.md)
        planar_pack, (AO3, TA3, R3) = self._all_pairs_both(pos_g, vel_g)
        perm, key_sorted = self._nearest_enemy_perm(R3, alive_g)

        # nearest-alive-threat damage (pre-step liveness on both sides).
        # All per-target selections are one-hot contractions over the
        # group axis (m is tiny and static; TPU gathers of per-row
        # dynamic indices lower to scalar loops)
        target = perm[:, :, 0]                               # [E, m]
        has_target = jnp.isfinite(key_sorted[:, :, 0])
        rows = jnp.arange(m)
        victim_onehot = (target[:, :, None] == rows[None, None, :])
        v_f = victim_onehot.astype(AO3.dtype)                # [E, m, m]
        AO_t = jnp.einsum("eij,eij->ei", AO3, v_f)           # [E, m]
        R_t = jnp.einsum("eij,eij->ei", R3, v_f)
        dmg = (orientation_fn(AO_t) * distance_fn(R_t * FT / 1000.0)
               * alive_g * has_target)                       # [E, m]
        incoming = jnp.einsum("eij,ei->ej", v_f, dmg)

        state, w_incoming, w_dealt, r_adj, w_info = self._weapon_phase(
            state, mstate, xdot, alive_g, fire, perm, key_sorted, AO_t)
        incoming = incoming + w_incoming
        blood = state.blood - incoming.reshape(-1)
        alive_post = blood > 0.0
        alive_post_g = self._group(alive_post)

        new_state = state.replace(model=mstate, controller=cst, blood=blood,
                                  step_count=step_count)
        obs = self._team_obs(new_state, xdot, alive_post_g,
                             geom=(planar_pack, R3))
        done, bad, exceed, info = self._team_termination(
            new_state, xdot, alive_post_g, dist=R3)
        # team-shared reward: alive-masked posture vs nearest alive enemy
        TA_t = jnp.einsum("eij,eij->ei", TA3, v_f)
        posture = (0.01 * orientation_reward(AO_t, TA_t)
                   * range_reward(self.config.target_dist, R_t * FT / 1000.0)
                   * alive_g * has_target)                   # [E, m]
        team_post = (posture[:, :h].sum(1)[:, None] * (rows < h)[None, :]
                     + posture[:, h:].sum(1)[:, None] * (rows >= h)[None, :])
        dmg_all = dmg + w_dealt
        dealt = (dmg_all[:, :h].sum(1)[:, None] * (rows < h)[None, :]
                 + dmg_all[:, h:].sum(1)[:, None] * (rows >= h)[None, :])
        taken = (incoming[:, :h].sum(1)[:, None] * (rows < h)[None, :]
                 + incoming[:, h:].sum(1)[:, None] * (rows >= h)[None, :])
        own_wiped = ~jnp.any(alive_post_g[:, :h], axis=1)    # [E]
        enm_wiped = ~jnp.any(alive_post_g[:, h:], axis=1)
        wiped_own = jnp.where((rows < h)[None, :], own_wiped[:, None],
                              enm_wiped[:, None])            # [E, m]
        wiped_enm = jnp.where((rows < h)[None, :], enm_wiped[:, None],
                              own_wiped[:, None])
        reward = ((team_post + 0.1 * (dealt - taken)) / h + r_adj
                  + 200.0 * (wiped_enm & ~wiped_own)
                  - 200.0 * wiped_own).reshape(-1)
        info.update(w_info)

        new_state = new_state.replace(is_done=done, bad_done=bad,
                                      exceed_time_limit=exceed)
        return new_state, StepOutput(
            obs=obs, reward=reward, done=done, bad_done=bad,
            exceed_time_limit=exceed, info=info,
            active=alive_post.astype(jnp.float32))

    # ---- team observation ----
    def _team_obs(self, state: CombatState, xdot: jnp.ndarray,
                  alive_g: jnp.ndarray, geom=None) -> jnp.ndarray:
        """Team obs; `geom` = ((AO, TA, R, side) planar, R3) precomputed by
        step() - reset()/_obs compute it fresh."""
        E, m, h = self.num_envs, self.num_agents, self.half
        s = state.model.s
        vu, vv, vw = self.model.get_velocity(state.model)
        ego = jnp.stack([
            s[:, 2] * FT / 5000.0,
            jnp.sin(s[:, 3]), jnp.cos(s[:, 3]),
            jnp.sin(s[:, 4]), jnp.cos(s[:, 4]),
            vu * FT / 340.0, vv * FT / 340.0, vw * FT / 340.0,
            s[:, 6] * FT / 340.0,
        ], axis=1).reshape(E, m, 9)

        if geom is None:
            pos_g = self._group(s[:, :3])
            vel_g = self._group(xdot[:, :3])
            geom = self._all_pairs_both(pos_g, vel_g)
            geom = (geom[0], geom[1][2])
        (AO, TA, R, side), R3 = geom
        vu_g = self._group(vu)
        alt_g = self._group(s[:, 2])
        dvx = (vu_g[:, None, :] - vu_g[:, :, None]) * FT / 340.0  # [E,m,m]
        dalt = (alt_g[:, None, :] - alt_g[:, :, None]) * FT / 1000.0
        # ONE stacked feature tensor; each block is a one-hot contraction
        # over the (tiny, static-size) group axis - six separate
        # take_along_axis passes lowered to HBM-bound TPU gathers
        feats_all = jnp.stack([dvx, dalt, AO, TA, R * FT / 10000.0, side],
                              axis=-1)                        # [E,m,m,6]

        def block(idx):
            """idx [E or 1, m, k] of within-group agent indices ->
            [E, m, k, 7] relative blocks, dead blocks zeroed."""
            onehot = (idx[..., None]
                      == jnp.arange(m)).astype(dvx.dtype)     # [*,m,k,m]
            onehot = jnp.broadcast_to(onehot,
                                      (E, m, idx.shape[-1], m))
            feats = jnp.einsum("eikj,eijf->eikf", onehot, feats_all)
            a_f = jnp.einsum("eikj,ej->eik", onehot,
                             alive_g.astype(dvx.dtype))
            return jnp.concatenate([feats * a_f[..., None], a_f[..., None]],
                                   axis=-1)

        mates_idx, _ = self._team_slices()
        parts = [ego]
        if h > 1:
            mi = jnp.asarray(mates_idx)[None]                # [1, m, h-1]
            parts.append(block(mi).reshape(E, m, (h - 1) * 7))
        perm, _ = self._nearest_enemy_perm(R3, alive_g)      # [E, m, h]
        parts.append(block(perm).reshape(E, m, h * 7))
        return jnp.concatenate(parts, axis=-1).reshape(self.n, -1)

    # ---- team termination ----
    def _team_termination(self, state: CombatState, xdot: jnp.ndarray,
                          alive_g: jnp.ndarray, dist=None):
        cfg, model, mstate = self.config, self.model, state.model
        E, m, h = self.num_envs, self.num_agents, self.half
        alive = alive_g.reshape(-1)

        def masked(cond):
            b, d, e = cond
            return b & alive, d & alive, e

        conds = [
            ("overload", masked(X.overload(cfg, model, mstate, xdot))),
            ("low_altitude", masked(X.low_altitude(cfg, model, mstate))),
            ("high_speed", masked(X.high_speed(cfg, model, mstate))),
            ("low_speed", masked(X.low_speed(cfg, model, mstate))),
            ("extreme_state", masked(X.extreme_state(cfg, model, mstate))),
            ("timeout", X.timeout(cfg, state.step_count)),
        ]
        # crash: any ALIVE pair within a group closer than distance_limit
        # (dist = the step's R3 when provided; recomputed otherwise)
        if dist is None:
            pos_g = self._group(mstate.s[:, :3])
            delta = pos_g[:, None, :, :] - pos_g[:, :, None, :]
            dist = jnp.linalg.norm(delta, axis=-1)
        pair_alive = alive_g[:, :, None] & alive_g[:, None, :]
        off_diag = ~jnp.eye(m, dtype=bool)[None]
        close = (dist < cfg.distance_limit) & pair_alive & off_diag
        crash_bad = jnp.any(close, axis=2).reshape(-1)
        conds.append(("crash", (crash_bad, jnp.zeros_like(crash_bad),
                                jnp.zeros_like(crash_bad))))
        # shutdown: team-wipe win/lose split (pairwise rule at h = 1)
        own_wiped = ~jnp.any(alive_g[:, :h], axis=1)
        enm_wiped = ~jnp.any(alive_g[:, h:], axis=1)
        rows = jnp.arange(m)
        bad_sd = jnp.where((rows < h)[None, :], own_wiped[:, None],
                           enm_wiped[:, None]).reshape(-1)
        done_sd = (jnp.where((rows < h)[None, :], enm_wiped[:, None],
                             own_wiped[:, None]).reshape(-1) & ~bad_sd)
        z = jnp.zeros_like(bad_sd)
        conds.append(("shutdown", (bad_sd, done_sd, z)))

        bad = functools.reduce(jnp.logical_or, [c[0] for _, c in conds])
        done = functools.reduce(jnp.logical_or, [c[1] for _, c in conds])
        exceed = functools.reduce(jnp.logical_or, [c[2] for _, c in conds])
        info = {f"termination/{name}": (b | d | e).sum()
                for name, (b, d, e) in conds}
        return done, bad, exceed, info

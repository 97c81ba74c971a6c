"""Batched proportional-navigation missile kinematics.

The reference ships the *policy side* of a missile engagement — the
Tuple(MultiDiscrete, Discrete) "shoot" action head with its Beta-prior
launch heuristic (`algorithms/utils/act.py:39-53`,
`algorithms/utils/distributions.py:107-129`, `ppo_actor.py:41-49`) — but no
in-tree environment ever exposes that action space, so the head is dead
code there. This module supplies the missing *environment side*: a
constant-speed, pure-proportional-navigation point-mass missile, fully
batched over [n, K] (n shooters x K missile slots) so the whole weapon
layer rides the same single-program XLA step as the rest of the sim.

Model (all units feet / seconds, matching the F-16 state):

- constant speed `speed` (boost/coast collapsed into one cruise speed);
- pure PN steering: a_cmd = N' * Omega x v_m with Omega = (r x dv) / |r|^2
  the line-of-sight rotation rate, clamped to `g_max` g of lateral
  acceleration, velocity renormalized to `speed` after each update
  (gravity and drag are absorbed by the constant-speed assumption);
- continuous (segment) hit test per step: the miss distance is evaluated
  at the closest point of approach within the step interval, so a
  2600 ft/s missile cannot tunnel through a 300 ft kill radius between
  0.1 s samples;
- lifetime `duration` seconds, one-shot deactivation on hit or expiry.

Everything is shape-static and elementwise over [n, K] — under vmap/jit it
fuses into the combat env's step program with no extra host round trips.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

G0_FTPS2 = 32.17405  # standard gravity, ft/s^2

_EPS = 1e-6


class MissileState(NamedTuple):
    """Per-shooter missile slots; arrays are [n, K(, 3)]."""
    pos: jnp.ndarray      # [n, K, 3] (npos, epos, alt) ft
    vel: jnp.ndarray      # [n, K, 3] ft/s
    active: jnp.ndarray   # [n, K] bool
    age: jnp.ndarray      # [n, K] s


def init_missiles(n: int, max_missiles: int) -> MissileState:
    return MissileState(
        pos=jnp.zeros((n, max_missiles, 3), jnp.float32),
        vel=jnp.zeros((n, max_missiles, 3), jnp.float32),
        active=jnp.zeros((n, max_missiles), bool),
        age=jnp.zeros((n, max_missiles), jnp.float32))


def clear_missiles(m: MissileState, mask: jnp.ndarray) -> MissileState:
    """Deactivate every slot of shooters where mask [n] is True."""
    return m._replace(active=m.active & ~mask[:, None])


def segment_min_dist(rel_pos: jnp.ndarray, rel_vel: jnp.ndarray,
                     dt: float) -> jnp.ndarray:
    """Minimum |rel_pos + t * rel_vel| over t in [0, dt] (closed form).

    `rel_pos` is target-minus-missile at the START of the step, `rel_vel`
    the relative velocity held constant over the step. The minimizing
    t* = -<r, v>/<v, v> is clamped into the step interval.
    """
    rv = jnp.sum(rel_pos * rel_vel, axis=-1)
    vv = jnp.sum(rel_vel * rel_vel, axis=-1)
    t_star = jnp.clip(-rv / (vv + _EPS), 0.0, dt)
    closest = rel_pos + t_star[..., None] * rel_vel
    return jnp.linalg.norm(closest, axis=-1)


def step_missiles(m: MissileState, target_pos: jnp.ndarray,
                  target_vel: jnp.ndarray, *, dt: float, speed: float,
                  nav_gain: float, g_max: float, duration: float,
                  hit_radius: float, fuse_outer: float = 0.0
                  ) -> Tuple[MissileState, jnp.ndarray, jnp.ndarray]:
    """Advance every missile one env step toward its target.

    target_pos/target_vel are [n, 3] (one target per shooter — 1v1
    pairing resolves it before the call) or [n, K, 3] (per-slot targets,
    locked at launch — the team game gathers them from the stored victim
    index). Returns (new state, hits [n, K] bool, pk [n, K] float32).

    Fuse modes:
    - **binary** (fuse_outer == 0, default): a hit fires when an active
      missile passes within `hit_radius` of its target during the step
      (closest point of approach over the segment); pk is 1.0 on hit.
    - **graded proximity fuse** (fuse_outer > hit_radius): the warhead
      detonates at closest approach — when the CPA falls inside this step
      (the unclamped minimizer t* < dt, i.e. the missile stops closing)
      within `fuse_outer` ft, or any time the target is inside the
      always-lethal `hit_radius`. The kill weight ramps linearly:
      pk = 1 at miss <= hit_radius down to 0 at miss >= fuse_outer.
      This replaces the binary radius's knife-edge (a 5 g missile's
      breaking CPA measures ~209 ft vs a 200 ft radius) with a learnable
      gradient: every extra foot of miss distance earned by a break turn
      reduces the damage taken. Detonated missiles deactivate either way.
    """
    if target_pos.ndim == 2:
        target_pos = target_pos[:, None, :]            # broadcast over K
        target_vel = target_vel[:, None, :]
    rel_pos = target_pos - m.pos                       # [n, K, 3]
    rel_vel = target_vel - m.vel

    # continuous collision over the step (pre-update kinematics)
    miss = segment_min_dist(rel_pos, rel_vel, dt)
    if fuse_outer > 0.0:
        assert fuse_outer > hit_radius, "graded fuse needs outer > inner"
        rv = jnp.sum(rel_pos * rel_vel, axis=-1)
        vv = jnp.sum(rel_vel * rel_vel, axis=-1)
        t_star = -rv / (vv + _EPS)                     # unclamped CPA time
        cpa_in_step = t_star < dt                      # passes CPA this step
        hits = m.active & (miss < fuse_outer) & (cpa_in_step
                                                 | (miss < hit_radius))
        pk = jnp.clip((fuse_outer - miss) / (fuse_outer - hit_radius),
                      0.0, 1.0) * hits.astype(jnp.float32)
    else:
        hits = m.active & (miss < hit_radius)
        pk = hits.astype(jnp.float32)

    # pure PN: Omega = (r x dv) / |r|^2 ; a = N' * Omega x v_m
    r2 = jnp.sum(rel_pos * rel_pos, axis=-1, keepdims=True)
    omega = jnp.cross(rel_pos, rel_vel) / (r2 + _EPS)
    acc = nav_gain * jnp.cross(omega, m.vel)
    a_norm = jnp.linalg.norm(acc, axis=-1, keepdims=True)
    a_max = g_max * G0_FTPS2
    # clamp |a| <= a_max (the _EPS floor keeps 0/0 out of the degenerate
    # a_norm == a_max == 0 corner, e.g. an unguided g_max=0 round)
    acc = acc * (a_max / jnp.maximum(a_norm, jnp.maximum(a_max, _EPS)))

    vel_new = m.vel + acc * dt
    vel_new = vel_new * (speed / (jnp.linalg.norm(vel_new, axis=-1,
                                                  keepdims=True) + _EPS))
    pos_new = m.pos + m.vel * dt                       # pre-update velocity
    age_new = m.age + dt

    still = m.active & ~hits & (age_new < duration)
    keep = m.active[..., None]
    return MissileState(
        pos=jnp.where(keep, pos_new, m.pos),
        vel=jnp.where(keep, vel_new, m.vel),
        active=still,
        age=jnp.where(m.active, age_new, m.age)), hits, pk


def launch_missiles(m: MissileState, slot: jnp.ndarray, fire: jnp.ndarray,
                    shooter_pos: jnp.ndarray, shooter_vel: jnp.ndarray,
                    *, speed: float) -> MissileState:
    """Arm slot `slot[n]` for shooters with fire[n] True.

    The missile separates at the shooter's position flying along the
    shooter's velocity direction at cruise `speed` (a stationary shooter
    defaults to straight north — degenerate but well-defined).
    """
    k = m.active.shape[1]
    sel = fire[:, None] & (jnp.arange(k)[None, :] == slot[:, None])  # [n, K]
    v_norm = jnp.linalg.norm(shooter_vel, axis=-1, keepdims=True)
    head = jnp.where(v_norm > _EPS, shooter_vel / (v_norm + _EPS),
                     jnp.array([1.0, 0.0, 0.0]))
    sel3 = sel[..., None]
    return MissileState(
        pos=jnp.where(sel3, shooter_pos[:, None, :], m.pos),
        vel=jnp.where(sel3, (head * speed)[:, None, :], m.vel),
        active=m.active | sel,
        age=jnp.where(sel, 0.0, m.age))

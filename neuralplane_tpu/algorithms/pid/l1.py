"""L1 lateral navigation controller as pure state-transition functions.

Re-design of the reference `L1Controller` (`algorithms/pid/L1Controller.py:
12-271`): waypoint / loiter / heading-hold / level-flight guidance producing
a lateral-acceleration demand, converted to a bank angle by `l1_nav_roll`.
The reference's wall-clock integrator reset (`update_waypoint`, sim_time > 1)
becomes an explicit `reset_i` argument. `prevent_indecision` in the waypoint
path receives yaw (the reference passes the whole state tensor there - a
latent broadcasting bug, L1Controller.py:150 vs :42; fixed here).

2-D vectors are [n, 2] (north, east); everything else flat [n].
"""
from __future__ import annotations

import math
import jax.numpy as jnp
from flax import struct

from ...utils.math import wrap_PI
from .config import L1Config

PI = math.pi


def _length(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.sum(v * v, axis=1))


def _dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(a * b, axis=1)


def _cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return a[:, 0] * b[:, 1] - a[:, 1] * b[:, 0]


def _diff_angle(loc1: jnp.ndarray, loc2: jnp.ndarray) -> jnp.ndarray:
    d = loc2 - loc1
    return jnp.arctan2(d[:, 1], d[:, 0])


@struct.dataclass
class L1State:
    L1_xtrack_i: jnp.ndarray      # [n]
    last_Nu: jnp.ndarray          # [n]
    # outputs of the last update_* call
    Nu: jnp.ndarray
    latAccDem: jnp.ndarray        # [n] ft/s^2
    L1_dist: jnp.ndarray
    target_bearing: jnp.ndarray
    nav_bearing: jnp.ndarray
    crosstrack_error: jnp.ndarray
    bearing_error: jnp.ndarray
    WPcircle: jnp.ndarray         # [n] bool


def l1_init(n: int) -> L1State:
    z = jnp.zeros((n,), jnp.float32)
    return L1State(L1_xtrack_i=z, last_Nu=z, Nu=z, latAccDem=z, L1_dist=z,
                   target_bearing=z, nav_bearing=z, crosstrack_error=z,
                   bearing_error=z, WPcircle=jnp.zeros((n,), bool))


def _prevent_indecision(st_Nu, last_Nu, target_bearing, yaw):
    """Keep the previous turn direction in the narrow pointing-away band
    (`L1Controller.py:42-50`)."""
    Nu_limit = 0.9 * PI
    osc = ((jnp.abs(st_Nu) > Nu_limit) & (jnp.abs(last_Nu) > Nu_limit)
           & (jnp.abs(wrap_PI(target_bearing - yaw)) > 2 * PI / 3)
           & (st_Nu * last_Nu < 0))
    return jnp.where(osc, last_Nu, st_Nu)


def l1_update_waypoint(cfg: L1Config, st: L1State, prev_WP: jnp.ndarray,
                       next_WP: jnp.ndarray, dist_min: jnp.ndarray,
                       current_loc: jnp.ndarray, ground_speed: jnp.ndarray,
                       yaw: jnp.ndarray,
                       reset_i: bool = False) -> L1State:
    """Waypoint-tracking guidance (`L1Controller.py:70-158`)."""
    xtrack_i = jnp.zeros_like(st.L1_xtrack_i) if reset_i else st.L1_xtrack_i
    K_L1 = 4.0 * cfg.L1_damping * cfg.L1_damping
    target_bearing = _diff_angle(current_loc, next_WP)
    gs = _length(ground_speed)
    L1_dist = jnp.maximum(cfg.L1_damping * cfg.L1_period * gs / PI, dist_min)

    AB = next_WP - prev_WP
    tiny = _length(AB) < 1e-6
    AB = jnp.where(tiny[:, None], next_WP - current_loc, AB)
    tiny = _length(AB) < 1e-6
    AB = jnp.where(tiny[:, None],
                   jnp.stack([jnp.cos(yaw), jnp.sin(yaw)], axis=1), AB)
    AB = AB / _length(AB)[:, None]

    A_air = current_loc - prev_WP
    crosstrack_error = _cross(A_air, AB)
    WP_A_dist = _length(A_air)
    alongTrackDist = _dot(A_air, AB)

    m1 = (WP_A_dist > L1_dist) & (
        alongTrackDist / jnp.maximum(WP_A_dist, 1.0) < -0.7071)
    # guard the unit vector: current_loc == prev_WP gives 0/0 = NaN, and
    # NaN survives the masked mix below (NaN * False-mask = NaN)
    A_unit = A_air / jnp.maximum(_length(A_air), 1e-9)[:, None]
    Nu_a = jnp.arctan2(_cross(ground_speed, -A_unit),
                       _dot(ground_speed, -A_unit))
    nav_a = jnp.arctan2(-A_unit[:, 1], -A_unit[:, 0])

    seg_len = _length(next_WP - prev_WP)
    m2 = (~m1) & (alongTrackDist > seg_len + gs * 3)
    B_air = current_loc - next_WP
    B_unit = B_air / jnp.maximum(_length(B_air), 1e-9)[:, None]
    Nu_b = jnp.arctan2(_cross(ground_speed, -B_unit),
                       _dot(ground_speed, -B_unit))
    nav_b = jnp.arctan2(-B_unit[:, 1], -B_unit[:, 0])

    m3 = ~(m1 | m2)
    Nu2 = jnp.arctan2(_cross(ground_speed, AB), _dot(ground_speed, AB))
    sine_Nu1 = jnp.clip(crosstrack_error / jnp.maximum(L1_dist, 0.1),
                        -0.7071, 0.7071)
    Nu1 = jnp.arcsin(sine_Nu1)
    small = jnp.abs(Nu1) < (5 * PI / 180)
    xtrack_i = jnp.clip(
        xtrack_i + Nu1 * cfg.L1_xtrack_i_gain * cfg.dt * small, -0.1, 0.1)
    Nu1 = Nu1 + xtrack_i
    nav_ab = wrap_PI(jnp.arctan2(AB[:, 1], AB[:, 0]) + Nu1)

    Nu = Nu_a * m1 + Nu_b * m2 + (Nu1 + Nu2) * m3
    nav_bearing = nav_a * m1 + nav_b * m2 + nav_ab * m3
    Nu = _prevent_indecision(Nu, st.last_Nu, target_bearing, yaw)
    last_Nu = Nu
    Nu = jnp.clip(Nu, -PI / 2, PI / 2)
    latAccDem = K_L1 * gs * gs / L1_dist * jnp.sin(Nu)
    return L1State(L1_xtrack_i=xtrack_i, last_Nu=last_Nu, Nu=Nu,
                   latAccDem=latAccDem, L1_dist=L1_dist,
                   target_bearing=target_bearing, nav_bearing=nav_bearing,
                   crosstrack_error=crosstrack_error, bearing_error=Nu,
                   WPcircle=jnp.zeros_like(st.WPcircle))


def l1_update_loiter(cfg: L1Config, st: L1State, center_WP: jnp.ndarray,
                     radius: jnp.ndarray, loiter_direction: jnp.ndarray,
                     current_loc: jnp.ndarray, ground_speed: jnp.ndarray,
                     yaw: jnp.ndarray) -> L1State:
    """Loiter-circle guidance (`L1Controller.py:160-228`)."""
    omega = 2 * PI / cfg.L1_period
    Kx = omega * omega
    Kv = 2 * cfg.L1_damping * omega
    K_L1 = 4 * cfg.L1_damping * cfg.L1_damping
    gs = _length(ground_speed)
    target_bearing = _diff_angle(current_loc, center_WP)
    L1_dist = cfg.L1_damping * cfg.L1_period * gs / PI

    A_air = current_loc - center_WP
    a_len = _length(A_air)
    m1 = a_len > 0.1
    m2 = (~m1) & (gs < 0.1)
    m3 = ~(m1 | m2)
    A_unit = (A_air / jnp.maximum(a_len, 1e-9)[:, None] * m1[:, None]
              + jnp.stack([jnp.cos(yaw), jnp.sin(yaw)], axis=1) * m2[:, None]
              + ground_speed / jnp.maximum(gs, 1e-9)[:, None] * m3[:, None])

    xtrackVelCap = _cross(A_unit, ground_speed)
    ltrackVelCap = -_dot(ground_speed, A_unit)
    Nu = jnp.arctan2(xtrackVelCap, ltrackVelCap)
    Nu = _prevent_indecision(Nu, st.last_Nu, target_bearing, yaw)
    last_Nu = Nu
    Nu = jnp.clip(Nu, -PI / 2, PI / 2)
    latAccDemCap = K_L1 * gs * gs / jnp.maximum(L1_dist, 1e-6) * jnp.sin(Nu)

    xtrackVelCirc = -ltrackVelCap
    xtrackErrCirc = a_len - radius
    latAccDemCircPD = xtrackErrCirc * Kx + xtrackVelCirc * Kv
    velTangent = xtrackVelCap * loiter_direction
    wrong_way = (ltrackVelCap < 0) & (velTangent < 0)
    latAccDemCircPD = jnp.where(wrong_way, jnp.maximum(latAccDemCircPD, 0.0),
                                latAccDemCircPD)
    latAccDemCircCtr = velTangent * velTangent / jnp.maximum(
        0.5 * radius, radius + xtrackErrCirc)
    latAccDemCirc = loiter_direction * (latAccDemCircPD + latAccDemCircCtr)

    capture = (xtrackErrCirc > 0) & (
        loiter_direction * latAccDemCap < loiter_direction * latAccDemCirc)
    latAccDem = jnp.where(capture, latAccDemCap, latAccDemCirc)
    nav_bearing = jnp.arctan2(-A_unit[:, 1], -A_unit[:, 0])
    return L1State(L1_xtrack_i=st.L1_xtrack_i, last_Nu=last_Nu, Nu=Nu,
                   latAccDem=latAccDem, L1_dist=L1_dist,
                   target_bearing=target_bearing, nav_bearing=nav_bearing,
                   crosstrack_error=xtrackErrCirc,
                   bearing_error=Nu * capture, WPcircle=~capture)


def l1_update_heading_hold(cfg: L1Config, st: L1State,
                           navigation_heading: jnp.ndarray,
                           ground_speed: jnp.ndarray,
                           yaw: jnp.ndarray) -> L1State:
    """Heading-hold guidance (`L1Controller.py:230-253`)."""
    omegaA = 4.4428 / cfg.L1_period
    target_bearing = wrap_PI(navigation_heading)
    Nu = wrap_PI(target_bearing - wrap_PI(yaw))
    gs = _length(ground_speed)
    L1_dist = gs / omegaA
    VomegaA = gs * omegaA
    Nu = jnp.clip(Nu, -PI / 2, PI / 2)
    latAccDem = 2 * jnp.sin(Nu) * VomegaA
    z = jnp.zeros_like(Nu)
    return L1State(L1_xtrack_i=st.L1_xtrack_i, last_Nu=st.last_Nu, Nu=Nu,
                   latAccDem=latAccDem, L1_dist=L1_dist,
                   target_bearing=target_bearing,
                   nav_bearing=navigation_heading,
                   crosstrack_error=z, bearing_error=Nu,
                   WPcircle=jnp.zeros_like(st.WPcircle))


def l1_update_level_flight(st: L1State, yaw: jnp.ndarray) -> L1State:
    """Hold-current-heading guidance (`L1Controller.py:255-265`)."""
    z = jnp.zeros_like(yaw)
    return L1State(L1_xtrack_i=st.L1_xtrack_i, last_Nu=st.last_Nu, Nu=st.Nu,
                   latAccDem=z, L1_dist=st.L1_dist, target_bearing=yaw,
                   nav_bearing=yaw, crosstrack_error=z, bearing_error=z,
                   WPcircle=jnp.zeros_like(st.WPcircle))


def l1_nav_roll(cfg: L1Config, st: L1State, pitch: jnp.ndarray) -> jnp.ndarray:
    """Bank angle for the demanded lateral accel (`L1Controller.py:267-271`)."""
    result = jnp.cos(pitch) * jnp.arctan(st.latAccDem / cfg.gravity)
    return jnp.clip(result, -PI / 2, PI / 2)

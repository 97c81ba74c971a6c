"""Angle wrapping, combat geometry, and reward-shaping math.

Pure jnp functions over batched arrays. Behavior parity with the reference's
`envs/utils/utils.py:144-249` (wrap_PI/wrap_2PI, get_AO_TA_R/get2d_AO_TA_R,
orientation/range reward shaping, blood-damage orientation/distance fns),
re-expressed branch-free for XLA.
"""
from __future__ import annotations

import jax.numpy as jnp

PI = jnp.pi


def wrap_2PI(angle: jnp.ndarray) -> jnp.ndarray:
    """Wrap angle into [0, 2*pi)."""
    res = jnp.mod(angle, 2.0 * PI)
    return jnp.where(res < 0.0, res + 2.0 * PI, res)


def wrap_PI(angle: jnp.ndarray) -> jnp.ndarray:
    """Wrap angle into (-pi, pi]."""
    res = wrap_2PI(angle)
    return jnp.where(res > PI, res - 2.0 * PI, res)


def get_AO_TA_R(ego_pos, enm_pos, ego_vel, enm_vel, return_side: bool = False):
    """Aspect/antenna-train angles and range between paired agents.

    Args:
        ego_pos, enm_pos: [n, 3] (north, east, altitude)
        ego_vel, enm_vel: [n, 3] velocities
        return_side: also return the sign of the horizontal cross product.

    Returns:
        (AO, TA, R[, side_flag]) each [n].
    """
    ego_v = jnp.linalg.norm(ego_vel, axis=1)
    enm_v = jnp.linalg.norm(enm_vel, axis=1)
    delta_pos = enm_pos - ego_pos
    distance = jnp.linalg.norm(delta_pos, axis=1)

    proj = jnp.sum(delta_pos * ego_vel, axis=1)
    ego_AO = jnp.arccos(jnp.clip(proj / (distance * ego_v + 1e-8), -1.0, 1.0))
    proj = jnp.sum(delta_pos * enm_vel, axis=1)
    ego_TA = jnp.arccos(jnp.clip(proj / (distance * enm_v + 1e-8), -1.0, 1.0))
    if not return_side:
        return ego_AO, ego_TA, distance
    # z-component of (ego_vel_2d x delta_pos_2d)
    cross_z = ego_vel[:, 0] * delta_pos[:, 1] - ego_vel[:, 1] * delta_pos[:, 0]
    side_flag = jnp.sign(cross_z)
    return ego_AO, ego_TA, distance, side_flag


def get2d_AO_TA_R(ego_pos, enm_pos, ego_vel, enm_vel, return_side: bool = False):
    """Planar (drop-altitude) variant of :func:`get_AO_TA_R`."""
    ego_vel2, enm_vel2 = ego_vel[:, :-1], enm_vel[:, :-1]
    ego_pos2, enm_pos2 = ego_pos[:, :-1], enm_pos[:, :-1]
    ego_v = jnp.linalg.norm(ego_vel2, axis=1)
    enm_v = jnp.linalg.norm(enm_vel2, axis=1)
    delta_pos = enm_pos2 - ego_pos2
    distance = jnp.linalg.norm(delta_pos, axis=1)

    proj = jnp.sum(delta_pos * ego_vel2, axis=1)
    ego_AO = jnp.arccos(jnp.clip(proj / (distance * ego_v + 1e-8), -1.0, 1.0))
    proj = jnp.sum(delta_pos * enm_vel2, axis=1)
    ego_TA = jnp.arccos(jnp.clip(proj / (distance * enm_v + 1e-8), -1.0, 1.0))
    if not return_side:
        return ego_AO, ego_TA, distance
    cross_z = ego_vel2[:, 0] * delta_pos[:, 1] - ego_vel2[:, 1] * delta_pos[:, 0]
    side_flag = jnp.sign(cross_z)
    return ego_AO, ego_TA, distance, side_flag


def orientation_reward(AO, TA, version: str = "v2"):
    """Continuous posture-orientation shaping (three published variants)."""
    if version == "v0":
        return ((1.0 - jnp.tanh(9.0 * (AO - PI / 9.0))) / 3.0 + 1.0 / 3.0
                + jnp.minimum(
                    jnp.arctanh(1.0 - jnp.maximum(2.0 * TA / PI, 1e-4)) / (2.0 * PI),
                    0.0) + 0.5)
    if version == "v1":
        return ((1.0 - jnp.tanh(2.0 * (AO - PI / 2.0))) / 2.0
                * jnp.arctanh(1.0 - jnp.maximum(2.0 * TA / PI, 1e-4)) / (2.0 * PI)
                + 0.5)
    if version == "v2":
        return (1.0 / (50.0 * AO / PI + 2.0) + 0.5
                + jnp.minimum(
                    jnp.arctanh(1.0 - jnp.maximum(1.9 * TA / PI, 1e-4)) / (2.0 * PI),
                    0.0) + 0.5)
    raise NotImplementedError(f"Unknown orientation function version: {version}")


def range_reward(target_dist, R, version: str = "v3"):
    """Range shaping toward a preferred engagement distance (km)."""
    if version == "v0":
        return jnp.exp(-((R - target_dist) ** 2) * 0.004) / (
            1.0 + jnp.exp(-(R - target_dist + 2.0) * 2.0))
    if version == "v1":
        return jnp.clip(
            1.2 * jnp.minimum(jnp.exp(-(R - target_dist) * 0.21), 1.0)
            / (1.0 + jnp.exp(-(R - target_dist + 1.0) * 0.8)), 0.3, 1.0)
    if version == "v2":
        return jnp.maximum(
            jnp.clip(
                1.2 * jnp.minimum(jnp.exp(-(R - target_dist) * 0.21), 1.0)
                / (1.0 + jnp.exp(-(R - target_dist + 1.0) * 0.8)), 0.3, 1.0),
            jnp.sign(7.0 - R))
    if version == "v3":
        return (1.0 * (R < 5.0)
                + (R >= 5.0) * jnp.clip(-0.032 * R ** 2 + 0.284 * R + 0.38, 0.0, 1.0)
                + jnp.clip(jnp.exp(-0.16 * R), 0.0, 0.2))
    raise NotImplementedError(f"Unknown range function version: {version}")


def orientation_fn(AO):
    """Blood-damage orientation factor: 1 at nose-on, linear to 0 at +/-30 deg.

    Fixed reference defect: the reference's two branch masks both include
    AO == 0 (`envs/utils/utils.py:235-243`), so exact nose-on (reachable -
    arccos(clip(x,-1,1)) returns 0.0 whenever the clip saturates) doubles
    the damage to 2.0. The negative branch here is exclusive."""
    in_pos = (AO >= 0.0) & (AO <= PI / 6.0)
    in_neg = (AO < 0.0) & (AO >= -PI / 6.0)
    return (1.0 - 6.0 * AO / PI) * in_pos + (1.0 + 6.0 * AO / PI) * in_neg


def distance_fn(R):
    """Blood-damage range factor: 1 inside 1 km, linear to 0 at 3 km."""
    return 1.0 * (R <= 1.0) + (3.0 - R) / 2.0 * ((R > 1.0) & (R <= 3.0))

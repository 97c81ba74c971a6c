"""Typed scenario configuration.

Replaces the reference's YAML -> anonymous-class pattern
(`envs/utils/utils.py:12-27`) with a frozen dataclass: explicit fields,
defaults in one place, silent-fallback `getattr(config, key, default)` reads
become type-checked attribute access. Still loads the same YAML scenario files
(`neuralplane_tpu/configs/*.yaml` mirror the reference's `envs/configs/*`).

The config is static (hashable) so it can be closed over by jitted functions.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Mapping, Optional

import yaml

_CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs")


@dataclasses.dataclass(frozen=True)
class InitState:
    init_altitude_ft: float = 20000.0
    init_heading: float = 0.0
    init_vt_ft: float = 1100.0
    init_T: float = 2000.0


@dataclasses.dataclass(frozen=True)
class EnvConfig:
    """Scenario configuration (sim + aircraft + task + init ranges)."""

    # atmos
    airspeed: float = 0.0
    noise_scale: float = 0.01

    # simulation
    sim_freq: int = 60
    solver: str = "euler"          # euler | rk4
    dt: float = 0.02
    num_agents: int = 1
    num_states: int = 12
    num_controls: int = 5
    num_actions: int = 4
    num_observation: int = 22
    max_steps: int = 2500

    # aircraft limits
    altitude_limit: float = 2500.0
    acceleration_limit: float = 300.0
    max_velocity: float = 3.0      # Mach
    min_velocity: float = 0.01     # Mach
    min_alpha: float = -20.0       # deg
    max_alpha: float = 45.0        # deg
    min_beta: float = -30.0        # deg
    max_beta: float = 30.0         # deg
    color: str = "Red"
    model: str = "f16"

    # target sampling
    max_heading_increment: float = 0.3     # rad
    max_pitch_increment: float = 0.3       # rad
    max_altitude_increment: float = 500.0  # ft
    max_velocities_u_increment: float = 100.0  # ft/s
    max_distance: float = 2000.0   # ft (tracking)
    min_distance: float = 2000.0   # ft
    max_check_interval: int = 2500
    min_check_interval: int = 300

    # init ranges
    init_state: InitState = dataclasses.field(default_factory=InitState)
    max_altitude: float = 20000.0
    min_altitude: float = 19000.0
    max_vt: float = 1200.0
    min_vt: float = 1000.0

    # combat (selfplay scenarios)
    preset_name: str = "F16"
    ego_agents: int = 1
    enm_agents: int = 1
    max_blood: float = 100.0
    distance_limit: float = 200.0  # ft pairwise-crash threshold
    init_T: float = 2000.0
    target_dist: float = 3.0       # km preferred engagement range
    max_heading: float = 0.5
    min_heading: float = -0.5
    max_npos: float = 5000.0
    min_npos: float = -5000.0
    max_epos: float = 5000.0
    # 1v1 side-flag convention. The reference gives enemy-side rows the
    # ROLE-SWAPPED side flag (sign of the EGO aircraft's velocity cross
    # the line of sight, `singlecombat_env.py:118-125`), so the same
    # policy deployed on odd rows reads obs slot 14 with different
    # semantics than it trained on - measured as a ~2.5:1 ego-side
    # mirror-match advantage on fine-maneuvering games
    # (results/shoot_evadable). True = every agent computes the flag in
    # its OWN convention (sign of its own velocity cross its line of
    # sight - what ego rows always get). Default False for exact
    # reference parity. The team env is unaffected: its all-pairs
    # geometry is own-convention for every row already.
    symmetric_side_flag: bool = False
    min_epos: float = -5000.0

    # shoot-combat (missile) scenarios — envs/combat_shoot.py supplies the
    # environment side of the reference's ShootTuple action head
    max_missiles: int = 4
    # defaults are the VALIDATED soft-missile balance (the round-3 1v1 run
    # showed the original 2600 ft/s / 30 g / 30 s / 300 ft set produces a
    # degenerate first-strike lottery); YAML scenarios carry the same
    # values, so programmatic EnvConfig() construction agrees with them
    missile_speed: float = 2000.0      # ft/s cruise (constant-speed PN)
    missile_g_max: float = 12.0        # g lateral-accel clamp
    missile_duration: float = 20.0     # s flight time before expiry
    missile_hit_radius: float = 200.0  # ft kill radius (segment hit test)
    missile_damage: float = 100.0      # blood per hit
    missile_cooldown: float = 4.0      # s between launches
    missile_nav_gain: float = 3.0      # PN navigation constant N'
    missile_shoot_cost: float = 5.0    # reward penalty per launch
    # weapons-engagement-zone launch gate: a launch only leaves the rail
    # with the target inside |AO| < wez_max_ao_deg AND R < wez_max_range.
    # Without the gate the game is a first-strike lottery (a pure-PN
    # missile connects from almost any aspect, so spray-on-sight beats
    # every flying skill and self-play collapses to trigger passivity —
    # measured on the first 1v1 shoot run); with it, kills are earned by
    # the same posture game the gun envs train, and the shoot head still
    # owns within-WEZ trigger discipline.
    wez_max_ao_deg: float = 60.0
    wez_max_range: float = 20000.0     # ft
    # evadable-missile game (selfplay_shoot_evadable): a graded proximity
    # fuse (kill weight ramps 1 -> 0 from hit_radius out to fuse_outer at
    # the closest point of approach; 0 keeps the binary radius), incoming-
    # missile bearing/closure obs so a directed break is representable,
    # and a dense damage-shaping reward term. See ops/missile.py and
    # docs/ARCHITECTURE.md for the design rationale.
    missile_fuse_outer: float = 0.0    # ft (0 = binary hit test)
    missile_threat_obs: bool = False   # append [sin brg, cos brg, closure]
    blood_shaping: float = 0.0         # reward coeff on (dealt - taken)
    attitude_bins: int = 41            # discrete roll/pitch/yaw demand bins
    throttle_bins: int = 30            # discrete throttle bins

    # hierarchical control (planning env)
    low_level_steps: int = 50
    low_level_ckpt: Optional[str] = None

    # reuse the integrator's step-start xdot for termination/accel checks
    # (saves a full dynamics evaluation per step; the overload check sees the
    # acceleration experienced DURING the step, one substep earlier than the
    # reference's post-step recomputation - set false for exact semantics)
    reuse_step_xdot: bool = True

    # fuse obs+terminations+reward into one Pallas pass on the TPU path
    # (ops/task_pallas.py); semantics identical to the XLA task layer
    fused_task_kernel: bool = True

    # generate the observation sensor noise inside the fused step kernel
    # (ops/step_pallas.py) with the TPU hardware PRNG + Box-Muller instead
    # of a jax.random.normal pass over [n, 22] in XLA. Same distribution
    # N(0, noise_scale), different stream than the portable path - set
    # false for bit-exact fused==portable observations
    kernel_obs_noise: bool = True

    # draw the auto-reset init uniforms (altitude, vt) AND the task target
    # resample inside the fused step kernel from the TPU hardware PRNG
    # (ops/step_pallas.py reset_consts/_resample_targets) instead of
    # threefry + a [n]-wide select pass in XLA. Same distributions and the
    # same masked-reset semantics, different stream than the portable path
    # - set false for bit-exact fused==portable states/targets
    kernel_reset_draws: bool = True

    # deterministic-vs-random target resampling for the heading task
    # (the reference hardcodes fixed increments with the random path
    # commented out, `envs/tasks/heading_task.py:60-65`)
    heading_random_increments: bool = False

    def replace(self, **kwargs: Any) -> "EnvConfig":
        return dataclasses.replace(self, **kwargs)


def load_config(name_or_path: str, **overrides: Any) -> EnvConfig:
    """Load a scenario config by name (from package configs/) or path."""
    path = name_or_path
    if not os.path.exists(path):
        path = os.path.join(_CONFIG_DIR, f"{name_or_path}.yaml")
    if not os.path.exists(path):
        raise FileNotFoundError(f"No scenario config: {name_or_path!r} (looked in {_CONFIG_DIR})")
    with open(path, "r", encoding="utf-8") as f:
        raw: Mapping[str, Any] = yaml.safe_load(f) or {}
    return config_from_dict({**raw, **overrides})


def config_from_dict(raw: Mapping[str, Any]) -> EnvConfig:
    field_names = {f.name for f in dataclasses.fields(EnvConfig)}
    known = {k: v for k, v in raw.items() if k in field_names}
    unknown = sorted(set(raw) - field_names)
    if unknown:
        raise KeyError(f"Unknown scenario config keys: {unknown}")
    if "init_state" in known and isinstance(known["init_state"], Mapping):
        known["init_state"] = InitState(**known["init_state"])
    return EnvConfig(**known)

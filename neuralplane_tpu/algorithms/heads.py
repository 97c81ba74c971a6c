"""Action heads for every reference action-space type.

Parity with `ACTLayer` (`algorithms/utils/act.py:9-199`): Box -> DiagGaussian
(tanh-squashed mean net + learnable log_std), Discrete -> Categorical,
MultiBinary -> Bernoulli, MultiDiscrete -> one Categorical per dim,
Tuple(MultiDiscrete, Discrete) -> the combat "shoot missile" head whose
Bernoulli probability is built from softplus-bounded pseudo-counts plus the
Beta prior (alpha0, beta0) derived from attack angle / distance
(`ppo_actor.py:41-49`, `distributions.py:107-129`).

Each head is a small static object: `init(key, in_dim)` -> params,
`dist(params, feat, **priors)` -> distribution(s) with
sample/mode/log_prob/entropy, all pure and jit-safe.
"""
from __future__ import annotations

from typing import Any, List, NamedTuple

import jax
import jax.numpy as jnp

from .networks import _dense, _dense_init
from .utils.distributions import (Bernoulli, Categorical, DiagGaussian,
                                  beta_shoot_probability)
from .utils.spaces import Box, Discrete, MultiBinary, MultiDiscrete, ShootTuple


class _MultiDist(NamedTuple):
    """A product of independent per-dim distributions (MultiDiscrete)."""
    dists: Any  # tuple of Categorical

    def sample(self, key: jax.Array) -> jnp.ndarray:
        keys = jax.random.split(key, len(self.dists))
        return jnp.concatenate([d.sample(k) for d, k in zip(self.dists, keys)],
                               axis=-1)

    def mode(self) -> jnp.ndarray:
        return jnp.concatenate([d.mode() for d in self.dists], axis=-1)

    def log_prob(self, actions: jnp.ndarray) -> jnp.ndarray:
        lps = [d.log_prob(actions[..., i:i + 1])
               for i, d in enumerate(self.dists)]
        return sum(lps)

    def entropy(self) -> jnp.ndarray:
        return sum(d.entropy() for d in self.dists)


class _ShootDist(NamedTuple):
    """(MultiDiscrete flight controls, Bernoulli shoot) product."""
    control: _MultiDist
    shoot: Bernoulli

    def sample(self, key: jax.Array) -> jnp.ndarray:
        k1, k2 = jax.random.split(key)
        return jnp.concatenate(
            [self.control.sample(k1), self.shoot.sample(k2)], axis=-1)

    def mode(self) -> jnp.ndarray:
        return jnp.concatenate([self.control.mode(), self.shoot.mode()],
                               axis=-1)

    def log_prob(self, actions: jnp.ndarray) -> jnp.ndarray:
        # parity: the reference sums only the discrete log-probs at rollout
        # but evaluates shoot log-prob in training (act.py:134-158); we keep
        # the full product likelihood for both (more correct, documented).
        nc = len(self.control.dists)
        return (self.control.log_prob(actions[..., :nc])
                + self.shoot.log_prob(actions[..., nc:]))

    def entropy(self) -> jnp.ndarray:
        return self.control.entropy() + self.shoot.entropy()


class BoxHead:
    def __init__(self, space: Box, gain: float = 0.01):
        self.dim = space.dim
        self.gain = gain

    def init(self, key: jax.Array, in_dim: int) -> dict:
        return {"mu": _dense_init(key, in_dim, self.dim, self.gain),
                "log_std": jnp.zeros((self.dim,), jnp.float32)}

    def dist(self, p: dict, feat: jnp.ndarray, **_) -> DiagGaussian:
        return DiagGaussian(jnp.tanh(_dense(p["mu"], feat)), p["log_std"])


class DiscreteHead:
    def __init__(self, space: Discrete, gain: float = 0.01):
        self.n = space.n
        self.gain = gain

    def init(self, key: jax.Array, in_dim: int) -> dict:
        return {"logits": _dense_init(key, in_dim, self.n, self.gain)}

    def dist(self, p: dict, feat: jnp.ndarray, **_) -> Categorical:
        return Categorical(_dense(p["logits"], feat))


class MultiBinaryHead:
    def __init__(self, space: MultiBinary, gain: float = 0.01):
        self.n = space.n
        self.gain = gain

    def init(self, key: jax.Array, in_dim: int) -> dict:
        return {"logits": _dense_init(key, in_dim, self.n, self.gain)}

    def dist(self, p: dict, feat: jnp.ndarray, **_) -> Bernoulli:
        return Bernoulli(jax.nn.sigmoid(_dense(p["logits"], feat)))


class MultiDiscreteHead:
    def __init__(self, space: MultiDiscrete, gain: float = 0.01):
        self.nvec = tuple(space.nvec)
        self.gain = gain

    def init(self, key: jax.Array, in_dim: int) -> List[dict]:
        keys = jax.random.split(key, len(self.nvec))
        return [{"logits": _dense_init(k, in_dim, n, self.gain)}
                for k, n in zip(keys, self.nvec)]

    def dist(self, p: List[dict], feat: jnp.ndarray, **_) -> _MultiDist:
        return _MultiDist(tuple(Categorical(_dense(pi["logits"], feat))
                                for pi in p))


class ShootHead:
    """MultiDiscrete controls + Beta-prior shoot Bernoulli (act.py:39-53)."""

    def __init__(self, space: ShootTuple, gain: float = 0.01):
        self.control = MultiDiscreteHead(MultiDiscrete(space.nvec), gain)
        self.gain = gain

    def init(self, key: jax.Array, in_dim: int) -> dict:
        k1, k2 = jax.random.split(key)
        return {"control": self.control.init(k1, in_dim),
                "shoot": _dense_init(k2, in_dim, 2, self.gain)}

    def dist(self, p: dict, feat: jnp.ndarray, alpha0=3.0, beta0=10.0,
             **_) -> _ShootDist:
        prob = beta_shoot_probability(_dense(p["shoot"], feat),
                                      jnp.asarray(alpha0),
                                      jnp.asarray(beta0))
        return _ShootDist(self.control.dist(p["control"], feat),
                          Bernoulli(prob))


def build_head(space, gain: float = 0.01):
    if isinstance(space, Box):
        return BoxHead(space, gain)
    if isinstance(space, Discrete):
        return DiscreteHead(space, gain)
    if isinstance(space, MultiBinary):
        return MultiBinaryHead(space, gain)
    if isinstance(space, MultiDiscrete):
        return MultiDiscreteHead(space, gain)
    if isinstance(space, ShootTuple):
        return ShootHead(space, gain)
    raise NotImplementedError(f"Unsupported action space: {space!r}")


def shoot_priors(obs: jnp.ndarray, ao_slot: int = 11, r_slot: int = 13):
    """Beta-prior pseudo-counts from the attack-angle (rad) and distance
    (10 km units) observation slots - `ppo_actor.py:41-49`.

    The reference hardcodes slots 11/13 (the 1v1 layout); slot indices are
    parameters here because the team obs layout puts the nearest-enemy
    AO/R at 9 + 7*(h-1) + 2 / + 4 — envs expose `shoot_prior_slots` so the
    prior is always keyed on the LOCK TARGET's geometry, not whatever
    happens to sit at index 11 (in the team layout that is the teammate).
    """
    attack_deg = jnp.rad2deg(obs[..., ao_slot:ao_slot + 1])
    distance_m = obs[..., r_slot:r_slot + 1] * 10000.0
    alpha0 = jnp.where(distance_m <= 8000.0, 10.0,
                       jnp.where(distance_m <= 12000.0, 6.0, 3.0))
    beta0 = jnp.where(attack_deg <= 22.5, 3.0,
                      jnp.where(attack_deg <= 45.0, 6.0, 10.0))
    return alpha0, beta0

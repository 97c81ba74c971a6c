"""Generic gym-environment runner (the `scripts/train/train_gym.py` analogue).

Trains the recurrent PPO stack on ANY host-stepped environment exposing the
gym-style contract reset() -> obs, step(a) -> (obs, reward, done, info) -
external simulators, classic-control tasks, or this framework's GymVecEnv
wrapper. The env steps on host; the policy forward runs as one jitted call
per step and the PPO update reuses the fully-jitted trainer - so only the
env itself is off-device (reference `scripts/train/train_gym.py`,
`runner/*`).
"""
from __future__ import annotations

import logging
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..algorithms.ppo.buffer import RolloutBatch
from ..algorithms.rl_config import RLConfig
from .base import Runner


class GymEnvAdapter:
    """Duck-typing shim: normalizes (obs, reward, done, info) 4-tuples and
    5-tuples (terminated/truncated) to a common contract."""

    def __init__(self, env):
        self.env = env
        self.num_observation = int(np.prod(env.observation_space.shape))
        self.num_actions = int(np.prod(env.action_space.shape))
        # config shim so Runner.eval defaults work
        self.config = type("C", (), {"max_steps": 1000})()

    def reset(self):
        out = self.env.reset()
        obs = out[0] if isinstance(out, tuple) else out
        return np.asarray(obs, np.float32).reshape(-1)

    def step(self, action: np.ndarray):
        out = self.env.step(action)
        if len(out) == 5:  # gymnasium: obs, r, terminated, truncated, info
            obs, r, term, trunc, info = out
            return (np.asarray(obs, np.float32).reshape(-1), float(r),
                    bool(term), bool(trunc), info)
        obs, r, done, info = out
        trunc = bool(info.get("TimeLimit.truncated", False))
        return (np.asarray(obs, np.float32).reshape(-1), float(r),
                bool(done) and not trunc, trunc, info)


class GymRunner(Runner):
    """PPO on a list of host-stepped single-agent envs."""

    def __init__(self, envs, cfg: RLConfig, run_dir: str = "runs/gym",
                 model_dir: Optional[str] = None,
                 use_tensorboard: bool = False):
        self.adapters = [e if isinstance(e, GymEnvAdapter) else
                         GymEnvAdapter(e) for e in envs]
        super().__init__(self.adapters[0], cfg, run_dir, None, model_dir,
                         use_tensorboard)
        self.n = len(self.adapters)

        @jax.jit
        def _act(params, obs, h_a, h_c, masks, key):
            return self.policy.get_actions(params, obs, h_a, h_c, masks, key)
        self._act = _act

    def run(self) -> Dict[str, float]:
        cfg = self.cfg
        T, n = cfg.buffer_size, self.n
        d_obs = self.env.num_observation
        d_act = self.env.num_actions
        episodes = max(1, int(cfg.num_env_steps) // (T * n))

        obs = np.stack([a.reset() for a in self.adapters])
        h_a, h_c = self.policy.init_rnn_states(n)
        masks = np.ones((n, 1), np.float32)
        bad_masks = np.ones((n, 1), np.float32)
        start = time.time()
        train_infos: Dict[str, float] = {}

        for episode in range(episodes):
            buf = {k: np.zeros((T + 1, n, d), np.float32) for k, d in
                   (("obs", d_obs), ("masks", 1), ("bad_masks", 1),
                    ("value_preds", 1))}
            buf["actions"] = np.zeros((T, n, d_act), np.float32)
            buf["rewards"] = np.zeros((T, n, 1), np.float32)
            buf["logp"] = np.zeros((T, n, 1), np.float32)
            L, H = self.policy.spec.recurrent_hidden_layers, \
                self.policy.spec.recurrent_hidden_size
            buf["h_a"] = np.zeros((T, n, L, H), np.float32)
            buf["h_c"] = np.zeros_like(buf["h_a"])

            for t in range(T):
                buf["obs"][t] = obs
                buf["masks"][t] = masks
                buf["bad_masks"][t] = bad_masks
                buf["h_a"][t] = np.asarray(h_a)
                buf["h_c"][t] = np.asarray(h_c)
                values, actions, logp, h_a, h_c = self._act(
                    self.train_state.params, jnp.asarray(obs), h_a, h_c,
                    jnp.asarray(masks), self.next_key())
                buf["value_preds"][t] = np.asarray(values)
                buf["actions"][t] = np.asarray(actions)
                buf["logp"][t] = np.asarray(logp)

                for i, adapter in enumerate(self.adapters):
                    o, r, done, trunc, _ = adapter.step(
                        np.asarray(actions[i]))
                    buf["rewards"][t, i, 0] = r
                    masks[i, 0] = 0.0 if (done or trunc) else 1.0
                    # proper-time-limits convention (buffer.compute_returns):
                    # bad_masks=0 marks a TIME-LIMIT end whose return is
                    # replaced by V(s); a true terminal keeps bad_masks=1
                    # so its reward signal survives
                    bad_masks[i, 0] = 0.0 if (trunc and not done) else 1.0
                    if done or trunc:
                        o = adapter.reset()
                        h_a = h_a.at[i].set(0.0)
                        h_c = h_c.at[i].set(0.0)
                    obs[i] = o

            buf["obs"][T] = obs
            buf["masks"][T] = masks
            buf["bad_masks"][T] = bad_masks
            bootstrap = self.policy.get_values(
                self.train_state.params, jnp.asarray(obs), h_c,
                jnp.asarray(masks))
            buf["value_preds"][T] = np.asarray(bootstrap)

            batch = RolloutBatch(
                obs=jnp.asarray(buf["obs"]),
                actions=jnp.asarray(buf["actions"]),
                rewards=jnp.asarray(buf["rewards"]),
                masks=jnp.asarray(buf["masks"]),
                bad_masks=jnp.asarray(buf["bad_masks"]),
                action_log_probs=jnp.asarray(buf["logp"]),
                value_preds=jnp.asarray(buf["value_preds"]),
                rnn_states_actor=jnp.asarray(buf["h_a"]),
                rnn_states_critic=jnp.asarray(buf["h_c"]))
            train_infos = self.train(batch)

            total = (episode + 1) * T * n
            if episode % cfg.log_interval == 0:
                # every episode end (terminal or truncation) zeroes masks;
                # bad_masks is a subset (truncations), so masks alone counts
                ends = float((buf["masks"][1:] == 0).sum())
                train_infos["average_episode_rewards"] = float(
                    buf["rewards"].sum() / max(ends, 1.0))
                train_infos["fps"] = int(total / (time.time() - start))
                logging.info("gym episode %d/%d avg_reward %.2f", episode,
                             episodes, train_infos["average_episode_rewards"])
                self.log_info(train_infos, total)
            if episode % cfg.save_interval == 0 or episode == episodes - 1:
                self.save("latest")
        return train_infos

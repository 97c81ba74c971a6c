"""Base runner: policy/trainer/state ownership, checkpointing, logging.

Counterpart of the reference `Runner` (`runner/base_runner.py:15-105`), with
two deliberate upgrades: (1) checkpoints carry optimizer + RNG state (the
reference saves only actor/critic weights); (2) metrics go to a JSONL file
plus, when torch is importable, a tensorboard SummaryWriter - same scalars
the reference logs.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..algorithms.ppo import PPOPolicy, PPOTrainer, TrainState
from ..algorithms.rl_config import RLConfig
from ..utils.checkpoint import load_pytree, save_pytree


class Runner:
    def __init__(self, env, cfg: RLConfig, run_dir: str = "runs/debug",
                 eval_env=None, model_dir: Optional[str] = None,
                 use_tensorboard: bool = False):
        self.env = env
        self.eval_env = eval_env
        self.cfg = cfg
        self.run_dir = run_dir
        self.save_dir = os.path.join(run_dir, "checkpoints")
        os.makedirs(self.save_dir, exist_ok=True)

        self.policy, self.trainer = self._build_policy(env, cfg)

        key = jax.random.PRNGKey(cfg.seed)
        self.key, k_params = jax.random.split(key)
        params = self.policy.init_params(k_params)
        self.train_state: TrainState = self.trainer.init_state(params)
        if model_dir is not None:
            self.restore(model_dir)

        self._log_file = open(os.path.join(run_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(run_dir)
            except Exception:
                pass
        self._t0 = time.time()

    def _build_policy(self, env, cfg: RLConfig):
        """Policy/trainer factory; MAPPO runner overrides this."""
        # envs with a non-Box action space (e.g. the shoot-combat env's
        # ShootTuple) expose `action_space`; Box envs just expose num_actions
        policy = PPOPolicy(cfg, env.num_observation, env.num_actions,
                           act_space=getattr(env, "action_space", None),
                           prior_slots=getattr(env, "shoot_prior_slots",
                                               (11, 13)))
        return policy, PPOTrainer(cfg, policy)

    # ---- training hooks (subclasses implement collect/run) ----
    def next_key(self) -> jax.Array:
        self.key, k = jax.random.split(self.key)
        return k

    def train(self, batch) -> Dict[str, float]:
        self.train_state, metrics = self.trainer.train(
            self.train_state, batch, self.next_key())
        return {k: float(v) for k, v in metrics.items()}

    # ---- persistence ----
    def _extra_state(self) -> Dict:
        """Subclass hook: extra host-side state to ride along in the
        checkpoint (e.g. the selfplay runner's pool ELO ratings)."""
        return {}

    def save(self, tag: str = "latest") -> str:
        path = os.path.join(self.save_dir, f"state_{tag}.pkl")
        save_pytree(path, {"train_state": self.train_state, "key": self.key,
                           **self._extra_state()})
        return path

    def restore(self, path: str) -> None:
        if os.path.isdir(path):
            path = os.path.join(path, "checkpoints", "state_latest.pkl")
        blob = load_pytree(path)
        if "train_state" not in blob:
            # Actor-only checkpoint (a pool actor_k.pkl or a committed
            # results/*/policy_checkpoint.pkl): graft the actor subtree onto
            # the freshly-initialized params and rebuild optimizer state.
            # Critic/opt restart from scratch - the value function relearns
            # quickly against a fixed policy; step restarts at 0 (callers
            # track cumulative budget across legs themselves).
            actor = jax.tree_util.tree_map(jnp.asarray, blob)
            want = jax.tree_util.tree_structure(
                self.train_state.params["actor"])
            got = jax.tree_util.tree_structure(actor)
            if want != got:
                raise ValueError(
                    f"actor-only checkpoint {path} does not match this "
                    f"policy's actor structure:\n got {got}\nwant {want}")
            params = dict(self.train_state.params)
            params["actor"] = actor
            self.train_state = self.trainer.init_state(params)
            self._restored_extras = {}
            return
        restored = jax.tree_util.tree_map(jnp.asarray, blob["train_state"])
        self.train_state = TrainState(**{
            f: getattr(restored, f) for f in ("params", "opt_state", "step")})
        self.key = jnp.asarray(blob["key"])
        # stash non-core keys for subclasses; restore() runs during
        # Runner.__init__, before subclass attributes exist, so they pick
        # these up after their own defaults are set
        self._restored_extras = {k: v for k, v in blob.items()
                                 if k not in ("train_state", "key")}

    # ---- logging ----
    def log_info(self, infos: Dict[str, float], total_num_steps: int) -> None:
        rec = {"step": int(total_num_steps),
               "wall_s": round(time.time() - self._t0, 2), **infos}
        self._log_file.write(json.dumps(rec) + "\n")
        self._log_file.flush()
        if self._tb is not None:
            for k, v in infos.items():
                self._tb.add_scalar(k, v, total_num_steps)

    def close(self) -> None:
        self._log_file.close()
        if self._tb is not None:
            self._tb.close()

"""Functional environment core.

The reference's `BaseEnv.step` (`envs/env_base.py:99-109`) mutates member
tensors and auto-resets done rows at the top of each step. Here the whole
environment is a pure function pair:

    reset(key)        -> (EnvState, obs)
    step(state, action) -> (EnvState, StepOutput)

both jit-compiled into single fused XLA programs. Auto-reset is a masked
where-select (the reference already does masked reset, which maps directly).
The state derivative `xdot` is computed ONCE per step and threaded to every
consumer (termination overload check etc.) - the reference recomputes
nlplant in each getter (SURVEY.md S3.1 hot-loop note).

Done-flag semantics (parity): flags accumulate during a step from zero after
auto-reset, so the flags in StepOutput are exactly this step's termination
outputs; `is_done` means "goal reached" (target resample + bonus), `bad_done`
ends the episode, `exceed_time_limit` is truncation.
"""
from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.c172p import C172PModel
from ..models.f16 import F16Model
from ..models.uav import UAVModel
from ..ops.aero import load_aero_weights, select_aero_weights
from ..utils.config import EnvConfig, load_config
from .tasks import TASKS
from .types import EnvState, StepOutput

MODELS = {"F16": F16Model, "UAV": UAVModel, "C172P": C172PModel}


class Env:
    """Config + model + task bound together; all methods are pure."""

    def __init__(self, num_envs: int, config: str | EnvConfig = "heading",
                 task: str = "heading", model: str = "F16",
                 aero_backend: str = "auto"):
        self.config = config if isinstance(config, EnvConfig) else load_config(config)
        self.num_envs = num_envs
        self.num_agents = self.config.num_agents
        self.n = self.num_envs * self.num_agents
        weights = None
        if model == "F16":
            # 'auto' uses the fused Pallas aero kernel on TPU backends
            # (ops/aero_pallas.py); 'stacked' is the portable XLA path.
            weights = select_aero_weights(load_aero_weights(), aero_backend)
        self.model = MODELS[model](self.config, weights)
        self.task = TASKS[task](self.config)
        # Fused post-step task kernel (obs+terminations+reward in one
        # Pallas pass, ops/task_pallas.py): TPU aero backend + F16 + a
        # control task. Equivalent to the XLA path by construction
        # (tests/test_task_pallas.py); disable via config.
        self._task_kernel = (
            model == "F16"
            and type(weights).__name__ in ("GroupedAeroWeightsT",
                                           "DistilledAeroWeightsT")
            and getattr(self.task, "kernel_variant", None) is not None
            and self.config.fused_task_kernel
            # the fused step kernel integrates with Euler only
            # (ops/step_pallas.py); rk4 scenarios take the XLA path
            and self.config.solver == "euler"
            and self.config.reuse_step_xdot)

    # --- properties mirroring the reference env API ---
    @property
    def num_observation(self) -> int:
        return self.task.num_observation

    @property
    def num_actions(self) -> int:
        return self.task.num_actions

    def init_state(self, key: jax.Array) -> EnvState:
        """All-done initial state; the first (auto-)reset re-inits every row."""
        n = self.n
        ones = jnp.ones(n, dtype=bool)
        return EnvState(
            model=self.model.init_state(n),
            task=self.task.init_state(n),
            step_count=jnp.zeros(n, dtype=jnp.int32),
            is_done=ones, bad_done=ones, exceed_time_limit=ones,
            key=key,
        )

    def _masked_reset(self, state: EnvState) -> EnvState:
        """Re-init rows whose any done flag is set; zero flags and counters."""
        mask = state.is_done | state.bad_done | state.exceed_time_limit
        key, k_model, k_task = jax.random.split(state.key, 3)
        mstate = self.model.reset(state.model, mask, k_model)
        tstate = self.task.reset(self.model, mstate, state.task, mask, k_task)
        zeros = jnp.zeros_like(state.is_done)
        return EnvState(
            model=mstate, task=tstate,
            step_count=jnp.where(mask, 0, state.step_count),
            is_done=zeros, bad_done=zeros, exceed_time_limit=zeros,
            key=key,
        )

    @functools.partial(jax.jit, static_argnums=0)
    def reset(self, key: jax.Array) -> Tuple[EnvState, jnp.ndarray]:
        state = self._masked_reset(self.init_state(key))
        key, k_obs = jax.random.split(state.key)
        state = state.replace(key=key)
        obs = self.task.get_obs(self.model, state.model, state.task, k_obs)
        if self._task_kernel:
            # fused-step envs carry model state in the kernel's native
            # feature-major padded layout (models/f16.py F16StateFM) so the
            # step kernel's outputs feed the next step with zero re-layout
            from ..models.f16 import to_fm
            state = state.replace(model=to_fm(state.model))
        return state, obs

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def step(self, state: EnvState, action: jnp.ndarray
             ) -> Tuple[EnvState, StepOutput]:
        """One env step. NOTE: the input `state` is donated on accelerator
        backends (its buffers are reused for the new state - ~0.2 ms of
        copies saved at n=10^6); don't reuse it after calling step."""
        if self._task_kernel:
            return self._step_fused(state, action)
        # 1. auto-reset rows finished on the previous step
        state = self._masked_reset(state)
        # 2. advance dynamics
        if self.config.reuse_step_xdot:
            # the integrator's own f(s, u) serves the overload/accel checks:
            # "acceleration experienced during the step" instead of a second
            # full dynamics evaluation at the post-step state (the single
            # most expensive computation; exact semantics restorable via
            # reuse_step_xdot: false)
            mstate, xdot = self.model.update_with_xdot(state.model, action)
        else:
            mstate = self.model.update(state.model, action)
        step_count = state.step_count + 1
        # 3. observation (with sensor noise)
        key, k_obs = jax.random.split(state.key)
        obs = self.task.get_obs(self.model, mstate, state.task, k_obs)
        # 4. terminations - xdot computed once, shared by all consumers
        if not self.config.reuse_step_xdot:
            xdot = self.model.extended_state(mstate)
        done, bad, exceed, info = self.task.get_termination(
            self.model, mstate, xdot, step_count, state.task)
        # 5. reward (event-driven part consumes this step's flags)
        reward = self.task.get_reward(self.model, mstate, state.task, done, bad)
        new_state = EnvState(
            model=mstate, task=state.task, step_count=step_count,
            is_done=done, bad_done=bad, exceed_time_limit=exceed, key=key,
        )
        out = StepOutput(obs=obs, reward=reward, done=done, bad_done=bad,
                         exceed_time_limit=exceed, info=info)
        return new_state, out

    def _step_fused(self, state: EnvState, action: jnp.ndarray
                    ) -> Tuple[EnvState, StepOutput]:
        """TPU fast path: the ENTIRE step (masked reset select, actuator
        lag, dynamics, Euler, obs/terminations/reward - plus, when
        kernel_reset_draws/kernel_obs_noise are on, the init uniforms,
        target resample and sensor noise from the hardware PRNG) runs in
        one Pallas kernel (ops/step_pallas.py); XLA keeps only [n]-vector
        flag/step-count glue and the [24,n]->[n,22] obs transpose.

        Semantics equal the portable step (same select lattice, same
        distributions; tests/test_step_pallas.py pins bit-equality with
        kernel_reset_draws/kernel_obs_noise off, and
        tools/validate_kernel_draws.py / validate_kernel_noise.py validate
        the hardware-PRNG paths on TPU), with ONE structural deviation:
        `recent_s`/`recent_u` are not carried by the feature-major state
        (models/f16.py F16StateFM note). Nothing on the control-task path
        consumes recent_*; combat (the consumer, for rollback) uses its
        own step."""
        from ..models.f16 import F16StateFM, to_fm
        from ..ops.step_pallas import env_step_pallas
        from ..ops.task_pallas import COND_NAMES
        from .tasks.base import add_sensor_noise

        cfg = self.config
        mask = state.is_done | state.bad_done | state.exceed_time_limit
        key, k_model, k_task = jax.random.split(state.key, 3)
        n = self.n
        kernel_noise = cfg.noise_scale > 0 and cfg.kernel_obs_noise
        kernel_draws = cfg.kernel_reset_draws
        # key splits are identical on every path so streams stay in lockstep
        key, k_obs = jax.random.split(key)
        if kernel_draws:
            # init uniforms + target resample drawn in-kernel from the TPU
            # hardware PRNG (EnvConfig.kernel_reset_draws); pass the
            # PRE-resample targets, take the resampled ones back
            alt_init = vt_init = None
            targets_in = self.task.kernel_targets(state.task)
        else:
            k_alt, k_vt = jax.random.split(k_model)
            alt_init = jax.random.uniform(k_alt, (n,), minval=cfg.min_altitude,
                                          maxval=cfg.max_altitude)
            vt_init = jax.random.uniform(k_vt, (n,), minval=cfg.min_vt,
                                         maxval=cfg.max_vt)
            tstate = self.task.reset_from_init(state.task, mask, alt_init,
                                               vt_init, k_task)
            targets_in = self.task.kernel_targets(tstate)
        step_count = jnp.where(mask, 0, state.step_count) + 1

        a = action
        if a.shape[1] < 4:  # narrow action spaces (e.g. tracking's 3)
            a = jnp.concatenate(
                [a, jnp.zeros((a.shape[0], 4 - a.shape[1]), a.dtype)], axis=1)
        # sensor noise: in-kernel via the TPU hardware PRNG when enabled
        # (saves a full [n,22] XLA pass; same N(0, noise_scale) distribution,
        # different stream - see EnvConfig.kernel_obs_noise)
        seed = None
        if kernel_noise or kernel_draws:
            # seed from k_task when it's otherwise unused (kernel_draws) so
            # k_obs stays free for the XLA noise fallback; k_obs otherwise
            k_seed = k_task if kernel_draws else k_obs
            seed = jax.random.randint(k_seed, (2,), 0,
                                      jnp.iinfo(jnp.int32).max,
                                      dtype=jnp.int32)
        fm = to_fm(state.model)  # no-op when already feature-major
        outs = env_step_pallas(
            self.task.kernel_variant, cfg, self.model.weights,
            fm.sf, fm.uf, a[:, :4], mask, alt_init, vt_init,
            targets_in, step_count,
            noise_seed=seed,
            noise_scale=float(cfg.noise_scale) if kernel_noise else 0.0,
            reset_draws=kernel_draws)
        sf_new, uf_new, obs_nl, done, bad, reward, counts = outs[:7]
        if kernel_draws:
            tstate = self.task.state_from_kernel_targets(*outs[7:10])

        obs = (obs_nl if kernel_noise
               else add_sensor_noise(obs_nl, k_obs, cfg.noise_scale))
        exceed = jnp.zeros_like(done)
        info = {f"termination/{nm}": counts[i].astype(jnp.int32)
                for i, nm in enumerate(COND_NAMES[self.task.kernel_variant])}
        # recent_* is not carried in F16StateFM: any passthrough of a donated
        # buffer costs a full copy per step (models/f16.py note)
        mstate = F16StateFM(sf=sf_new, uf=uf_new)
        new_state = EnvState(
            model=mstate, task=tstate, step_count=step_count,
            is_done=done, bad_done=bad, exceed_time_limit=exceed, key=key,
        )
        out = StepOutput(obs=obs, reward=reward, done=done, bad_done=bad,
                         exceed_time_limit=exceed, info=info)
        return new_state, out


class ControlEnv(Env):
    """Single-agent control env factory: model in {F16, UAV, C172P}, task in
    {heading, control, tracking} (parity: `envs/control_env.py:12-35`)."""

    def __init__(self, num_envs: int = 10, config: str | EnvConfig = "heading",
                 model: str = "F16", aero_backend: str = "auto",
                 task: Optional[str] = None):
        if task is None:
            if not isinstance(config, str):
                raise ValueError(
                    "ControlEnv(config=<EnvConfig>) needs an explicit task=; "
                    "the task can only be inferred from a scenario name")
            # scenario files are named <task>[_<variant>].yaml (e.g.
            # heading_c172p); the task is the leading token of the stem,
            # also for path-style configs ('/tmp/control_lowalt.yaml')
            stem = os.path.splitext(os.path.basename(config))[0]
            task = stem.split("_")[0]
        if task not in TASKS:
            raise ValueError(f"cannot infer task from scenario {config!r} "
                             f"(got {task!r}); pass task= explicitly, one of "
                             f"{sorted(TASKS)}")
        super().__init__(num_envs, config=config, task=task, model=model,
                         aero_backend=aero_backend)

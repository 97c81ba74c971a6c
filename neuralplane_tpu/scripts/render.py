"""Render / evaluation CLI: deterministic rollouts -> ACMI + npy + metrics.

Covers the reference's render scripts (SURVEY.md S2 S6):
  --mode ppo      render_ppo.py        - trained policy on a control env
  --mode pid      render_control.py    - PID/TECS/L1 controller instead
  --mode combat   render_singlecombat.py - two policies 1v1, blood printout
  --mode planning - hierarchical: high-level tracking policy + frozen
                    low-level control actor (the reference has no planning
                    render script; render_ppo.py only covers ControlEnv)

Outputs: <out>/result/*.npy channel buffers, <out>/recording.txt.acmi,
success-rate + evaluate_result metrics printed (render_ppo.py:188-191,
evaluate_result.py:31-53).
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..algorithms.pid import Controller, flight_data
from ..algorithms.ppo import PPOPolicy
from ..algorithms.rl_config import RLConfig
from ..envs import (ControlEnv, MultipleCombatEnv, PlanningEnv,
                    SingleCombatEnv)
from ..render import ACMIWriter, TrajectoryRecorder, evaluate_metrics, \
    plot_result
from ..utils.checkpoint import load_pytree


def _load_actor_params(policy: PPOPolicy, path: str) -> dict:
    blob = load_pytree(path)
    if isinstance(blob, dict) and "train_state" in blob:
        params = blob["train_state"].params
    elif isinstance(blob, dict) and "actor" in blob:
        params = blob
    else:
        params = {"actor": blob}
    return jax.tree_util.tree_map(jnp.asarray, params)


def render_control(args) -> None:
    planning = args.mode == "planning"
    if planning:
        low = None
        if args.low_level_ckpt:
            blob = load_pytree(args.low_level_ckpt)
            if isinstance(blob, dict) and "train_state" in blob:
                low = blob["train_state"].params["actor"]
            elif isinstance(blob, dict) and "actor" in blob:
                low = blob["actor"]
            else:
                low = blob
        env = PlanningEnv(num_envs=args.num_envs, config=args.scenario,
                          low_level_params=low)
    else:
        env = ControlEnv(num_envs=args.num_envs, config=args.scenario,
                         model=args.model_name)
    cfg = RLConfig()
    policy = PPOPolicy(cfg, env.num_observation, env.num_actions)
    if args.mode in ("ppo", "planning"):
        params = (_load_actor_params(policy, args.checkpoint)
                  if args.checkpoint else
                  policy.init_params(jax.random.PRNGKey(0)))
    controller = Controller(dt=env.config.dt)
    # one ACMI frame per env step: dt for control, dt*inner for planning
    frame_dt = env.config.dt * (env.low_level_steps if planning else 1)

    state, obs = env.reset(jax.random.PRNGKey(args.seed))
    h, _ = policy.init_rnn_states(env.n)
    cst = controller.init_state(env.n)
    masks = jnp.ones((env.n, 1), jnp.float32)
    rec = TrajectoryRecorder()
    acmi = ACMIWriter(os.path.join(args.out, "recording.txt.acmi"))
    reached, failed, episode_reward = 0, 0, 0.0

    @jax.jit
    def ppo_act(params, obs, h, masks):
        return policy.act(params, obs, h, masks, deterministic=True)

    @jax.jit
    def channels(estate, out):
        """All recorded channels + step stats in ONE program: a single
        device->host pull per frame (the tunnel round-trip dominates)."""
        model, mstate = env.model, estate.model
        xdot = model.extended_state(mstate)
        npos, epos, altitude = model.get_position(mstate)
        roll, pitch, yaw = model.get_posture(mstate)
        el, ail, rud, _ = model.get_control_surface(mstate)
        T = model.get_thrust(mstate)
        out_ch = dict(npos=npos, epos=epos, altitude=altitude, roll=roll,
                   pitch=pitch, yaw=yaw, vt=model.get_vt(mstate),
                   alpha=model.get_AOA(mstate), beta=model.get_AOS(mstate),
                   G=model.get_G(mstate, xdot), T=T,
                   throttle=T * 0.3048 / 82339.0 / 0.225,
                   ail=ail, el=el, rud=rud)
        for name in ("target_altitude", "target_heading", "target_vt",
                     "target_pitch", "target_npos", "target_epos"):
            if hasattr(estate.task, name):
                out_ch[name] = getattr(estate.task, name)
        stats = (out.done.sum(), out.bad_done.sum(), out.reward.mean())
        return {k: v.mean() for k, v in out_ch.items()}, mstate.s[:, :6], stats

    @jax.jit
    def pid_act(cst, state):
        mstate = state.model
        xdot = env.model.extended_state(mstate)
        data = flight_data(env.model, mstate, xdot)
        _, _, alt = env.model.get_position(mstate)
        tstate = state.task
        hdg = getattr(tstate, "target_heading", data.yaw)
        tvt = getattr(tstate, "target_vt", jnp.full((env.n,), 1100.0))
        talt = getattr(tstate, "target_altitude", alt)
        cst2 = controller.update_heading_hold(cst, hdg, data)
        cst2 = controller.cal_pitch_throttle(cst2, talt, tvt, alt, data)
        cst2 = controller.stabilize(cst2, data)
        return cst2, jnp.clip(controller.get_action(cst2), -1.0, 1.0)

    for count in range(args.steps):
        if args.mode in ("ppo", "planning"):
            actions, h = ppo_act(params, obs, h, masks)
        else:  # pid: hold the task targets with the classical stack
            cst, actions = pid_act(cst, state)

        state, out = env.step(state, actions)
        obs = out.obs
        reset = out.done | out.bad_done | out.exceed_time_limit
        masks = 1.0 - out.done.astype(jnp.float32)[:, None]
        h = h * (1.0 - reset.astype(jnp.float32))[:, None, None]

        chans, pose, (n_done, n_bad, rew) = jax.device_get(
            channels(state.env if planning else state, out))
        reached += int(n_done)
        failed += int(n_bad)
        episode_reward += float(rew)
        rec.record(**chans)
        acmi.write_frame(count * frame_dt, pose)

    result_dir = os.path.join(args.out, "result")
    rec.save(result_dir)
    buffers = rec.arrays()
    plot_result(buffers, os.path.join(args.out, "result.png"),
                dt=env.config.dt)
    metrics = evaluate_metrics(buffers)
    total = max(reached + failed, 1)
    metrics.update(episode_reward=episode_reward,
                   reached_target=reached, failed=failed,
                   success_rate=reached / total)
    print(json.dumps(metrics, indent=2))


def _resolve_pool_ckpt(model_dir: str, index: str) -> str:
    """Map a pool index to a checkpoint file: actor_<index>.pkl, falling back
    to state_<index>.pkl (full train-state saves use that prefix)."""
    for name in (f"actor_{index}.pkl", f"state_{index}.pkl"):
        path = os.path.join(model_dir, name)
        if os.path.exists(path):
            return path
    raise FileNotFoundError(
        f"no actor_{index}.pkl or state_{index}.pkl in {model_dir}")


def render_combat(args) -> None:
    # team scenarios (e.g. multiple_selfplay 2v2) use the nvn env; "shoot"
    # scenarios the missile env; the reference's render_singlecombat is
    # 1v1-gun-only - both renders are framework additions on top of it
    if "multiple" in args.scenario and "shoot" in args.scenario:
        from ..envs import MultipleCombatShootEnv
        env_cls = MultipleCombatShootEnv
    elif "multiple" in args.scenario:
        env_cls = MultipleCombatEnv
    elif "shoot" in args.scenario:
        from ..envs import SingleCombatShootEnv
        env_cls = SingleCombatShootEnv
    else:
        env_cls = SingleCombatEnv
    env = env_cls(num_envs=1, config=args.scenario)
    half = env.num_agents // 2
    cfg = RLConfig()
    policy = PPOPolicy(cfg, env.num_observation, env.num_actions,
                       act_space=getattr(env, "action_space", None),
                       prior_slots=getattr(env, "shoot_prior_slots",
                                           (11, 13)))
    ego = (_load_actor_params(policy, args.checkpoint) if args.checkpoint
           else policy.init_params(jax.random.PRNGKey(0)))
    enm = (_load_actor_params(policy, args.opponent) if args.opponent else ego)

    state, obs = env.reset(jax.random.PRNGKey(args.seed))
    h_e, _ = policy.init_rnn_states(half)
    h_o, _ = policy.init_rnn_states(half)
    ones = jnp.ones((half, 1), jnp.float32)
    acmi = ACMIWriter(os.path.join(args.out, "recording.txt.acmi"))
    colors = ["Red"] * half + ["Blue"] * half
    prev_active = None
    launches = hits = 0

    key = jax.random.PRNGKey(args.seed + 1)
    det = not getattr(args, "stochastic", False)
    for count in range(args.steps):
        key, k1, k2 = jax.random.split(key, 3)
        a_e, h_e = policy.act(ego, obs[:half], h_e, ones, key=k1,
                              deterministic=det)
        a_o, h_o = policy.act(enm, obs[half:], h_o, ones, key=k2,
                              deterministic=det)
        state, out = env.step(state, jnp.concatenate([a_e, a_o], axis=0))
        obs = out.obs
        s = np.asarray(state.model.s)
        t = count * env.config.dt * env.inner_steps
        acmi.write_frame(t, s[:, :6], colors=colors)
        mis = getattr(state, "missiles", None)
        if mis is not None:
            launches += int(out.info["shoot/launches"])
            hits += int(out.info["shoot/hits"])
            active = np.asarray(mis.active)            # [n, K]
            pos = np.asarray(mis.pos)
            vel = np.asarray(mis.vel)
            k = active.shape[1]
            for i, j in zip(*np.nonzero(active)):
                yaw = np.arctan2(vel[i, j, 1], vel[i, j, 0])
                pitch = np.arctan2(vel[i, j, 2],
                                   np.hypot(vel[i, j, 0], vel[i, j, 1]))
                acmi.write_object(
                    1000 + i * k + int(j),
                    np.concatenate([pos[i, j], [0.0, pitch, yaw]]),
                    name="AAM", color=colors[i])
            if prev_active is not None:
                for i, j in zip(*np.nonzero(prev_active & ~active)):
                    acmi.remove_object(1000 + i * k + int(j))
            prev_active = active
        if bool((out.done | out.bad_done).any()):
            break
    rec = {"steps": count + 1, "blood": np.asarray(state.blood).tolist()}
    if prev_active is not None:
        rec.update(launches=launches, hits=hits,
                   ammo=np.asarray(state.ammo).tolist())
    print(json.dumps(rec))


def main(argv=None) -> None:
    p = argparse.ArgumentParser("neuralplane_tpu.render")
    p.add_argument("--mode", default="ppo",
                   choices=["ppo", "pid", "combat", "planning"])
    p.add_argument("--scenario", default=None,
                   help="defaults to 'heading' (ppo/pid), 'selfplay' (combat) "
                   "or 'tracking' (planning)")
    p.add_argument("--checkpoint", default=None,
                   help="state_*.pkl or actor_*.pkl from a training run")
    p.add_argument("--opponent", default=None, help="combat: enemy actor ckpt")
    p.add_argument("--model-dir", default=None,
                   help="run checkpoint dir; combined with --render-index/"
                   "--render-opponent-index to pick pool entries "
                   "(config.py:284-285)")
    p.add_argument("--render-index", default="latest",
                   help="ego policy index in --model-dir's pool "
                   "(actor_<index>.pkl; 'latest' -> state_latest.pkl)")
    p.add_argument("--render-opponent-index", default="latest",
                   help="opponent policy index in --model-dir's pool")
    p.add_argument("--low-level-ckpt", default=None,
                   help="planning: trained control-task actor checkpoint")
    p.add_argument("--model-name", default="F16",
                   choices=["F16", "UAV", "C172P"],
                   help="vehicle model for ppo/pid modes (train CLI parity)")
    p.add_argument("--num-envs", type=int, default=1)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--stochastic", action="store_true",
                   help="combat mode: SAMPLE both policies instead of the "
                   "deterministic reference protocol - the behavioral "
                   "matchup self-play actually trains (a deterministic "
                   "missile duel between posture-fighters may never fire)")
    p.add_argument("--out", default="render_out")
    from ..utils.cache import enable_persistent_cache
    enable_persistent_cache()
    args = p.parse_args(argv)
    if args.model_dir:
        # reference --render-index/--render-opponent-index semantics
        # (config.py:284-285): resolve pool entries inside the run dir;
        # explicit --checkpoint/--opponent paths take precedence
        args.checkpoint = args.checkpoint or _resolve_pool_ckpt(
            args.model_dir, args.render_index)
        args.opponent = args.opponent or _resolve_pool_ckpt(
            args.model_dir, args.render_opponent_index)
    os.makedirs(args.out, exist_ok=True)
    if args.mode == "combat":
        args.scenario = args.scenario or "selfplay"
        render_combat(args)
    else:
        args.scenario = args.scenario or (
            "tracking" if args.mode == "planning" else "heading")
        render_control(args)


if __name__ == "__main__":
    main()

"""Wipe-event ELO eval scoring (RLConfig.eval_event_scoring).

The banded mean-reward W/T/L protocol (reference
`selfplay_F16sim_runner.py:218-241`) is near-silent on team combat:
latest_elo stayed at init through a full 1e9-step 2v2 run
(results/mappo_2v2_evadable). Event scoring replaces the band with
decisive team-wipe outcomes from StepOutput.active and feeds ELO the
fractional score (wins + ties/2) / episodes.
"""
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralplane_tpu.algorithms.rl_config import RLConfig
from neuralplane_tpu.algorithms.selfplay import elo_update_scored
from neuralplane_tpu.envs.types import StepOutput
from neuralplane_tpu.runner import SelfplayRunner
from neuralplane_tpu.runner.selfplay import SelfplayCarry


def test_elo_update_scored_math():
    # equal ratings, all-win score -> ego gains K/2, zero-sum exchange
    ego, opp = elo_update_scored(1000.0, np.array([1000.0]), np.array([1.0]))
    assert ego == pytest.approx(1016.0)
    assert opp[0] == pytest.approx(984.0)
    # all-tie score at equal ratings -> unchanged
    ego, opp = elo_update_scored(1000.0, np.array([1000.0]), np.array([0.5]))
    assert ego == pytest.approx(1000.0)
    assert opp[0] == pytest.approx(1000.0)
    # fractional surplus moves the rating proportionally
    ego, _ = elo_update_scored(1000.0, np.array([1000.0]), np.array([0.55]))
    assert ego == pytest.approx(1001.6)


class _StubTeamEnv:
    """Deterministic 1v1-layout team env: every 3rd step the ego side
    wipes the enemy (enemy inactive, ego done). Rewards are rigged so the
    banded protocol would see a huge ego surplus every step - event
    scoring must ignore them and count the wipes."""

    num_envs = 4
    num_agents = 2
    num_observation = 6
    num_actions = 2

    def __init__(self):
        self.config = types.SimpleNamespace(max_steps=12)
        self.n = self.num_envs * self.num_agents

    def reset(self, key):
        return jnp.zeros((), jnp.int32), jnp.zeros(
            (self.n, self.num_observation), jnp.float32)

    def step(self, state, action):
        count = state + 1
        wipe = (count % 3) == 0
        is_ego = (jnp.arange(self.n) % self.num_agents) == 0
        done = jnp.where(wipe, is_ego, False)
        z = jnp.zeros(self.n, bool)
        active = jnp.where(wipe & ~is_ego, 0.0, 1.0)
        obs = jnp.zeros((self.n, self.num_observation), jnp.float32)
        reward = jnp.where(is_ego, 100.0, 0.0)  # band bait
        return count, StepOutput(obs=obs, reward=reward, done=done,
                                 bad_done=z, exceed_time_limit=z, info={},
                                 active=active)


def _runner(tmp_path, **cfg_kw):
    cfg = RLConfig(buffer_size=4, data_chunk_length=4, ppo_epoch=1,
                   num_mini_batch=1, hidden_sizes=(8,), act_hidden_sizes=(8,),
                   recurrent_hidden_size=8, n_choose_opponents=1,
                   save_interval=100, log_interval=1, elo_tie_band=50.0,
                   **cfg_kw)
    return SelfplayRunner(_StubTeamEnv(), cfg, run_dir=str(tmp_path))


def test_event_scoring_counts_wipes_and_moves_elo(tmp_path):
    runner = _runner(tmp_path, eval_event_scoring=True)
    out = runner.eval_elo(num_steps=9)
    # 3 wipes per env x 4 envs = 12 decisive wins, no losses
    assert out["eval_wins"] == 12.0
    assert out["eval_losses"] == 0.0
    assert out["eval_episodes_ended"] == 12.0
    # all-win fractional score vs an equal-rated opponent: +K/2
    assert out["latest_elo"] == pytest.approx(1016.0)


def test_event_scoring_ignores_reward_band(tmp_path):
    """Same match under the banded protocol: the rigged +100/step ego
    reward makes every episode a banded 'win' too - but with NO wipes
    (active all ones) event scoring must report all ties while the
    banded protocol would still claim a win."""

    class NoWipeEnv(_StubTeamEnv):
        def step(self, state, action):
            count, out = super().step(state, action)
            return count, out.replace(
                active=jnp.ones(self.n, jnp.float32))

    cfg = RLConfig(buffer_size=4, data_chunk_length=4, ppo_epoch=1,
                   num_mini_batch=1, hidden_sizes=(8,), act_hidden_sizes=(8,),
                   recurrent_hidden_size=8, n_choose_opponents=1,
                   save_interval=100, log_interval=1, elo_tie_band=50.0,
                   eval_event_scoring=True)
    runner = SelfplayRunner(NoWipeEnv(), cfg, run_dir=str(tmp_path))
    out = runner.eval_elo(num_steps=9)
    assert out["eval_wins"] == 0.0 and out["eval_losses"] == 0.0
    assert out["eval_episodes_ended"] == 12.0
    assert out["latest_elo"] == pytest.approx(1000.0)  # all ties


def test_event_scoring_requires_active(tmp_path):
    """A non-team env (StepOutput.active is None) must fail loudly."""

    class NoActiveEnv(_StubTeamEnv):
        def step(self, state, action):
            count, out = super().step(state, action)
            return count, out.replace(active=None)

    cfg = RLConfig(buffer_size=4, data_chunk_length=4, ppo_epoch=1,
                   num_mini_batch=1, hidden_sizes=(8,), act_hidden_sizes=(8,),
                   recurrent_hidden_size=8, n_choose_opponents=1,
                   save_interval=100, log_interval=1,
                   eval_event_scoring=True)
    runner = SelfplayRunner(NoActiveEnv(), cfg, run_dir=str(tmp_path))
    with pytest.raises(ValueError, match="eval_event_scoring"):
        runner.eval_elo(num_steps=3)


def test_event_scoring_on_real_team_env(tmp_path):
    """Integration: the event-scoring eval program compiles and runs on
    the real 2v2 team env under the MAPPO runner (short horizon -> no
    completed episodes -> all-tie, rating unchanged, zero events)."""
    from neuralplane_tpu.envs import MultipleCombatEnv
    from neuralplane_tpu.runner import MAPPOSelfplayRunner

    cfg = RLConfig(buffer_size=4, data_chunk_length=4, ppo_epoch=1,
                   num_mini_batch=1, hidden_sizes=(16,), act_hidden_sizes=(8,),
                   recurrent_hidden_size=8, n_choose_opponents=1,
                   save_interval=100, log_interval=1,
                   eval_stochastic=True, eval_event_scoring=True)
    env = MultipleCombatEnv(num_envs=2)
    runner = MAPPOSelfplayRunner(env, cfg, run_dir=str(tmp_path))
    out = runner.eval_elo(num_steps=4)
    assert out["eval_wins"] == 0.0 and out["eval_losses"] == 0.0
    assert out["latest_elo"] == pytest.approx(1000.0)

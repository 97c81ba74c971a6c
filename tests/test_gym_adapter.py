"""Generic gym-adapter runner test with a toy host-stepped env."""
import numpy as np

from neuralplane_tpu.algorithms.rl_config import RLConfig
from neuralplane_tpu.runner.gym_adapter import GymRunner


class _Space:
    def __init__(self, shape):
        self.shape = shape


class ToyEnv:
    """Point-mass chase: reward = -|x - target|; 4-tuple gym API."""

    observation_space = _Space((3,))
    action_space = _Space((1,))

    def __init__(self, seed=0):
        self.rng = np.random.default_rng(seed)
        self.t = 0

    def reset(self):
        self.x = self.rng.uniform(-1, 1)
        self.target = self.rng.uniform(-1, 1)
        self.t = 0
        return self._obs()

    def _obs(self):
        return np.array([self.x, self.target, self.target - self.x],
                        np.float32)

    def step(self, action):
        self.x += 0.1 * float(np.clip(action[0], -1, 1))
        self.t += 1
        reward = -abs(self.x - self.target)
        done = self.t >= 20
        return self._obs(), reward, done, {
            "TimeLimit.truncated": done}


def test_gym_runner_trains(tmp_path):
    cfg = RLConfig(buffer_size=20, data_chunk_length=5, ppo_epoch=4,
                   num_mini_batch=1, hidden_sizes=(16,), act_hidden_sizes=(),
                   recurrent_hidden_size=8, num_env_steps=20 * 8 * 25,
                   log_interval=1, save_interval=1000, lr=5e-3)
    envs = [ToyEnv(seed=i) for i in range(8)]
    runner = GymRunner(envs, cfg, run_dir=str(tmp_path))
    infos = runner.run()
    assert np.isfinite(infos["policy_loss"])
    assert np.isfinite(infos["average_episode_rewards"])

    # PPO must actually LEARN the chase task: late episodes beat early ones
    import json
    recs = [json.loads(l) for l in open(f"{tmp_path}/metrics.jsonl")]
    rew = [r["average_episode_rewards"] for r in recs]
    early, late = np.mean(rew[:3]), np.mean(rew[-3:])
    assert late > early + 0.5, f"no learning: {early:.2f} -> {late:.2f}"

from .rl_config import RLConfig
from .ppo import PPOPolicy, PPOTrainer, TrainState, RolloutBatch

__all__ = ["RLConfig", "PPOPolicy", "PPOTrainer", "TrainState", "RolloutBatch"]

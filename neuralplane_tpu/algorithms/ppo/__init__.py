from .buffer import RolloutBatch, compute_returns, compute_advantages, make_chunks
from .policy import PPOPolicy
from .trainer import PPOTrainer, TrainState

__all__ = ["RolloutBatch", "compute_returns", "compute_advantages",
           "make_chunks", "PPOPolicy", "PPOTrainer", "TrainState"]

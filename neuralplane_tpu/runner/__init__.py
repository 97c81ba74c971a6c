from .base import Runner
from .f16sim import F16SimRunner, RolloutCarry
from .gym_adapter import GymEnvAdapter, GymRunner
from .mappo import MAPPOSelfplayRunner
from .selfplay import SelfplayCarry, SelfplayRunner

__all__ = ["Runner", "F16SimRunner", "RolloutCarry", "SelfplayCarry",
           "SelfplayRunner", "MAPPOSelfplayRunner", "GymRunner", "GymEnvAdapter"]

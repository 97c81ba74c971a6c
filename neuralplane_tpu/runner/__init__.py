from .base import Runner
from .f16sim import F16SimRunner, RolloutCarry
from .mappo import MAPPOSelfplayRunner
from .selfplay import SelfplayCarry, SelfplayRunner

__all__ = ["Runner", "F16SimRunner", "RolloutCarry", "SelfplayCarry",
           "SelfplayRunner", "MAPPOSelfplayRunner"]

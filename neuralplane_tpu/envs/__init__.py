from .base import Env, ControlEnv
from .planning import PlanningEnv, PlanningState
from .combat import CombatState, MultipleCombatEnv, SingleCombatEnv
from .combat_shoot import (MultipleCombatShootEnv, ShootCombatState,
                           SingleCombatShootEnv, TeamShootCombatState)
from .types import EnvState, StepOutput
from .wrappers import GymVecEnv, make_control_vec_env

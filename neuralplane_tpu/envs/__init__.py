from .base import Env, ControlEnv
from .types import EnvState, StepOutput
from .wrappers import GymVecEnv, make_control_vec_env

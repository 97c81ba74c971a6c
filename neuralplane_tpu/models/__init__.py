from .c172p import C172PModel
from .f16 import F16Model, F16State
from .uav import UAVModel

from .f16 import F16Model, F16State
from .uav import UAVModel

from .math import wrap_PI, wrap_2PI
from .config import EnvConfig, load_config

from .config import Config
from .logmath import LogMath

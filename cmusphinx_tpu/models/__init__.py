from .mdef import Mdef
from .tmat import TransitionMatrices
from .gauden import GaussianParams
from .sendump import read_sendump, read_mixture_weights

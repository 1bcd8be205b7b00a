from .gmm import SemiContinuousScorer, ContinuousScorer, PTMScorer, density_logliks
from .hmm import hmm_step, hmm_init_state

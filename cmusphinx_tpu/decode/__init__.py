from .fsg_search import FsgSearch, Hypothesis, Segment
from .ngram_search import NgramSearch

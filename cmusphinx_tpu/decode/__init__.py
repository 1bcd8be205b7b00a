from .fsg_search import FsgSearch

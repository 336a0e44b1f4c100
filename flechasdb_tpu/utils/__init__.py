"""Host-side utilities with reference-parity semantics."""

from .distribution import WeightedIndex
from .nbest import NBestByKey, n_best_by_key
from .profiling import annotate, trace

__all__ = ["NBestByKey", "WeightedIndex", "annotate",
           "n_best_by_key", "trace"]

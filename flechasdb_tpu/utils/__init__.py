"""Host-side utilities with reference-parity semantics."""

from .distribution import WeightedIndex
from .nbest import NBestByKey, n_best_by_key

__all__ = ["NBestByKey", "WeightedIndex", "n_best_by_key"]

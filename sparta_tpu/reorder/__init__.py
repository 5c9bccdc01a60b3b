from .algos import (
    BlockingStats,
    fixed_blocking,
    greedy_blocking,
    hash_greedy_blocking,
    scramble_blocking,
    structured_blocking,
)
from .distances import distance_pair, distance_pattern_vs_rows
from .engine import BlockingEngine
from .signatures import block_signatures, popcount

__all__ = [
    "BlockingEngine",
    "BlockingStats",
    "block_signatures",
    "distance_pair",
    "distance_pattern_vs_rows",
    "fixed_blocking",
    "greedy_blocking",
    "hash_greedy_blocking",
    "popcount",
    "scramble_blocking",
    "structured_blocking",
]

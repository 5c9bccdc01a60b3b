"""Blocking-artifact cache: reorder once per (matrix, config), reuse across
sweeps (the reference persists groupings as .g files and reloads them,
utilities.cpp:239-243 / Matrix_Analysis.cpp:10-32; this is the
config-hash-keyed npz upgrade promised in SURVEY §5)."""
from __future__ import annotations

import hashlib
from pathlib import Path

import numpy as np

from ..formats.csr import CSR
from ..reorder import BlockingEngine


def matrix_fingerprint(cmat: CSR) -> str:
    h = hashlib.sha1()
    h.update(np.ascontiguousarray(cmat.indptr).tobytes())
    h.update(np.ascontiguousarray(cmat.indices).tobytes())
    h.update(str(cmat.shape).encode())
    return h.hexdigest()[:16]


def engine_fingerprint(eng: BlockingEngine) -> str:
    key = (
        f"{eng.tau}|{eng.col_block_size}|{eng.row_block_size}|"
        f"{int(eng.blocking_algo)}|{int(eng.sim_measure)}|{eng.use_groups}|"
        f"{eng.use_pattern}|{eng.force_fixed_size}|{eng.structured_m}|"
        f"{eng.structured_n}"
    )
    return hashlib.sha1(key.encode()).hexdigest()[:16]


def cached_grouping(
    cmat: CSR, eng: BlockingEngine, cache_dir: str | Path
) -> np.ndarray:
    """Return the engine's grouping, loading from/storing to the cache.
    Stats (counters/timers) are restored from the cache on hit."""
    cache_dir = Path(cache_dir)
    cache_dir.mkdir(parents=True, exist_ok=True)
    path = cache_dir / f"blocking_{matrix_fingerprint(cmat)}_{engine_fingerprint(eng)}.npz"
    if path.exists():
        z = np.load(path)
        eng.grouping_result = z["grouping"]
        eng.comparison_counter = int(z["comparisons"])
        eng.merge_counter = int(z["merges"])
        eng.timer_total = float(z["timer_total"])
        return eng.grouping_result
    grouping = eng.get_grouping(cmat)
    np.savez_compressed(
        path,
        grouping=grouping,
        comparisons=eng.comparison_counter,
        merges=eng.merge_counter,
        timer_total=eng.timer_total,
    )
    return grouping

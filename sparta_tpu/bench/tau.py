"""Tau selection: sweep the merge threshold, keep the blocking that
minimizes the nonzero-block count.

Reference equivalents: reorder_matrix.cpp:17-34 (sweep tau 0.9..0.01,
pick min VBR_nzblocks_count) and collect_taus.py (tau=-1 sentinel when no
reordering beats natural blocking).
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..definitions import BlockingType
from ..formats.csr import CSR
from ..reorder import BlockingEngine

DEFAULT_TAUS = (0.9, 0.7, 0.5, 0.3, 0.2, 0.1, 0.05, 0.01)


@dataclasses.dataclass
class TauSearchResult:
    best_tau: float          # -1.0 when natural blocking wins (sentinel)
    grouping: np.ndarray | None
    nzblocks: int
    natural_nzblocks: int
    per_tau: dict            # tau -> VBR_nzblocks_count
    per_tau_stats: dict = dataclasses.field(default_factory=dict)
    # tau -> the full 4-stat dict from collect_blocking_info (tau curves)


def search_tau(
    cmat: CSR,
    col_block_size: int,
    row_block_size: int,
    blocking_algo: BlockingType = BlockingType.iterative_clocked,
    taus=DEFAULT_TAUS,
    force_fixed_size: bool = True,
    **engine_kw,
) -> TauSearchResult:
    natural = BlockingEngine(
        col_block_size=col_block_size, row_block_size=row_block_size,
        blocking_algo=BlockingType.fixed_size,
    )
    natural.get_grouping(cmat)
    natural.collect_blocking_info(cmat)

    best = (natural.VBR_nzblocks_count, -1.0, None)
    per_tau = {}
    per_tau_stats = {}
    for tau in taus:
        eng = BlockingEngine(
            tau=tau, col_block_size=col_block_size, row_block_size=row_block_size,
            blocking_algo=blocking_algo, force_fixed_size=force_fixed_size,
            **engine_kw,
        )
        g = eng.get_grouping(cmat)
        per_tau_stats[tau] = eng.collect_blocking_info(cmat)
        per_tau[tau] = eng.VBR_nzblocks_count
        if eng.VBR_nzblocks_count < best[0]:
            best = (eng.VBR_nzblocks_count, tau, g)

    return TauSearchResult(
        best_tau=best[1],
        grouping=best[2],
        nzblocks=best[0],
        natural_nzblocks=natural.VBR_nzblocks_count,
        per_tau=per_tau,
        per_tau_stats=per_tau_stats,
    )

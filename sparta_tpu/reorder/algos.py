"""Blocking (row-clustering) algorithms.

Vectorized re-designs of the reference's greedy seed-and-sweep family
(blocking.cpp:20-574).  Semantics are bit-compatible with the reference —
including its pruning cache, whose C++ aggregate initializer
``float distances[rows] = {-1}`` sets element 0 to -1 and ZERO-fills the
rest (blocking.cpp:160); we replicate that faithfully since it gates the
pruning heuristic — while the inner candidate scan is a chunked, vectorized
popcount pass over packed signatures instead of a per-row merge scan.

Grouping conventions (shared with the reference):
- group id of a cluster = its seed row index (algos 0/1/3/4);
- algo 5 numbers clusters seed+rows, then subtracts rows for clusters that
  reached full height, so complete blocks sort first (blocking.cpp:365-370,
  :527-533);
- every row ends grouped: unmerged rows seed their own singleton cluster.
"""
from __future__ import annotations

import bisect
import dataclasses
import time

import numpy as np

from ..definitions import SimMeasure
from ..formats.csr import CSR
from .distances import distance_pattern_vs_rows
from .signatures import block_signatures

CHUNK = 2048  # candidate rows per vectorized distance pass


@dataclasses.dataclass
class BlockingStats:
    comparison_counter: int = 0
    merge_counter: int = 0
    total_merge_tau: float = 0.0
    total_row_distance: float = 0.0
    # phase timers (seconds): distance passes vs pattern merges — the
    # reference's time_to_compare / time_to_merge split (blocking.cpp:156-243)
    time_comparisons: float = 0.0
    time_merges: float = 0.0

    @property
    def average_merge_tau(self) -> float:
        return self.total_merge_tau / self.merge_counter if self.merge_counter else float("nan")

    @property
    def average_row_distance(self) -> float:
        return self.total_row_distance / self.merge_counter if self.merge_counter else float("nan")


def merge_rows(pattern: np.ndarray, row: np.ndarray) -> np.ndarray:
    """Merge a row into the pattern with the reference's EXACT semantics
    (utilities.cpp:145-173).

    The reference's merge is NOT a set union: pattern elements strictly
    greater than the largest row element that is <= max(pattern) are dropped
    (the copy loop breaks before flushing the pattern tail), and merging an
    empty row empties the pattern.  Faithfully replicated because the munged
    pattern drives all subsequent distance comparisons.
    """
    if row.size == 0:
        return row
    if pattern.size == 0:
        return row.copy()
    max_a = pattern[-1]
    k = int(np.searchsorted(row, max_a, side="right"))  # row[:k] <= max_a
    if k == 0:
        return row.copy()
    cutoff = row[k - 1]
    keep = pattern[: int(np.searchsorted(pattern, cutoff, side="right"))]
    return np.unique(np.concatenate((keep, row)))


class _Pattern:
    """Cluster pattern: element list (reference semantics incl. the lossy
    merge) + derived packed block signature + group size."""

    def __init__(self, cmat: CSR, sigs: np.ndarray, i: int, cols: int, bw: int):
        r0, r1 = cmat.indptr[i], cmat.indptr[i + 1]
        self.elements = cmat.indices[r0:r1].astype(np.int64)
        self.bits = sigs[i].copy()
        self.bw = bw
        self.group_size = 1

    @property
    def elems(self) -> int:
        return int(self.elements.size)

    def merge(self, cmat: CSR, sigs: np.ndarray, j: int, use_pattern: bool, use_size: bool):
        if use_pattern:
            r0, r1 = cmat.indptr[j], cmat.indptr[j + 1]
            self.elements = merge_rows(self.elements, cmat.indices[r0:r1].astype(np.int64))
            blk = self.elements // self.bw
            self.bits[:] = 0
            np.bitwise_or.at(
                self.bits, blk >> 6, np.uint64(1) << (blk & 63).astype(np.uint64)
            )
        if use_size:
            self.group_size += 1


def greedy_blocking(
    cmat: CSR,
    tau: float,
    measure: SimMeasure | int,
    col_block_size: int,
    use_groups: bool = False,
    use_pattern: bool = True,
    strict_less: bool = False,
    prune: bool = True,
    max_size: int | None = None,
    keeper: bool = False,
    stats: BlockingStats | None = None,
) -> np.ndarray:
    """Greedy seed-and-sweep clustering.

    Parameterization covers the reference algos:
      0 iterative          : strict_less=True,  prune=False
      3 iterative_clocked  : strict_less=False, prune=True  (default algo)
      4 iterative_queue    : identical semantics to 3 (the reference's queue
                             merely avoids rescanning merged rows; leftover
                             order is preserved ascending, blocking.cpp:245-338)
      5 iterative_max_size : strict_less=False, prune=True, max_size=H,
                             keeper=True (blocking.cpp:433-549)
    """
    stats = stats if stats is not None else BlockingStats()
    tau = np.float32(tau)  # reference compares float dist vs float tau
    rows = cmat.rows
    sigs = block_signatures(cmat, col_block_size)
    row_elems = cmat.row_nnz.astype(np.int64)
    grouping = np.full(rows, -1, dtype=np.int64)
    ung = np.ones(rows, dtype=bool)
    # replicate C++ `float distances[rows] = {-1}`: [0]=-1, rest 0.0
    distances = np.zeros(rows, dtype=np.float32)
    if rows:
        distances[0] = -1.0
    use_size = use_groups
    # with a static pattern and group size (and no height cap) a merge cannot
    # change later distances, so a whole chunk's accepts merge in one pass
    static_pattern = not use_pattern and not use_size and max_size is None

    for i in range(rows):
        if not ung[i]:
            continue
        group_id = i + rows if max_size is not None else i
        grouping[i] = group_id
        ung[i] = False
        merged = [i]
        pat = _Pattern(cmat, sigs, i, cmat.cols, col_block_size)

        cand = np.flatnonzero(ung[i + 1 :]).astype(np.int64) + (i + 1)
        pruned_rows = np.zeros(0, dtype=np.int64)
        if prune and cand.size:
            d_i = distances[i]
            d_c = distances[cand]
            pruned = (d_i != -1) & (d_c != -1) & (np.abs(d_i - d_c) > tau)
            pruned_rows = cand[pruned]  # marked -1 only if visited (below)
            cand = cand[~pruned]

        best: list[tuple[float, int]] = []  # keeper near-miss set, sorted
        full = max_size is not None and len(merged) >= max_size
        # row at which the sweep broke off (block full): candidates beyond it
        # are never visited, so their prune marks must not be applied
        stop_row = -1 if full else None
        pos = 0
        while pos < cand.size and not full:
            end = min(pos + CHUNK, cand.size)
            chunk = cand[pos:end]
            t_cmp = time.perf_counter()
            d = distance_pattern_vs_rows(
                measure, pat.bits, sigs[chunk], pat.group_size, pat.elems,
                row_elems[chunk],
            )
            stats.time_comparisons += time.perf_counter() - t_cmp
            acc = d < tau if strict_less else d <= tau
            # cache distances only for rows actually visited this sweep: on a
            # merge the scan restarts after the hit, and rows past a
            # block-full stop are never visited by the sequential reference
            _hit = int(np.argmax(acc)) if acc.any() else -1
            if _hit < 0:
                distances[chunk] = d
            else:
                distances[chunk[: _hit + 1]] = d[: _hit + 1]
            if static_pattern:
                distances[chunk] = d  # every chunk row is visited here
                hits = np.flatnonzero(acc)
                js = chunk[hits]
                grouping[js] = group_id
                ung[js] = False
                merged.extend(int(j) for j in js)
                stats.merge_counter += hits.size
                stats.total_merge_tau += float(d[hits].sum())
                stats.total_row_distance += float((js - i).sum())
                stats.comparison_counter += chunk.size
                pos = end
                continue
            hit = _hit
            if hit < 0:
                stats.comparison_counter += chunk.size
                if keeper:
                    cap = max_size - len(merged)
                    for t in range(chunk.size):
                        bisect.insort(best, (float(d[t]), int(chunk[t])))
                    del best[cap:]
                pos = end
                continue
            # rows before the hit are rejections at this pattern state
            stats.comparison_counter += hit + 1
            if keeper and hit:
                cap = max_size - len(merged)
                for t in range(hit):
                    bisect.insort(best, (float(d[t]), int(chunk[t])))
                del best[cap:]
            j = int(chunk[hit])
            grouping[j] = group_id
            ung[j] = False
            merged.append(j)
            stats.merge_counter += 1
            stats.total_merge_tau += float(d[hit])
            stats.total_row_distance += j - i
            t_mrg = time.perf_counter()
            pat.merge(cmat, sigs, j, use_pattern, use_size or max_size is not None)
            stats.time_merges += time.perf_counter() - t_mrg
            pos += hit + 1
            if max_size is not None and len(merged) >= max_size:
                full = True
                stop_row = j

        if prune and pruned_rows.size:
            visited = (
                pruned_rows
                if stop_row is None
                else pruned_rows[pruned_rows < stop_row]
            )
            distances[visited] = -1.0

        if keeper and not full:
            # top up under-full block from the best near misses (dist order)
            for _, j in best:
                if len(merged) >= max_size:
                    break
                if not ung[j]:
                    continue
                grouping[j] = group_id
                ung[j] = False
                merged.append(j)
            full = len(merged) >= max_size

        if max_size is not None and full:
            for j in merged:
                grouping[j] -= rows  # complete blocks sort first

    return grouping


def structured_blocking(
    cmat: CSR,
    tau: float,
    measure: SimMeasure | int,
    col_block_size: int,
    use_groups: bool = False,
    use_pattern: bool = True,
    structured_m: int = 2,
    structured_n: int = 4,
    stats: BlockingStats | None = None,
) -> np.ndarray:
    """Algo 1: greedy blocking gated by m:n structured-sparsity feasibility
    (blocking.cpp:20-87): within every window of ``structured_n`` merged rows,
    no column may hold more than ``structured_m`` nonzeros — the resulting
    blocks stay compatible with m:n sparse hardware paths."""
    stats = stats if stats is not None else BlockingStats()
    tau = np.float32(tau)  # reference compares float dist vs float tau
    rows = cmat.rows
    sigs = block_signatures(cmat, col_block_size)
    row_elems = cmat.row_nnz.astype(np.int64)
    grouping = np.full(rows, -1, dtype=np.int64)
    ung = np.ones(rows, dtype=bool)
    col_counts = np.zeros(max(cmat.cols, 1), dtype=np.int64)
    rescan_on_merge = use_pattern or use_groups

    for i in range(rows):
        if not ung[i]:
            continue
        grouping[i] = i
        ung[i] = False
        pat = _Pattern(cmat, sigs, i, cmat.cols, col_block_size)
        # seed initializes the m:n window (blocking.cpp:36-38)
        seed_cols = cmat.indices[cmat.indptr[i] : cmat.indptr[i + 1]].astype(np.int64)
        touched = list(seed_cols)
        col_counts[seed_cols] = 1
        row_counter = 1

        cand = np.flatnonzero(ung[i + 1 :]).astype(np.int64) + (i + 1)
        pos = 0
        while pos < cand.size:
            end = min(pos + CHUNK, cand.size)
            chunk = cand[pos:end]
            t_cmp = time.perf_counter()
            d = distance_pattern_vs_rows(
                measure, pat.bits, sigs[chunk], pat.group_size, pat.elems,
                row_elems[chunk],
            )
            stats.time_comparisons += time.perf_counter() - t_cmp
            acc_idx = np.flatnonzero(d < tau)
            stats.comparison_counter += chunk.size
            advanced = False
            for t in acc_idx:
                j = int(chunk[t])
                jcols = cmat.indices[cmat.indptr[j] : cmat.indptr[j + 1]].astype(np.int64)
                if row_counter % structured_n == 0:
                    # restart the m:n window (blocking.cpp:51-57)
                    col_counts[np.asarray(touched, dtype=np.int64)] = 0
                    touched = []
                    row_counter = 0
                    ok = True
                else:
                    ok = not np.any(col_counts[jcols] >= structured_m)
                if not ok:
                    continue
                grouping[j] = i
                ung[j] = False
                stats.merge_counter += 1
                stats.total_merge_tau += float(d[t])
                stats.total_row_distance += j - i
                t_mrg = time.perf_counter()
                pat.merge(cmat, sigs, j, use_pattern, use_groups)
                stats.time_merges += time.perf_counter() - t_mrg
                col_counts[jcols] += 1
                touched.extend(jcols.tolist())
                row_counter += 1
                if rescan_on_merge:
                    # pattern/group size changed: re-scan remaining candidates
                    stats.comparison_counter -= chunk.size - (int(t) + 1)
                    pos += int(t) + 1
                    advanced = True
                    break
            if not advanced:
                pos = end
        if touched:
            col_counts[np.asarray(touched, dtype=np.int64)] = 0

    return grouping


def hash_greedy_blocking(
    cmat: CSR,
    tau: float,
    measure: SimMeasure | int,
    col_block_size: int,
    max_size: int | None = None,
    stats: BlockingStats | None = None,
) -> np.ndarray:
    """NEW (beyond the reference): signature-dedup + greedy over uniques.

    Rows with IDENTICAL block signatures always belong together — group them
    in O(rows) by hashing the packed signature, then run the greedy
    seed-and-sweep only over the unique signatures, weighting each by its
    multiplicity (the use_groups semantics).  Complexity drops from
    O(rows^2) to O(uniques^2); on matrices with recoverable block structure
    uniques << rows.  Output grouping ids follow the greedy result expanded
    back through the dedup map.
    """
    stats = stats if stats is not None else BlockingStats()
    rows = cmat.rows
    if rows == 0:
        return np.zeros(0, dtype=np.int64)
    sigs = block_signatures(cmat, col_block_size)
    # dedup by signature bytes
    view = sigs.view(np.uint8).reshape(rows, -1)
    uniq, first_idx, inverse = np.unique(
        view, axis=0, return_index=True, return_inverse=True
    )
    inverse = inverse.reshape(rows)
    # representative rows, in first-appearance order for determinism
    order = np.argsort(first_idx, kind="stable")
    rep_rows = first_idx[order]
    remap = np.empty(uniq.shape[0], dtype=np.int64)
    remap[order] = np.arange(uniq.shape[0])
    inverse = remap[inverse]

    rep = CSR(
        indptr=np.concatenate(
            ([0], np.cumsum(cmat.row_nnz[rep_rows]))
        ).astype(np.int64),
        indices=np.concatenate(
            [cmat.indices[cmat.indptr[r] : cmat.indptr[r + 1]] for r in rep_rows]
        ) if rep_rows.size else np.zeros(0, dtype=cmat.indices.dtype),
        data=None,
        shape=(rep_rows.size, cmat.cols),
    )
    g_rep = None
    try:  # prefer the native engine for the greedy stage
        from . import native

        if native.available():
            g_rep = native.greedy_blocking(
                rep, tau, int(SimMeasure(measure)), col_block_size,
                use_groups=True, use_pattern=True, strict_less=False,
                prune=True, stats=stats,
            )
    except ImportError:
        pass
    if g_rep is None:
        g_rep = greedy_blocking(
            rep, tau, measure, col_block_size,
            use_groups=True, use_pattern=True, strict_less=False, prune=True,
            max_size=None, keeper=False, stats=stats,
        )
    grouping = g_rep[inverse]
    if max_size is not None:
        from ..utils import get_fixed_size_grouping

        grouping = get_fixed_size_grouping(grouping, max_size)
    return grouping


def fixed_blocking(rows: int, row_block_size: int) -> np.ndarray:
    """Algo 2: natural fixed-size blocking (blocking.cpp:554-562)."""
    return np.arange(rows, dtype=np.int64) // row_block_size


def scramble_blocking(rows: int, seed: int = 123) -> np.ndarray:
    """Algo 6: random permutation grouping — adversarial baseline
    (blocking.cpp:565-574; RNG differs from the reference's libstdc++
    shuffle, by design)."""
    rng = np.random.default_rng(seed)
    return rng.permutation(rows).astype(np.int64)

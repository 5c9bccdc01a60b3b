"""Reordering-engine tests: distances, algorithms, stats.

Hand-computed cases + invariants; cross-validation against the *compiled
reference CPU code* lives in test_reference_parity.py.
"""
import numpy as np
import pytest

from sparta_tpu.definitions import BlockingType, SimMeasure
from sparta_tpu.formats import CSR, random_uniform_csr, read_edgelist
from sparta_tpu.reorder import (
    BlockingEngine,
    block_signatures,
    distance_pair,
    fixed_blocking,
    greedy_blocking,
    scramble_blocking,
    structured_blocking,
)
from sparta_tpu.reorder.signatures import elem_signatures_row
from sparta_tpu.utils import get_partition

FIXTURE_EL = "tests/fixtures/TEST_matrix_weighted.el"


def csr_from_rows(rows_cols, ncols):
    """Build a pattern CSR from a list of per-row sorted column lists."""
    r = np.concatenate([[i] * len(c) for i, c in enumerate(rows_cols)]) if rows_cols else []
    c = np.concatenate([c for c in rows_cols]) if rows_cols else []
    m = CSR.from_coo(np.asarray(r), np.asarray(c), None, (len(rows_cols), ncols))
    return m


# ----------------------------------------------------------- signatures ----
def test_block_signatures():
    m = csr_from_rows([[0, 1, 5], [64 * 3], []], ncols=64 * 3 + 1)
    s = block_signatures(m, 1)  # block size 1: signature == column set
    assert s.shape == (3, 4)  # 193 cols -> 4 words
    assert s[0, 0] == (1 << 0) | (1 << 1) | (1 << 5)
    assert s[1, 3] == 1  # bit 192
    assert np.all(s[2] == 0)
    s3 = block_signatures(m, 64)  # 4 column-blocks -> 1 word
    assert s3.shape[1] == 1
    assert s3[0, 0] == 0b1 and s3[1, 0] == 0b1000


# ------------------------------------------------------------ distances ----
def bits_of(cols_list, ncols, bw):
    m = csr_from_rows([cols_list], ncols)
    return block_signatures(m, bw)[0]


@pytest.mark.parametrize("bw", [1, 2, 3])
def test_distance_hamming_jaccard_basic(bw):
    ncols = 12
    a = [0, 1, 5]
    b = [0, 2, 5, 7]
    ba, bb = bits_of(a, ncols, bw), bits_of(b, ncols, bw)
    blk = lambda cols: sorted(set(c // bw for c in cols))
    A, B = set(blk(a)), set(blk(b))
    inter = len(A & B)
    ham = (len(A) - inter) + (len(B) - inter)
    jac = 2.0 * ham / (len(A) + len(B) + ham)
    assert distance_pair(SimMeasure.hamming, ba, bb, elems_a=3, elems_b=4) == ham
    assert distance_pair(SimMeasure.jaccard, ba, bb, elems_a=3, elems_b=4) == pytest.approx(jac)
    # gA == gB == 1 -> _alt variants coincide
    assert distance_pair(SimMeasure.hamming_alt, ba, bb, elems_a=3, elems_b=4) == ham
    assert distance_pair(SimMeasure.jaccard_alt, ba, bb, elems_a=3, elems_b=4) == pytest.approx(jac)


def test_distance_group_weighting():
    ncols, bw = 8, 1
    a, b = [0, 1], [1, 2, 3]
    ba, bb = bits_of(a, ncols, bw), bits_of(b, ncols, bw)
    # aonly=1, bonly=2, inter=1; gA=3, gB=1
    # hamming (count_zeros=1): aonly*gB + bonly*gA = 1 + 6 = 7
    assert distance_pair(SimMeasure.hamming, ba, bb, group_size_a=3, elems_a=2, elems_b=3) == 7
    # hamming_alt (count_zeros=0): aonly*gA + bonly*gB = 3 + 2 = 5
    assert distance_pair(SimMeasure.hamming_alt, ba, bb, group_size_a=3, elems_a=2, elems_b=3) == 5
    # jaccard: 2*7/(2*3 + 3*1 + 7) = 14/16
    assert distance_pair(
        SimMeasure.jaccard, ba, bb, group_size_a=3, elems_a=2, elems_b=3
    ) == pytest.approx(14 / 16)


def test_distance_empty_cases():
    ncols, bw = 8, 2
    e = bits_of([], ncols, bw)
    b = bits_of([0, 3], ncols, bw)
    assert distance_pair(SimMeasure.hamming, e, e) == 0
    assert distance_pair(SimMeasure.jaccard, e, e) == 0
    # one empty: hamming uses ELEMENT counts (blocking.cpp:865)
    assert distance_pair(SimMeasure.hamming, e, b, elems_a=0, elems_b=2) == 2
    assert distance_pair(SimMeasure.hamming, b, e, group_size_a=4, elems_a=2, elems_b=0) == 8
    assert distance_pair(SimMeasure.jaccard, e, b, elems_b=2) == 1
    assert distance_pair(SimMeasure.jaccard_alt, b, e, elems_a=2) == 1


# ------------------------------------------------------------ algorithms ----
def test_fixed_and_scramble():
    np.testing.assert_array_equal(fixed_blocking(7, 3), [0, 0, 0, 1, 1, 1, 2])
    s = scramble_blocking(100, seed=1)
    assert sorted(s) == list(range(100))
    assert not np.all(s == np.arange(100))


def test_greedy_identical_rows_cluster():
    # rows 0,2,4 identical; rows 1,3 identical; tau tiny -> two clusters
    m = csr_from_rows([[0, 1], [4, 5], [0, 1], [4, 5], [0, 1]], ncols=8)
    g = greedy_blocking(m, 0.01, SimMeasure.jaccard, 2, prune=False)
    np.testing.assert_array_equal(g, [0, 1, 0, 1, 0])


def test_greedy_tau_one_merges_everything():
    m = random_uniform_csr(30, 30, 0.2, seed=5, pattern_only=True)
    g = greedy_blocking(m, 1.5, SimMeasure.jaccard, 4, prune=False)
    assert np.all(g == g[0])


def test_greedy_tau_zero_strict_no_merges():
    m = random_uniform_csr(20, 30, 0.2, seed=6, pattern_only=True)
    g = greedy_blocking(m, 0.0, SimMeasure.jaccard, 4, strict_less=True, prune=False)
    np.testing.assert_array_equal(g, np.arange(20))


def test_greedy_grouping_ids_are_seeds():
    m = random_uniform_csr(40, 40, 0.15, seed=7, pattern_only=True)
    g = greedy_blocking(m, 0.6, SimMeasure.jaccard, 4, prune=False)
    # each group id equals its smallest member (the seed)
    for gid in np.unique(g):
        members = np.flatnonzero(g == gid)
        assert members.min() == gid


def test_maxsize_caps_heights_and_orders_complete_first():
    m = random_uniform_csr(64, 64, 0.15, seed=8, pattern_only=True)
    H = 8
    bs = None
    g = greedy_blocking(
        m, 0.9, SimMeasure.jaccard, 8, max_size=H, keeper=True, strict_less=False
    )
    part = get_partition(g)
    heights = np.diff(part)
    assert heights.max() <= H
    # complete blocks have ids < rows, sort first
    sorted_ids = np.sort(np.unique(g))
    complete = sorted_ids[sorted_ids < 64]
    incomplete = sorted_ids[sorted_ids >= 64]
    for gid in complete:
        assert (g == gid).sum() == H
    for gid in incomplete:
        assert (g == gid).sum() < H


def test_structured_blocking_respects_mn():
    # 5 identical dense-ish rows; 2:4 allows only 2 rows per column window
    m = csr_from_rows([[0, 1]] * 6, ncols=4)
    g = structured_blocking(m, 0.5, SimMeasure.jaccard, 2, structured_m=2, structured_n=4)
    # every window of up to 4 merged rows holds <=2 rows per column
    part = get_partition(g)
    # within each group, entries per column per n-window <= m
    for gid in np.unique(g):
        members = np.flatnonzero(g == gid)
        for w in range(0, len(members), 4):
            window = members[w : w + 4]
            counts = np.zeros(4)
            for r in window:
                cols = m.indices[m.indptr[r] : m.indptr[r + 1]]
                counts[cols] += 1
            assert counts.max() <= 2


def test_engine_dispatch_and_stats():
    m = read_edgelist(FIXTURE_EL, pattern_only=False)
    eng = BlockingEngine(
        tau=0.5, col_block_size=3, row_block_size=3,
        blocking_algo=BlockingType.iterative_clocked, backend="numpy",
    )
    g = eng.get_grouping(m)
    assert g.shape == (9,)
    assert eng.merge_counter > 0 and eng.comparison_counter > 0
    info = eng.collect_blocking_info(m)
    assert info["VBR_nzblocks_count"] > 0
    # stats consistent with a materialized VBR
    from sparta_tpu.formats import vbr_from_csr

    v = vbr_from_csr(m, g, col_block_size=3)
    assert info["VBR_nzblocks_count"] == v.total_nzblocks
    assert info["VBR_nzcount"] == v.nzcount_total


def test_collect_blocking_info_partial_last_block():
    # cols=5, bw=3 -> trailing block is 2 wide; stats must subtract padding
    m = csr_from_rows([[0, 4], [4]], ncols=5)
    eng = BlockingEngine(tau=0.5, col_block_size=3, row_block_size=1,
                         blocking_algo=BlockingType.fixed_size, backend="numpy")
    eng.get_grouping(m)
    info = eng.collect_blocking_info(m)
    # row0: blocks {0,1} -> 3 + 2; row1: block {1} -> 2
    assert info["VBR_nzcount"] == 7
    assert info["VBR_nzblocks_count"] == 3
    assert info["VBR_longest_row"] == 2


def test_force_fixed_size_groups():
    m = random_uniform_csr(50, 50, 0.1, seed=9, pattern_only=True)
    eng = BlockingEngine(tau=0.4, col_block_size=8, row_block_size=8,
                         blocking_algo=BlockingType.iterative_clocked,
                         force_fixed_size=True, backend="numpy")
    g = eng.get_grouping(m)
    heights = np.diff(get_partition(g))
    assert np.all(heights[:-1] == 8) and heights[-1] <= 8


def test_hash_greedy_recovers_planted_blocks():
    from sparta_tpu.formats import random_block_csr
    from sparta_tpu.reorder import hash_greedy_blocking
    import time

    m = random_block_csr(2048, 2048, block=64, block_density=0.06,
                         intra_density=0.4, seed=13)
    t0 = time.perf_counter()
    g = hash_greedy_blocking(m, 0.3, SimMeasure.jaccard, 64)
    t_hash = time.perf_counter() - t0
    eng = BlockingEngine(tau=0.3, col_block_size=64, row_block_size=64,
                         blocking_algo=BlockingType.hash_greedy, backend="numpy")
    eng.get_grouping(m)
    info = eng.collect_blocking_info(m)
    nat = BlockingEngine(tau=0, col_block_size=64, row_block_size=64,
                         blocking_algo=BlockingType.fixed_size, backend="numpy")
    nat.get_grouping(m)
    nat_info = nat.collect_blocking_info(m)
    # must recover (nearly) the planted structure
    assert info["VBR_nzcount"] < nat_info["VBR_nzcount"] / 2


def test_hash_greedy_groups_identical_rows():
    m = csr_from_rows([[0, 1], [4, 5], [0, 1], [4, 5], [0, 1]], ncols=8)
    from sparta_tpu.reorder import hash_greedy_blocking

    g = hash_greedy_blocking(m, 0.01, SimMeasure.jaccard, 2)
    assert g[0] == g[2] == g[4]
    assert g[1] == g[3]
    assert g[0] != g[1]


def test_phase_timers_split():
    # time_to_compare / time_to_merge must be real, non-degenerate phases
    # (reference blocking.cpp:156-243): compare >> merge on a greedy run
    # sparse signatures + moderate tau: the compare-dominant regime, like
    # the reference's example (BASELINE.md: compare 1.988s vs merge 0.038s).
    # At high tau (everything merges) the merge phase genuinely dominates;
    # the timers report each engine's true phase costs either way.
    m = random_uniform_csr(600, 600, density=0.01, seed=3)
    for backend in ("numpy", "native"):
        eng = BlockingEngine(
            tau=0.4, col_block_size=16, row_block_size=16,
            blocking_algo=BlockingType.iterative_clocked, backend=backend,
        )
        try:
            eng.get_grouping(m)
        except RuntimeError:
            continue  # native backend not built in this environment
        assert eng.merge_counter > 0
        assert eng.timer_comparisons > 0.0
        assert eng.timer_merges > 0.0
        assert eng.timer_comparisons + eng.timer_merges <= eng.timer_total * 1.05
        assert eng.timer_comparisons > eng.timer_merges


def test_scramble_seed_plumbing():
    m = random_uniform_csr(64, 64, density=0.1, seed=0)
    g1 = BlockingEngine(blocking_algo=BlockingType.scramble, seed=1)
    g2 = BlockingEngine(blocking_algo=BlockingType.scramble, seed=2)
    g1b = BlockingEngine(blocking_algo=BlockingType.scramble, seed=1)
    a, b, c = g1.get_grouping(m), g2.get_grouping(m), g1b.get_grouping(m)
    assert not np.array_equal(a, b)
    assert np.array_equal(a, c)
    # -s flows from the CLI config into the engine
    from sparta_tpu.cli import parse_args

    cfg = parse_args(["-a", "6", "-s", "7"])
    eng = BlockingEngine.from_config(cfg)
    assert eng.seed == 7

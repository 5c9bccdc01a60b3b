"""Native C++ blocking engine: bit-parity vs the numpy engine (which is
itself parity-tested against the compiled reference)."""
import numpy as np
import pytest

from sparta_tpu.definitions import BlockingType, SimMeasure
from sparta_tpu.formats import random_block_csr, random_uniform_csr
from sparta_tpu.reorder import BlockingEngine, BlockingStats, greedy_blocking
from sparta_tpu.reorder import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native backend not built (no g++?)"
)

MATRICES = [
    random_uniform_csr(80, 70, 0.08, seed=31, pattern_only=True),
    random_block_csr(128, 128, block=16, block_density=0.2, intra_density=0.5, seed=32),
    random_uniform_csr(60, 200, 0.05, seed=33, pattern_only=True),
]


@pytest.mark.parametrize("mi", range(len(MATRICES)))
@pytest.mark.parametrize(
    "measure,tau", [(1, 0.4), (0, 5.0), (3, 0.5), (2, 4.0)]
)
@pytest.mark.parametrize("kw", [
    dict(strict_less=False, prune=True),
    dict(strict_less=True, prune=False),
    dict(strict_less=False, prune=True, max_size=8, keeper=True),
    dict(strict_less=False, prune=True, use_groups=True),
    dict(strict_less=False, prune=True, use_pattern=False),
])
def test_native_matches_numpy(mi, measure, tau, kw):
    m = MATRICES[mi]
    s_np, s_nat = BlockingStats(), BlockingStats()
    g_np = greedy_blocking(m, tau, SimMeasure(measure), 8, stats=s_np, **kw)
    g_nat = native.greedy_blocking(
        m, tau, measure, 8, stats=s_nat,
        **{**kw, "max_size": kw.get("max_size") or 0},
    )
    np.testing.assert_array_equal(g_nat, g_np)
    assert s_nat.comparison_counter == s_np.comparison_counter
    assert s_nat.merge_counter == s_np.merge_counter
    assert s_nat.total_merge_tau == pytest.approx(s_np.total_merge_tau, abs=1e-4)


def test_engine_auto_uses_native():
    m = MATRICES[1]
    eng = BlockingEngine(tau=0.4, col_block_size=16, row_block_size=16,
                         blocking_algo=BlockingType.iterative_clocked,
                         backend="native")
    g1 = eng.get_grouping(m)
    eng2 = BlockingEngine(tau=0.4, col_block_size=16, row_block_size=16,
                          blocking_algo=BlockingType.iterative_clocked,
                          backend="numpy")
    g2 = eng2.get_grouping(m)
    np.testing.assert_array_equal(g1, g2)
    assert eng.comparison_counter == eng2.comparison_counter


def test_native_speed_sanity():
    """Native engine should not be slower than numpy on a mid-size matrix."""
    import time

    m = random_uniform_csr(3000, 3000, 0.01, seed=40, pattern_only=True)
    t0 = time.perf_counter()
    native.greedy_blocking(m, 0.3, 1, 64)
    t_nat = time.perf_counter() - t0
    t0 = time.perf_counter()
    greedy_blocking(m, 0.3, SimMeasure.jaccard, 64)
    t_np = time.perf_counter() - t0
    assert t_nat < t_np * 2  # allow slack; typically much faster

"""Format layer tests: CSR/VBR/BELL vs scipy + dense oracles.

Mirrors the reference's oracle strategy (TEST_matrices.cpp: CSR::multiply vs
VBR::multiply compared with std::equal) with scipy as ground truth.
"""
import numpy as np
import pytest
import scipy.sparse as sp

from sparta_tpu.formats import (
    CSR,
    bell_from_csr,
    bell_from_vbr,
    random_block_csr,
    random_uniform_csr,
    read_edgelist,
    read_grouping,
    vbr_from_csr,
    write_grouping,
)
from sparta_tpu.utils import (
    get_fixed_size_grouping,
    get_partition,
    get_permutation,
)

FIXTURE_EL = "tests/fixtures/TEST_matrix_weighted.el"


def random_csr(rng, rows=50, cols=40, density=0.1):
    m = sp.random(rows, cols, density=density, random_state=np.random.RandomState(1))
    return CSR.from_scipy(m.tocsr())


# ---------------------------------------------------------------- utils ----
def test_get_permutation_partition():
    grouping = np.array([2, 0, 2, 1, 0])
    perm = get_permutation(grouping)
    np.testing.assert_array_equal(perm, [1, 4, 3, 0, 2])
    part = get_partition(grouping)
    np.testing.assert_array_equal(part, [0, 2, 3, 5])


def test_fixed_size_grouping():
    grouping = np.array([5, 5, 9, 9, 9, 1])
    out = get_fixed_size_grouping(grouping, 2)
    # permuted order: rows [5, 0, 1, 2, 3, 4] -> chopped in pairs
    np.testing.assert_array_equal(out, [0, 1, 1, 2, 2, 0])


# ------------------------------------------------------------------ CSR ----
def test_csr_from_dense_roundtrip(rng):
    a = (rng.random((13, 17)) < 0.2) * rng.standard_normal((13, 17))
    m = CSR.from_dense(a)
    np.testing.assert_allclose(m.to_dense(), a.astype(np.float32), rtol=1e-6)


def test_csr_multiply_oracle(rng):
    m = random_csr(rng)
    B = rng.standard_normal((m.cols, 8)).astype(np.float32)
    C = m.multiply(B)
    C_ref = m.to_scipy() @ B
    np.testing.assert_allclose(C, C_ref, rtol=1e-4, atol=1e-5)


def test_csr_permute_rows(rng):
    m = random_csr(rng)
    perm = np.random.default_rng(3).permutation(m.rows)
    mp = m.permute_rows(perm)
    np.testing.assert_allclose(mp.to_dense(), m.to_dense()[perm])


def test_csr_reorder_groups_adjacent(rng):
    m = random_csr(rng, rows=10)
    grouping = np.array([3, 1, 3, 1, 0, 0, 2, 2, 1, 3])
    mr = m.reorder(grouping)
    perm = get_permutation(grouping)
    np.testing.assert_allclose(mr.to_dense(), m.to_dense()[perm])


def test_csr_reorder2d_symmetric(rng):
    d = (rng.random((12, 12)) < 0.3).astype(np.float32)
    m = CSR.from_dense(d)
    grouping = rng.integers(0, 4, 12)
    mr = m.reorder2d(grouping)
    perm = get_permutation(grouping)
    np.testing.assert_allclose(mr.to_dense(), d[np.ix_(perm, perm)])


def test_csr_reorder_by_degree(rng):
    m = random_csr(rng)
    md = m.reorder_by_degree(descending=True)
    assert np.all(np.diff(md.row_nnz) <= 0)
    ma = m.reorder_by_degree(descending=False)
    assert np.all(np.diff(ma.row_nnz) >= 0)


def test_read_edgelist_fixture():
    # 9x9 weighted fixture mirroring the reference data/TEST_matrix_weighted.el
    m = read_edgelist(FIXTURE_EL)
    assert m.shape == (9, 9)
    assert m.nnz == 13
    d = m.to_dense()
    assert d[0, 8] == 2
    assert d[1, 2] == 5
    assert d[8, 1] == 5
    # pattern-only read drops weights
    mp = read_edgelist(FIXTURE_EL, pattern_only=True)
    assert mp.pattern_only and mp.nnz == 13
    assert mp.to_dense()[0, 8] == 1


def test_symmetrize(tmp_path):
    p = tmp_path / "tri.el"
    p.write_text("0 1\n0 2\n1 2\n")
    m = read_edgelist(p, pattern_only=True, symmetrize=True)
    d = m.to_dense()
    np.testing.assert_allclose(d, d.T)
    assert m.nnz == 6


def test_grouping_file_roundtrip(tmp_path):
    g = np.array([3, 1, 0, 2])
    p = tmp_path / "x.g"
    write_grouping(p, g)
    np.testing.assert_array_equal(read_grouping(p), g)
    # leading size line dropped when expected_rows is known
    p2 = tmp_path / "y.g"
    p2.write_text("4\n3\n1\n0\n2\n")
    np.testing.assert_array_equal(read_grouping(p2, expected_rows=4), g)


# ------------------------------------------------------------------ VBR ----
@pytest.mark.parametrize("force_fixed", [False, True])
def test_vbr_roundtrip_natural(rng, force_fixed):
    m = random_csr(rng, rows=30, cols=25, density=0.15)
    v = vbr_from_csr(m, None, col_block_size=4, row_block_size=5,
                     force_fixed_size=force_fixed)
    d = v.to_dense_permuted()
    ref = m.to_dense()
    np.testing.assert_allclose(d[: m.rows, : m.cols], ref)
    if force_fixed:
        assert v.shape == (30, 28)
        # padding area must be zero
        assert np.all(d[:, m.cols:] == 0)


def test_vbr_grouped_matches_permuted_dense(rng):
    m = random_csr(rng, rows=20, cols=20, density=0.2)
    grouping = np.random.default_rng(7).integers(0, 6, 20)
    v = vbr_from_csr(m, grouping, col_block_size=3)
    perm = get_permutation(grouping)
    np.testing.assert_allclose(
        v.to_dense_permuted()[:, : m.cols], m.to_dense()[perm]
    )


def test_vbr_multiply_oracle(rng):
    m = random_csr(rng, rows=24, cols=18, density=0.2)
    grouping = np.random.default_rng(5).integers(0, 7, 24)
    v = vbr_from_csr(m, grouping, col_block_size=4)
    B = rng.standard_normal((m.cols, 6)).astype(np.float32)
    C = v.multiply(B)
    perm = get_permutation(grouping)
    C_ref = (m.to_scipy() @ B)[perm]
    np.testing.assert_allclose(C, C_ref, rtol=1e-4, atol=1e-5)


# ----------------------------------------------------------------- BELL ----
def test_bell_from_csr_natural(rng):
    m = random_csr(rng, rows=30, cols=25, density=0.15)
    b = bell_from_csr(m, None, block_row_size=8, block_col_size=8)
    assert b.shape == (32, 32)
    d = b.to_dense_permuted()
    np.testing.assert_allclose(d[: m.rows, : m.cols], m.to_dense())
    # padding blocks flagged -1 beyond nb_row
    for ib in range(b.n_block_rows):
        assert np.all(b.cols_idx[ib, b.nb_row[ib]:] == -1)
        assert np.all(np.diff(b.cols_idx[ib, : b.nb_row[ib]]) > 0)


def test_bell_from_csr_grouped_multiply(rng):
    m = random_block_csr(64, 64, block=8, block_density=0.3, seed=2)
    grouping = get_fixed_size_grouping(np.arange(64) // 8, 8)
    b = bell_from_csr(m, grouping, block_row_size=8)
    B = rng.standard_normal((64, 16)).astype(np.float32)
    C = b.multiply(B)
    C_ref = m.to_scipy() @ B
    np.testing.assert_allclose(C[:64], C_ref, rtol=1e-4, atol=1e-4)


def test_bell_from_vbr_equals_direct(rng):
    m = random_csr(rng, rows=32, cols=32, density=0.2)
    v = vbr_from_csr(m, None, col_block_size=8, row_block_size=8,
                     force_fixed_size=True)
    b1 = bell_from_vbr(v)
    b2 = bell_from_csr(m, None, block_row_size=8, block_col_size=8)
    np.testing.assert_array_equal(b1.cols_idx, b2.cols_idx)
    np.testing.assert_allclose(b1.vals, b2.vals)


def test_generators():
    m = random_uniform_csr(50, 60, 0.05, seed=1)
    assert m.shape == (50, 60) and m.nnz == int(50 * 60 * 0.05)
    mb = random_block_csr(64, 64, block=16, block_density=0.25, seed=3)
    assert mb.nnz > 0


def test_native_io_matches_numpy(tmp_path):
    from sparta_tpu.formats import native_io

    if not native_io.available():
        pytest.skip("native io not built")
    m = random_block_csr(200, 180, block=16, block_density=0.2, seed=44)
    p = tmp_path / "w.el"
    m.save_to_edgelist(p)
    # native path (default)
    m1 = read_edgelist(p)
    # forced numpy path
    import sparta_tpu.formats.csr as csr_mod

    r, c, w, h = native_io.parse_edgelist(p)
    assert h  # weights present
    np.testing.assert_allclose(m1.to_dense(), m.to_dense(), rtol=1e-5)
    # pattern-only read drops weights on both paths
    mp = read_edgelist(p, pattern_only=True)
    assert mp.pattern_only


def test_native_io_comments_and_blank(tmp_path):
    from sparta_tpu.formats import native_io

    if not native_io.available():
        pytest.skip("native io not built")
    p = tmp_path / "c.el"
    p.write_text("# comment\n\n0 1 2.5\n% another\n1 0 1.5\n")
    m = read_edgelist(p)
    assert m.nnz == 2 and m.to_dense()[0, 1] == 2.5


def test_stencil_csr_structure():
    from sparta_tpu.datasets import stencil_csr

    m = stencil_csr((8, 8), pattern="star")
    S = m.to_scipy()
    # 5-point star: symmetric PATTERN (weights are random), interior rows
    # have 5 entries
    P = (S != 0).astype(int)
    assert (P.toarray() != P.toarray().T).sum() == 0
    row_nnz = np.diff(S.indptr)
    assert row_nnz.max() == 5 and row_nnz.min() == 3

    m3 = stencil_csr((4, 4, 4), pattern="star")
    row_nnz = np.diff(m3.to_scipy().indptr)
    assert row_nnz.max() == 7

    mb = stencil_csr((6, 6), pattern="box")
    assert np.diff(mb.to_scipy().indptr).max() == 9


# ------------------------------------------------------------------ mtx ----
def _write_mtx(tmp_path, banner, body):
    p = tmp_path / "m.mtx"
    p.write_text(banner + "\n% a comment\n" + body)
    return p


@pytest.fixture(params=["native", "numpy"])
def _mtx_parser(request, monkeypatch):
    """Run each mtx test through the native scanner AND the numpy
    fallback — both must produce identical matrices."""
    if request.param == "numpy":
        import sparta_tpu.formats.native_io as nio

        monkeypatch.setenv("SPARTA_TPU_NO_NATIVE", "1")
        monkeypatch.setattr(nio, "_lib", None)
        monkeypatch.setattr(nio, "_tried", False)
    return request.param


def test_read_mtx_general_weighted(tmp_path, _mtx_parser):
    from sparta_tpu.formats import read_mtx

    p = _write_mtx(
        tmp_path, "%%MatrixMarket matrix coordinate real general",
        "3 4 3\n1 2 5.5\n3 1 -2e-1\n2 4 7\n")
    m = read_mtx(p, pattern_only=False)
    assert m.shape == (3, 4) and m.nnz == 3
    d = m.to_dense()
    assert d[0, 1] == 5.5 and abs(d[2, 0] - -0.2) < 1e-12 and d[1, 3] == 7
    # pattern-only read drops the weights (reference csr.cpp:318-321)
    mp = read_mtx(p, pattern_only=True)
    assert np.array_equal(mp.to_dense() != 0, d != 0)
    assert set(np.unique(mp.to_dense())) <= {0.0, 1.0}


def test_read_mtx_symmetric_banner(tmp_path, _mtx_parser):
    from sparta_tpu.formats import read_mtx

    p = _write_mtx(
        tmp_path, "%%MatrixMarket matrix coordinate real symmetric",
        "3 3 2\n2 1 4\n3 3 9\n")
    m = read_mtx(p, pattern_only=False)
    d = m.to_dense()
    assert d[1, 0] == 4 and d[0, 1] == 4 and d[2, 2] == 9  # transpose added


def test_read_mtx_truncated_body_raises(tmp_path):
    from sparta_tpu.formats import read_mtx
    from sparta_tpu.formats.native_io import available

    if not available():
        pytest.skip("native io unavailable")
    p = _write_mtx(
        tmp_path, "%%MatrixMarket matrix coordinate real general",
        "3 3 5\n1 1 1\n2 2 2\n")
    with pytest.raises(ValueError, match="truncated"):
        read_mtx(p)

"""Property tests on random CSR (SURVEY §4: permutation invariance of
results, padding identity) — many random shapes/groupings, CPU."""
import jax.numpy as jnp
import numpy as np
import pytest

from sparta_tpu.formats import bell_from_csr, random_block_csr, random_uniform_csr
from sparta_tpu.ops import (
    BellCompactDevice,
    BellDevice,
    bell_spmm_pallas_compact_unrolled,
    bell_spmm_xla,
    compact_from_host_padded,
    pad_b_for_bell,
)
from sparta_tpu.utils import get_fixed_size_grouping, get_permutation


@pytest.mark.parametrize("seed", range(5))
def test_permutation_invariance(seed):
    """For ANY grouping, un-permuting the blocked product recovers m @ B."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(40, 160))
    b = int(rng.choice([4, 8, 16]))
    m = random_uniform_csr(n, n, density=float(rng.uniform(0.01, 0.1)),
                           seed=seed + 100)
    grouping = get_fixed_size_grouping(rng.integers(0, max(n // 7, 1), n), b)
    bell = bell_from_csr(m, grouping, block_row_size=b)
    B = rng.standard_normal((n, 24)).astype(np.float32)
    C = np.asarray(
        bell_spmm_xla(BellDevice.from_host(bell), pad_b_for_bell(B, bell))
    )[: m.rows]
    perm = get_permutation(grouping)
    inv = np.argsort(perm)
    np.testing.assert_allclose(C[inv], m.to_scipy() @ B, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("seed", range(3))
def test_padding_identity(seed):
    """Block-alignment padding never changes the result in the original
    range, and padding blocks carry zero values (CLAUDE.md invariant)."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(30, 100))  # deliberately NOT a block multiple
    b = 16
    m = random_uniform_csr(n, n, density=0.05, seed=seed + 7)
    bell = bell_from_csr(m, None, block_row_size=b)
    assert bell.shape[0] % b == 0 and bell.shape[0] >= n
    # padding blocks (cols_idx == -1) must be exactly zero
    mask = np.asarray(bell.cols_idx) < 0
    assert np.all(np.asarray(bell.vals)[mask] == 0)
    B = rng.standard_normal((n, 16)).astype(np.float32)
    C = np.asarray(
        bell_spmm_xla(BellDevice.from_host(bell), pad_b_for_bell(B, bell))
    )
    np.testing.assert_allclose(C[:n], m.to_scipy() @ B, rtol=1e-4, atol=1e-4)
    # rows beyond n are pure padding: exactly zero
    assert np.all(C[n:] == 0)


@pytest.mark.parametrize("seed", range(3))
def test_kernel_agreement(seed):
    """XLA and Pallas(interpret) paths agree bit-for-bit-ish on random
    blocked matrices (fp32)."""
    rng = np.random.default_rng(seed)
    m = random_block_csr(128, 128, block=8, block_density=0.25,
                         intra_density=0.5, seed=seed + 3)
    bell = bell_from_csr(m, None, block_row_size=8)
    B = rng.standard_normal((128, 32)).astype(np.float32)
    Bj = jnp.asarray(pad_b_for_bell(B, bell))
    C1 = np.asarray(bell_spmm_xla(BellDevice.from_host(bell), Bj))
    chunk = 3
    C2 = np.asarray(bell_spmm_pallas_compact_unrolled(
        compact_from_host_padded(bell, chunk), Bj, tn=32, chunk=chunk))
    np.testing.assert_allclose(C1, C2, rtol=1e-5, atol=1e-5)

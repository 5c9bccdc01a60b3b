"""Int8 quantized SpMM accuracy."""
import jax.numpy as jnp
import numpy as np

from sparta_tpu.formats import bell_from_csr, random_block_csr
from sparta_tpu.ops import BellDevice, pad_b_for_bell
from sparta_tpu.ops.quant import QBellDevice, bell_spmm_int8, quantize_b


def test_int8_spmm_matched_accuracy():
    m = random_block_csr(256, 256, block=16, block_density=0.2, intra_density=0.8,
                         seed=11, shuffle_rows=False)
    bell = bell_from_csr(m, None, block_row_size=16)
    dev = BellDevice.from_host(bell)
    q = QBellDevice.from_bell(dev)
    B = np.random.default_rng(0).standard_normal((256, 64)).astype(np.float32)
    Bq, bscale = quantize_b(pad_b_for_bell(B, bell), bell.block_col_size)
    C = np.asarray(bell_spmm_int8(q, Bq, bscale))
    C_ref = np.asarray(m.to_scipy() @ B)
    rel = np.abs(C[:256] - C_ref).max() / (np.abs(C_ref).max() + 1e-9)
    assert rel < 2e-2  # int8 matched-accuracy criterion


def test_int8_roundtrip_quantization():
    m = random_block_csr(64, 64, block=8, block_density=0.5, seed=3,
                         shuffle_rows=False)
    bell = bell_from_csr(m, None, block_row_size=8)
    dev = BellDevice.from_host(bell)
    q = QBellDevice.from_bell(dev)
    deq = np.asarray(q.q_vals, dtype=np.float32) * np.asarray(q.scales)[:, :, None, None]
    rel = np.abs(deq - np.asarray(dev.vals)).max() / (
        np.abs(np.asarray(dev.vals)).max() + 1e-9
    )
    assert rel < 1e-2


def test_int8_unrolled_matches_xla_int8():
    """Pallas int8 unrolled kernel == XLA int8 path (same quantized math)."""
    import jax.numpy as jnp

    from sparta_tpu.formats import bell_from_csr, random_block_csr
    from sparta_tpu.ops import BellDevice
    from sparta_tpu.ops.quant import (
        QBellCompactDevice,
        QBellDevice,
        bell_spmm_int8,
        bell_spmm_int8_unrolled,
        quantize_b,
    )

    m = random_block_csr(128, 128, block=8, block_density=0.3,
                         intra_density=0.6, seed=21)
    bell = bell_from_csr(m, None, block_row_size=8)
    B = np.random.default_rng(2).standard_normal((128, 32)).astype(np.float32)

    qd = QBellDevice.from_bell(BellDevice.from_host(bell))
    Bq, bscale = quantize_b(jnp.asarray(B), 8)
    C_xla = np.asarray(bell_spmm_int8(qd, Bq, bscale))

    qc = QBellCompactDevice.from_bell(bell, chunk=2)
    C_pl = np.asarray(
        bell_spmm_int8_unrolled(
            qc, jnp.asarray(Bq).reshape(-1, 32), bscale, tn=32, chunk=2
        )
    )
    np.testing.assert_allclose(C_pl[: m.rows], C_xla[: m.rows],
                               rtol=1e-5, atol=1e-5)

    # and both approximate the fp32 truth within int8 quantization error
    C_ref = m.to_scipy() @ B
    rel = np.abs(C_pl[: m.rows] - C_ref).max() / (np.abs(C_ref).max() + 1e-9)
    assert rel < 0.05, rel

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

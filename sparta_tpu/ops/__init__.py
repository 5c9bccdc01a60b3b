from .bell_pallas import bell_spmm_pallas
from .bell_xla import bell_spmm_xla, bell_spmm_xla_ba, bell_spmm_xla_unrolled
from .csr_spmm import EllDevice, bcoo_spmm, csr_to_bcoo, dense_matmul, ell_spmm
from .device import BellDevice, pad_b_for_bell

__all__ = [
    "BellDevice",
    "EllDevice",
    "bcoo_spmm",
    "bell_spmm_pallas",
    "bell_spmm_xla",
    "bell_spmm_xla_ba",
    "bell_spmm_xla_unrolled",
    "csr_to_bcoo",
    "dense_matmul",
    "ell_spmm",
    "pad_b_for_bell",
]

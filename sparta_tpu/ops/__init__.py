from .bell_compact import (
    BellCompactDevice,
    bell_spmm_pallas_compact,
    bell_spmm_pallas_compact_chunked,
    bell_spmm_pallas_compact_gather,
    bell_spmm_pallas_compact_ksplit,
    bell_spmm_pallas_compact_multirow,
    bell_spmm_pallas_compact_unrolled,
    bell_spmm_pallas_compact_unrolled_epilogue,
    compact_auto_chunk,
    compact_from_host_padded,
    compact_ksplit_from_host,
)
from .bell_pallas import (
    bell_spmm_pallas,
    bell_spmm_pallas_auto,
    bell_spmm_pallas_bcache,
)
from .bell_xla import bell_spmm_xla, bell_spmm_xla_ba, bell_spmm_xla_unrolled
from .csr_spmm import (
    EllDevice,
    bcoo_spmm,
    csr_spmm_auto,
    csr_to_bcoo,
    dense_matmul,
    ell_spmm,
)
from .device import BellDevice, pad_b_for_bell
from .quant import (
    FP8BellCompactDevice,
    bell_spmm_fp8_unrolled,
    quantize_b_fp8,
    QBellCompactDevice,
    QBellDevice,
    bell_spmm_int8,
    bell_spmm_int8_unrolled,
    quantize_b,
)
from .select import SpmmPlan, plan_spmm
from .vbr_pallas import VbrPallasDevice, vbr_spmm_pallas
from .vbr_xla import VbrDevice, vbr_spmm_xla, vbr_spmm_xla_ba

__all__ = [
    "BellCompactDevice",
    "BellDevice",
    "EllDevice",
    "VbrDevice",
    "bcoo_spmm",
    "bell_spmm_pallas",
    "bell_spmm_pallas_auto",
    "bell_spmm_pallas_bcache",
    "bell_spmm_pallas_compact",
    "bell_spmm_pallas_compact_chunked",
    "bell_spmm_pallas_compact_gather",
    "bell_spmm_pallas_compact_ksplit",
    "bell_spmm_pallas_compact_multirow",
    "bell_spmm_pallas_compact_unrolled",
    "bell_spmm_pallas_compact_unrolled_epilogue",
    "compact_from_host_padded",
    "compact_ksplit_from_host",
    "compact_auto_chunk",
    "bell_spmm_xla",
    "bell_spmm_xla_ba",
    "bell_spmm_xla_unrolled",
    "csr_to_bcoo",
    "dense_matmul",
    "ell_spmm",
    "pad_b_for_bell",
    "plan_spmm",
    "FP8BellCompactDevice",
    "QBellCompactDevice",
    "QBellDevice",
    "bell_spmm_fp8_unrolled",
    "bell_spmm_int8",
    "bell_spmm_int8_unrolled",
    "quantize_b",
    "quantize_b_fp8",
    "SpmmPlan",
    "VbrPallasDevice",
    "vbr_spmm_pallas",
    "vbr_spmm_xla",
    "vbr_spmm_xla_ba",
]

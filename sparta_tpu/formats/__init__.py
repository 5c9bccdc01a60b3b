from .bell import BELL, bell_from_csr, bell_from_vbr
from .csr import (
    CSR,
    random_block_csr,
    random_uniform_csr,
    read_edgelist,
    read_matrix,
    read_mtx,
    rmat_csr,
)
from .io import load_blocking_npz, read_grouping, save_blocking_npz, write_grouping
from .vbr import VBR, partition_check, vbr_from_csr

__all__ = [
    "BELL",
    "CSR",
    "VBR",
    "bell_from_csr",
    "bell_from_vbr",
    "load_blocking_npz",
    "partition_check",
    "random_block_csr",
    "random_uniform_csr",
    "read_edgelist",
    "read_grouping",
    "read_matrix",
    "read_mtx",
    "rmat_csr",
    "save_blocking_npz",
    "vbr_from_csr",
    "write_grouping",
]

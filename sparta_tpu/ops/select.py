"""Kernel selection: one place that knows which SpMM path wins where.

Decision tree (measured on v5e, see docs/DESIGN.md §3):
- blocks not MXU-tileable ((8,128)-aligned)      -> XLA gather path
- K*tn fits the VMEM budget (resident B tile)    -> unrolled compact kernel
- otherwise (huge K / heavy-tailed block counts) -> compact-gather kernel
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp
import numpy as np

from ..formats.bell import BELL
from .bell_compact import (
    BellCompactDevice,
    bell_spmm_pallas_compact_gather,
    bell_spmm_pallas_compact_unrolled,
    compact_auto_chunk,
    compact_from_host_padded,
)
from .bell_xla import bell_spmm_xla
from .device import BellDevice

VMEM_BUDGET = 12 * 2**20  # resident-B tile budget out of ~16MB/core


def auto_tile_n(n: int) -> int:
    """Largest of (512, 256, 128) dividing ``n``; the single tile rule for
    every caller (runner, plan_spmm, int8 path)."""
    for t in (512, 256, 128):
        if n % t == 0:
            return t
    raise ValueError(f"N={n} is not a multiple of 128; pad the operand first")


def unrolled_vmem_bytes(K: int, tn: int, bh: int, bw: int, chunk: int,
                        itemsize: int, nslots: int = 2) -> int:
    """VMEM footprint of the unrolled compact kernel: resident B tile +
    double-buffered vals + fp32 accumulator + double-buffered out tile."""
    return (
        K * tn * itemsize                 # resident B tile
        + nslots * chunk * bh * bw * itemsize  # vals pipeline
        + bh * tn * 4                     # fp32 accumulator
        + 2 * bh * tn * itemsize          # double-buffered out block
    )


@dataclasses.dataclass(frozen=True)
class SpmmPlan:
    """A ready-to-call SpMM: ``fn(B) -> C`` with B [K, N] (padded to the
    bell's padded K; see ``pad_b_for_bell``) and C [nbr*bh, N] in the
    bell's (permuted) row order."""

    fn: Callable
    backend: str
    tn: int
    chunk: int = 0

    def __call__(self, B):
        return self.fn(B)


def plan_spmm(bell: BELL, N: int, dtype=jnp.float32,
              tile_n: int | None = None) -> SpmmPlan:
    """Pick the fastest device path for this blocked matrix and operand
    width. ``N`` may be any positive width; callers pad B's columns to a
    multiple of 128 (the plan's ``tn`` divides that padded width)."""
    bh, bw = bell.block_row_size, bell.block_col_size
    K = bell.shape[1]
    Np = -(-N // 128) * 128
    tn = tile_n or auto_tile_n(Np)
    itemsize = jnp.dtype(dtype).itemsize

    if bh % 8 or bw % 128:
        dev = BellDevice.from_host(bell, dtype=dtype)
        return SpmmPlan(lambda B: bell_spmm_xla(dev, B), "bell_xla", tn)

    chunk = compact_auto_chunk(bell.nb_row)
    if unrolled_vmem_bytes(K, tn, bh, bw, chunk, itemsize) <= VMEM_BUDGET:
        cdev = compact_from_host_padded(bell, chunk, dtype=dtype)
        return SpmmPlan(
            lambda B: bell_spmm_pallas_compact_unrolled(
                cdev, B, tn=tn, chunk=chunk),
            f"bell_pallas_unrolled_tn{tn}_c{chunk}", tn, chunk,
        )

    cdev = BellCompactDevice.from_host(bell, dtype=dtype)
    return SpmmPlan(
        lambda B: bell_spmm_pallas_compact_gather(cdev, B, tn=tn),
        f"bell_pallas_gather_tn{tn}", tn,
    )

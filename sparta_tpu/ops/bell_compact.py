"""Compact blocked SpMM — the speed-of-light Pallas kernel.

Traffic analysis of the simpler kernels (measured at roofline on v5e):
- gather kernel: every nonzero block re-fetches its B row-stripe from HBM
  -> B traffic = nzblocks * bw * N (the dominant term at moderate density);
- resident-B kernel with ELL-padded values: vals traffic = padded blocks *
  (N/tn), paying for padding and for every column tile.

This kernel removes both:
- blocks stored COMPACTED (CSR-of-blocks: row_ptr + flat cols + flat vals,
  no ELL padding) and DMA'd HBM->VMEM double-buffered, so vals traffic is
  the true block count;
- the B column tile [K, tn] lives in a persistent VMEM scratch, DMA'd ONCE
  per column sweep (grid is (N/tn, nbr), block-rows innermost), so B traffic
  is K * N total — each stripe is reused by every block-row touching it.

HBM traffic = K*N + nzblocks*bh*bw*(N/tn) + M*N, compute-bound once block
density clears the MXU ridge.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats.bell import BELL


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BellCompactDevice:
    """CSR-of-blocks on device: block b of block-row i lives at
    flat position row_ptr[i] + b."""

    row_ptr: jax.Array    # int32 [nbr+1]
    cols_flat: jax.Array  # int32 [nzblocks]
    vals_flat: jax.Array  # [nzblocks, bh, bw]

    @property
    def n_block_rows(self) -> int:
        return self.row_ptr.shape[0] - 1

    @property
    def block_row_size(self) -> int:
        return self.vals_flat.shape[1]

    @property
    def block_col_size(self) -> int:
        return self.vals_flat.shape[2]

    def tree_flatten(self):
        return (self.row_ptr, self.cols_flat, self.vals_flat), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def from_host(cls, bell: BELL, dtype=jnp.float32) -> "BellCompactDevice":
        nb = bell.nb_row.astype(np.int64)
        row_ptr = np.concatenate(([0], np.cumsum(nb))).astype(np.int32)
        total = int(row_ptr[-1])
        cols = np.zeros(total, dtype=np.int32)
        vals = np.zeros((max(total, 1), bell.block_row_size, bell.block_col_size),
                        dtype=np.float32)
        for i in range(bell.n_block_rows):
            n = int(nb[i])
            cols[row_ptr[i] : row_ptr[i] + n] = bell.cols_idx[i, :n]
            vals[row_ptr[i] : row_ptr[i] + n] = bell.vals[i, :n]
        return cls(
            row_ptr=jnp.asarray(row_ptr),
            cols_flat=jnp.asarray(cols),
            vals_flat=jnp.asarray(vals, dtype=dtype),
        )


def _kernel(
    row_ptr_ref,   # int32 [nbr+1] (SMEM)
    cols_ref,      # int32 [nzblocks] (SMEM)
    vals_hbm,      # [nzblocks, bh, bw] (HBM)
    b_hbm,         # [K, N] (HBM)
    out_ref,       # [bh, tn] (VMEM)
    b_tile,        # [K, tn] persistent VMEM scratch
    vbuf,          # [2, bh, bw] VMEM
    acc_ref,       # [bh, tn] fp32
    bsem,          # DMA sem
    vsems,         # DMA sems (2,)
    *,
    bw: int,
    tn: int,
):
    j = pl.program_id(0)
    i = pl.program_id(1)

    # load the B column tile once per column sweep; it persists across i
    @pl.when(i == 0)
    def _():
        cp = pltpu.make_async_copy(
            b_hbm.at[:, pl.ds(j * tn, tn)], b_tile, bsem
        )
        cp.start()
        cp.wait()

    start = row_ptr_ref[i]
    nb = row_ptr_ref[i + 1] - start

    def vdma(k, slot):
        return pltpu.make_async_copy(
            vals_hbm.at[start + k], vbuf.at[slot], vsems.at[slot]
        )

    @pl.when(nb > 0)
    def _():
        vdma(0, 0).start()

    acc_ref[...] = jnp.zeros_like(acc_ref)

    def body(k, _):
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < nb)
        def _():
            vdma(k + 1, jax.lax.rem(k + 1, 2)).start()

        vdma(k, slot).wait()
        jb = cols_ref[start + k]
        acc_ref[...] += jax.lax.dot(
            vbuf[slot],
            b_tile[pl.ds(jb * bw, bw), :],
            preferred_element_type=jnp.float32,
        )
        return 0

    jax.lax.fori_loop(0, nb, body, 0)
    out_ref[...] = acc_ref[...].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tn", "out_dtype", "interpret"))
def bell_spmm_pallas_compact(
    bell: BellCompactDevice,
    B: jax.Array,
    tn: int = 512,
    out_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    """C[permuted rows] = A @ B.  Requires K*tn*itemsize + small buffers to
    fit VMEM (see auto selector in bell_pallas)."""
    total, bh, bw = bell.vals_flat.shape
    nbr = bell.n_block_rows
    K, N = B.shape
    if N % tn:
        raise ValueError(f"N={N} not a multiple of tile {tn}")
    out_dtype = out_dtype or B.dtype
    interpret = interpret or jax.default_backend() == "cpu"

    kernel = functools.partial(_kernel, bw=bw, tn=tn)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(N // tn, nbr),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # vals stay in HBM
                pl.BlockSpec(memory_space=pl.ANY),  # B stays in HBM
            ],
            out_specs=pl.BlockSpec(
                (bh, tn), lambda j, i, *_: (i, j), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((K, tn), B.dtype),
                pltpu.VMEM((2, bh, bw), bell.vals_flat.dtype),
                pltpu.VMEM((bh, tn), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nbr * bh, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * total * bh * bw * N,
            bytes_accessed=(
                K * N * B.dtype.itemsize
                + (N // tn) * total * bh * bw * bell.vals_flat.dtype.itemsize
                + nbr * bh * N * jnp.dtype(out_dtype).itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(bell.row_ptr, bell.cols_flat, bell.vals_flat, B)

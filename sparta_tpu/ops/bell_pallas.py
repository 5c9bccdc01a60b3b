"""Blocked-ELL SpMM — Pallas MXU kernel (the flagship compute path).

TPU-native replacement for the reference's per-block cuBLAS/CUTLASS loops
(cuda_utilities.cpp:39-209, cutlass_bellpack_lib.cu:60-242): instead of one
GEMM launch per nonzero block over CUDA streams, a SINGLE kernel walks each
block-row's nonzero blocks, DMAs the matching B row-stripes HBM->VMEM with
double buffering, and accumulates bh x TN output tiles on the MXU in fp32.

Grid: (n_block_rows, N // TN).  Per step:
  - the block-row's values [max_nb, bh, bw] are auto-pipelined into VMEM;
  - block-column indices and true block counts ride in SMEM via scalar
    prefetch, bounding the inner loop at the row's actual block count
    (padding rows cost nothing);
  - B stays in HBM (ANY); tiles are gathered by index with two-slot DMA
    overlap, so the MXU runs while the next stripe is in flight.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .device import BellDevice


def _kernel(
    # scalar prefetch
    cols_ref,     # int32 [nbr, max_nb] (SMEM)
    nb_ref,       # int32 [nbr]        (SMEM)
    # inputs
    vals_ref,     # [1, max_nb, bh, bw] (VMEM, this block-row)
    b_hbm,        # [K, N] (HBM)
    # output
    out_ref,      # [bh, TN] (VMEM)
    # scratch
    b_buf,        # [nslots, bw, TN] (VMEM)
    acc_ref,      # [bh, TN] fp32 (VMEM)
    sems,         # DMA sems (nslots,)
    *,
    bw: int,
    tn: int,
    nslots: int,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    nb = nb_ref[i]

    def b_dma(k, slot):
        jb = cols_ref[i, k]
        return pltpu.make_async_copy(
            b_hbm.at[pl.ds(jb * bw, bw), pl.ds(j * tn, tn)],
            b_buf.at[slot],
            sems.at[slot],
        )

    # per-stripe copies are latency-bound: keep nslots-1 in flight
    for s in range(nslots - 1):
        @pl.when(s < nb)
        def _(s=s):
            b_dma(s, s).start()

    def body(k, _):
        slot = jax.lax.rem(k, nslots)

        @pl.when(k + (nslots - 1) < nb)
        def _():
            b_dma(k + (nslots - 1),
                  jax.lax.rem(k + (nslots - 1), nslots)).start()

        b_dma(k, slot).wait()
        acc_ref[...] += jax.lax.dot(
            vals_ref[0, k], b_buf[slot], preferred_element_type=jnp.float32
        )
        return 0

    acc_ref[...] = jnp.zeros_like(acc_ref)
    jax.lax.fori_loop(0, nb, body, 0)
    out_ref[...] = acc_ref[...].astype(out_ref.dtype)


def _kernel_bcache(
    cols_ref,     # int32 [nbr, max_nb] (SMEM)
    nb_ref,       # int32 [nbr]        (SMEM)
    vals_ref,     # [1, max_nb, bh, bw] (VMEM, this block-row)
    b_ref,        # [K, tn] (VMEM, resident across the whole i sweep)
    out_ref,      # [bh, tn]
    acc_ref,      # [bh, tn] fp32
    *,
    bw: int,
):
    i = pl.program_id(1)
    nb = nb_ref[i]
    acc_ref[...] = jnp.zeros_like(acc_ref)

    def body(k, _):
        jb = cols_ref[i, k]
        acc_ref[...] += jax.lax.dot(
            vals_ref[0, k],
            b_ref[pl.ds(jb * bw, bw), :],
            preferred_element_type=jnp.float32,
        )
        return 0

    jax.lax.fori_loop(0, nb, body, 0)
    out_ref[...] = acc_ref[...].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tn", "out_dtype", "interpret"))
def bell_spmm_pallas_bcache(
    bell: BellDevice,
    B: jax.Array,
    tn: int = 512,
    out_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    """Blocked SpMM with the B column-tile RESIDENT in VMEM.

    Grid (N/tn, nbr) with the block-row sweep innermost: the pipeline fetches
    B[:, j*tn:(j+1)*tn] once per j and keeps it while every block-row
    multiplies against it, so B HBM traffic is K*N instead of the gather
    kernel's nzblocks*bw*N — compute-bound when block density is moderate.
    Requires K*tn*itemsize to fit the VMEM budget (see auto selector).
    """
    nbr, max_nb, bh, bw = bell.vals.shape
    K, N = B.shape
    if N % tn:
        raise ValueError(f"N={N} not a multiple of tile {tn}")
    out_dtype = out_dtype or B.dtype
    interpret = interpret or jax.default_backend() == "cpu"

    kernel = functools.partial(_kernel_bcache, bw=bw)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(N // tn, nbr),
            in_specs=[
                pl.BlockSpec(
                    (1, max_nb, bh, bw),
                    lambda j, i, *_: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((K, tn), lambda j, i, *_: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (bh, tn), lambda j, i, *_: (i, j), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[pltpu.VMEM((bh, tn), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((nbr * bh, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nbr * max_nb * bh * bw * N,
            bytes_accessed=(
                (N // tn) * bell.vals.size * bell.vals.dtype.itemsize
                + K * N * B.dtype.itemsize
                + nbr * bh * N * jnp.dtype(out_dtype).itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(bell.cols_idx, bell.nb_row, bell.vals, B)


VMEM_BUDGET = 10 * 1024 * 1024  # leave headroom out of ~16MB/core


def bell_spmm_pallas_auto(
    bell: BellDevice, B: jax.Array, out_dtype=None, interpret: bool = False
) -> jax.Array:
    """Pick the resident-B kernel when a column tile fits VMEM, else the
    gather-DMA kernel; choose the largest fitting tile width."""
    K, N = B.shape
    item = B.dtype.itemsize
    # Mosaic requires the lane (last) dim of VMEM blocks to be a multiple
    # of 128: never tile below that
    tiles = [t for t in (1024, 512, 256, 128) if N % t == 0] or [N]
    for tn in tiles:
        vals_row = bell.max_nb * bell.block_row_size * bell.block_col_size
        # the B tile rides a BlockSpec, so Pallas double-buffers it: count
        # it twice (a single-count estimate OOM'd scoped vmem at K*tn=10.5MB)
        need = 2 * K * tn * item + 2 * vals_row * bell.vals.dtype.itemsize \
            + 3 * bell.block_row_size * tn * 4
        if need <= VMEM_BUDGET:
            return bell_spmm_pallas_bcache(bell, B, tn=tn, out_dtype=out_dtype,
                                           interpret=interpret)
    # B can't be VMEM-resident at any valid tile: gather stripes from HBM
    # with the LARGEST tile (the gather kernel re-reads vals once per
    # column tile, so a small tn multiplies A-values HBM traffic)
    return bell_spmm_pallas(bell, B, tn=tiles[0], out_dtype=out_dtype,
                            interpret=interpret)


@functools.partial(
    jax.jit, static_argnames=("tn", "nslots", "out_dtype", "interpret")
)
def bell_spmm_pallas(
    bell: BellDevice,
    B: jax.Array,
    tn: int = 512,
    nslots: int = 4,
    out_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    """C[permuted rows] = A_bell @ B on the MXU.   B: [K, N], K == nbc*bw.

    N must be a multiple of ``tn`` (pad N or lower tn; the bench harness
    picks tn automatically)."""
    nbr, max_nb, bh, bw = bell.vals.shape
    K, N = B.shape
    if N % tn:
        raise ValueError(f"N={N} not a multiple of tile {tn}")
    out_dtype = out_dtype or B.dtype
    interpret = interpret or jax.default_backend() == "cpu"

    grid = (nbr, N // tn)
    kernel = functools.partial(_kernel, bw=bw, tn=tn, nslots=nslots)

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, max_nb, bh, bw),
                    lambda i, j, *_: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pl.ANY),  # B stays in HBM
            ],
            out_specs=pl.BlockSpec(
                (bh, tn), lambda i, j, *_: (i, j), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((nslots, bw, tn), B.dtype),
                pltpu.VMEM((bh, tn), jnp.float32),
                pltpu.SemaphoreType.DMA((nslots,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nbr * bh, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nbr * max_nb * bh * bw * N,
            bytes_accessed=(
                bell.vals.size * bell.vals.dtype.itemsize
                + nbr * max_nb * (N // tn) * bw * tn * B.dtype.itemsize
                + nbr * bh * N * jnp.dtype(out_dtype).itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(bell.cols_idx, bell.nb_row, bell.vals, B)

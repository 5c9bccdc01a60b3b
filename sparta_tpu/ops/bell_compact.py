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

All resident-B variants (plain / multirow / chunked / unrolled /
unrolled_multirow / fused-epilogue) share ONE kernel body and ONE
``pallas_call`` builder, parameterized by (chunk, nslots, rows, guarded,
epilogue) — the scaffolding (grid spec, scratch, cost estimate) is written
once so a fix propagates everywhere.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..definitions import to_device
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats.bell import BELL


def _flatten_bell_rows(bell: BELL, row_ptr: np.ndarray):
    """Scatter the ELL-padded [nbr, max_nb] block arrays into flat streams
    at each row's ``row_ptr`` offset (rows may be padded: row_ptr gaps wider
    than nb_row stay zero blocks). Fully vectorized — on a 1M-block-row
    matrix the per-row python loop this replaces dominated ingest."""
    nb = bell.nb_row.astype(np.int64)
    total = int(row_ptr[-1])
    cols = np.zeros(total, dtype=np.int32)
    vals = np.zeros((max(total, 1), bell.block_row_size, bell.block_col_size),
                    dtype=np.float32)
    if bell.cols_idx.size:
        nbr, max_nb = bell.cols_idx.shape
        valid = np.arange(max_nb, dtype=np.int64)[None, :] < nb[:, None]
        dest = row_ptr[:-1].astype(np.int64)[:, None] + np.arange(
            max_nb, dtype=np.int64)[None, :]
        # integer row gather/scatter on a 2D view — numpy boolean advanced
        # indexing over the 4D vals runs ~25x slower than this
        src = np.flatnonzero(valid.ravel())
        dst = dest.ravel()[src]
        cols[dst] = bell.cols_idx.ravel()[src]
        vals[dst] = bell.vals.reshape(nbr * max_nb, *bell.vals.shape[2:])[src]
    return cols, vals


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BellCompactDevice:
    """CSR-of-blocks on device: block b of block-row i lives at
    flat position row_ptr[i] + b."""

    row_ptr: jax.Array    # int32 [nbr+1]
    cols_flat: jax.Array  # int32 [nzblocks]
    vals_flat: jax.Array  # [nzblocks, bh, bw]
    # static: every block-row's count is a multiple of this (1 = unpadded);
    # set by compact_from_host_padded, REQUIRED by the unrolled kernel
    chunk_multiple: int = 1
    # static: zero safety blocks appended past row_ptr[-1] (pad_blocks);
    # the chunked kernel's overrunning DMAs require chunk*nslots of them
    pad_count: int = 0

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
        return (
            (self.row_ptr, self.cols_flat, self.vals_flat),
            (self.chunk_multiple, self.pad_count),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, chunk_multiple=aux[0], pad_count=aux[1])

    @classmethod
    def from_host(cls, bell: BELL, dtype=jnp.float32) -> "BellCompactDevice":
        nb = bell.nb_row.astype(np.int64)
        row_ptr = np.concatenate(([0], np.cumsum(nb))).astype(np.int32)
        cols, vals = _flatten_bell_rows(bell, row_ptr)
        return cls(
            row_ptr=jnp.asarray(row_ptr),
            cols_flat=jnp.asarray(cols),
            vals_flat=to_device(vals, dtype),
        )

    def pad_blocks(self, extra: int) -> "BellCompactDevice":
        """Append ``extra`` zero blocks to the flat vals/cols streams so
        chunked DMAs may safely overrun past the last row's blocks."""
        if extra <= 0:
            return self
        cols = np.concatenate(
            [np.asarray(self.cols_flat), np.zeros(extra, dtype=np.int32)]
        )
        v = self.vals_flat
        vals = jnp.concatenate(
            [v, jnp.zeros((extra,) + v.shape[1:], dtype=v.dtype)]
        )
        return BellCompactDevice(
            row_ptr=self.row_ptr,
            cols_flat=jnp.asarray(cols),
            vals_flat=vals,
            chunk_multiple=self.chunk_multiple,
            pad_count=self.pad_count + extra,
        )

    def pad_rows(self, multiple: int) -> "BellCompactDevice":
        """Append empty block-rows until n_block_rows % multiple == 0
        (for the multirow kernel); padding rows produce zero output rows."""
        nbr = self.n_block_rows
        pad = (-nbr) % multiple
        if pad == 0:
            return self
        rp = np.asarray(self.row_ptr)
        rp = np.concatenate([rp, np.full(pad, rp[-1], dtype=rp.dtype)])
        return BellCompactDevice(
            row_ptr=jnp.asarray(rp),
            cols_flat=self.cols_flat,
            vals_flat=self.vals_flat,
            chunk_multiple=self.chunk_multiple,
            pad_count=self.pad_count,
        )


# --------------------------------------------------------------------------
# unified resident-B kernel body + pallas_call builder
# --------------------------------------------------------------------------

def _kernel_resident(
    row_ptr_ref,   # int32 [nbr+1] (SMEM)
    cols_ref,      # int32 [total] (SMEM)
    vals_hbm,      # [total, bh, bw] (HBM)
    b_hbm,         # [K, N] (HBM)
    *refs,         # [bias_ref f32 [1,1,bh] if has_bias,] out_ref [rows*bh,tn],
                   # b_tile [K,tn], vbuf [nslots,chunk,bh,bw], acc_ref, bsem,
                   # vsems (nslots,)
    bw: int,
    tn: int,
    chunk: int,
    nslots: int,
    rows: int,
    guarded: bool,
    has_bias: bool = False,
    relu: bool = False,
):
    """One body for every resident-B variant.

    ``chunk`` blocks per vals DMA, an ``nslots``-deep DMA pipeline, ``rows``
    block-rows per grid step (amortizes the measured ~312 ns/step pipeline
    floor).  ``guarded=True`` guards the intra-chunk dots with ``pl.when``
    (rows need no chunk padding); ``guarded=False`` runs them unguarded and
    requires every row's block count to be a chunk multiple
    (compact_from_host_padded) — on v5e one fori_loop iteration (~115ns) and
    one pl.when (~90ns) each cost as much as a 128x128x512 dot (~93ns), so
    guard-free unrolling is the difference between ~50% and ~85% of peak."""
    if has_bias:
        bias_ref, out_ref, b_tile, vbuf, acc_ref, bsem, vsems = refs
    else:
        out_ref, b_tile, vbuf, acc_ref, bsem, vsems = refs
        bias_ref = None
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

    for r in range(rows):  # static unroll over the row group
        start = row_ptr_ref[i * rows + r]
        nb = row_ptr_ref[i * rows + r + 1] - start
        nchunks = (nb + chunk - 1) // chunk if guarded else nb // chunk

        def vdma(c, slot, start=start):
            return pltpu.make_async_copy(
                vals_hbm.at[pl.ds(start + c * chunk, chunk)],
                vbuf.at[slot],
                vsems.at[slot],
            )

        for s in range(nslots - 1):  # prime the pipeline
            @pl.when(s < nchunks)
            def _(s=s, vdma=vdma):
                vdma(s, s).start()

        acc_ref[...] = jnp.zeros_like(acc_ref)

        def body(c, _, vdma=vdma, nchunks=nchunks, nb=nb, start=start):
            slot = jax.lax.rem(c, nslots)

            @pl.when(c + (nslots - 1) < nchunks)
            def _():
                vdma(c + (nslots - 1),
                     jax.lax.rem(c + (nslots - 1), nslots)).start()

            vdma(c, slot).wait()
            for k in range(chunk):  # static unroll over the chunk
                t = c * chunk + k

                def dot(t=t, k=k, slot=slot):
                    jb = cols_ref[start + t]
                    acc_ref[...] += jax.lax.dot(
                        vbuf[slot, k],
                        b_tile[pl.ds(jb * bw, bw), :],
                        preferred_element_type=jnp.float32,
                    )

                if guarded and chunk > 1:
                    pl.when(t < nb)(dot)
                else:  # chunk==1 never overruns; unrolled rows are padded
                    dot()
            return 0

        jax.lax.fori_loop(0, nchunks, body, 0)
        y = acc_ref[...]
        if has_bias:
            y = y + bias_ref[0, 0][:, None]
            if relu:
                y = jnp.maximum(y, 0.0)
        bh = acc_ref.shape[0]
        out_ref[r * bh:(r + 1) * bh, :] = y.astype(out_ref.dtype)


def _cost_estimate(bell, B, tn, out_dtype, resident_b: bool):
    """Written once for every variant: the only difference is whether the B
    tile is VMEM-resident (read K*N once) or HBM-gathered per block."""
    total, bh, bw = bell.vals_flat.shape
    nbr = bell.n_block_rows
    K, N = B.shape
    vals_bytes = (N // tn) * total * bh * bw * bell.vals_flat.dtype.itemsize
    out_bytes = nbr * bh * N * jnp.dtype(out_dtype).itemsize
    if resident_b:
        b_bytes = K * N * B.dtype.itemsize
    else:
        b_bytes = (N // tn) * total * bw * tn * B.dtype.itemsize
    return pl.CostEstimate(
        flops=2 * total * bh * bw * N,
        bytes_accessed=b_bytes + vals_bytes + out_bytes,
        transcendentals=0,
    )


def _resident_call(
    bell: BellCompactDevice,
    B: jax.Array,
    *,
    tn: int,
    chunk: int,
    nslots: int,
    rows: int,
    guarded: bool,
    out_dtype,
    interpret: bool,
    bias: jax.Array | None = None,
    relu: bool = False,
):
    total, bh, bw = bell.vals_flat.shape
    nbr = bell.n_block_rows
    K, N = B.shape
    kernel = functools.partial(
        _kernel_resident, bw=bw, tn=tn, chunk=chunk, nslots=nslots,
        rows=rows, guarded=guarded, has_bias=bias is not None, relu=relu,
    )
    extra_inputs, extra_specs = (), ()
    if bias is not None:
        assert rows == 1, "fused epilogue supports rows_per_step=1 only"
        extra_inputs = (bias,)
        extra_specs = (
            pl.BlockSpec((1, 1, bh), lambda j, i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(N // tn, nbr // rows),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # vals stay in HBM
                pl.BlockSpec(memory_space=pl.ANY),  # B stays in HBM
                *extra_specs,
            ],
            out_specs=pl.BlockSpec(
                (rows * bh, tn), lambda j, i, *_: (i, j),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((K, tn), B.dtype),
                pltpu.VMEM((nslots, chunk, bh, bw), bell.vals_flat.dtype),
                pltpu.VMEM((bh, tn), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA((nslots,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nbr * bh, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=_cost_estimate(bell, B, tn, out_dtype, resident_b=True),
        interpret=interpret,
    )(bell.row_ptr, bell.cols_flat, bell.vals_flat, B, *extra_inputs)


def _check_tile(N, tn):
    if N % tn:
        raise ValueError(f"N={N} not a multiple of tile {tn}")


def _check_chunk_padding(bell, chunk):
    if bell.chunk_multiple % chunk:
        raise ValueError(
            f"layout padded to multiples of {bell.chunk_multiple}, kernel "
            f"chunk={chunk}: build with compact_from_host_padded(bell, "
            f"{chunk}) — unpadded rows would silently drop trailing blocks"
        )


def _check_rows(nbr, R):
    if nbr % R:
        raise ValueError(f"n_block_rows={nbr} not a multiple of {R}")


# --------------------------------------------------------------------------
# public resident-B variants
# --------------------------------------------------------------------------

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
    _check_tile(B.shape[1], tn)
    return _resident_call(
        bell, B, tn=tn, chunk=1, nslots=2, rows=1, guarded=True,
        out_dtype=out_dtype or B.dtype,
        interpret=interpret or jax.default_backend() == "cpu",
    )


@functools.partial(
    jax.jit, static_argnames=("tn", "rows_per_step", "out_dtype", "interpret")
)
def bell_spmm_pallas_compact_multirow(
    bell: BellCompactDevice,
    B: jax.Array,
    tn: int = 512,
    rows_per_step: int = 4,
    out_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    """Compact kernel with ``rows_per_step`` block-rows per grid step
    (measured neutral-to-slower at the headline shape — step overhead is not
    the bottleneck there — kept for shapes with many near-empty block-rows).

    Requires n_block_rows % rows_per_step == 0 (pad with empty block-rows
    via ``BellCompactDevice.pad_rows``)."""
    _check_tile(B.shape[1], tn)
    _check_rows(bell.n_block_rows, rows_per_step)
    return _resident_call(
        bell, B, tn=tn, chunk=1, nslots=2, rows=rows_per_step, guarded=True,
        out_dtype=out_dtype or B.dtype,
        interpret=interpret or jax.default_backend() == "cpu",
    )


@functools.partial(
    jax.jit,
    static_argnames=("tn", "chunk", "nslots", "out_dtype", "interpret"),
)
def bell_spmm_pallas_compact_chunked(
    bell: BellCompactDevice,
    B: jax.Array,
    tn: int = 512,
    chunk: int = 2,
    nslots: int = 2,
    out_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    """Compact kernel with CHUNKED vals DMA: ``chunk`` blocks per copy and
    an ``nslots``-deep pipeline (fewer, larger copies). ``bell`` must carry
    at least ``chunk * nslots`` safety padding blocks (see pad_blocks):
    a row's last chunk DMA may overrun into the next row's blocks (fetched
    but never used)."""
    _check_tile(B.shape[1], tn)
    if bell.pad_count < chunk * nslots:
        raise ValueError(
            f"chunked kernel needs {chunk * nslots} safety padding blocks "
            f"(device has {bell.pad_count}); build with "
            f"BellCompactDevice.pad_blocks({chunk * nslots}) — the last "
            f"row's chunk DMA may overrun the flat vals/cols streams"
        )
    return _resident_call(
        bell, B, tn=tn, chunk=chunk, nslots=nslots, rows=1, guarded=True,
        out_dtype=out_dtype or B.dtype,
        interpret=interpret or jax.default_backend() == "cpu",
    )


@functools.partial(
    jax.jit, static_argnames=("tn", "chunk", "nslots", "out_dtype", "interpret")
)
def bell_spmm_pallas_compact_unrolled(
    bell: BellCompactDevice,
    B: jax.Array,
    tn: int = 512,
    chunk: int = 4,
    nslots: int = 2,
    out_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    """Compact kernel, guard-free chunk-unrolled inner loop. ``bell`` must
    come from ``compact_from_host_padded(bell, chunk)`` (every block-row's
    count a multiple of ``chunk``)."""
    _check_tile(B.shape[1], tn)
    _check_chunk_padding(bell, chunk)
    return _resident_call(
        bell, B, tn=tn, chunk=chunk, nslots=nslots, rows=1, guarded=False,
        out_dtype=out_dtype or B.dtype,
        interpret=interpret or jax.default_backend() == "cpu",
    )


@functools.partial(
    jax.jit,
    static_argnames=("tn", "chunk", "nslots", "rows_per_step", "out_dtype",
                     "interpret"),
)
def bell_spmm_pallas_compact_unrolled_multirow(
    bell: BellCompactDevice,
    B: jax.Array,
    tn: int = 512,
    chunk: int = 4,
    nslots: int = 2,
    rows_per_step: int = 4,
    out_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    """Guard-free unrolled kernel, ``rows_per_step`` block-rows per grid
    step.  ``bell`` from ``compact_from_host_padded(bell, chunk)`` with
    n_block_rows padded to a rows_per_step multiple (``pad_rows``)."""
    _check_tile(B.shape[1], tn)
    _check_rows(bell.n_block_rows, rows_per_step)
    _check_chunk_padding(bell, chunk)
    return _resident_call(
        bell, B, tn=tn, chunk=chunk, nslots=nslots, rows=rows_per_step,
        guarded=False,
        out_dtype=out_dtype or B.dtype,
        interpret=interpret or jax.default_backend() == "cpu",
    )


@functools.partial(
    jax.jit,
    static_argnames=("tn", "chunk", "nslots", "relu", "out_dtype", "interpret"),
)
def bell_spmm_pallas_compact_unrolled_epilogue(
    bell: BellCompactDevice,
    B: jax.Array,
    bias: jax.Array,   # f32 [nbr * bh] (padded row space)
    tn: int = 512,
    chunk: int = 4,
    nslots: int = 2,
    relu: bool = False,
    out_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    """out = act(A @ B + bias[:, None]) with the epilogue fused into the
    unrolled kernel's output stage — the bias add and activation cost no
    extra HBM round trip of the output (XLA cannot fuse into a custom
    call). ``bell`` from compact_from_host_padded."""
    _check_tile(B.shape[1], tn)
    _check_chunk_padding(bell, chunk)
    nbr = bell.n_block_rows
    bias2 = bias.astype(jnp.float32).reshape(nbr, 1, bell.block_row_size)
    return _resident_call(
        bell, B, tn=tn, chunk=chunk, nslots=nslots, rows=1, guarded=False,
        out_dtype=out_dtype or B.dtype,
        interpret=interpret or jax.default_backend() == "cpu",
        bias=bias2, relu=relu,
    )


# --------------------------------------------------------------------------
# host-side packing
# --------------------------------------------------------------------------

def compact_from_host_padded(
    bell: BELL, chunk: int, dtype=jnp.float32
) -> BellCompactDevice:
    """CSR-of-blocks with every row's block count padded UP to a multiple
    of ``chunk`` with explicit zero blocks (block-col 0, zero values).

    Zero blocks contribute nothing to the product, so the unrolled kernel
    can run ``chunk`` UNGUARDED dots per loop iteration (see
    _kernel_resident). Average fill-in is (chunk-1)/2 blocks per
    block-row."""
    nb = bell.nb_row.astype(np.int64)
    nb_pad = (nb + chunk - 1) // chunk * chunk
    row_ptr = np.concatenate(([0], np.cumsum(nb_pad))).astype(np.int32)
    cols, vals = _flatten_bell_rows(bell, row_ptr)
    return BellCompactDevice(
        row_ptr=jnp.asarray(row_ptr),
        cols_flat=jnp.asarray(cols),
        vals_flat=to_device(vals, dtype),
        chunk_multiple=chunk,
    )


def compact_ksplit_from_host(
    bell: BELL, n_parts: int, chunk: int, dtype=jnp.float32
):
    """Split the blocked matrix by CONTIGUOUS block-column ranges into
    ``n_parts`` compact devices with locally remapped column ids.

    The huge-K layout: when no B column tile [K, tn] fits VMEM, each part's
    K-slice does — the K-split SpMM runs the resident-B unrolled kernel per
    part and accumulates C, so B streams from HBM exactly once (vs the
    gather kernel's per-block stripe fetches, bw*tn bytes per nonzero block
    per pass — the dominant term on low-block-density graphs).

    Returns (parts, k_part_blocks): parts is a list of (possibly None for
    empty ranges) BellCompactDevice, each padded for ``chunk``.
    """
    nbc = bell.n_block_cols
    k_part = -(-nbc // n_parts)
    nbr = bell.n_block_rows
    bh, bw = bell.block_row_size, bell.block_col_size
    max_nb = bell.max_nb
    valid = np.arange(max_nb)[None, :] < bell.nb_row[:, None]
    vals2d = bell.vals.reshape((nbr * max_nb,) + bell.vals.shape[2:]) \
        if max_nb else bell.vals
    parts = []
    for p in range(n_parts):
        lo = p * k_part
        hi = min(lo + k_part, nbc)
        sel = valid & (bell.cols_idx >= lo) & (bell.cols_idx < hi)
        counts = sel.sum(axis=1).astype(np.int64)
        total = int(counts.sum())
        if total == 0:
            parts.append(None)
            continue
        # compact each row's selected blocks to the front (stable argsort of
        # ~sel preserves order), flat integer gather on a 2D view of vals —
        # vectorized over all rows (see _flatten_bell_rows note)
        width = max(int(counts.max()), 1)
        order = np.argsort(~sel, axis=1, kind="stable")[:, :width]
        in_part = np.arange(width)[None, :] < counts[:, None]
        sub_cols = np.where(
            in_part, np.take_along_axis(bell.cols_idx, order, axis=1) - lo, -1
        ).astype(bell.cols_idx.dtype)
        flat = np.arange(nbr, dtype=np.int64)[:, None] * max_nb + order
        sub_vals = vals2d[flat.ravel()].reshape(
            (nbr, width) + bell.vals.shape[2:]).astype(bell.vals.dtype)
        sub_vals *= in_part[:, :, None, None].astype(sub_vals.dtype)
        sub = BELL(
            cols_idx=sub_cols, vals=sub_vals,
            nb_row=counts.astype(bell.nb_row.dtype),
            row_perm=bell.row_perm,
            block_row_size=bh, block_col_size=bw,
            shape=(nbr * bh, (hi - lo) * bw),
            orig_shape=bell.orig_shape,
        )
        parts.append(compact_from_host_padded(sub, chunk, dtype=dtype))
    return parts, k_part


def bell_spmm_pallas_compact_ksplit(
    parts,
    k_part: int,
    bw: int,
    B: jax.Array,
    tn: int = 512,
    chunk: int = 2,
    out_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    """C = A @ B through per-K-slice resident-B unrolled kernels, fp32
    accumulated across parts.  ``parts`` from ``compact_ksplit_from_host``;
    B is padded to n_parts * k_part * bw rows internally."""
    out_dtype = out_dtype or B.dtype
    n_parts = len(parts)
    K_need = n_parts * k_part * bw
    if B.shape[0] < K_need:
        B = jnp.pad(B, ((0, K_need - B.shape[0]), (0, 0)))
    out = None
    for p, cdev in enumerate(parts):
        if cdev is None:
            continue
        Bp = jax.lax.slice_in_dim(B, p * k_part * bw, (p + 1) * k_part * bw)
        Cp = bell_spmm_pallas_compact_unrolled(
            cdev, Bp, tn=tn, chunk=chunk, out_dtype=jnp.float32,
            interpret=interpret,
        )
        out = Cp if out is None else out + Cp
    if out is None:
        raise ValueError("K-split SpMM over an all-empty matrix")
    return out.astype(out_dtype)


def compact_auto_chunk(nb_row) -> int:
    """Default unroll chunk for compact_from_host_padded: ~80% of the mean
    blocks-per-row balances loop-overhead amortization against zero-block
    fill-in (measured optimum c=5..8 at mean nb=6.4 on v5e)."""
    mean = max(float(np.mean(np.asarray(nb_row))), 1.0)
    return int(np.clip(round(mean * 0.8), 2, 8))


def compact_optimal_chunk(nb_row, dot_s: float = 93e-9,
                          iter_s: float = 115e-9,
                          max_chunk: int = 8) -> int:
    """Exact model-optimal unroll chunk from the row histogram.

    Per column-tile pass, a block-row with ``nb`` nonzero blocks costs
    ``ceil(nb/c)`` fori iterations of ``c`` unguarded dots each (zero-block
    padding included), so the total is

        cost(c) = sum_rows ceil(nb/c) * (c*dot_s + iter_s)

    which this minimizes exactly over c in [1, max_chunk] (the pass count
    and tile width scale both terms equally, so the argmin is shape-free).
    The mean-based heuristic ``compact_auto_chunk`` is near-optimal for
    concentrated distributions (planted blocks, FEM) but can lose >20% of
    dot time on heavy-tailed rows (power-law graphs) where the mean sits
    in a gap of the histogram; this computes the argmin from the actual
    counts instead.  ``max_chunk`` stays at the hardware-validated DMA
    granularity bound (VMEM scratch = 2*chunk*bh*bw*itemsize)."""
    nb = np.asarray(nb_row, dtype=np.int64)
    nb = nb[nb > 0]
    if nb.size == 0:
        return 2
    cs = np.arange(1, max_chunk + 1, dtype=np.int64)
    steps = np.ceil(nb[:, None] / cs[None, :]).sum(axis=0)
    cost = steps * (cs * dot_s + iter_s)
    return int(cs[int(np.argmin(cost))])


# --------------------------------------------------------------------------
# HBM-gathered-B kernel (the large-matrix layout)
# --------------------------------------------------------------------------

def _kernel_gather(
    row_ptr_ref,   # int32 [nbr+1] (SMEM)
    cols_ref,      # int32 [total] (SMEM)
    vals_hbm,      # [total, bh, bw] (HBM)
    b_hbm,         # [K, N] (HBM)
    out_ref,       # [bh, tn] (VMEM)
    vbuf,          # [nslots, bh, bw] VMEM
    bbuf,          # [nslots, bw, tn] VMEM
    acc_ref,       # [bh, tn] fp32
    vsems,         # DMA sems (nslots,)
    bsems,         # DMA sems (nslots,)
    *,
    bw: int,
    tn: int,
    nslots: int,
):
    """Compact vals + HBM-gathered B: the LARGE-matrix kernel.

    Neither operand is VMEM-resident: per nonzero block, its values AND the
    matching B row-stripe stream from HBM with paired double-buffered DMAs.
    This is the only layout that works when K*tn exceeds VMEM (B tile can't
    be resident) and the block-count distribution is heavy-tailed (ELL
    padding of a power-law graph explodes), e.g. RMAT / social graphs."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    start = row_ptr_ref[i]
    nb = row_ptr_ref[i + 1] - start

    def vdma(k, slot):
        return pltpu.make_async_copy(
            vals_hbm.at[start + k], vbuf.at[slot], vsems.at[slot]
        )

    def bdma(k, slot):
        jb = cols_ref[start + k]
        return pltpu.make_async_copy(
            b_hbm.at[pl.ds(jb * bw, bw), pl.ds(j * tn, tn)],
            bbuf.at[slot],
            bsems.at[slot],
        )

    for s in range(nslots - 1):  # prime an (nslots-1)-deep pipeline
        @pl.when(s < nb)
        def _(s=s):
            vdma(s, s).start()
            bdma(s, s).start()

    acc_ref[...] = jnp.zeros_like(acc_ref)

    def body(k, _):
        slot = jax.lax.rem(k, nslots)

        @pl.when(k + (nslots - 1) < nb)
        def _():
            nslot = jax.lax.rem(k + (nslots - 1), nslots)
            vdma(k + (nslots - 1), nslot).start()
            bdma(k + (nslots - 1), nslot).start()

        vdma(k, slot).wait()
        bdma(k, slot).wait()
        acc_ref[...] += jax.lax.dot(
            vbuf[slot], bbuf[slot], preferred_element_type=jnp.float32
        )
        return 0

    jax.lax.fori_loop(0, nb, body, 0)
    out_ref[...] = acc_ref[...].astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("tn", "nslots", "out_dtype", "interpret")
)
def bell_spmm_pallas_compact_gather(
    bell: BellCompactDevice,
    B: jax.Array,
    tn: int = 512,
    nslots: int = 4,
    out_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    """Large-matrix blocked SpMM: compact vals stream + HBM-gathered B.

    Use when K*tn exceeds the VMEM budget (no resident B tile possible) or
    the per-row block counts are heavy-tailed (ELL padding prohibitive)."""
    total, bh, bw = bell.vals_flat.shape
    nbr = bell.n_block_rows
    K, N = B.shape
    _check_tile(N, tn)
    out_dtype = out_dtype or B.dtype
    interpret = interpret or jax.default_backend() == "cpu"

    kernel = functools.partial(_kernel_gather, bw=bw, tn=tn, nslots=nslots)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nbr, N // tn),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (bh, tn), lambda i, j, *_: (i, j), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((nslots, bh, bw), bell.vals_flat.dtype),
                pltpu.VMEM((nslots, bw, tn), B.dtype),
                pltpu.VMEM((bh, tn), jnp.float32),
                pltpu.SemaphoreType.DMA((nslots,)),
                pltpu.SemaphoreType.DMA((nslots,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nbr * bh, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=_cost_estimate(bell, B, tn, out_dtype, resident_b=False),
        interpret=interpret,
    )(bell.row_ptr, bell.cols_flat, bell.vals_flat, B)

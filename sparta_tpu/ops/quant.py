"""Int8 / fp8 quantized blocked SpMM.

The reference defines low-precision compute paths via cuBLAS type switches
(cuda_utilities.cpp:24-32, CUDA_R_8I / half).  TPU-natively: per-block
symmetric quantization of the A blocks, per-row-stripe quantization of B,
low-precision MXU matmuls, dequantized by the product of scales into fp32.
v5e int8 throughput is 2x bf16; fp8 (e4m3) stores 1 byte/elem — halves the
vals+B HBM/VMEM traffic like int8 — with ~3 mantissa bits of precision
(int8 with per-block scales is usually both as fast and more accurate; the
fp8 path exists for checkpoint compatibility and the type-switch parity).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from .device import BellDevice


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QBellDevice:
    cols_idx: jax.Array  # int32 [nbr, max_nb]
    nb_row: jax.Array    # int32 [nbr]
    q_vals: jax.Array    # int8 [nbr, max_nb, bh, bw]
    scales: jax.Array    # f32 [nbr, max_nb]

    def tree_flatten(self):
        return (self.cols_idx, self.nb_row, self.q_vals, self.scales), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def from_bell(cls, bell: BellDevice) -> "QBellDevice":
        v = bell.vals.astype(jnp.float32)
        amax = jnp.max(jnp.abs(v), axis=(2, 3))
        scale = jnp.where(amax > 0, amax / 127.0, 1.0)
        q = jnp.clip(jnp.round(v / scale[:, :, None, None]), -127, 127).astype(jnp.int8)
        return cls(bell.cols_idx, bell.nb_row, q, scale)


def quantize_b(B: jax.Array, bw: int):
    """Quantize B per row-stripe of width bw -> (int8 [nbc, bw, N], f32 [nbc])."""
    Bt = B.astype(jnp.float32).reshape(-1, bw, B.shape[1])
    amax = jnp.max(jnp.abs(Bt), axis=(1, 2))
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(Bt / scale[:, None, None]), -127, 127).astype(jnp.int8)
    return q, scale


@jax.jit
def bell_spmm_int8(qbell: QBellDevice, Bq: jax.Array, bscale: jax.Array) -> jax.Array:
    """C = dequant( Aq @ Bq ):  int8 x int8 -> int32 MXU, fp32 dequant."""
    nbr, max_nb, bh, bw = qbell.q_vals.shape
    N = Bq.shape[2]
    safe_idx = jnp.maximum(qbell.cols_idx, 0)

    def step(acc, k):
        stripes = Bq[safe_idx[:, k]]  # int8 [nbr, bw, N]
        prod = jax.lax.dot_general(
            qbell.q_vals[:, k], stripes,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )
        deq = prod.astype(jnp.float32) * (
            qbell.scales[:, k] * bscale[safe_idx[:, k]]
        )[:, None, None]
        return acc + deq, None

    acc0 = jnp.zeros((nbr, bh, N), dtype=jnp.float32)
    acc, _ = jax.lax.scan(step, acc0, jnp.arange(max_nb))
    return acc.reshape(nbr * bh, N)


def _compact_quantized(bell, chunk: int, qmax: float, cast):
    """Shared compact CSR-of-blocks quantization: per-block symmetric scale
    amax/qmax, values cast via ``cast(blk/scale)``.  Returns
    (row_ptr, cols, scales, qvals) numpy arrays, rows padded to chunk."""
    import numpy as np

    nb = np.asarray(bell.nb_row, dtype=np.int64)
    nb_pad = (nb + chunk - 1) // chunk * chunk
    row_ptr = np.concatenate(([0], np.cumsum(nb_pad))).astype(np.int32)
    total = int(row_ptr[-1])
    bh, bw = bell.block_row_size, bell.block_col_size
    cols = np.zeros(total, dtype=np.int32)
    scales = np.ones(total, dtype=np.float32)
    q = np.zeros((max(total, 1), bh, bw), dtype=np.float32)
    vals = np.asarray(bell.vals, dtype=np.float32)
    for i in range(bell.n_block_rows):
        n = int(nb[i])
        s = row_ptr[i]
        cols[s : s + n] = bell.cols_idx[i, :n]
        blk = vals[i, :n]
        amax = np.abs(blk).max(axis=(1, 2)) if n else np.zeros(0)
        sc = np.where(amax > 0, amax / qmax, 1.0).astype(np.float32)
        scales[s : s + n] = sc
        q[s : s + n] = blk / sc[:, None, None]
    return row_ptr, cols, scales, cast(q)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QBellCompactDevice:
    """Compact CSR-of-blocks, int8 values + per-block scales, rows padded to
    a chunk multiple (zero blocks) for the guard-free unrolled kernel."""

    row_ptr: jax.Array     # int32 [nbr+1]
    cols_flat: jax.Array   # int32 [total]
    scales_flat: jax.Array  # f32 [total] per-block dequant scale
    q_vals: jax.Array      # int8 [total, bh, bw]
    chunk_multiple: int = 1  # static: row counts are multiples of this

    def tree_flatten(self):
        return (
            (self.row_ptr, self.cols_flat, self.scales_flat, self.q_vals),
            self.chunk_multiple,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, chunk_multiple=aux)

    @property
    def n_block_rows(self) -> int:
        return self.row_ptr.shape[0] - 1

    @classmethod
    def from_bell(cls, bell, chunk: int = 4) -> "QBellCompactDevice":
        """bell: host BELL. Quantizes per block (symmetric int8)."""
        import numpy as np

        row_ptr, cols, scales, q = _compact_quantized(
            bell, chunk, 127.0,
            lambda x: np.clip(np.round(x), -127, 127).astype(np.int8))
        return cls(
            row_ptr=jnp.asarray(row_ptr),
            cols_flat=jnp.asarray(cols),
            scales_flat=jnp.asarray(scales),
            q_vals=jnp.asarray(q),
            chunk_multiple=chunk,
        )


def _kernel_q_unrolled(
    row_ptr_ref,   # int32 [nbr+1] (SMEM), counts multiples of chunk
    cols_ref,      # int32 [total] (SMEM)
    ascale_ref,    # f32 [total] (SMEM)
    bscale_ref,    # f32 [nbc] (SMEM)
    vals_hbm,      # q [total, bh, bw] (HBM)
    b_hbm,         # q [K, N] (HBM)
    out_ref,       # f32 [bh, tn] (VMEM)
    b_tile,        # q [K, tn] persistent VMEM scratch
    vbuf,          # q [2, chunk, bh, bw] VMEM
    acc_ref,       # f32 [bh, tn]
    bsem,
    vsems,
    *,
    bw: int,
    tn: int,
    chunk: int,
    int_dot: bool,
    upcast: bool,
):
    """Shared low-precision unrolled kernel.  ``int_dot``: int8 x int8 ->
    int32 MXU dots; otherwise float dots, optionally upcast to bf16 first
    (fp8 on v5e, which has no native fp8 MXU path).  Dequant by the product
    of per-(A-block, B-stripe) scales, fp32 accumulate."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    j = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        cp = pltpu.make_async_copy(
            b_hbm.at[:, pl.ds(j * tn, tn)], b_tile, bsem
        )
        cp.start()
        cp.wait()

    start = row_ptr_ref[i]
    nchunks = (row_ptr_ref[i + 1] - start) // chunk

    def vdma(c, slot):
        return pltpu.make_async_copy(
            vals_hbm.at[pl.ds(start + c * chunk, chunk)],
            vbuf.at[slot],
            vsems.at[slot],
        )

    @pl.when(nchunks > 0)
    def _():
        vdma(0, 0).start()

    acc_ref[...] = jnp.zeros_like(acc_ref)

    def body(c, _):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nchunks)
        def _():
            vdma(c + 1, jax.lax.rem(c + 1, 2)).start()

        vdma(c, slot).wait()
        for k in range(chunk):  # static unroll, guard-free (zero padding)
            t = start + c * chunk + k
            jb = cols_ref[t]
            a = vbuf[slot, k]
            b = b_tile[pl.ds(jb * bw, bw), :]
            if int_dot:
                d = jax.lax.dot(
                    a, b, preferred_element_type=jnp.int32
                ).astype(jnp.float32)
            else:
                if upcast:
                    a = a.astype(jnp.bfloat16)
                    b = b.astype(jnp.bfloat16)
                d = jax.lax.dot(a, b, preferred_element_type=jnp.float32)
            acc_ref[...] += d * (ascale_ref[t] * bscale_ref[jb])
        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)
    out_ref[...] = acc_ref[...]


def _q_unrolled_call(qbell, Bq, bscale, tn, chunk, vdtype, int_dot, upcast,
                     interpret):
    """Shared pallas_call wrapper for the quantized unrolled kernels."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from functools import partial as _partial

    total, bh, bw = qbell.q_vals.shape
    nbr = qbell.n_block_rows
    K, N = Bq.shape
    if N % tn:
        raise ValueError(f"N={N} not a multiple of tile {tn}")
    if qbell.chunk_multiple % chunk:
        raise ValueError(
            f"layout padded to multiples of {qbell.chunk_multiple}, kernel "
            f"chunk={chunk}: rebuild from_bell with chunk={chunk}"
        )
    interpret = interpret or jax.default_backend() == "cpu"

    kernel = _partial(_kernel_q_unrolled, bw=bw, tn=tn, chunk=chunk,
                      int_dot=int_dot, upcast=upcast)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(N // tn, nbr),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (bh, tn), lambda j, i, *_: (i, j), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((K, tn), vdtype),
                pltpu.VMEM((2, chunk, bh, bw), vdtype),
                pltpu.VMEM((bh, tn), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nbr * bh, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * total * bh * bw * N,
            bytes_accessed=(
                K * N + (N // tn) * total * bh * bw + nbr * bh * N * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(qbell.row_ptr, qbell.cols_flat, qbell.scales_flat, bscale,
      qbell.q_vals, Bq)


@partial(jax.jit, static_argnames=("tn", "chunk", "interpret"))
def bell_spmm_int8_unrolled(
    qbell: QBellCompactDevice,
    Bq: jax.Array,        # int8 [K, N] (row-stripe quantized, flattened)
    bscale: jax.Array,    # f32 [nbc]
    tn: int = 512,
    chunk: int = 4,
    interpret: bool = False,
) -> jax.Array:
    """Int8 MXU blocked SpMM (2x bf16 peak on v5e): int8 x int8 -> int32
    dots, fp32 dequant-accumulate with per-(A-block, B-stripe) scales."""
    return _q_unrolled_call(qbell, Bq, bscale, tn, chunk, jnp.int8,
                            int_dot=True, upcast=False, interpret=interpret)


# ------------------------------------------------------- int8 row/col scales --
def quantize_b_cols(B: jax.Array, bw: int):
    """Quantize B per (row-stripe, column) -> (int8 [K, N], f32 [nbc, N]).

    Finer than :func:`quantize_b`'s one-scale-per-stripe: the amax is taken
    over the bw values a single MXU contraction column sees, which halves
    the end-to-end quantization error (measured 1.34e-2 -> 8.9e-3 max-rel
    on the headline planted-block matrix) at identical kernel cost — the
    dequant multiply was already an elementwise VPU op; only its operand
    changes from a scalar to a [tn] row vector."""
    K, N = B.shape
    Bt = B.astype(jnp.float32).reshape(-1, bw, N)
    amax = jnp.max(jnp.abs(Bt), axis=1)  # [nbc, N]
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(Bt / scale[:, None, :]), -127, 127).astype(jnp.int8)
    return q.reshape(K, N), scale


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QBellRowColDevice:
    """Compact CSR-of-blocks with per-GLOBAL-ROW int8 scales: each output
    row r of block-row i is quantized by one scale = amax over ALL of row
    r's entries across the block-row (finer than per-block for sparse
    blocks: the amax sees ~nnz_row values, not bh*bw).  The dequant then
    factors as ``C[r, :] = row_scale[r] * sum_t (Aq_t @ (Bq * bscale))`` so
    the A-scale multiply leaves the inner loop entirely — one [bh, 1]
    broadcast per grid step."""

    row_ptr: jax.Array     # int32 [nbr+1], counts padded to chunk multiple
    cols_flat: jax.Array   # int32 [total]
    row_scales: jax.Array  # f32 [nbr, bh] per-output-row dequant scale
    q_vals: jax.Array      # int8 [total, bh, bw]
    chunk_multiple: int = 1
    # max (padded) blocks per row, cached host-side at build time so the
    # int8_global overflow guard never syncs row_ptr off the device (a
    # device->host readback costs ~100 ms over the tunnel per eager call);
    # None = unknown (hand-built instance) -> guard falls back to a sync.
    nb_max: int | None = None

    def tree_flatten(self):
        return (
            (self.row_ptr, self.cols_flat, self.row_scales, self.q_vals),
            (self.chunk_multiple, self.nb_max),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, chunk_multiple=aux[0], nb_max=aux[1])

    @property
    def n_block_rows(self) -> int:
        return self.row_ptr.shape[0] - 1

    @classmethod
    def from_bell(cls, bell, chunk: int = 4) -> "QBellRowColDevice":
        import numpy as np

        nb = np.asarray(bell.nb_row, dtype=np.int64)
        nb_pad = (nb + chunk - 1) // chunk * chunk
        row_ptr = np.concatenate(([0], np.cumsum(nb_pad))).astype(np.int32)
        total = int(row_ptr[-1])
        bh, bw = bell.block_row_size, bell.block_col_size
        cols = np.zeros(total, dtype=np.int32)
        row_scales = np.ones((bell.n_block_rows, bh), dtype=np.float32)
        q = np.zeros((max(total, 1), bh, bw), dtype=np.int8)
        vals = np.asarray(bell.vals, dtype=np.float32)
        for i in range(bell.n_block_rows):
            n = int(nb[i])
            if not n:
                continue
            s = row_ptr[i]
            cols[s : s + n] = bell.cols_idx[i, :n]
            blk = vals[i, :n]  # [n, bh, bw]
            amax = np.abs(blk).max(axis=(0, 2))  # [bh] per global row
            sc = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
            row_scales[i] = sc
            q[s : s + n] = np.clip(
                np.round(blk / sc[None, :, None]), -127, 127)
        return cls(
            row_ptr=jnp.asarray(row_ptr),
            cols_flat=jnp.asarray(cols),
            row_scales=jnp.asarray(row_scales),
            q_vals=jnp.asarray(q),
            chunk_multiple=chunk,
            nb_max=int(nb_pad.max()) if nb_pad.size else 0,
        )


def _kernel_q_rowcol(
    row_ptr_ref,    # int32 [nbr+1] (SMEM)
    cols_ref,       # int32 [total] (SMEM)
    bscale_ref,     # f32 [nbc, tn] (VMEM, blocked by column tile)
    rowscale_ref,   # f32 [bh, 1] (VMEM, blocked by block-row)
    vals_hbm,       # int8 [total, bh, bw] (HBM)
    b_hbm,          # int8 [K, N] (HBM)
    out_ref,        # f32 [bh, tn] (VMEM)
    b_tile,         # int8 [K, tn] persistent VMEM scratch
    vbuf,           # int8 [2, chunk, bh, bw] VMEM
    acc_ref,        # f32 [bh, tn]
    bsem,
    vsems,
    *,
    bw: int,
    tn: int,
    chunk: int,
):
    """Int8 unrolled kernel with per-column B scales + per-row A scales.
    Inner loop: int8 MXU dot, fp32 accumulate scaled by the [tn] column
    vector ``bscale[jb]`` (same VPU shape as the per-stripe scalar path);
    the per-row A scale is applied once to the finished accumulator."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    j = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        cp = pltpu.make_async_copy(
            b_hbm.at[:, pl.ds(j * tn, tn)], b_tile, bsem
        )
        cp.start()
        cp.wait()

    start = row_ptr_ref[i]
    nchunks = (row_ptr_ref[i + 1] - start) // chunk

    def vdma(c, slot):
        return pltpu.make_async_copy(
            vals_hbm.at[pl.ds(start + c * chunk, chunk)],
            vbuf.at[slot],
            vsems.at[slot],
        )

    @pl.when(nchunks > 0)
    def _():
        vdma(0, 0).start()

    acc_ref[...] = jnp.zeros_like(acc_ref)

    def body(c, _):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nchunks)
        def _():
            vdma(c + 1, jax.lax.rem(c + 1, 2)).start()

        vdma(c, slot).wait()
        for k in range(chunk):  # static unroll, guard-free (zero padding)
            t = start + c * chunk + k
            jb = cols_ref[t]
            a = vbuf[slot, k]
            b = b_tile[pl.ds(jb * bw, bw), :]
            d = jax.lax.dot(
                a, b, preferred_element_type=jnp.int32
            ).astype(jnp.float32)
            acc_ref[...] += d * bscale_ref[jb]
        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)
    out_ref[...] = acc_ref[...] * rowscale_ref[...]


@partial(jax.jit, static_argnames=("tn", "chunk", "interpret"))
def bell_spmm_int8_rowcol(
    qbell: QBellRowColDevice,
    Bq: jax.Array,        # int8 [K, N] from quantize_b_cols
    bscale: jax.Array,    # f32 [nbc, N] from quantize_b_cols
    tn: int = 512,
    chunk: int = 4,
    interpret: bool = False,
) -> jax.Array:
    """Int8 MXU blocked SpMM with per-(stripe, column) B scales and
    per-global-row A scales — same MXU/DMA schedule and speed class as
    :func:`bell_spmm_int8_unrolled`, ~1.5x lower quantization error
    (passes the 1e-2 matched-accuracy gate where the per-stripe/per-block
    scheme fails marginally)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from functools import partial as _partial

    total, bh, bw = qbell.q_vals.shape
    nbr = qbell.n_block_rows
    K, N = Bq.shape
    nbc = K // bw
    if N % tn:
        raise ValueError(f"N={N} not a multiple of tile {tn}")
    if qbell.chunk_multiple % chunk:
        raise ValueError(
            f"layout padded to multiples of {qbell.chunk_multiple}, kernel "
            f"chunk={chunk}: rebuild from_bell with chunk={chunk}"
        )
    interpret = interpret or jax.default_backend() == "cpu"

    rowscale2d = qbell.row_scales.reshape(nbr * bh, 1)
    kernel = _partial(_kernel_q_rowcol, bw=bw, tn=tn, chunk=chunk)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(N // tn, nbr),
            in_specs=[
                pl.BlockSpec((nbc, tn), lambda j, i, *_: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bh, 1), lambda j, i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (bh, tn), lambda j, i, *_: (i, j), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((K, tn), jnp.int8),
                pltpu.VMEM((2, chunk, bh, bw), jnp.int8),
                pltpu.VMEM((bh, tn), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nbr * bh, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * total * bh * bw * N,
            bytes_accessed=(
                K * N + (N // tn) * total * bh * bw + nbr * bh * N * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(qbell.row_ptr, qbell.cols_flat, bscale, rowscale2d,
      qbell.q_vals, Bq)


# ------------------------------------------------- int8 global col scales --
def quantize_b_global_cols(B: jax.Array):
    """Standard per-channel quantization: one scale per output column,
    amax over the WHOLE contraction dim -> (int8 [K, N], f32 [N]).

    Coarser along K than :func:`quantize_b_cols` (one amax per column vs
    per (stripe, column)), but it makes the B scale independent of the
    contraction index, so the dequant factors entirely out of the inner
    loop:  ``C = diag(row_scale) @ (Aq @ Bq) @ diag(col_scale)`` — a pure
    int32 dot-accumulate with one rank-1 epilogue multiply."""
    K, N = B.shape
    Bf = B.astype(jnp.float32)
    amax = jnp.max(jnp.abs(Bf), axis=0)  # [N]
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(Bf / scale[None, :]), -127, 127).astype(jnp.int8)
    return q, scale


def _kernel_q_global(
    row_ptr_ref,    # int32 [nbr+1] (SMEM)
    cols_ref,       # int32 [total] (SMEM)
    bscale_ref,     # f32 [1, tn] (VMEM, blocked by column tile)
    rowscale_ref,   # f32 [bh, 1] (VMEM, blocked by block-row)
    vals_hbm,       # int8 [total, bh, bw] (HBM)
    b_hbm,          # int8 [K, N] (HBM)
    out_ref,        # f32 [bh, tn] (VMEM)
    b_tile,         # int8 [K, tn] persistent VMEM scratch
    vbuf,           # int8 [2, chunk, bh, bw] VMEM
    acc_ref,        # int32 [bh, tn]
    bsem,
    vsems,
    *,
    bw: int,
    tn: int,
    chunk: int,
):
    """Int8 unrolled kernel with scale-free inner loop: int8 MXU dots
    accumulate in int32 (no VPU scale pass per block); both scales apply
    once, as a rank-1 multiply on the finished accumulator."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    j = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        cp = pltpu.make_async_copy(
            b_hbm.at[:, pl.ds(j * tn, tn)], b_tile, bsem
        )
        cp.start()
        cp.wait()

    start = row_ptr_ref[i]
    nchunks = (row_ptr_ref[i + 1] - start) // chunk

    def vdma(c, slot):
        return pltpu.make_async_copy(
            vals_hbm.at[pl.ds(start + c * chunk, chunk)],
            vbuf.at[slot],
            vsems.at[slot],
        )

    @pl.when(nchunks > 0)
    def _():
        vdma(0, 0).start()

    acc_ref[...] = jnp.zeros_like(acc_ref)

    def body(c, _):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nchunks)
        def _():
            vdma(c + 1, jax.lax.rem(c + 1, 2)).start()

        vdma(c, slot).wait()
        for k in range(chunk):  # static unroll, guard-free (zero padding)
            t = start + c * chunk + k
            jb = cols_ref[t]
            a = vbuf[slot, k]
            b = b_tile[pl.ds(jb * bw, bw), :]
            acc_ref[...] += jax.lax.dot(
                a, b, preferred_element_type=jnp.int32
            )
        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)
    out_ref[...] = (
        acc_ref[...].astype(jnp.float32) * rowscale_ref[...] * bscale_ref[...]
    )


def bell_spmm_int8_global(
    qbell: QBellRowColDevice,
    Bq: jax.Array,        # int8 [K, N] from quantize_b_global_cols
    bscale: jax.Array,    # f32 [N]
    tn: int = 512,
    chunk: int = 4,
    interpret: bool = False,
) -> jax.Array:
    """Int8 MXU blocked SpMM, per-column B + per-global-row A scales.

    The fastest quantized variant: the inner loop is nothing but int8 MXU
    dots into an int32 accumulator (the rowcol kernel spends one [bh, tn]
    VPU multiply per block on the stripe-dependent B scale; here the scale
    is contraction-independent so it leaves the loop).  Checks the int32
    accumulator cannot overflow for this structure (worst case
    nb_max*bw*127*127 per element) and raises otherwise — use
    :func:`bell_spmm_int8_rowcol` there."""
    import numpy as np

    nb_max = qbell.nb_max
    if nb_max is None:  # hand-built instance: fall back to a device sync
        nb_max = int(np.diff(np.asarray(qbell.row_ptr)).max()) if (
            qbell.row_ptr.shape[0] > 1) else 0
    bw = qbell.q_vals.shape[2]
    if nb_max * bw * 127 * 127 >= 2**31:
        raise ValueError(
            f"int32 accumulator may overflow: {nb_max} blocks/row x bw={bw}"
            " — use bell_spmm_int8_rowcol"
        )
    return _int8_global_call(qbell, Bq, bscale, tn=tn, chunk=chunk,
                             interpret=interpret)


@partial(jax.jit, static_argnames=("tn", "chunk", "interpret"))
def _int8_global_call(qbell, Bq, bscale, tn, chunk, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from functools import partial as _partial

    total, bh, bw = qbell.q_vals.shape
    nbr = qbell.n_block_rows
    K, N = Bq.shape
    if N % tn:
        raise ValueError(f"N={N} not a multiple of tile {tn}")
    if qbell.chunk_multiple % chunk:
        raise ValueError(
            f"layout padded to multiples of {qbell.chunk_multiple}, kernel "
            f"chunk={chunk}: rebuild from_bell with chunk={chunk}"
        )
    interpret = interpret or jax.default_backend() == "cpu"

    rowscale2d = qbell.row_scales.reshape(nbr * bh, 1)
    bscale2d = bscale.reshape(1, N)
    kernel = _partial(_kernel_q_global, bw=bw, tn=tn, chunk=chunk)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(N // tn, nbr),
            in_specs=[
                pl.BlockSpec((1, tn), lambda j, i, *_: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bh, 1), lambda j, i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (bh, tn), lambda j, i, *_: (i, j), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((K, tn), jnp.int8),
                pltpu.VMEM((2, chunk, bh, bw), jnp.int8),
                pltpu.VMEM((bh, tn), jnp.int32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nbr * bh, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * total * bh * bw * N,
            bytes_accessed=(
                K * N + (N // tn) * total * bh * bw + nbr * bh * N * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(qbell.row_ptr, qbell.cols_flat, bscale2d, rowscale2d,
      qbell.q_vals, Bq)


# --------------------------------------------------------------------- fp8 --
FP8_MAX = 448.0  # float8_e4m3fn largest finite


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class FP8BellCompactDevice:
    """Compact CSR-of-blocks, fp8(e4m3) values + per-block scales, rows
    padded to a chunk multiple (zero blocks) — the fp8 twin of
    QBellCompactDevice."""

    row_ptr: jax.Array      # int32 [nbr+1]
    cols_flat: jax.Array    # int32 [total]
    scales_flat: jax.Array  # f32 [total]
    q_vals: jax.Array       # float8_e4m3fn [total, bh, bw]
    chunk_multiple: int = 1

    def tree_flatten(self):
        return (
            (self.row_ptr, self.cols_flat, self.scales_flat, self.q_vals),
            self.chunk_multiple,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, chunk_multiple=aux)

    @property
    def n_block_rows(self) -> int:
        return self.row_ptr.shape[0] - 1

    @classmethod
    def from_bell(cls, bell, chunk: int = 4) -> "FP8BellCompactDevice":
        row_ptr, cols, scales, q = _compact_quantized(
            bell, chunk, FP8_MAX, lambda x: x)  # cast to fp8 on device below
        return cls(
            row_ptr=jnp.asarray(row_ptr),
            cols_flat=jnp.asarray(cols),
            scales_flat=jnp.asarray(scales),
            q_vals=jnp.asarray(q, dtype=jnp.float8_e4m3fn),
            chunk_multiple=chunk,
        )


def quantize_b_fp8(B: jax.Array, bw: int):
    """Quantize B per row-stripe of width bw -> (fp8 [K, N], f32 [nbc])."""
    Bt = B.astype(jnp.float32).reshape(-1, bw, B.shape[1])
    amax = jnp.max(jnp.abs(Bt), axis=(1, 2))
    scale = jnp.where(amax > 0, amax / FP8_MAX, 1.0)
    q = (Bt / scale[:, None, None]).astype(jnp.float8_e4m3fn)
    return q.reshape(B.shape), scale


@partial(jax.jit, static_argnames=("tn", "chunk", "upcast", "interpret"))
def bell_spmm_fp8_unrolled(
    qbell: FP8BellCompactDevice,
    Bq: jax.Array,        # fp8 [K, N] (row-stripe quantized)
    bscale: jax.Array,    # f32 [nbc]
    tn: int = 512,
    chunk: int = 4,
    upcast: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """fp8(e4m3) blocked SpMM: 1-byte storage (int8-class HBM/VMEM traffic),
    per-(A-block, B-stripe) fp32 dequant scales.  ``upcast=True`` runs the
    dots as bf16 (v5e has no native fp8 MXU path — measured storage-only:
    the VPU upcasts dominate); flip it off on hardware generations with fp8
    matmul units."""
    return _q_unrolled_call(qbell, Bq, bscale, tn, chunk, jnp.float8_e4m3fn,
                            int_dot=False, upcast=upcast, interpret=interpret)

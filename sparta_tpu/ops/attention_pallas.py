"""Fused Pallas block-sparse attention (flash/splash style).

The XLA path (attention.py) materializes the gathered key/value tiles
``[nbr, wmax, bw, D]`` and the probability blocks ``[nbr, wmax, bh, bw]``
in HBM — at long context that HBM round-trip dominates.  This kernel
streams instead: grid ``(heads, query_tile, slot)`` with the block-column
indices scalar-prefetched, one K and one V tile DMA'd per step, and an
online (running max / running denominator) softmax held in VMEM scratch —
scores and probabilities never touch HBM.

Structure follows the canonical TPU splash-attention recipe (grid-minor
reduction axis + scalar-prefetch index maps), built on this repo's
BlockMask ELL machinery.  The reference has no attention story at all
(SURVEY §0: SpMM only); this is the framework's extension of the same
128-block sparsity to the attention pattern.

Two generations live here.  The v1 kernels (one key tile per grid step)
measured issue-bound on v5e; the v2 kernels (default) process a whole
query row per grid step — key/value tiles stream into contiguous VMEM
chunks (double-buffered ACROSS grid steps) so each chunk is one wide
QK^T dot and one deep PV dot.  Hardware (results/attn2_probe.json):
v2 forward 3.1-3.7x v1 and 1.4-2.0x the XLA forward at T>=4k; the v2
train step beats every other configuration at every benched T.

Differentiable via jax.custom_vjp.  The backward is fused too (flash
backward): the forward additionally emits the per-row logsumexp (stored
128-lane-replicated, the canonical TPU trick — a (block, 1) column can't
be cheaply transposed into a (1, block) lane row, so it's broadcast
across lanes and sliced outside), and two Pallas kernels recompute the
probability tiles on the fly: ``dq`` sweeps the row ELL exactly like the
forward; ``dk``/``dv`` sweep a TRANSPOSED ELL (per key tile, the list of
query tiles that touch it) so each key tile's gradient accumulates in
VMEM over grid-minor steps instead of scatter-adding in HBM.  Scores,
probabilities, and dS never touch HBM in either direction.  Set
``bwd="xla"`` to differentiate through the batched-einsum path instead
(the oracle the tests compare against).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import BlockMask, _mask_to_ell, _mask_to_ell_t

_NEG_BIG = -1e30  # finite "-inf": keeps the running max finite on
#                   fully-masked rows (exp(-inf - finite) == 0 cleanly)


def _flash_kernel(bc_ref, live_ref, q_ref, k_ref, v_ref, o_ref,
                  acc_s, m_s, l_s, *, wmax, block, causal, scale):
    r = pl.program_id(1)
    w = pl.program_id(2)

    @pl.when(w == 0)
    def _init():
        acc_s[...] = jnp.zeros_like(acc_s)
        m_s[...] = jnp.full_like(m_s, _NEG_BIG)
        l_s[...] = jnp.zeros_like(l_s)

    q = q_ref[0]  # [bh, D]
    k = k_ref[0]  # [bw, D]
    # SDD score tile on the MXU, fp32 accumulate
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    neg = jnp.asarray(-jnp.inf, jnp.float32)
    if causal:
        qi = r * block + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        ki = bc_ref[r, w] * block + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1)
        s = jnp.where(qi >= ki, s, neg)
    s = jnp.where(live_ref[r, w] > 0, s, neg)
    # online softmax update (m clamped finite by the _NEG_BIG init)
    m_prev = m_s[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_s[:, :1] = l_s[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_s[...] = acc_s[...] * alpha + jax.lax.dot(
        p.astype(v_ref.dtype), v_ref[0],
        preferred_element_type=jnp.float32)
    m_s[:, :1] = m_new

    @pl.when(w == wmax - 1)
    def _emit():
        o_ref[0] = (acc_s[...]
                    / jnp.maximum(l_s[:, :1], 1e-30)).astype(o_ref.dtype)


def _flash_fwd_lse_kernel(bc_ref, live_ref, q_ref, k_ref, v_ref,
                          o_ref, lse_ref, acc_s, m_s, l_s, **kw):
    """Forward + logsumexp emit (used under custom_vjp so the backward
    can rebuild P = exp(S - L) tile-by-tile without a second softmax
    pass).  lse is broadcast across the 128 lanes (see module doc)."""
    _flash_kernel(bc_ref, live_ref, q_ref, k_ref, v_ref, o_ref,
                  acc_s, m_s, l_s, **kw)
    w = pl.program_id(2)

    @pl.when(w == kw["wmax"] - 1)
    def _emit_lse():
        lse = m_s[:, :1] + jnp.log(jnp.maximum(l_s[:, :1], 1e-30))
        lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


@functools.partial(
    jax.jit, static_argnames=("nbr", "block", "causal", "scale", "wmax",
                              "interpret", "with_lse"))
def _bsa_pallas_hqd(q, k, v, bc_ell, live, *, nbr, block, causal, scale,
                    wmax, interpret, with_lse=False):
    """q [H, T_q, D], k/v [H, T_k, D] -> [H, T_q, D]
    (+ lse [H, T_q, 128] f32, lane-replicated, when ``with_lse``)."""
    H, Tq, D = q.shape
    kern = _flash_fwd_lse_kernel if with_lse else _flash_kernel
    kernel = functools.partial(kern, wmax=wmax, block=block,
                               causal=causal, scale=scale)
    qtile = pl.BlockSpec((1, block, D), lambda h, r, w, bc, lv: (h, r, 0),
                         memory_space=pltpu.VMEM)
    ktile = pl.BlockSpec((1, block, D),
                         lambda h, r, w, bc, lv: (h, bc[r, w], 0),
                         memory_space=pltpu.VMEM)
    out_specs = pl.BlockSpec((1, block, D), lambda h, r, w, bc, lv: (h, r, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((H, Tq, D), q.dtype)
    if with_lse:
        out_specs = (out_specs, pl.BlockSpec(
            (1, block, 128), lambda h, r, w, bc, lv: (h, r, 0),
            memory_space=pltpu.VMEM))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((H, Tq, 128), jnp.float32))
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(H, nbr, wmax),
            in_specs=[qtile, ktile, ktile],
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((block, D), jnp.float32),    # acc
                pltpu.VMEM((block, 128), jnp.float32),  # running max
                pltpu.VMEM((block, 128), jnp.float32),  # running denom
            ],
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(bc_ell, live, q, k, v)


# ---------------------------------------------------------------------------
# v2 forward: chunked wide-dot flash (one grid step per (head, query tile))
# ---------------------------------------------------------------------------
#
# The v1 grid above issues one (128, D)x(D, 128) tile pair per grid step —
# measured issue-bound on v5e (results/attention_bench.json r5: 0.72 ms vs
# XLA's 0.126 at T=2k).  v2 applies the bell_compact recipe: one grid step
# per (head, query tile), the row's key/value tiles DMA'd into a contiguous
# VMEM buffer in chunks of ``ch`` tiles, so each chunk is ONE wide QK^T dot
# [block, ch*block] and ONE deep PV dot (contraction ch*block) instead of
# ``ch`` tiny dots.  Chunk DMAs are double-buffered ACROSS grid steps (the
# windowed masks have nch==1, so intra-step prefetch alone would serialize
# DMA latency with compute).  Masking (dead ELL slots + intra-block causal)
# runs under a per-(row, chunk) prefetched flag: interior rows skip the VPU
# mask loop entirely.

_CHUNK_MAX = 8  # tiles per chunk: caps s_buf at [128, 1024] f32 (512 KB)


def _chunk_layout(wmax: int):
    nch = -(-wmax // _CHUNK_MAX)
    ch = -(-wmax // nch)
    return nch, ch


@functools.lru_cache(maxsize=64)
def _mask_to_ell_chunked(mask: BlockMask):
    """ELL padded to a chunk multiple, laid out so masking is (nearly)
    free in the kernel:

    * dead padding slots get an ADDITIVE per-column bias of -1e30
      (``bias_cols`` [nbr, nch, ch*block] f32) folded into the score
      scale-add — no per-tile ``where`` loop;
    * under ``causal`` every row's diagonal block (bc == r) is swapped
      into the LAST slot, so the intra-block triangular mask is a
      static-position ``where`` (blocks with bc < r are fully visible
      and need nothing; builders never emit bc > r when causal)."""
    wmax, bc_ell, live = _mask_to_ell(mask)
    nch, ch = _chunk_layout(wmax)
    wpad = nch * ch
    bc = np.zeros((mask.nbr, wpad), np.int32)
    lv = np.zeros((mask.nbr, wpad), bool)
    bc[:, :wmax] = bc_ell
    lv[:, :wmax] = live
    if mask.causal:
        for r in range(mask.nbr):
            hits = np.flatnonzero(lv[r] & (bc[r] == r))
            if hits.size:  # swap the diagonal into the last slot
                i = hits[0]
                bc[r, i], bc[r, -1] = bc[r, -1], bc[r, i]
                lv[r, i], lv[r, -1] = lv[r, -1], lv[r, i]
    bias = np.where(lv, 0.0, _NEG_BIG).astype(np.float32)
    bias_cols = np.repeat(bias, mask.block, axis=1).reshape(
        mask.nbr, nch, ch * mask.block)
    return nch, ch, bc, bias_cols


def _flash2_kernel(bc_ref, q_ref, bias_ref, k_hbm, v_hbm, o_ref,
                   *refs, nbr, nsteps, nch, ch, block, causal, scale,
                   with_lse, rows=1):
    if with_lse:
        lse_ref, kbuf, vbuf, ksem, vsem = refs
    else:
        (kbuf, vbuf, ksem, vsem) = refs
        lse_ref = None
    g = pl.program_id(0)
    Dp = kbuf.shape[-1]
    nsr = nbr // rows  # grid steps per head

    def dmas(gg, rr, c):
        """The 2*ch tile copies of chunk c of row rr of step gg (start and
        wait recreate identical descriptors — the bell_compact contract).
        The double-buffer slot alternates on the GLOBAL chunk counter so
        prefetch flows across rows and steps."""
        hh = gg // nsr
        grow = jax.lax.rem(gg, nsr) * rows + rr
        slot = jax.lax.rem((gg * rows + rr) * nch + c, 2)
        out = []
        for t in range(ch):
            off = pl.multiple_of(bc_ref[grow, c * ch + t] * block, block)
            dst = pl.ds(t * block, block)
            out.append(pltpu.make_async_copy(
                k_hbm.at[hh, pl.ds(off, block), :],
                kbuf.at[slot, dst, :], ksem.at[slot, t]))
            out.append(pltpu.make_async_copy(
                v_hbm.at[hh, pl.ds(off, block), :],
                vbuf.at[slot, dst, :], vsem.at[slot, t]))
        return out

    @pl.when(g == 0)
    def _prime():
        for cp in dmas(0, 0, 0):
            cp.start()

    if causal:
        # triangular mask for the last slot (the diagonal block's fixed
        # position): visible iff column outside the last tile OR
        # row >= col within it.  Built once per grid step (the diagonal
        # is pinned to the last slot of EVERY row, so it's row-invariant).
        col = jax.lax.broadcasted_iota(jnp.int32, (block, ch * block), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (block, ch * block), 0)
        tri_full = (col < (ch - 1) * block) | (row >= col - (ch - 1) * block)
    for rr in range(rows):  # static unroll over the step's query tiles
        q = q_ref[0, rr * block:(rr + 1) * block, :]
        m = jnp.full((block, 1), _NEG_BIG, jnp.float32)
        l = jnp.zeros((block, 1), jnp.float32)
        acc = jnp.zeros((block, Dp), jnp.float32)
        for c in range(nch):  # static unroll over the row's chunks
            if c + 1 < nch:
                for cp in dmas(g, rr, c + 1):
                    cp.start()
            elif rr + 1 < rows:
                for cp in dmas(g, rr + 1, 0):
                    cp.start()
            else:
                @pl.when(g + 1 < nsteps)
                def _next_step():
                    for cp in dmas(g + 1, 0, 0):
                        cp.start()
            for cp in dmas(g, rr, c):
                cp.wait()
            slot = jax.lax.rem((g * rows + rr) * nch + c, 2)
            s = jax.lax.dot_general(
                q, kbuf[slot], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale \
                + bias_ref[0, rr, pl.ds(c, 1), :]
            if causal and c == nch - 1:
                s = jnp.where(tri_full, s,
                              jnp.asarray(-jnp.inf, jnp.float32))
            if nch == 1:  # no running rescale needed — one chunk per row
                m = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
                p = jnp.exp(s - m)
                l = jnp.sum(p, axis=1, keepdims=True)
                acc = jax.lax.dot(p.astype(vbuf.dtype), vbuf[slot],
                                  preferred_element_type=jnp.float32)
            else:
                m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
                alpha = jnp.exp(m - m_new)
                p = jnp.exp(s - m_new)
                l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
                acc = acc * alpha + jax.lax.dot(
                    p.astype(vbuf.dtype), vbuf[slot],
                    preferred_element_type=jnp.float32)
                m = m_new
        o_ref[0, rr * block:(rr + 1) * block, :] = (
            acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        if with_lse:
            lse = m + jnp.log(jnp.maximum(l, 1e-30))
            lse_ref[0, rr * block:(rr + 1) * block, :] = jnp.broadcast_to(
                lse, (block, lse_ref.shape[-1]))


@functools.partial(
    jax.jit, static_argnames=("nbr", "block", "causal", "scale", "nch",
                              "ch", "interpret", "with_lse", "rows"))
def _bsa_pallas2_hqd(q, k, v, bc_ell, bias_cols, *, nbr, block, causal,
                     scale, nch, ch, interpret, with_lse=False, rows=1):
    """v2 forward: q [H, T_q, D], k/v [H, T_k, D] -> [H, T_q, D]
    (+ lane-replicated lse when ``with_lse``).  ``rows`` query tiles are
    processed per grid step (must divide nbr) — amortizes the fixed
    per-step cost at small T."""
    H, Tq, D = q.shape
    if nbr % rows:
        raise ValueError(f"rows={rows} must divide nbr={nbr}")
    nsr = nbr // rows
    nsteps = H * nsr
    kernel = functools.partial(
        _flash2_kernel, nbr=nbr, nsteps=nsteps, nch=nch, ch=ch, block=block,
        causal=causal, scale=scale, with_lse=with_lse, rows=rows)
    qtile = pl.BlockSpec((1, rows * block, D),
                         lambda g, bc: (g // nsr, g % nsr, 0),
                         memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, rows, nch, ch * block),
                             lambda g, bc: (0, g % nsr, 0, 0),
                             memory_space=pltpu.VMEM)
    out_specs = qtile
    out_shape = jax.ShapeDtypeStruct((H, Tq, D), q.dtype)
    if with_lse:
        out_specs = (out_specs, pl.BlockSpec(
            (1, rows * block, 128), lambda g, bc: (g // nsr, g % nsr, 0),
            memory_space=pltpu.VMEM))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((H, Tq, 128), jnp.float32))
    # bias viewed as [1, nbr//rows * rows, nch, W] so one (1, rows, ...)
    # block per step covers the step's row group
    bias4 = bias_cols.reshape(1, nbr, *bias_cols.shape[1:])
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nsteps,),
            in_specs=[qtile, bias_spec,
                      pl.BlockSpec(memory_space=pl.ANY),   # K stays in HBM
                      pl.BlockSpec(memory_space=pl.ANY)],  # V stays in HBM
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((2, ch * block, D), k.dtype),       # K chunks
                pltpu.VMEM((2, ch * block, D), v.dtype),       # V chunks
                pltpu.SemaphoreType.DMA((2, ch)),
                pltpu.SemaphoreType.DMA((2, ch)),
            ],
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(bc_ell, q, bias4, k, v)


def _pad_flatten(q, k, v):
    """Leading dims flattened into the head grid axis; D padded to the
    128-lane grid (zero feature columns change neither scores nor the
    sliced-away output columns)."""
    Tq, D = q.shape[-2:]
    Tk = k.shape[-2]
    qf = q.reshape(-1, Tq, D)
    kf = k.reshape(-1, Tk, D)
    vf = v.reshape(-1, Tk, D)
    Dp = -(-D // 128) * 128
    if Dp != D:
        pad = ((0, 0), (0, 0), (0, Dp - D))
        qf, kf, vf = (jnp.pad(t, pad) for t in (qf, kf, vf))
    return qf, kf, vf


def _pallas_forward(q, k, v, mask: BlockMask, scale: float,
                    interpret: bool = False, with_lse: bool = False,
                    version: int = 2, rows: int = 1):
    lead = q.shape[:-2]
    Tq, D = q.shape[-2:]
    qf, kf, vf = _pad_flatten(q, k, v)
    interpret = interpret or jax.default_backend() == "cpu"
    if version == 2:
        nch, ch, bc_ell, bias_cols = _mask_to_ell_chunked(mask)
        res = _bsa_pallas2_hqd(
            qf, kf, vf, jnp.asarray(bc_ell), jnp.asarray(bias_cols),
            nbr=mask.nbr, block=mask.block,
            causal=mask.causal, scale=scale, nch=nch, ch=ch,
            interpret=interpret, with_lse=with_lse, rows=rows)
    else:
        wmax, bc_ell, live = _mask_to_ell(mask)
        res = _bsa_pallas_hqd(
            qf, kf, vf, jnp.asarray(bc_ell), jnp.asarray(live, jnp.int32),
            nbr=mask.nbr, block=mask.block, causal=mask.causal, scale=scale,
            wmax=wmax, interpret=interpret, with_lse=with_lse)
    o, lse = res if with_lse else (res, None)
    o = o[..., :D].reshape(*lead, Tq, D)
    return (o, lse) if with_lse else o


# ---------------------------------------------------------------------------
# v2 backward: chunked wide-dot flash dq / dkdv (same recipe as the forward)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def _mask_to_ell_t_chunked(mask: BlockMask):
    """Transposed ELL (per KEY tile, its query tiles) padded to a chunk
    multiple; dead slots become an additive per-ROW bias of the tall
    [ch*block, block] score tile; under ``causal`` the diagonal query
    tile (brt == c) is swapped into the LAST slot (query tiles with
    brt > c are fully visible; brt < c never appear when causal)."""
    umax, br_ell, live = _mask_to_ell_t(mask)
    nch, ch = _chunk_layout(umax)
    upad = nch * ch
    br = np.zeros((mask.nbc, upad), np.int32)
    lv = np.zeros((mask.nbc, upad), bool)
    br[:, :umax] = br_ell
    lv[:, :umax] = live
    if mask.causal:
        for c in range(mask.nbc):
            hits = np.flatnonzero(lv[c] & (br[c] == c))
            if hits.size:
                i = hits[0]
                br[c, i], br[c, -1] = br[c, -1], br[c, i]
                lv[c, i], lv[c, -1] = lv[c, -1], lv[c, i]
    return nch, ch, br, lv.astype(np.int32)


def _flash2_dq_kernel(bc_ref, q_ref, bias_ref, do_ref, o_ref, lse_ref,
                      k_hbm, v_hbm, dq_ref, kbuf, vbuf, ksem, vsem,
                      *, nbr, nsteps, nch, ch, block, causal, scale):
    """dQ over the chunked row ELL — the forward's sweep with two extra
    wide dots per chunk (dP = dO V_cat^T, dQ += dS K_cat)."""
    g = pl.program_id(0)
    Dp = kbuf.shape[-1]

    def dmas(gg, c):
        hh = gg // nbr
        rr = jax.lax.rem(gg, nbr)
        slot = jax.lax.rem(gg * nch + c, 2)
        out = []
        for t in range(ch):
            off = pl.multiple_of(bc_ref[rr, c * ch + t] * block, block)
            dst = pl.ds(t * block, block)
            out.append(pltpu.make_async_copy(
                k_hbm.at[hh, pl.ds(off, block), :],
                kbuf.at[slot, dst, :], ksem.at[slot, t]))
            out.append(pltpu.make_async_copy(
                v_hbm.at[hh, pl.ds(off, block), :],
                vbuf.at[slot, dst, :], vsem.at[slot, t]))
        return out

    @pl.when(g == 0)
    def _prime():
        for cp in dmas(0, 0):
            cp.start()

    q = q_ref[0]
    do = do_ref[0]
    delta = jnp.sum(do.astype(jnp.float32) * o_ref[0].astype(jnp.float32),
                    axis=1, keepdims=True)
    lse = lse_ref[0][:, :1]
    if causal:
        col = jax.lax.broadcasted_iota(jnp.int32, (block, ch * block), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (block, ch * block), 0)
        tri_full = (col < (ch - 1) * block) | (row >= col - (ch - 1) * block)
    acc = jnp.zeros((block, Dp), jnp.float32)
    for c in range(nch):
        if c + 1 < nch:
            for cp in dmas(g, c + 1):
                cp.start()
        else:
            @pl.when(g + 1 < nsteps)
            def _next_step():
                for cp in dmas(g + 1, 0):
                    cp.start()
        for cp in dmas(g, c):
            cp.wait()
        slot = jax.lax.rem(g * nch + c, 2)
        s = jax.lax.dot_general(
            q, kbuf[slot], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale \
            + bias_ref[0, pl.ds(c, 1), :]
        if causal and c == nch - 1:
            s = jnp.where(tri_full, s, jnp.asarray(-jnp.inf, jnp.float32))
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do, vbuf[slot], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        acc += jax.lax.dot(ds.astype(kbuf.dtype), kbuf[slot],
                           preferred_element_type=jnp.float32)
    dq_ref[0] = (acc * scale).astype(dq_ref.dtype)


def _flash2_dkdv_kernel(brt_ref, livet_ref, k_ref, v_ref, q_hbm, do_hbm,
                        o_hbm, lse_hbm, dk_ref, dv_ref,
                        qbuf, dobuf, obuf, lsebuf, sems,
                        *, nbc, nsteps, nch, ch, block, causal, scale):
    """dK/dV over the chunked TRANSPOSED ELL: one grid step per (head,
    key tile); each chunk gathers ``ch`` query tiles (q, dO, O, lse) and
    runs four tall/deep dots (S^T, dV += P^T dO, dP^T, dK += dS^T Q).
    Dead slots die by a per-row bias column built in-kernel from the
    prefetched live scalars ([ch*block, 1] vector ops — a lane-row bias
    would need a lane->sublane relayout here)."""
    g = pl.program_id(0)
    cc = jax.lax.rem(g, nbc)
    Dp = qbuf.shape[-1]

    def dmas(gg, c):
        hh = gg // nbc
        cc = jax.lax.rem(gg, nbc)
        slot = jax.lax.rem(gg * nch + c, 2)
        out = []
        for t in range(ch):
            off = pl.multiple_of(brt_ref[cc, c * ch + t] * block, block)
            src = pl.ds(off, block)
            dst = pl.ds(t * block, block)
            for buf, hbm, i in ((qbuf, q_hbm, 0), (dobuf, do_hbm, 1),
                                (obuf, o_hbm, 2), (lsebuf, lse_hbm, 3)):
                out.append(pltpu.make_async_copy(
                    hbm.at[hh, src, :], buf.at[slot, dst, :],
                    sems.at[i, slot, t]))
        return out

    @pl.when(g == 0)
    def _prime():
        for cp in dmas(0, 0):
            cp.start()

    k = k_ref[0]
    v = v_ref[0]
    if causal:
        # transposed triangular: the diagonal query tile sits in the
        # LAST slot (rows [(ch-1)*block:]); visible iff q row >= k col.
        row = jax.lax.broadcasted_iota(jnp.int32, (ch * block, block), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (ch * block, block), 1)
        tri_full = (row < (ch - 1) * block) | (row - (ch - 1) * block >= col)
    tile_idx = jax.lax.broadcasted_iota(
        jnp.int32, (ch * block, 1), 0) // block
    dk = jnp.zeros((block, Dp), jnp.float32)
    dv = jnp.zeros((block, Dp), jnp.float32)
    for c in range(nch):
        if c + 1 < nch:
            for cp in dmas(g, c + 1):
                cp.start()
        else:
            @pl.when(g + 1 < nsteps)
            def _next_step():
                for cp in dmas(g + 1, 0):
                    cp.start()
        for cp in dmas(g, c):
            cp.wait()
        slot = jax.lax.rem(g * nch + c, 2)
        qc = qbuf[slot]
        doc = dobuf[slot]
        bias_col = jnp.zeros((ch * block, 1), jnp.float32)
        for t in range(ch):
            dead = livet_ref[cc, c * ch + t] == 0
            bias_col = jnp.where((tile_idx == t) & dead,
                                 jnp.float32(_NEG_BIG), bias_col)
        s = jax.lax.dot_general(
            qc, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + bias_col
        if causal and c == nch - 1:
            s = jnp.where(tri_full, s, jnp.asarray(-jnp.inf, jnp.float32))
        p = jnp.exp(s - lsebuf[slot][:, :1])
        # dV += P^T dO (contract the query-row axis)
        dv += jax.lax.dot_general(
            p.astype(doc.dtype), doc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        delta = jnp.sum(
            doc.astype(jnp.float32) * obuf[slot].astype(jnp.float32),
            axis=1, keepdims=True)
        dp = jax.lax.dot_general(
            doc, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dk += jax.lax.dot_general(
            ds.astype(qc.dtype), qc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("nbr", "nbc", "block", "causal", "scale",
                              "nch", "ch", "ncht", "cht", "interpret"))
def _bsa_pallas2_bwd_hqd(q, k, v, do, o, lse, bc_ell, bias_cols, brt_ell,
                         livet, *, nbr, nbc, block, causal, scale,
                         nch, ch, ncht, cht, interpret):
    H, Tq, D = q.shape
    Tk = k.shape[1]
    nsteps = H * nbr
    qrow = pl.BlockSpec((1, block, D), lambda g, bc: (g // nbr, g % nbr, 0),
                        memory_space=pltpu.VMEM)
    lrow = pl.BlockSpec((1, block, 128),
                        lambda g, bc: (g // nbr, g % nbr, 0),
                        memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, nch, ch * block),
                             lambda g, bc: (g % nbr, 0, 0),
                             memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_flash2_dq_kernel, nbr=nbr, nsteps=nsteps,
                          nch=nch, ch=ch, block=block, causal=causal,
                          scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nsteps,),
            in_specs=[qrow, bias_spec, qrow, qrow, lrow,
                      pl.BlockSpec(memory_space=pl.ANY),   # K
                      pl.BlockSpec(memory_space=pl.ANY)],  # V
            out_specs=qrow,
            scratch_shapes=[
                pltpu.VMEM((2, ch * block, D), k.dtype),
                pltpu.VMEM((2, ch * block, D), v.dtype),
                pltpu.SemaphoreType.DMA((2, ch)),
                pltpu.SemaphoreType.DMA((2, ch)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((H, Tq, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(bc_ell, q, bias_cols, do, o, lse, k, v)

    nsteps_t = H * nbc
    kcol = pl.BlockSpec((1, block, D),
                        lambda g, br, lv: (g // nbc, g % nbc, 0),
                        memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_flash2_dkdv_kernel, nbc=nbc, nsteps=nsteps_t,
                          nch=ncht, ch=cht, block=block, causal=causal,
                          scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nsteps_t,),
            in_specs=[kcol, kcol,
                      pl.BlockSpec(memory_space=pl.ANY),   # Q
                      pl.BlockSpec(memory_space=pl.ANY),   # dO
                      pl.BlockSpec(memory_space=pl.ANY),   # O
                      pl.BlockSpec(memory_space=pl.ANY)],  # lse
            out_specs=(kcol, kcol),
            scratch_shapes=[
                pltpu.VMEM((2, cht * block, D), q.dtype),
                pltpu.VMEM((2, cht * block, D), do.dtype),
                pltpu.VMEM((2, cht * block, D), o.dtype),
                pltpu.VMEM((2, cht * block, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((4, 2, cht)),
            ],
        ),
        out_shape=(jax.ShapeDtypeStruct((H, Tk, D), k.dtype),
                   jax.ShapeDtypeStruct((H, Tk, D), v.dtype)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(brt_ell, livet, k, v, q, do, o, lse)
    return dq, dk, dv


def _flash_dq_kernel(bc_ref, live_ref, q_ref, k_ref, v_ref, do_ref, o_ref,
                     lse_ref, dq_ref, acc_s, delta_s,
                     *, wmax, block, causal, scale):
    """dQ over the row ELL — same sweep shape as the forward.  P and dS
    are rebuilt per tile from the saved lse; delta = rowsum(dO*O) is
    computed once per query tile at w == 0 (cheap VPU rowsum — saves
    materializing a [H, T] side input)."""
    r = pl.program_id(1)
    w = pl.program_id(2)

    @pl.when(w == 0)
    def _init():
        acc_s[...] = jnp.zeros_like(acc_s)
        delta_s[:, :1] = jnp.sum(
            do_ref[0].astype(jnp.float32) * o_ref[0].astype(jnp.float32),
            axis=1, keepdims=True)

    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    neg = jnp.asarray(-jnp.inf, jnp.float32)
    if causal:
        qi = r * block + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        ki = bc_ref[r, w] * block + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1)
        s = jnp.where(qi >= ki, s, neg)
    s = jnp.where(live_ref[r, w] > 0, s, neg)
    p = jnp.exp(s - lse_ref[0][:, :1])          # true softmax probs
    dp = jax.lax.dot_general(                   # dO V^T
        do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = p * (dp - delta_s[:, :1])
    acc_s[...] += jax.lax.dot(ds.astype(k.dtype), k,
                              preferred_element_type=jnp.float32)

    @pl.when(w == wmax - 1)
    def _emit():
        dq_ref[0] = (acc_s[...] * scale).astype(dq_ref.dtype)


def _flash_dkdv_kernel(brt_ref, livet_ref, q_ref, k_ref, v_ref, do_ref,
                       o_ref, lse_ref, dk_ref, dv_ref, dk_s, dv_s,
                       *, umax, block, causal, scale):
    """dK/dV over the TRANSPOSED ELL: grid (heads, key_tile, slot), each
    key tile's gradients accumulate in VMEM while the slot axis walks the
    query tiles that touch it.  q/dO/O/lse tiles arrive via the
    scalar-prefetched brt index map; the contraction dimension numbers do
    the P^T / dS^T products without materializing a transpose."""
    c = pl.program_id(1)
    u = pl.program_id(2)

    @pl.when(u == 0)
    def _init():
        dk_s[...] = jnp.zeros_like(dk_s)
        dv_s[...] = jnp.zeros_like(dv_s)

    q = q_ref[0]       # query tile r = brt[c, u]
    k = k_ref[0]
    do = do_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    neg = jnp.asarray(-jnp.inf, jnp.float32)
    if causal:
        qi = brt_ref[c, u] * block + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 0)
        ki = c * block + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(qi >= ki, s, neg)
    s = jnp.where(livet_ref[c, u] > 0, s, neg)
    p = jnp.exp(s - lse_ref[0][:, :1])
    # dV += P^T dO  (contract the query-row axis)
    dv_s[...] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    delta = jnp.sum(do.astype(jnp.float32) * o_ref[0].astype(jnp.float32),
                    axis=1, keepdims=True)
    dp = jax.lax.dot_general(
        do, v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    dk_s[...] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(u == umax - 1)
    def _emit():
        dk_ref[0] = (dk_s[...] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_s[...].astype(dv_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("nbr", "nbc", "block", "causal", "scale",
                              "wmax", "umax", "interpret"))
def _bsa_pallas_bwd_hqd(q, k, v, do, o, lse, bc_ell, live, brt_ell, livet,
                        *, nbr, nbc, block, causal, scale, wmax, umax,
                        interpret):
    H, Tq, D = q.shape
    Tk = k.shape[1]
    qrow = pl.BlockSpec((1, block, D), lambda h, r, w, *pref: (h, r, 0),
                        memory_space=pltpu.VMEM)
    kcol = pl.BlockSpec((1, block, D),
                        lambda h, r, w, bc, lv: (h, bc[r, w], 0),
                        memory_space=pltpu.VMEM)
    lrow = pl.BlockSpec((1, block, 128), lambda h, r, w, *pref: (h, r, 0),
                        memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_flash_dq_kernel, wmax=wmax, block=block,
                          causal=causal, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(H, nbr, wmax),
            in_specs=[qrow, kcol, kcol, qrow, qrow, lrow],
            out_specs=qrow,
            scratch_shapes=[
                pltpu.VMEM((block, D), jnp.float32),    # dq acc
                pltpu.VMEM((block, 128), jnp.float32),  # delta
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((H, Tq, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(bc_ell, live, q, k, v, do, o, lse)

    qrow_t = pl.BlockSpec((1, block, D),
                          lambda h, c, u, brt, lv: (h, brt[c, u], 0),
                          memory_space=pltpu.VMEM)
    kcol_t = pl.BlockSpec((1, block, D), lambda h, c, u, *pref: (h, c, 0),
                          memory_space=pltpu.VMEM)
    lrow_t = pl.BlockSpec((1, block, 128),
                          lambda h, c, u, brt, lv: (h, brt[c, u], 0),
                          memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_flash_dkdv_kernel, umax=umax, block=block,
                          causal=causal, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(H, nbc, umax),
            in_specs=[qrow_t, kcol_t, kcol_t, qrow_t, qrow_t, lrow_t],
            out_specs=(kcol_t, kcol_t),
            scratch_shapes=[
                pltpu.VMEM((block, D), jnp.float32),    # dk acc
                pltpu.VMEM((block, D), jnp.float32),    # dv acc
            ],
        ),
        out_shape=(jax.ShapeDtypeStruct((H, Tk, D), k.dtype),
                   jax.ShapeDtypeStruct((H, Tk, D), v.dtype)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(brt_ell, livet, q, k, v, do, o, lse)
    return dq, dk, dv


def _pallas_backward(q, k, v, do, o, lse, mask: BlockMask, scale: float,
                     interpret: bool = False, version: int = 2):
    lead = q.shape[:-2]
    Tq, D = q.shape[-2:]
    Tk = k.shape[-2]
    qf, kf, vf = _pad_flatten(q, k, v)
    dof, of, _ = _pad_flatten(do, o, o)
    interpret = interpret or jax.default_backend() == "cpu"
    if version == 2:
        nch, ch, bc_ell, bias_cols = _mask_to_ell_chunked(mask)
        ncht, cht, brt_ell, livet = _mask_to_ell_t_chunked(mask)
        dq, dk, dv = _bsa_pallas2_bwd_hqd(
            qf, kf, vf, dof, of, lse,
            jnp.asarray(bc_ell), jnp.asarray(bias_cols),
            jnp.asarray(brt_ell), jnp.asarray(livet),
            nbr=mask.nbr, nbc=mask.nbc, block=mask.block,
            causal=mask.causal, scale=scale, nch=nch, ch=ch,
            ncht=ncht, cht=cht, interpret=interpret)
    else:
        wmax, bc_ell, live = _mask_to_ell(mask)
        umax, brt_ell, livet = _mask_to_ell_t(mask)
        dq, dk, dv = _bsa_pallas_bwd_hqd(
            qf, kf, vf, dof, of, lse,
            jnp.asarray(bc_ell), jnp.asarray(live, jnp.int32),
            jnp.asarray(brt_ell), jnp.asarray(livet, jnp.int32),
            nbr=mask.nbr, nbc=mask.nbc, block=mask.block,
            causal=mask.causal, scale=scale, wmax=wmax, umax=umax,
            interpret=interpret)
    return (dq[..., :D].reshape(*lead, Tq, D),
            dk[..., :D].reshape(*lead, Tk, D),
            dv[..., :D].reshape(*lead, Tk, D))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def block_sparse_attention_pallas(q, k, v, mask: BlockMask, scale=None,
                                  bwd: str = "auto"):
    """Fused block-sparse attention.  Same contract as
    attention.block_sparse_attention: q [..., T_q, D], k/v [..., T_k, D].

    ``bwd`` picks the gradient path: "pallas" = fused flash backward
    (dq + dkdv kernels above), "xla" = differentiate the batched-einsum
    path (materializes the [nb, wmax, bh, bw] probability blocks in HBM;
    the oracle), "auto" = pallas on an accelerator backend, xla on CPU
    (interpret-mode kernels are far slower than real XLA on CPU)."""
    if scale is None:
        scale = 1.0 / np.sqrt(q.shape[-1])
    return _pallas_forward(q, k, v, mask, scale)


def _fwd(q, k, v, mask, scale, bwd):
    if scale is None:
        scale = 1.0 / np.sqrt(q.shape[-1])
    o, lse = _pallas_forward(q, k, v, mask, scale, with_lse=True)
    return o, (q, k, v, o, lse)


def _bwd(mask, scale, bwd, res, g):
    q, k, v, o, lse = res
    if scale is None:
        scale = 1.0 / np.sqrt(q.shape[-1])
    if bwd == "auto":
        bwd = "xla" if jax.default_backend() == "cpu" else "pallas"
    if bwd == "pallas":
        return _pallas_backward(q, k, v, g, o, lse, mask, scale)
    from .attention import block_sparse_attention

    _, vjp = jax.vjp(
        lambda a, b, c: block_sparse_attention(a, b, c, mask, scale=scale,
                                               impl="xla"), q, k, v)
    return vjp(g)


block_sparse_attention_pallas.defvjp(_fwd, _bwd)


def _xla_forward_lse(q, k, v, mask: BlockMask, scale: float):
    """The batched-einsum forward, also returning per-row logsumexp
    [..., T_q] — the residual the flash backward rebuilds P from."""
    import jax.numpy as _jnp

    from .attention import _bsa_core

    _, bc_ell, live = _mask_to_ell(mask)
    fn = functools.partial(_bsa_core, nbr=mask.nbr, block=mask.block,
                           causal=mask.causal, scale=scale, with_lse=True)
    for _ in range(q.ndim - 2):
        fn = jax.vmap(fn, in_axes=(0, 0, 0, None, None))
    return fn(q, k, v, _jnp.asarray(bc_ell), _jnp.asarray(live))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def block_sparse_attention_hybrid(q, k, v, mask: BlockMask, scale=None):
    """XLA forward + flash Pallas backward.  SUPERSEDED as the training
    default by the v2 fully fused kernels (results/attn2_probe.json,
    r5c: full-v2 train step beats this hybrid 1.27x at T=2k and 2.0x at
    T=4k — the lse-producing XLA forward costs more than the v2 forward
    gap).  Kept as a measured comparison point and for callers that want
    the XLA forward's exact numerics with a fast backward."""
    if scale is None:
        scale = 1.0 / np.sqrt(q.shape[-1])
    from .attention import block_sparse_attention

    return block_sparse_attention(q, k, v, mask, scale=scale, impl="xla")


def _hyb_fwd(q, k, v, mask, scale):
    if scale is None:
        scale = 1.0 / np.sqrt(q.shape[-1])
    o, lse = _xla_forward_lse(q, k, v, mask, scale)
    return o, (q, k, v, o, lse)


def _hyb_bwd(mask, scale, res, g):
    q, k, v, o, lse = res
    if scale is None:
        scale = 1.0 / np.sqrt(q.shape[-1])
    if jax.default_backend() == "cpu":
        # interpret-mode flash kernels are far slower than real XLA
        from .attention import block_sparse_attention

        _, vjp = jax.vjp(
            lambda a, b, c: block_sparse_attention(
                a, b, c, mask, scale=scale, impl="xla"), q, k, v)
        return vjp(g)
    Tq = q.shape[-2]
    lse_r = jnp.broadcast_to(
        lse.reshape(-1, Tq)[..., None].astype(jnp.float32),
        (int(np.prod(q.shape[:-2])) if q.ndim > 2 else 1, Tq, 128))
    return _pallas_backward(q, k, v, g, o, lse_r, mask, scale)


block_sparse_attention_hybrid.defvjp(_hyb_fwd, _hyb_bwd)

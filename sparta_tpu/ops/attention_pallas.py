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

Differentiable via jax.custom_vjp: forward runs this kernel; backward
recomputes through the XLA path's autodiff (same math, bitwise-comparable
tolerances) — training pays the XLA backward cost, serving gets the fused
forward.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import BlockMask, _mask_to_ell

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


@functools.partial(
    jax.jit, static_argnames=("nbr", "block", "causal", "scale", "wmax",
                              "interpret"))
def _bsa_pallas_hqd(q, k, v, bc_ell, live, *, nbr, block, causal, scale,
                    wmax, interpret):
    """q [H, T_q, D], k/v [H, T_k, D] -> [H, T_q, D]."""
    H, Tq, D = q.shape
    kernel = functools.partial(_flash_kernel, wmax=wmax, block=block,
                               causal=causal, scale=scale)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(H, nbr, wmax),
            in_specs=[
                pl.BlockSpec((1, block, D),
                             lambda h, r, w, bc, lv: (h, r, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block, D),
                             lambda h, r, w, bc, lv: (h, bc[r, w], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block, D),
                             lambda h, r, w, bc, lv: (h, bc[r, w], 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block, D),
                                   lambda h, r, w, bc, lv: (h, r, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((block, D), jnp.float32),    # acc
                pltpu.VMEM((block, 128), jnp.float32),  # running max
                pltpu.VMEM((block, 128), jnp.float32),  # running denom
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((H, Tq, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(bc_ell, live, q, k, v)


def _pallas_forward(q, k, v, mask: BlockMask, scale: float,
                    interpret: bool = False):
    """Leading dims flattened into the head grid axis; D padded to the
    128-lane grid (zero feature columns change neither scores nor the
    sliced-away output columns)."""
    lead = q.shape[:-2]
    Tq, D = q.shape[-2:]
    Tk = k.shape[-2]
    qf = q.reshape(-1, Tq, D)
    kf = k.reshape(-1, Tk, D)
    vf = v.reshape(-1, Tk, D)
    Dp = -(-D // 128) * 128
    if Dp != D:
        pad = ((0, 0), (0, 0), (0, Dp - D))
        qf, kf, vf = (jnp.pad(t, pad) for t in (qf, kf, vf))
    wmax, bc_ell, live = _mask_to_ell(mask)
    o = _bsa_pallas_hqd(
        qf, kf, vf, jnp.asarray(bc_ell), jnp.asarray(live, jnp.int32),
        nbr=mask.nbr, block=mask.block, causal=mask.causal, scale=scale,
        wmax=wmax, interpret=interpret or jax.default_backend() == "cpu")
    return o[..., :D].reshape(*lead, Tq, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def block_sparse_attention_pallas(q, k, v, mask: BlockMask, scale=None):
    """Fused-forward block-sparse attention.  Same contract as
    attention.block_sparse_attention: q [..., T_q, D], k/v [..., T_k, D].
    Backward differentiates the mathematically-identical XLA path."""
    if scale is None:
        scale = 1.0 / np.sqrt(q.shape[-1])
    return _pallas_forward(q, k, v, mask, scale)


def _fwd(q, k, v, mask, scale):
    return block_sparse_attention_pallas(q, k, v, mask, scale), (q, k, v)


def _bwd(mask, scale, res, g):
    from .attention import block_sparse_attention

    q, k, v = res
    if scale is None:
        scale = 1.0 / np.sqrt(q.shape[-1])
    _, vjp = jax.vjp(
        lambda a, b, c: block_sparse_attention(a, b, c, mask, scale=scale,
                                               impl="xla"), q, k, v)
    return vjp(g)


block_sparse_attention_pallas.defvjp(_fwd, _bwd)

"""Block-sparse attention on the framework's blocked-sparsity machinery.

The reference stops at SpMM (its transformer story is "pruned weight
matrices", BASELINE north star); this extends the same 128-block
structure to the attention *pattern* — the other place block sparsity
pays on TPU.  Scores are computed only for the mask's nonzero blocks
(SDD: sampled dense-dense QKᵀ as batched MXU dots over the block list),
softmax runs per query row across that block-row's blocks via segment
reductions, and the probability blocks multiply V with the same
batched-dot + segment-sum shape as the bell SpMM.

Everything is pure XLA on static block patterns: the block list (br, bc)
is host-built per config, so jit sees fixed shapes; intra-block causal /
key-padding masks are built on the fly from iota (no [nb, bh, bw] host
tensors).  Differentiable end-to-end (plain XLA ops — jax.grad flows
through segment_sum/segment_max), vmapped over batch and heads.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class BlockMask:
    """Static block-sparsity pattern for [T_q, T_k] attention scores.

    ``br``/``bc`` list the nonzero (query-block, key-block) pairs, sorted
    by ``br``.  ``causal`` adds the intra-block lower-triangular mask on
    diagonal blocks (off-diagonal blocks are all-or-nothing by
    construction of the builders)."""

    br: tuple  # int block-row (query tile) per nonzero block, sorted
    bc: tuple  # int block-col (key tile) per nonzero block
    nbr: int
    nbc: int
    block: int
    causal: bool = False

    @property
    def n_blocks(self) -> int:
        return len(self.br)

    @property
    def density(self) -> float:
        return self.n_blocks / (self.nbr * self.nbc)


def build_block_mask(T_q: int, T_k: int, block: int = 128, *,
                     window: int | None = None, causal: bool = False,
                     global_blocks: int = 0) -> BlockMask:
    """Local-window (+ optional global key blocks) block pattern —
    the Longformer/BigBird family of structures, at MXU tile granularity.

    window=None -> every block (dense pattern, for testing);
    window=w    -> query tile i sees key tiles within w-1 tiles
                   (past-only when causal);
    global_blocks=g -> the first g key tiles are visible to every row.
    """
    if T_q % block or T_k % block:
        raise ValueError(f"T_q={T_q}, T_k={T_k} must be multiples of "
                         f"block={block}")
    nbr, nbc = T_q // block, T_k // block
    pairs = set()
    for i in range(nbr):
        if window is None:
            lo, hi = 0, nbc - 1
        else:
            lo, hi = i - (window - 1), i + (window - 1)
        if causal:
            hi = min(hi, i)
        for j in range(max(lo, 0), min(hi, nbc - 1) + 1):
            pairs.add((i, j))
        for j in range(min(global_blocks, nbc)):
            if not causal or j <= i:
                pairs.add((i, j))
    br, bc = zip(*sorted(pairs)) if pairs else ((), ())
    return BlockMask(br=br, bc=bc, nbr=nbr, nbc=nbc, block=block,
                     causal=causal)


@functools.partial(jax.jit, static_argnames=("nbr", "block", "causal"))
def _bsa_core(q, k, v, br, bc, nbr, block, causal, scale):
    """Single-head core: q [T_q, D], k/v [T_k, D] -> [T_q, D]."""
    bh = bw = block
    D = q.shape[-1]
    qt = q.reshape(nbr, bh, D)
    kt = k.reshape(-1, bw, D)
    vt = v.reshape(-1, bw, D)
    # SDD: scores only for the nonzero blocks — batched MXU dots
    s = jnp.einsum("nbd,ncd->nbc", qt[br], kt[bc],
                   preferred_element_type=jnp.float32) * scale
    if causal:
        # intra-block triangular mask built from iota (diagonal blocks);
        # strictly-past blocks are fully visible, future ones absent
        qi = br[:, None, None] * bh + jax.lax.broadcasted_iota(
            jnp.int32, (1, bh, 1), 1)
        ki = bc[:, None, None] * bw + jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, bw), 2)
        s = jnp.where(qi >= ki, s, -jnp.inf)
    # block-row softmax: per query row across all its blocks
    m = jax.ops.segment_max(s.max(axis=2), br, num_segments=nbr,
                            indices_are_sorted=True)          # [nbr, bh]
    m = jnp.maximum(m, -1e30)  # rows with no visible key
    p = jnp.exp(s - m[br][:, :, None])
    denom = jax.ops.segment_sum(p.sum(axis=2), br, num_segments=nbr,
                                indices_are_sorted=True)      # [nbr, bh]
    p = p / jnp.maximum(denom, 1e-30)[br][:, :, None]
    # PV: same batched-dot + segment-sum shape as the bell SpMM
    ov = jnp.einsum("nbc,ncd->nbd", p.astype(v.dtype), vt[bc],
                    preferred_element_type=jnp.float32)
    o = jax.ops.segment_sum(ov, br, num_segments=nbr,
                            indices_are_sorted=True)          # [nbr, bh, D]
    return o.reshape(nbr * bh, D).astype(q.dtype)


def block_sparse_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                           mask: BlockMask,
                           scale: float | None = None) -> jax.Array:
    """Attention over a static block pattern.

    q: [..., T_q, D], k/v: [..., T_k, D]; leading dims (batch, heads)
    are vmapped.  Returns [..., T_q, D].  Scores exist ONLY for the
    mask's blocks — compute and memory scale with mask.n_blocks, not
    T_q*T_k."""
    if q.shape[-2] != mask.nbr * mask.block:
        raise ValueError(f"T_q={q.shape[-2]} != mask {mask.nbr}x{mask.block}")
    if k.shape[-2] != mask.nbc * mask.block:
        raise ValueError(f"T_k={k.shape[-2]} != mask {mask.nbc}x{mask.block}")
    scale = scale if scale is not None else 1.0 / np.sqrt(q.shape[-1])
    br = jnp.asarray(mask.br, dtype=jnp.int32)
    bc = jnp.asarray(mask.bc, dtype=jnp.int32)
    fn = functools.partial(_bsa_core, nbr=mask.nbr, block=mask.block,
                           causal=mask.causal, scale=scale)
    for _ in range(q.ndim - 2):
        fn = jax.vmap(fn, in_axes=(0, 0, 0, None, None))
    return fn(q, k, v, br, bc)


def dense_mask_from_block_mask(mask: BlockMask) -> np.ndarray:
    """Boolean [T_q, T_k] elementwise mask equivalent — the test oracle."""
    T_q, T_k = mask.nbr * mask.block, mask.nbc * mask.block
    out = np.zeros((T_q, T_k), dtype=bool)
    b = mask.block
    for i, j in zip(mask.br, mask.bc):
        out[i * b:(i + 1) * b, j * b:(j + 1) * b] = True
    if mask.causal:
        out &= np.tril(np.ones((T_q, T_k), dtype=bool))
    return out

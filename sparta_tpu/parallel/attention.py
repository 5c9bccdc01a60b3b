"""Sequence-parallel block-sparse attention (halo exchange over the mesh).

Context/sequence parallelism for the local-window + global-blocks pattern
(`ops/attention.py`): the token axis is sharded over a mesh axis, and each
device computes attention for its own query tiles.  Because the pattern is
local, a device only ever needs

- the first ``global_blocks`` key tiles of the FULL sequence (owner-
  broadcast from the shard that holds them via a masked ``psum``), and
- the last ``window-1`` key tiles of its left neighbor (one ``ppermute``).

This is the degenerate — and maximally efficient — case of ring attention:
instead of rotating all K/V shards through every device (general dense
attention needs all pairs), the static block pattern bounds the halo to a
constant number of tiles, so communication is O(window + global) per device
regardless of sequence length.  Compute per device is O(T/n · (window +
global) · block²d) — the same block list the single-device kernel walks,
split by query tile ownership.

The reference has no distributed code at all (SURVEY §2.7); this subsystem
is part of the mandated multi-chip redesign.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P


def _sp_attention_local(q, k, v, *, axis: str, n_shards: int, block: int,
                        window: int, global_blocks: int, scale: float):
    """Shard-local attention body — call INSIDE shard_map.

    q/k/v: [..., Ts, D] local token slices (any leading batch/head dims).
    Returns [..., Ts, D].  Semantics match
    ``block_sparse_attention(build_block_mask(T, T, block, window=w,
    causal=True, global_blocks=g))`` restricted to this shard's queries.
    """
    Ts, D = q.shape[-2], q.shape[-1]
    if Ts % block:
        raise ValueError(f"shard length {Ts} not a multiple of block {block}")
    nbt_s = Ts // block
    g, w = global_blocks, window
    h = w - 1
    if h > nbt_s or g > nbt_s:
        raise ValueError(
            f"window-1={h} and global_blocks={g} must each fit in one shard "
            f"({nbt_s} tiles): halo exchange is single-neighbor")

    d_idx = lax.axis_index(axis)
    qtile0 = d_idx * nbt_s
    lead = q.shape[:-2]

    bufs = []
    if g:
        own = d_idx == 0
        kg = lax.psum(jnp.where(own, k[..., : g * block, :], 0), axis)
        vg = lax.psum(jnp.where(own, v[..., : g * block, :], 0), axis)
        bufs.append((kg, vg))
    if h:
        # device i's trailing h tiles -> device i+1; shard 0 receives zeros
        # (its halo slots are masked invalid below)
        perm = [(i, i + 1) for i in range(n_shards - 1)]
        kh = lax.ppermute(k[..., Ts - h * block:, :], axis, perm)
        vh = lax.ppermute(v[..., Ts - h * block:, :], axis, perm)
        bufs.append((kh, vh))
    kbuf = jnp.concatenate([b[0] for b in bufs] + [k], axis=-2)
    vbuf = jnp.concatenate([b[1] for b in bufs] + [v], axis=-2)

    S = g + h + nbt_s
    qt = q.reshape(*lead, nbt_s, block, D)
    kt = kbuf.reshape(*lead, S, block, D)
    vt = vbuf.reshape(*lead, S, block, D)

    i = jnp.arange(nbt_s)
    # concat-buffer slot for query tile i's window tile j (global tile
    # qtile0+i-h+j): local tiles sit at slot g+h+t, halo tile -m at g+h-m —
    # both collapse to slot g+i+j
    win_slots = g + i[:, None] + jnp.arange(w)[None, :]           # [nbt_s, w]
    slots = jnp.concatenate(
        [jnp.broadcast_to(jnp.arange(g), (nbt_s, g)), win_slots], axis=1)
    # global tile id per slot (traced through qtile0)
    gtile = jnp.concatenate(
        [jnp.broadcast_to(jnp.arange(g), (nbt_s, g)),
         (qtile0 + i)[:, None] - h + jnp.arange(w)[None, :]], axis=1)
    # window slots drop out-of-range tiles AND tiles < g: those keys arrive
    # through the global slots — double-counting would corrupt the softmax
    valid = jnp.concatenate(
        [jnp.ones((nbt_s, g), bool), gtile[:, g:] >= g], axis=1)

    kt_s = kt[..., slots, :, :]          # [..., nbt_s, g+w, block, D]
    vt_s = vt[..., slots, :, :]
    s = jnp.einsum("...rqd,...rwkd->...rwqk", qt, kt_s,
                   preferred_element_type=jnp.float32) * scale
    qpos = ((qtile0 + i)[:, None, None, None] * block
            + lax.broadcasted_iota(jnp.int32, (1, 1, block, 1), 2))
    kpos = (gtile[:, :, None, None] * block
            + lax.broadcasted_iota(jnp.int32, (1, 1, 1, block), 3))
    m = valid[:, :, None, None] & (kpos <= qpos)
    s = jnp.where(m, s, -jnp.inf)
    mx = jnp.maximum(s.max(axis=(-3, -1)), -1e30)     # [..., nbt_s, block]
    p = jnp.exp(s - mx[..., None, :, None])
    den = jnp.maximum(p.sum(axis=(-3, -1)), 1e-30)
    p = p / den[..., None, :, None]
    o = jnp.einsum("...rwqk,...rwkd->...rqd", p.astype(v.dtype), vt_s,
                   preferred_element_type=jnp.float32)
    return o.reshape(*lead, Ts, D).astype(q.dtype)


def sequence_sharded_attention(q, k, v, mesh: Mesh, axis: str = "sp", *,
                               block: int = 128, window: int = 2,
                               global_blocks: int = 0,
                               scale: float | None = None):
    """Causal local-window (+global) attention with the token axis sharded.

    q/k/v: [..., T, D] (leading dims batch/heads replicated); T is sharded
    over ``mesh`` axis ``axis``.  Equivalent to
    ``block_sparse_attention(q, k, v, build_block_mask(T, T, block,
    window=window, causal=True, global_blocks=global_blocks))`` but with
    per-device compute + O(window+global) tiles of communication instead
    of gathering the full K/V.
    """
    T, D = q.shape[-2], q.shape[-1]
    n = mesh.shape[axis]
    if T % (n * block):
        raise ValueError(f"T={T} must be a multiple of n_shards*block="
                         f"{n * block}")
    scale = scale if scale is not None else 1.0 / np.sqrt(D)
    spec = P(*([None] * (q.ndim - 2)), axis, None)
    fn = jax.shard_map(
        functools.partial(_sp_attention_local, axis=axis, n_shards=n,
                          block=block, window=window,
                          global_blocks=global_blocks, scale=scale),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
    return fn(q, k, v)

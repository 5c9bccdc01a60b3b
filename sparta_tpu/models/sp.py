"""Sequence-parallel training for the block-sparse transformer.

Shards the TOKEN axis of activations over a mesh axis ("sp") in addition
to the batch axis ("dp"): every device holds the full (replicated) params
but only T/n_sp tokens of every activation, so the activation memory of
long sequences scales out — the transformer-training analog of sharding
block-rows of the sparse operand in `parallel/spmm.py`.

The only cross-token couplings in the model are

- local block-sparse attention  -> halo exchange of ``window-1`` key tiles
  + owner-broadcast of the global tiles
  (`parallel.attention._sp_attention_local`), and
- the next-token LM loss        -> a one-token ``ppermute`` halo of the
  targets.

Everything else (embeds, layernorms, Blocked-ELL FFN SpMM, projections) is
token-local, so the whole forward runs inside one ``shard_map`` with zero
other collectives; gradients flow through ``ppermute``/``psum`` and the
replicated params come back all-reduced by shard_map's backward.

Matches ``train.lm_loss`` exactly (same predicted positions, same local
attention pattern); tested against it on a virtual mesh.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel.attention import _sp_attention_local
from .layers import dense_apply, layernorm_apply
from .transformer import BlockSparseTransformer


def _sp_forward_local(model: BlockSparseTransformer, params, tokens,
                      *, axis_sp: str, n_sp: int):
    """Shard-local forward: tokens [Bl, Tl] -> logits [Bl, Tl, vocab]."""
    cfg = model.cfg
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    Bl, Tl = tokens.shape
    h, dh = cfg.n_heads, cfg.d_model // cfg.n_heads
    pos0 = lax.axis_index(axis_sp) * Tl

    x = params["embed"][tokens].astype(dtype)
    x = x + lax.dynamic_slice_in_dim(
        params["pos"], pos0, Tl, axis=0).astype(dtype)
    for i, lp in enumerate(params["layers"]):
        xin = layernorm_apply(lp["ln1"], x)
        qkv = dense_apply(lp["qkv"], xin).reshape(Bl, Tl, h, 3, dh)
        q, k, v = (qkv[:, :, :, j].swapaxes(1, 2) for j in range(3))
        if cfg.attention != "local":
            raise ValueError(
                "sequence-parallel training needs attention='local' "
                "(dense attention has no bounded halo)")
        out = _sp_attention_local(
            q, k, v, axis=axis_sp, n_shards=n_sp, block=cfg.block,
            window=cfg.attn_window, global_blocks=cfg.attn_global_blocks,
            scale=1.0 / np.sqrt(dh))
        out = out.swapaxes(1, 2).reshape(Bl, Tl, cfg.d_model)
        x = x + dense_apply(lp["proj"], out)
        hdn = layernorm_apply(lp["ln2"], x)
        # token-local FFN — dense block-sparse pair or MoE (routing and
        # capacity are then per sequence shard, the standard composition)
        hdn, _ = model._ffn(i, lp, hdn)
        x = x + hdn
    x = layernorm_apply(params["final_ln"], x)
    return (x @ params["embed"].T.astype(dtype)).astype(jnp.float32)


def _sp_loss_local(model, params, tokens, *, axis_dp: str, axis_sp: str,
                   n_dp: int, n_sp: int):
    """Shard-local LM loss; psum-reduced to the replicated global mean.

    Targets are next tokens: each shard fetches the FIRST token of its
    right neighbor (one-token ppermute halo); the last shard's final
    position has no target and is masked — the predicted-position set is
    exactly ``train.lm_loss``'s (positions 0..T-2).
    """
    Bl, Tl = tokens.shape
    # mark the replicated params as device-varying up front: the transpose
    # rule of the cast is psum, so shard_map's backward can statically infer
    # that each param grad is all-reduced (replicated) — without this the
    # vma check can't prove the P() out_specs of a handful of grad leaves
    params = jax.tree.map(
        lambda a: lax.pcast(a, (axis_dp, axis_sp), to="varying"), params)
    logits = _sp_forward_local(model, params, tokens, axis_sp=axis_sp,
                               n_sp=n_sp)
    nxt = lax.ppermute(tokens[:, :1], axis_sp,
                       [(i + 1, i) for i in range(n_sp - 1)])
    targets = jnp.concatenate([tokens[:, 1:], nxt], axis=1)
    is_last = lax.axis_index(axis_sp) == n_sp - 1
    valid = jnp.ones((Bl, Tl), jnp.float32).at[:, -1].mul(
        jnp.where(is_last, 0.0, 1.0))
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1).squeeze(-1)
    num = lax.psum((nll * valid).sum(), (axis_dp, axis_sp))
    # global predicted-position count is static: B*(T-1), like lm_loss's mean
    return num / (Bl * n_dp * (Tl * n_sp - 1))


def make_sp_train_step(model: BlockSparseTransformer, optimizer,
                       mesh: Mesh, axis_dp: str = "dp",
                       axis_sp: str = "sp"):
    """Training step over a (dp, sp) mesh: batch sharded on ``axis_dp``,
    sequence sharded on ``axis_sp``, params replicated.

    Returns ``(init_sharded, train_step)`` with the same signature as
    ``train.make_sharded_train_step``.  Sequence length must be a multiple
    of ``n_sp * cfg.block``.
    """
    n_dp = mesh.shape[axis_dp]
    n_sp = mesh.shape[axis_sp]

    def sp_loss(params, tokens):
        fn = jax.shard_map(
            functools.partial(_sp_loss_local, model, axis_dp=axis_dp,
                              axis_sp=axis_sp, n_dp=n_dp, n_sp=n_sp),
            mesh=mesh, in_specs=(P(), P(axis_dp, axis_sp)), out_specs=P())
        return fn(params, tokens)

    def init_sharded(key, sample_tokens):
        params = jax.device_put(model.init(key), NamedSharding(mesh, P()))
        opt_state = optimizer.init(params)
        tokens = jax.device_put(
            sample_tokens, NamedSharding(mesh, P(axis_dp, axis_sp)))
        return params, opt_state, tokens

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, tokens):
        loss, grads = jax.value_and_grad(sp_loss)(params, tokens)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return init_sharded, train_step

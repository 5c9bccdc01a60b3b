"""Block-sparse transformer (pruned-BERT-style): dense attention + Blocked-ELL
sparse FFN weights, the north-star "block-sparse transformer weight matrices
SpMM batch inference" configuration.

Pure-pytree model: ``BlockSparseTransformer.init(key)`` returns the param
tree; ``apply(params, tokens)`` the logits.  Static block structure lives in
the config (not in params) so optimizers and shardings see float leaves only.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .layers import (
    BlockSparseLinear,
    dense_apply,
    dense_init,
    layernorm_apply,
    layernorm_init,
)


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    vocab: int = 1024
    d_model: int = 512
    n_heads: int = 8
    n_layers: int = 2
    d_ff: int = 2048
    max_seq: int = 512
    block: int = 128
    ffn_block_density: float = 0.15   # 85% block-sparse FFN
    dtype: str = "float32"
    # attention pattern: "dense" (full causal) or "local" (block-sparse
    # causal local window + global key blocks, ops/attention.py)
    attention: str = "dense"
    attn_window: int = 2              # local: +-(window-1) key tiles
    attn_global_blocks: int = 1       # local: first g key tiles global
    # Mixture-of-Experts FFN (models/moe.py): 0 = dense block-sparse FFN;
    # >0 = that many block-sparse experts, Switch top-1 routing
    moe_experts: int = 0
    moe_capacity: float = 1.25        # per-expert slots = N/E * this
    moe_aux_weight: float = 1e-2      # load-balance loss weight (lm_loss)


@dataclasses.dataclass(frozen=True)
class BlockSparseTransformer:
    cfg: TransformerConfig
    ffn_up: tuple[BlockSparseLinear, ...]
    ffn_down: tuple[BlockSparseLinear, ...]
    moe: tuple = ()   # per-layer BlockSparseMoE when cfg.moe_experts > 0

    @classmethod
    def create(cls, cfg: TransformerConfig, key) -> "BlockSparseTransformer":
        if cfg.moe_experts:
            from .moe import BlockSparseMoE

            keys = jax.random.split(key, cfg.n_layers)
            moe = tuple(
                BlockSparseMoE.create(
                    keys[i], cfg.moe_experts, cfg.d_model, cfg.d_ff,
                    cfg.block, cfg.ffn_block_density,
                    capacity_factor=cfg.moe_capacity)
                for i in range(cfg.n_layers)
            )
            return cls(cfg, (), (), moe)
        keys = jax.random.split(key, 2 * cfg.n_layers)
        up = tuple(
            BlockSparseLinear.create(
                keys[2 * i], cfg.d_ff, cfg.d_model, cfg.block, cfg.ffn_block_density
            )
            for i in range(cfg.n_layers)
        )
        down = tuple(
            BlockSparseLinear.create(
                keys[2 * i + 1], cfg.d_model, cfg.d_ff, cfg.block, cfg.ffn_block_density
            )
            for i in range(cfg.n_layers)
        )
        return cls(cfg, up, down)

    # -- params -----------------------------------------------------------
    def init(self, key) -> dict:
        cfg = self.cfg
        k_emb, k_pos, *k_layers = jax.random.split(key, 2 + cfg.n_layers)
        params = {
            "embed": jax.random.normal(k_emb, (cfg.vocab, cfg.d_model)) * 0.02,
            "pos": jax.random.normal(k_pos, (cfg.max_seq, cfg.d_model)) * 0.02,
            "final_ln": layernorm_init(cfg.d_model),
            "layers": [],
        }
        for i in range(cfg.n_layers):
            ks = jax.random.split(k_layers[i], 6)
            layer = {
                "ln1": layernorm_init(cfg.d_model),
                "ln2": layernorm_init(cfg.d_model),
                "qkv": dense_init(ks[0], 3 * cfg.d_model, cfg.d_model),
                "proj": dense_init(ks[1], cfg.d_model, cfg.d_model),
            }
            if cfg.moe_experts:
                layer["moe"] = self.moe[i].init(ks[2])
            else:
                layer["ffn_up"] = self.ffn_up[i].init(ks[2])
                layer["ffn_down"] = self.ffn_down[i].init(ks[3])
            params["layers"].append(layer)
        return params

    # -- forward ----------------------------------------------------------
    def apply(self, params, tokens: jax.Array, *, return_aux: bool = False):
        """tokens [batch, seq] int32 -> logits [batch, seq, vocab]
        (+ summed MoE load-balance aux when ``return_aux``)."""
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        x = params["embed"][tokens].astype(dtype)
        x = x + params["pos"][: tokens.shape[1]].astype(dtype)
        aux = jnp.zeros((), jnp.float32)
        for i, lp in enumerate(params["layers"]):
            x = x + self._attn(lp, layernorm_apply(lp["ln1"], x), cfg)
            h = layernorm_apply(lp["ln2"], x)
            h, a = self._ffn(i, lp, h)
            aux = aux + a
            x = x + h
        x = layernorm_apply(params["final_ln"], x)
        logits = (x @ params["embed"].T.astype(dtype)).astype(jnp.float32)
        return (logits, aux) if return_aux else logits

    def _ffn(self, i, lp, h, dropless: bool = False):
        """FFN block: dense block-sparse pair, or MoE when configured.
        Returns (out, aux).  ``dropless`` lifts the MoE capacity to the
        token count (serving: decode never drops a token)."""
        if self.cfg.moe_experts:
            cap = int(np.prod(h.shape[:-1])) if dropless else None
            y, aux = self.moe[i].apply(lp["moe"], h, return_aux=True,
                                       capacity=cap)
            return y, aux
        h = self.ffn_up[i].apply(lp["ffn_up"], h)
        h = jax.nn.gelu(h)
        h = self.ffn_down[i].apply(lp["ffn_down"], h)
        return h, jnp.zeros((), jnp.float32)

    @staticmethod
    def _attn(lp, x, cfg):
        b, s, d = x.shape
        h = cfg.n_heads
        # qkv output columns are HEAD-MAJOR [h, 3, dh]: a contiguous tp
        # split of the 3*d_model axis then owns whole head groups, so
        # per-head attention and KV-cache writes run tp-local (a [3, h, dh]
        # layout would make every tp shard cross q/k/v boundaries and force
        # GSPMD reshards per layer)
        qkv = dense_apply(lp["qkv"], x).reshape(b, s, h, 3, d // h)
        q, k, v = qkv[:, :, :, 0], qkv[:, :, :, 1], qkv[:, :, :, 2]
        if cfg.attention == "local":
            from ..ops.attention import block_sparse_attention, build_block_mask

            # pad seq to a block multiple: the pattern is causal, so real
            # queries (index < s) can never see the padded keys (>= s)
            sp = -(-s // cfg.block) * cfg.block
            mask = build_block_mask(
                sp, sp, cfg.block, window=cfg.attn_window, causal=True,
                global_blocks=cfg.attn_global_blocks)
            qh, kh, vh = (
                jnp.pad(t.swapaxes(1, 2), ((0, 0), (0, 0), (0, sp - s),
                                           (0, 0)))
                for t in (q, k, v))  # [b, h, sp, d]
            out = block_sparse_attention(qh, kh, vh, mask)
            out = out[:, :, :s].swapaxes(1, 2).reshape(b, s, d)
        else:
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(d // h)
            mask = jnp.tril(jnp.ones((s, s), dtype=bool))
            logits = jnp.where(mask, logits, -1e30)
            att = jax.nn.softmax(logits, axis=-1)
            out = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, s, d)
        return dense_apply(lp["proj"], out)

    def param_count(self, params) -> int:
        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))

    # -- decode (KV cache) --------------------------------------------------
    def init_cache(self, batch: int) -> dict:
        """Per-layer K/V rings sized to max_seq (static shapes under jit)."""
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        dh = cfg.d_model // cfg.n_heads
        return {
            "pos": jnp.zeros((), jnp.int32),
            "layers": [
                {"k": jnp.zeros((batch, cfg.n_heads, cfg.max_seq, dh), dtype),
                 "v": jnp.zeros((batch, cfg.n_heads, cfg.max_seq, dh), dtype)}
                for _ in range(cfg.n_layers)
            ],
        }

    def decode_step(self, params, token: jax.Array, cache: dict):
        """One serving step: token [batch] int32 at position cache['pos']
        -> (logits [batch, vocab], new cache).

        Attention replicates apply()'s semantics exactly at single-query
        granularity: full causal for attention='dense'; for 'local', key
        positions whose 128-tile is within attn_window-1 tiles of the
        query's tile OR inside the first attn_global_blocks tiles (and
        <= pos) — the same tile-granular pattern build_block_mask emits."""
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        h, dh = cfg.n_heads, cfg.d_model // cfg.n_heads
        pos = cache["pos"]
        x = params["embed"][token].astype(dtype)  # [b, d]
        x = x + jax.lax.dynamic_index_in_dim(
            params["pos"], pos, keepdims=False).astype(dtype)
        new_layers = []
        kpos = jnp.arange(cfg.max_seq)
        visible = kpos <= pos  # causal
        # local attention: the visible set is a STATIC count of key tiles
        # (window + global), so gather just those from the ring instead of
        # scanning all max_seq slots — O(window*block) attention per token
        # instead of O(max_seq).  Falls back to the masked full-ring path
        # when the ring isn't tile-aligned.
        local_gather = (cfg.attention == "local"
                        and cfg.max_seq % cfg.block == 0)
        if local_gather:
            w_, g_ = cfg.attn_window, cfg.attn_global_blocks
            nbt = cfg.max_seq // cfg.block
            qt = pos // cfg.block
            loc = qt - (w_ - 1) + jnp.arange(w_)
            tiles = jnp.concatenate([jnp.arange(g_), loc])
            # global tiles are always gathered (causality via kpos<=pos);
            # local slots drop out-of-range tiles AND tiles < g_ (those
            # keys already arrive through the global slots — double-
            # counting them would corrupt the softmax)
            tvalid = jnp.concatenate(
                [jnp.ones((g_,), bool), loc >= g_])
            tiles_c = jnp.clip(tiles, 0, nbt - 1)
            kpos_t = tiles_c[:, None] * cfg.block \
                + jnp.arange(cfg.block)[None, :]          # [g+w, block]
            vis_t = tvalid[:, None] & (kpos_t <= pos)
        elif cfg.attention == "local":
            qt = pos // cfg.block
            kt = kpos // cfg.block
            visible &= (kt >= qt - (cfg.attn_window - 1)) \
                | (kt < cfg.attn_global_blocks)
        for i, lp in enumerate(params["layers"]):
            xa = layernorm_apply(lp["ln1"], x)  # rank-agnostic (last dim)
            # head-major [h, 3, dh] layout — see _attn
            qkv = dense_apply(lp["qkv"], xa).reshape(-1, h, 3, dh)
            q, k_new, v_new = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            ck = jax.lax.dynamic_update_slice_in_dim(
                cache["layers"][i]["k"], k_new.astype(dtype)[:, :, None, :],
                pos, axis=2)
            cv = jax.lax.dynamic_update_slice_in_dim(
                cache["layers"][i]["v"], v_new.astype(dtype)[:, :, None, :],
                pos, axis=2)
            new_layers.append({"k": ck, "v": cv})
            if local_gather:
                bsz = ck.shape[0]
                nt = tiles_c.shape[0]
                ck_t = ck.reshape(bsz, h, nbt, cfg.block, dh)[:, :, tiles_c]
                cv_t = cv.reshape(bsz, h, nbt, cfg.block, dh)[:, :, tiles_c]
                s = jnp.einsum(
                    "bhd,bhtkd->bhtk", q.astype(jnp.float32),
                    ck_t.astype(jnp.float32)) / np.sqrt(dh)
                s = jnp.where(vis_t[None, None], s, -jnp.inf)
                p = jax.nn.softmax(s.reshape(bsz, h, -1), axis=-1)
                o = jnp.einsum(
                    "bhk,bhkd->bhd", p,
                    cv_t.astype(jnp.float32).reshape(
                        bsz, h, nt * cfg.block, dh))
            else:
                s = jnp.einsum("bhd,bhkd->bhk", q.astype(jnp.float32),
                               ck.astype(jnp.float32)) / np.sqrt(dh)
                s = jnp.where(visible[None, None, :], s, -jnp.inf)
                p = jax.nn.softmax(s, axis=-1)
                o = jnp.einsum("bhk,bhkd->bhd", p, cv.astype(jnp.float32))
            att = dense_apply(lp["proj"], o.reshape(-1, cfg.d_model)
                              .astype(dtype))
            x = x + att
            hdn = layernorm_apply(lp["ln2"], x)
            hdn, _ = self._ffn(i, lp, hdn, dropless=True)
            x = x + hdn
        xf = layernorm_apply(params["final_ln"], x)
        logits = (xf @ params["embed"].T.astype(dtype)).astype(jnp.float32)
        # the cache holds max_seq slots: past it the K/V write would clamp
        # onto the last slot and return silently-wrong logits.  A python
        # assert can't see a traced pos, so poison the logits instead —
        # NaN propagates to any sampler/loss and fails LOUDLY.
        logits = jnp.where(pos < cfg.max_seq, logits, jnp.nan)
        return logits, {"pos": pos + 1, "layers": new_layers}

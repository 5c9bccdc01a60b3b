"""Batched autoregressive generation over the KV-cache decode step.

One jitted ``lax.scan`` drives prefill + generation: at step t the model
consumes the token at position t (prompt tokens verbatim; past the prompt,
the previously sampled token) and the sampled next token is written into
position t+1 unless the prompt still covers it.  Greedy when
``temperature == 0``; otherwise temperature softmax with optional top-k
truncation, deterministic per ``key`` (folded per step).

Works with every model configuration (dense/local attention, dense or MoE
FFN — decode routes droplessly) and with the tp-sharded serving path:
pass ``step_fn=make_sharded_decode(model, mesh)[1]`` to generate on a
mesh.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .transformer import BlockSparseTransformer


def sample_logits(logits, key, temperature: float = 0.0, top_k: int = 0):
    """logits [B, V] -> tokens [B].  temperature==0: argmax (key unused)."""
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = logits / temperature
    if top_k:
        kth = jax.lax.top_k(scaled, top_k)[0][:, -1:]
        scaled = jnp.where(scaled < kth, -jnp.inf, scaled)
    return jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)


def generate(model: BlockSparseTransformer, params, prompt, n_new: int, *,
             key=None, temperature: float = 0.0, top_k: int = 0,
             step_fn=None):
    """prompt [B, P] int32 -> [B, P + n_new] (prompt verbatim + sampled).

    ``step_fn(params, tok, cache) -> (logits, cache)`` defaults to the
    model's own ``decode_step``; pass a sharded step for mesh serving.
    """
    B, P = prompt.shape
    cfg = model.cfg
    if P + n_new > cfg.max_seq:
        raise ValueError(f"prompt {P} + n_new {n_new} exceeds "
                         f"max_seq {cfg.max_seq}")
    if temperature == 0.0:
        key = jax.random.PRNGKey(0)  # unused but scan wants a value
    elif key is None:
        raise ValueError("temperature sampling needs a PRNG key")
    default_step = step_fn is None
    step_fn = step_fn or model.decode_step
    total = P + n_new

    # the jitted scan is cached per (model config, shapes, sampler): a
    # fresh closure every call would silently retrace per generation
    if default_step:
        cache_key = (cfg, B, P, n_new, temperature, top_k)
        cached = _RUN_CACHE.get(cache_key)
        if cached is not None and cached[0] is model:
            return cached[1](params, jnp.asarray(prompt, jnp.int32), key)

    @jax.jit
    def run(params, prompt, key):
        buf = jnp.zeros((B, total), jnp.int32)
        buf = buf.at[:, :P].set(prompt)
        cache = model.init_cache(batch=B)

        def tick(carry, t):
            buf, cache = carry
            logits, cache = step_fn(params, buf[:, t], cache)
            nxt = sample_logits(logits, jax.random.fold_in(key, t),
                                temperature, top_k)
            keep_prompt = (t + 1) < P
            cur = jax.lax.dynamic_slice_in_dim(buf, t + 1, 1, axis=1)[:, 0]
            val = jnp.where(keep_prompt, cur, nxt)
            buf = jax.lax.dynamic_update_slice_in_dim(
                buf, val[:, None], t + 1, axis=1)
            return (buf, cache), None

        (buf, _), _ = jax.lax.scan(tick, (buf, cache),
                                   jnp.arange(total - 1))
        return buf

    if default_step:
        if len(_RUN_CACHE) > 32:
            _RUN_CACHE.clear()
        _RUN_CACHE[cache_key] = (model, run)
    return run(params, jnp.asarray(prompt, jnp.int32), key)


_RUN_CACHE: dict = {}

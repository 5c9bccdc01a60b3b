"""Batched generation over the KV-cache decode step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparta_tpu.models import (
    BlockSparseTransformer,
    TransformerConfig,
    generate,
    make_sharded_decode,
)
from sparta_tpu.parallel import make_mesh_2d


@pytest.fixture(scope="module")
def model_setup():
    cfg = TransformerConfig(
        vocab=61, d_model=32, n_heads=4, n_layers=2, d_ff=64, block=8,
        max_seq=32, attention="local", attn_window=2, attn_global_blocks=1)
    model = BlockSparseTransformer.create(cfg, jax.random.PRNGKey(7))
    params = model.init(jax.random.PRNGKey(0))
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 61)
    return model, params, prompt


def test_generate_greedy_matches_manual_decode(model_setup):
    model, params, prompt = model_setup
    out = generate(model, params, prompt, 8)
    assert out.shape == (2, 16)
    np.testing.assert_array_equal(np.asarray(out[:, :8]),
                                  np.asarray(prompt))
    cache = model.init_cache(batch=2)
    step = jax.jit(model.decode_step)
    buf = np.zeros((2, 16), np.int64)
    buf[:, :8] = np.asarray(prompt)
    for t in range(15):
        logits, cache = step(params, jnp.asarray(buf[:, t]), cache)
        if t + 1 >= 8:
            buf[:, t + 1] = np.asarray(jnp.argmax(logits, -1))
    np.testing.assert_array_equal(np.asarray(out), buf)


def test_generate_sampling_deterministic_and_in_range(model_setup):
    model, params, prompt = model_setup
    o1 = generate(model, params, prompt, 8, key=jax.random.PRNGKey(5),
                  temperature=0.8, top_k=10)
    o2 = generate(model, params, prompt, 8, key=jax.random.PRNGKey(5),
                  temperature=0.8, top_k=10)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    a = np.asarray(o1)
    assert (a >= 0).all() and (a < model.cfg.vocab).all()
    # a different key gives a different continuation (vanishingly unlikely
    # to collide over 8 sampled positions x 2 rows)
    o3 = generate(model, params, prompt, 8, key=jax.random.PRNGKey(6),
                  temperature=0.8, top_k=10)
    assert not np.array_equal(np.asarray(o1), np.asarray(o3))


def test_generate_rejects_overlong(model_setup):
    model, params, prompt = model_setup
    with pytest.raises(ValueError, match="max_seq"):
        generate(model, params, prompt, 100)
    with pytest.raises(ValueError, match="key"):
        generate(model, params, prompt, 4, temperature=0.5)


def test_generate_with_sharded_decode_step(model_setup):
    """generate(step_fn=<tp-sharded decode>) on a (dp, tp) mesh produces
    the same greedy continuation as the unsharded path."""
    model, params, prompt = model_setup
    ref = np.asarray(generate(model, params, prompt, 8))
    mesh = make_mesh_2d((2, 4), axes=("dp", "tp"))
    _, step = make_sharded_decode(model, mesh)
    with jax.sharding.set_mesh(mesh):
        out = generate(model, params, prompt, 8, step_fn=step)
    np.testing.assert_array_equal(np.asarray(out), ref)

"""Block-sparse MoE layer + expert parallelism on the virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from sparta_tpu.models import (
    BlockSparseMoE,
    BlockSparseTransformer,
    TransformerConfig,
    lm_loss,
    make_sharded_train_step,
)
from sparta_tpu.models.moe import _expert_ffn
from sparta_tpu.parallel import make_mesh, make_mesh_2d


@pytest.fixture(scope="module")
def moe_setup():
    moe = BlockSparseMoE.create(
        jax.random.PRNGKey(0), n_experts=4, d_model=32, d_ff=64, block=16,
        block_density=0.6, capacity_factor=4.0)
    params = moe.init(jax.random.PRNGKey(1))
    x = jnp.asarray(np.random.default_rng(0).standard_normal((32, 32)),
                    jnp.float32)
    return moe, params, x


def test_moe_apply_matches_per_token_oracle(moe_setup):
    """Dropless top-1 routing: every token's output equals
    gate_prob * its argmax expert's FFN — checked token by token."""
    moe, params, x = moe_setup
    y = np.asarray(moe.apply(params, x, capacity=x.shape[0]))

    from sparta_tpu.models.layers import dense_apply

    p = jax.nn.softmax(dense_apply(params["gate"], x), axis=-1)
    e = np.asarray(jnp.argmax(p, axis=-1))
    gv = np.asarray(jnp.max(p, axis=-1))
    for n in range(x.shape[0]):
        ye = _expert_ffn(
            moe.up_cols[e[n]], moe.up_nb[e[n]], params["up_vals"][e[n]],
            moe.dn_cols[e[n]], moe.dn_nb[e[n]], params["down_vals"][e[n]],
            x[n:n + 1], moe.d_model, moe.d_ff, moe.block)
        np.testing.assert_allclose(y[n], gv[n] * np.asarray(ye)[0],
                                   rtol=1e-4, atol=1e-5)


def test_moe_capacity_drops_tokens(moe_setup):
    """Over-capacity tokens contribute exactly zero (the residual stream
    carries them, as in Switch); under-capacity tokens are untouched."""
    moe, params, x = moe_setup
    y_full = np.asarray(moe.apply(params, x, capacity=x.shape[0]))
    y_c1 = np.asarray(moe.apply(params, x, capacity=1))
    # with capacity 1 only the FIRST token routed to each expert survives
    from sparta_tpu.models.layers import dense_apply

    e = np.asarray(jnp.argmax(dense_apply(params["gate"], x), axis=-1))
    seen = set()
    for n in range(x.shape[0]):
        if e[n] not in seen:
            seen.add(e[n])
            np.testing.assert_allclose(y_c1[n], y_full[n], rtol=1e-5,
                                       atol=1e-6)
        else:
            np.testing.assert_allclose(y_c1[n], 0.0, atol=1e-7)


def test_moe_aux_loss_uniform_routing(moe_setup):
    """Perfectly balanced routing gives the Switch aux loss its minimum
    value 1 (E * sum_e (1/E)*(1/E) * E = 1) — sanity on the formula."""
    moe, params, x = moe_setup
    # zero gate -> uniform probs; argmax routes all to expert 0, but the
    # aux's f*P term is what we check: f=(1,0,0,0), P=1/4 -> aux = 1
    p0 = dict(params, gate={"w": jnp.zeros_like(params["gate"]["w"]),
                            "b": jnp.zeros_like(params["gate"]["b"])})
    _, aux = moe.apply(p0, x, return_aux=True)
    assert float(aux) == pytest.approx(1.0, abs=1e-5)


def test_moe_apply_ep_matches_oracle_and_grads(moe_setup):
    """Expert-parallel all_to_all layout must equal the single-device
    apply (ample capacity) — outputs AND parameter gradients."""
    moe, params, x = moe_setup
    mesh = make_mesh(4)
    y = np.asarray(moe.apply(params, x))
    y_ep = np.asarray(moe.apply_ep(params, x, mesh, "x"))
    np.testing.assert_allclose(y_ep, y, rtol=1e-5, atol=1e-6)

    g1 = jax.grad(lambda p: (moe.apply(p, x) ** 2).sum())(params)
    g2 = jax.grad(lambda p: (moe.apply_ep(p, x, mesh, "x") ** 2).sum())(
        params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_moe_apply_ep_rejects_indivisible_experts(moe_setup):
    moe, params, x = moe_setup
    mesh = make_mesh(8)  # 4 experts over 8 devices
    with pytest.raises(ValueError, match="divisible"):
        moe.apply_ep(params, x, mesh, "x")


@pytest.fixture(scope="module")
def moe_model():
    cfg = TransformerConfig(
        vocab=64, d_model=32, n_heads=2, n_layers=2, d_ff=64, max_seq=64,
        block=16, ffn_block_density=0.5, attention="local", attn_window=2,
        attn_global_blocks=1, moe_experts=4, moe_capacity=4.0)
    model = BlockSparseTransformer.create(cfg, jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1))
    tokens = jax.random.randint(jax.random.PRNGKey(2), (4, 64), 0, 64)
    return model, params, tokens


def test_moe_transformer_decode_matches_forward(moe_model):
    """KV-cache decode through the MoE FFN (dropless serving capacity)
    reproduces the full forward's last-token logits."""
    model, params, tokens = moe_model
    cache = model.init_cache(batch=4)
    step = jax.jit(model.decode_step)
    for t in range(16):
        logits, cache = step(params, tokens[:, t], cache)
    full = model.apply(params, tokens[:, :16])
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full[:, 15]),
                               rtol=1e-4, atol=1e-4)


def test_moe_checkpoint_roundtrip(tmp_path, moe_model):
    """MoE params (gate + stacked expert vals) and expert block structure
    round-trip through the npz checkpoint."""
    from sparta_tpu.models.checkpoint import load_params, save_params

    model, params, tokens = moe_model
    save_params(tmp_path / "ckpt.npz", params, model=model)
    restored = load_params(tmp_path / "ckpt.npz", like=params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    z = np.load(tmp_path / "ckpt.npz.structure.npz")
    np.testing.assert_array_equal(z["moe_0_up_cols"],
                                  np.asarray(model.moe[0].up_cols))
    # device_put the restored numpy leaves (as real usage would): eager
    # numpy-leaf math takes numpy's reduction order, not XLA's
    restored = jax.tree.map(jnp.asarray, restored)
    logits_a = model.apply(params, tokens[:, :8])
    logits_b = model.apply(restored, tokens[:, :8])
    np.testing.assert_array_equal(np.asarray(logits_a),
                                  np.asarray(logits_b))


def test_moe_transformer_ep_train_matches_unsharded(moe_model):
    """(dp, ep) GSPMD training: expert vals sharded on the expert axis;
    first-step loss equals the unsharded lm_loss and training converges."""
    model, params, tokens = moe_model
    mesh = make_mesh_2d((2, 4), axes=("dp", "ep"))
    opt = optax.adamw(1e-3)
    init_s, step = make_sharded_train_step(model, opt, mesh)
    params_s, opt_s, toks_s = init_s(jax.random.PRNGKey(1), tokens)
    # the ep sharding actually landed on the expert axis
    sh = params_s["layers"][0]["moe"]["up_vals"].sharding
    assert "ep" in str(sh.spec), sh
    l_ref = float(lm_loss(model, params, tokens))
    with jax.sharding.set_mesh(mesh):
        losses = []
        for _ in range(4):
            params_s, opt_s, loss = step(params_s, opt_s, toks_s)
            losses.append(float(loss))
    assert losses[0] == pytest.approx(l_ref, abs=1e-4)
    assert losses[-1] < losses[0]
    assert all(np.isfinite(losses))

"""Block-sparse transformer tests: forward, autodiff into blocks, training
step on the dp x tp virtual mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from sparta_tpu.models import (
    BlockSparseLinear,
    BlockSparseTransformer,
    TransformerConfig,
    lm_loss,
    make_sharded_train_step,
    make_train_step,
)

CFG = TransformerConfig(
    vocab=128, d_model=128, n_heads=4, n_layers=2, d_ff=256, max_seq=64,
    block=32, ffn_block_density=0.25,
)


@pytest.fixture(scope="module")
def model():
    return BlockSparseTransformer.create(CFG, jax.random.key(0))


def test_block_sparse_linear_matches_dense():
    key = jax.random.key(1)
    lin = BlockSparseLinear.create(key, 64, 96, block=16, block_density=0.5)
    params = lin.init(jax.random.key(2))
    x = jax.random.normal(jax.random.key(3), (8, 96))
    y = lin.apply(params, x)
    assert y.shape == (8, 64)
    # dense reconstruction of the blocked weight
    W = np.zeros((64, 96), dtype=np.float32)
    cols = np.asarray(lin.cols_idx)
    vals = np.asarray(params["vals"])
    for ib in range(cols.shape[0]):
        for k in range(int(lin.nb_row[ib])):
            jb = cols[ib, k]
            W[ib * 16 : (ib + 1) * 16, jb * 16 : (jb + 1) * 16] = vals[ib, k]
    y_ref = np.asarray(x) @ W.T + np.asarray(params["bias"])
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-4, atol=1e-4)
    assert 0.4 < lin.density() < 0.6


def test_forward_shapes(model):
    params = model.init(jax.random.key(1))
    tokens = jax.random.randint(jax.random.key(2), (2, 16), 0, CFG.vocab)
    logits = model.apply(params, tokens)
    assert logits.shape == (2, 16, CFG.vocab)
    assert np.isfinite(np.asarray(logits)).all()


def test_grads_flow_into_blocks(model):
    params = model.init(jax.random.key(1))
    tokens = jax.random.randint(jax.random.key(2), (2, 16), 0, CFG.vocab)
    grads = jax.grad(lambda p: lm_loss(model, p, tokens))(params)
    g = np.asarray(grads["layers"][0]["ffn_up"]["vals"])
    assert g.shape == params["layers"][0]["ffn_up"]["vals"].shape
    assert np.abs(g).max() > 0


def test_train_step_reduces_loss(model):
    params = model.init(jax.random.key(1))
    opt = optax.adamw(3e-3)
    opt_state = opt.init(params)
    step = make_train_step(model, opt)
    tokens = jax.random.randint(jax.random.key(5), (4, 32), 0, CFG.vocab)
    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state, tokens)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


@pytest.mark.parametrize("attention", ["dense", "local"])
def test_sharded_train_step(attention):
    import dataclasses

    from sparta_tpu.parallel import make_mesh_2d

    mesh = make_mesh_2d((2, 4), axes=("dp", "tp"))
    cfg = dataclasses.replace(CFG, attention=attention, attn_window=1,
                              attn_global_blocks=1)
    model = BlockSparseTransformer.create(cfg, jax.random.key(0))
    opt = optax.adamw(1e-3)
    init_sharded, step = make_sharded_train_step(model, opt, mesh)
    tokens = jax.random.randint(jax.random.key(5), (8, 32), 0, CFG.vocab)
    with jax.sharding.set_mesh(mesh):
        params, opt_state, tokens_s = init_sharded(jax.random.key(1), tokens)
        params, opt_state, loss = step(params, opt_state, tokens_s)
        assert np.isfinite(float(loss))
    # sharding (incl. Megatron-split qkv/proj) must not change the math
    ref = float(lm_loss(model, model.init(jax.random.key(1)), tokens))
    assert abs(float(loss) - ref) < 1e-3 * max(1.0, abs(ref))


def test_from_dense_block_pruning():
    rng = np.random.default_rng(4)
    W = rng.standard_normal((96, 64)).astype(np.float32) * 0.01
    # plant strong blocks
    W[0:32, 0:32] += 5.0
    W[64:96, 32:64] += 5.0
    layer, params = BlockSparseLinear.from_dense(W, block=32, block_density=0.5)
    x = rng.standard_normal((4, 64)).astype(np.float32)
    y = np.asarray(layer.apply(params, jnp.asarray(x)))
    # kept blocks must include the planted ones
    cols = np.asarray(layer.cols_idx)
    assert 0 in cols[0] and 1 in cols[2]
    # output approximates dense product (dominated by planted blocks)
    y_ref = x @ W.T
    corr = np.corrcoef(y.ravel(), y_ref.ravel())[0, 1]
    assert corr > 0.99


def test_from_dense_global_topk():
    rng = np.random.default_rng(5)
    W = rng.standard_normal((64, 64)).astype(np.float32)
    layer, params = BlockSparseLinear.from_dense(W, block=16, block_density=0.25,
                                                 per_row=False)
    total = int(np.asarray(layer.nb_row).sum())
    assert total == round(16 * 0.25)


def test_checkpoint_roundtrip(tmp_path, model):
    from sparta_tpu.models.checkpoint import load_params, save_params

    params = model.init(jax.random.key(1))
    save_params(tmp_path / "ckpt.npz", params, model=model)
    restored = load_params(tmp_path / "ckpt.npz", like=params)
    tokens = jax.random.randint(jax.random.key(2), (2, 16), 0, CFG.vocab)
    y1 = np.asarray(model.apply(params, tokens))
    y2 = np.asarray(model.apply(restored, tokens))
    np.testing.assert_allclose(y1, y2, rtol=1e-5, atol=1e-5)
    assert (tmp_path / "ckpt.npz.structure.npz").exists()
    assert (tmp_path / "ckpt.npz.meta.json").exists()


def test_gcn_forward_matches_dense():
    """GCN forward through the blocked adjacency == dense-oracle forward."""
    import scipy.sparse as sp

    from sparta_tpu.formats.csr import random_block_csr
    from sparta_tpu.models import GCN, GCNConfig, normalize_adjacency

    n, block = 96, 8
    adj = random_block_csr(n, n, block=block, block_density=0.3,
                           intra_density=0.5, seed=5)
    cfg = GCNConfig(in_dim=16, hidden_dim=32, out_dim=4, n_layers=2,
                    block=block, tau=0.5)
    model = GCN.create(adj, cfg)
    params = model.init(jax.random.key(0))
    X = np.random.default_rng(0).standard_normal((n, 16)).astype(np.float32)
    out = np.asarray(model.apply(params, jnp.asarray(X)))

    # dense oracle in original node order
    Ahat = normalize_adjacency(adj).to_scipy().toarray()
    H = X
    for i, lp in enumerate(params["layers"]):
        H = Ahat @ H @ np.asarray(lp["w"]) + np.asarray(lp["b"])
        if i < len(params["layers"]) - 1:
            H = np.maximum(H, 0)
    np.testing.assert_allclose(out, H, rtol=1e-4, atol=1e-4)


def test_gcn_train_step_reduces_loss():
    import optax

    from sparta_tpu.formats.csr import random_block_csr
    from sparta_tpu.models import GCN, GCNConfig, make_gcn_train_step

    n, block = 64, 8
    adj = random_block_csr(n, n, block=block, block_density=0.4,
                           intra_density=0.5, seed=9)
    cfg = GCNConfig(in_dim=8, hidden_dim=16, out_dim=3, n_layers=2,
                    block=block, tau=0.5)
    model = GCN.create(adj, cfg)
    params = model.init(jax.random.key(1))
    rng = np.random.default_rng(2)
    X = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 3, n))
    mask = jnp.ones(n, dtype=jnp.float32)
    opt = optax.adam(1e-2)
    step = make_gcn_train_step(model, opt)
    opt_state = opt.init(params)
    losses = []
    for _ in range(20):
        params, opt_state, loss = step(params, opt_state, X, labels, mask)
        losses.append(float(loss))
    # random labels through a smoothing operator fit slowly; require a
    # clear monotone decrease, not a large one
    assert losses[-1] < losses[0] - 0.03, losses


def test_freeze_matches_training_apply():
    from sparta_tpu.models import BlockSparseLinear

    layer = BlockSparseLinear.create(jax.random.key(3), 64, 48, block=8,
                                     block_density=0.4)
    params = layer.init(jax.random.key(4))
    x = jnp.asarray(
        np.random.default_rng(5).standard_normal((10, 48)).astype(np.float32)
    )
    y_train = np.asarray(layer.apply(params, x))
    frozen = layer.freeze(params, batch_hint=16, dtype=jnp.float32)
    y_frozen = np.asarray(frozen(x))
    np.testing.assert_allclose(y_frozen, y_train, rtol=1e-4, atol=1e-4)


def test_orbax_checkpoint_roundtrip(tmp_path, model):
    from sparta_tpu.models.checkpoint import load_params_orbax, save_params_orbax

    params = model.init(jax.random.key(7))
    save_params_orbax(tmp_path / "ckpt_orbax", params)
    restored = load_params_orbax(tmp_path / "ckpt_orbax", params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_freeze_fused_epilogue_matches():
    """freeze(activation='relu') fused path == reference elementwise path."""
    from sparta_tpu.models import BlockSparseLinear

    layer = BlockSparseLinear.create(jax.random.key(8), 256, 256, block=128,
                                     block_density=0.5)
    params = layer.init(jax.random.key(9))
    x = jnp.asarray(
        np.random.default_rng(10).standard_normal((8, 256)).astype(np.float32)
    )
    frozen = layer.freeze(params, batch_hint=128, dtype=jnp.float32,
                          activation="relu")
    y = np.asarray(frozen(x))
    y_ref = np.maximum(np.asarray(layer.apply(params, x)), 0)
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4)


def test_sharded_gcn_matches_single_device():
    from sparta_tpu.formats.csr import random_block_csr
    from sparta_tpu.models import GCN, GCNConfig, make_sharded_gcn_apply
    from sparta_tpu.parallel import make_mesh

    n, block = 256, 8   # 32 block-rows / 8 devices
    adj = random_block_csr(n, n, block=block, block_density=0.2,
                           intra_density=0.5, seed=23)
    cfg = GCNConfig(in_dim=16, hidden_dim=24, out_dim=4, n_layers=2,
                    block=block, tau=0.5)
    model = GCN.create(adj, cfg)
    params = model.init(jax.random.key(2))
    X = jnp.asarray(
        np.random.default_rng(6).standard_normal((n, 16)).astype(np.float32)
    )
    y_single = np.asarray(model.apply(params, X))
    mesh = make_mesh(8)
    sharded = make_sharded_gcn_apply(model, mesh)
    y_sharded = np.asarray(sharded(params, X))
    np.testing.assert_allclose(y_sharded, y_single, rtol=1e-4, atol=1e-4)


# ------------------------------------------------------- minibatch GCN ----
def _toy_graph_model(block=8, n=64, seed=5):
    import scipy.sparse as sp

    from sparta_tpu.formats.csr import CSR, random_block_csr
    from sparta_tpu.models import GCN, GCNConfig

    m = random_block_csr(n, n, block=block, block_density=0.4,
                         intra_density=0.5, seed=seed, shuffle_rows=False)
    a = m.to_scipy()
    adj = CSR.from_scipy(((a + a.T) != 0).astype(np.float32).tocsr())
    cfg = GCNConfig(in_dim=12, hidden_dim=16, out_dim=4, n_layers=2,
                    block=block, tau=0.4)
    return GCN.create(adj, cfg)


def test_minibatch_full_fanout_matches_full_forward():
    """fanout >= max block degree + all blocks seeded => exactly the full
    GCN forward (in permuted block order)."""
    from sparta_tpu.models import BlockSampler, apply_minibatch, features_to_blocks

    model = _toy_graph_model()
    nbr, _, b, _ = model.adj_vals.shape
    params = model.init(jax.random.key(0))
    X = np.random.default_rng(1).standard_normal(
        (model.n_nodes, 12)).astype(np.float32)

    sampler = BlockSampler(model, fanout=int(np.asarray(model.nb_row).max()))
    batch = sampler.sample(np.arange(nbr), n_layers=2)
    Xb = features_to_blocks(model, jnp.asarray(X))
    out_mb = np.asarray(apply_minibatch(model, params, Xb, batch))

    full = np.asarray(model.apply(params, jnp.asarray(X)))  # original order
    # minibatch output is in permuted order of the (padded) seed set
    seeds = batch.seed_blocks
    perm_rows = (seeds[:, None] * b + np.arange(b)).reshape(-1)
    # map: permuted row r holds original node model.perm[r]
    out_full_perm = np.zeros((nbr * b, full.shape[1]), dtype=np.float32)
    out_full_perm[: model.n_nodes] = full[model.perm]
    np.testing.assert_allclose(
        out_mb[: perm_rows.size], out_full_perm[perm_rows],
        rtol=1e-4, atol=1e-4)


def test_minibatch_static_shapes_across_resamples():
    from sparta_tpu.models import BlockSampler

    model = _toy_graph_model()
    sampler = BlockSampler(model, fanout=2, seed=0)
    b1 = sampler.sample([0, 3], n_layers=2)
    b2 = sampler.sample([1, 2], n_layers=2)
    for l1, l2 in zip(b1.layers, b2.layers):
        assert l1.cols_idx.shape == l2.cols_idx.shape
        assert l1.vals.shape == l2.vals.shape
    assert b1.in_blocks.shape == b2.in_blocks.shape


def test_minibatch_train_step_decreases_loss():
    import optax

    from sparta_tpu.models import (
        BlockSampler,
        features_to_blocks,
        make_minibatch_train_step,
        seed_labels,
    )

    model = _toy_graph_model()
    nbr = model.adj_vals.shape[0]
    params = model.init(jax.random.key(0))
    rng = np.random.default_rng(2)
    X = rng.standard_normal((model.n_nodes, 12)).astype(np.float32)
    labels = rng.integers(0, 4, model.n_nodes)
    mask = np.ones(model.n_nodes, dtype=np.float32)

    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    step = make_minibatch_train_step(model, opt)
    sampler = BlockSampler(model, fanout=3, seed=1)
    Xb = features_to_blocks(model, jnp.asarray(X))

    losses = []
    for it in range(8):
        seeds = rng.choice(nbr, size=min(4, nbr), replace=False)
        batch = sampler.sample(seeds, n_layers=2)
        lab, msk = seed_labels(model, labels, mask, batch)
        params, opt_state, loss = step(params, opt_state, Xb, batch, lab, msk)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_minibatch_no_retrace_across_resamples():
    """One jit trace must serve every resampled batch (the treedef must not
    encode the seed set) — found as a per-batch recompile in review."""
    import optax

    from sparta_tpu.models import (
        BlockSampler,
        features_to_blocks,
        make_minibatch_train_step,
        seed_labels,
    )

    model = _toy_graph_model()
    nbr = model.adj_vals.shape[0]
    params = model.init(jax.random.key(0))
    rng = np.random.default_rng(3)
    X = rng.standard_normal((model.n_nodes, 12)).astype(np.float32)
    labels = rng.integers(0, 4, model.n_nodes)
    mask = np.ones(model.n_nodes, dtype=np.float32)
    opt = optax.adam(1e-2)
    st = opt.init(params)
    step = make_minibatch_train_step(model, opt)
    sampler = BlockSampler(model, fanout=3, seed=1)
    Xb = features_to_blocks(model, jnp.asarray(X))
    for _ in range(4):
        seeds = rng.choice(nbr, size=min(4, nbr), replace=False)
        batch = sampler.sample(seeds, n_layers=2)
        lab, msk = seed_labels(model, labels, mask, batch)
        params, st, _ = step(params, st, Xb, batch, lab, msk)
    assert step._cache_size() == 1, step._cache_size()


# ------------------------------------------------ train-to-quality ----
def test_gcn_trains_to_quality_and_sharded_checkpoint(tmp_path):
    """The custom-VJP pipeline must OPTIMIZE, not merely differentiate:
    train a 2-layer GCN 250 steps on a planted-community (stochastic block
    model) node-classification task and require >90% held-out accuracy,
    then round-trip the trained params through a sharded Orbax checkpoint
    and serve them through the mesh-sharded forward."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sparta_tpu.formats.csr import CSR
    from sparta_tpu.models import (
        GCN, GCNConfig, make_gcn_train_step, make_sharded_gcn_apply,
    )
    from sparta_tpu.models.checkpoint import (
        load_params_orbax, save_params_orbax,
    )
    from sparta_tpu.parallel import make_mesh

    rng = np.random.default_rng(0)
    k, per = 4, 64
    n = k * per
    comm = np.repeat(np.arange(k), per)
    p_in, p_out = 0.20, 0.01
    U = rng.random((n, n))
    P_edge = np.where(comm[:, None] == comm[None, :], p_in, p_out)
    A = np.triu(U < P_edge, 1)
    A = A | A.T
    r, c = np.nonzero(A)
    adj = CSR.from_coo(r, c, np.ones(r.size, np.float32), (n, n))

    F = 16
    proto = rng.standard_normal((k, F))
    X = jnp.asarray((proto[comm] * 0.3
                     + rng.standard_normal((n, F))).astype(np.float32))
    labels = jnp.asarray(comm)
    train_mask = np.zeros(n, np.float32)
    train_mask[rng.permutation(n)[: n // 2]] = 1

    cfg = GCNConfig(in_dim=F, hidden_dim=32, out_dim=k, n_layers=2,
                    block=16, tau=0.4)
    model = GCN.create(adj, cfg)
    params = model.init(jax.random.key(1))
    opt = optax.adam(1e-2)
    step = make_gcn_train_step(model, opt)
    opt_state = opt.init(params)
    mj = jnp.asarray(train_mask)
    first = None
    for _ in range(250):
        params, opt_state, loss = step(params, opt_state, X, labels, mj)
        first = float(loss) if first is None else first
    assert float(loss) < first / 10, (first, float(loss))

    logits = np.asarray(model.apply(params, X))
    test = train_mask == 0
    acc = (logits.argmax(1)[test] == comm[test]).mean()
    assert acc > 0.9, f"held-out accuracy {acc:.3f}"

    # sharded checkpoint round-trip: place params on an 8-device mesh
    # (replicated — GCN dense weights are small), save, restore INTO the
    # sharded structure, and serve through the mesh-sharded forward
    mesh = make_mesh(8)
    repl = NamedSharding(mesh, P())
    sharded_params = jax.device_put(params, repl)
    save_params_orbax(tmp_path / "gcn_ckpt", sharded_params)
    restored = load_params_orbax(tmp_path / "gcn_ckpt", sharded_params)
    for a, b in zip(jax.tree.leaves(sharded_params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert b.sharding.is_equivalent_to(repl, np.asarray(b).ndim)

    sharded_apply = make_sharded_gcn_apply(model, mesh)
    y_sharded = np.asarray(sharded_apply(restored, X))
    np.testing.assert_allclose(y_sharded, logits, rtol=2e-3, atol=2e-3)


def test_local_attention_transformer():
    """attention='local': block-sparse attention wired into the model.
    With the window covering every past tile the pattern IS full causal,
    so logits must match the dense-attention path; a narrow window still
    trains (loss decreases)."""
    import dataclasses

    cfg_dense = CFG
    cfg_full = dataclasses.replace(
        CFG, attention="local", attn_window=CFG.max_seq // CFG.block,
        attn_global_blocks=0)
    m_dense = BlockSparseTransformer.create(cfg_dense, jax.random.key(0))
    m_full = BlockSparseTransformer.create(cfg_full, jax.random.key(0))
    params = m_dense.init(jax.random.key(1))
    tokens = jax.random.randint(jax.random.key(2), (2, CFG.max_seq), 0,
                                CFG.vocab)
    l_dense = np.asarray(m_dense.apply(params, tokens))
    l_full = np.asarray(m_full.apply(params, tokens))
    np.testing.assert_allclose(l_full, l_dense, rtol=2e-3, atol=2e-3)

    import optax

    cfg_narrow = dataclasses.replace(CFG, attention="local", attn_window=1,
                                     attn_global_blocks=1)
    m = BlockSparseTransformer.create(cfg_narrow, jax.random.key(0))
    params = m.init(jax.random.key(1))
    opt = optax.adamw(3e-3)
    opt_state = opt.init(params)
    step = make_train_step(m, opt)
    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state, tokens)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


@pytest.mark.parametrize("attention", ["dense", "local"])
def test_decode_step_matches_full_forward(attention):
    """Token-by-token KV-cache decode must reproduce apply()'s last-token
    logits exactly (same tile-granular local-attention semantics)."""
    import dataclasses

    cfg = dataclasses.replace(CFG, attention=attention, attn_window=1,
                              attn_global_blocks=1)
    model = BlockSparseTransformer.create(cfg, jax.random.key(0))
    params = model.init(jax.random.key(1))
    S = CFG.max_seq
    tokens = jax.random.randint(jax.random.key(2), (2, S), 0, CFG.vocab)
    full = np.asarray(model.apply(params, tokens))  # [2, S, vocab]

    cache = model.init_cache(batch=2)
    step = jax.jit(model.decode_step)
    for t in range(S):
        logits, cache = step(params, tokens[:, t], cache)
        np.testing.assert_allclose(np.asarray(logits), full[:, t],
                                   rtol=2e-3, atol=2e-3)
    assert int(cache["pos"]) == S


def test_transformer_trains_to_quality_and_decodes():
    """The blocked-FFN custom-gather pipeline must OPTIMIZE end to end:
    train the tiny block-sparse transformer 400 steps to memorize a fixed
    batch (>90% next-token accuracy — the transformer analogue of the GCN
    train-to-quality test), then greedily regenerate the memorized
    continuation through the KV-cache decode path (train -> serve)."""
    import dataclasses

    cfg = dataclasses.replace(
        CFG, vocab=64, d_model=64, d_ff=128, max_seq=32,
        ffn_block_density=0.5)
    model = BlockSparseTransformer.create(cfg, jax.random.key(0))
    params = model.init(jax.random.key(1))
    opt = optax.adamw(3e-3)
    opt_state = opt.init(params)
    step = make_train_step(model, opt)
    tokens = jax.random.randint(jax.random.key(5), (8, 32), 0, cfg.vocab)
    first = None
    for _ in range(400):
        params, opt_state, loss = step(params, opt_state, tokens)
        first = float(loss) if first is None else first
    assert float(loss) < first / 100, (first, float(loss))

    logits = model.apply(params, tokens[:, :-1])
    acc = (np.asarray(logits).argmax(-1) == np.asarray(tokens[:, 1:])).mean()
    assert acc > 0.9, f"train accuracy {acc:.3f}"

    # greedy decode from an 8-token prefix must reproduce the memorized
    # continuation (the batch rows are distinct, so the prefix directs it)
    prefix = 8
    cache = model.init_cache(batch=8)
    dstep = jax.jit(model.decode_step)
    tok = None
    for t in range(tokens.shape[1] - 1):
        feed = tokens[:, t] if t < prefix else tok
        lg, cache = dstep(params, feed, cache)
        tok = jnp.argmax(lg, axis=-1).astype(jnp.int32)
        if t >= prefix - 1:
            match = (np.asarray(tok) == np.asarray(tokens[:, t + 1])).mean()
            assert match > 0.85, (t, match)


def test_decode_past_max_seq_poisons_logits():
    """The KV cache holds max_seq slots; decoding past it cannot grow the
    cache, and the K/V write would clamp onto the last slot — instead of
    returning silently-wrong logits, decode_step poisons them with NaN."""
    import dataclasses

    cfg = dataclasses.replace(CFG, max_seq=8)
    model = BlockSparseTransformer.create(cfg, jax.random.key(0))
    params = model.init(jax.random.key(1))
    cache = model.init_cache(batch=2)
    step = jax.jit(model.decode_step)
    tok = jnp.zeros((2,), jnp.int32)
    for _ in range(cfg.max_seq):
        lg, cache = step(params, tok, cache)
        assert np.isfinite(np.asarray(lg)).all()
    lg, cache = step(params, tok, cache)  # pos == max_seq: overrun
    assert np.isnan(np.asarray(lg)).all()


@pytest.mark.parametrize("attention", ["dense", "local"])
def test_sharded_decode_matches_unsharded(attention):
    """tp-sharded serving: decode_step jitted over the (dp, tp) mesh with
    params Megatron-split and the K/V rings sharded (dp on batch, tp on
    heads) must reproduce the unsharded decode logits exactly, and the
    returned cache must KEEP the ring sharding (no silent gather)."""
    import dataclasses

    from sparta_tpu.models import make_sharded_decode
    from sparta_tpu.parallel import make_mesh_2d

    mesh = make_mesh_2d((2, 4), axes=("dp", "tp"))
    cfg = dataclasses.replace(CFG, attention=attention, attn_window=1,
                              attn_global_blocks=1)
    model = BlockSparseTransformer.create(cfg, jax.random.key(0))
    params = model.init(jax.random.key(1))
    S, batch = 16, 4
    tokens = jax.random.randint(jax.random.key(2), (batch, S), 0, cfg.vocab)

    # unsharded reference decode
    ref_cache = model.init_cache(batch=batch)
    ref_step = jax.jit(model.decode_step)
    ref_logits = []
    for t in range(S):
        lg, ref_cache = ref_step(params, tokens[:, t], ref_cache)
        ref_logits.append(np.asarray(lg))

    place, step = make_sharded_decode(model, mesh)
    params_s, cache, tok0 = place(params, model.init_cache(batch=batch),
                                  tokens[:, 0])
    with jax.sharding.set_mesh(mesh):
        for t in range(S):
            lg, cache = step(params_s, tokens[:, t], cache)
            np.testing.assert_allclose(np.asarray(lg), ref_logits[t],
                                       rtol=2e-3, atol=2e-3)
    # the K/V rings must still be sharded over (dp, tp)
    k0 = cache["layers"][0]["k"]
    assert "tp" in str(k0.sharding.spec), k0.sharding

"""Block-sparse attention vs the dense-masked oracle.

New TPU-native capability beyond the reference (its transformer story is
pruned FFN weights only); built on the same 128-block structure as the
SpMM family."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparta_tpu.ops.attention import (
    BlockMask,
    block_sparse_attention,
    build_block_mask,
    dense_mask_from_block_mask,
)


def _dense_attention(q, k, v, mask_bool, scale):
    s = (q @ k.swapaxes(-1, -2)) * scale
    s = np.where(mask_bool, s, -np.inf)
    s = s - s.max(axis=-1, keepdims=True)
    p = np.exp(s)
    denom = p.sum(axis=-1, keepdims=True)
    p = np.divide(p, denom, out=np.zeros_like(p), where=denom > 0)
    return p @ v


def _qkv(rng, shape):
    return tuple(rng.standard_normal(shape).astype(np.float32)
                 for _ in range(3))


@pytest.mark.parametrize("causal", [False, True])
def test_bsa_local_window_matches_dense(causal):
    T, D, block = 512, 64, 128
    mask = build_block_mask(T, T, block, window=2, causal=causal)
    assert 0 < mask.density < 1
    rng = np.random.default_rng(0)
    q, k, v = _qkv(rng, (T, D))
    out = np.asarray(block_sparse_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mask))
    ref = _dense_attention(q, k, v, dense_mask_from_block_mask(mask),
                           1.0 / np.sqrt(D))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_bsa_dense_pattern_equals_full_attention():
    """window=None covers every block: must equal unmasked attention."""
    T, D = 256, 32
    mask = build_block_mask(T, T, 128)
    rng = np.random.default_rng(1)
    q, k, v = _qkv(rng, (T, D))
    out = np.asarray(block_sparse_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mask))
    ref = _dense_attention(q, k, v, np.ones((T, T), bool), 1.0 / np.sqrt(D))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_bsa_global_blocks_and_batch_heads():
    """[B, H, T, D] operands vmap over leading dims; global key blocks are
    visible to every query row."""
    B, H, T, D, block = 2, 3, 384, 32, 128
    mask = build_block_mask(T, T, block, window=1, causal=True,
                            global_blocks=1)
    # global column present for every block-row
    assert all(any(b == i and c == 0 for b, c in zip(mask.br, mask.bc))
               for i in range(mask.nbr))
    rng = np.random.default_rng(2)
    q, k, v = _qkv(rng, (B, H, T, D))
    out = np.asarray(block_sparse_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mask))
    ref = _dense_attention(q, k, v, dense_mask_from_block_mask(mask),
                           1.0 / np.sqrt(D))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_bsa_rectangular_cross_attention():
    """T_q != T_k (cross attention over a block pattern)."""
    Tq, Tk, D = 256, 512, 64
    mask = build_block_mask(Tq, Tk, 128, window=None)
    rng = np.random.default_rng(3)
    q = rng.standard_normal((Tq, D)).astype(np.float32)
    k = rng.standard_normal((Tk, D)).astype(np.float32)
    v = rng.standard_normal((Tk, D)).astype(np.float32)
    out = np.asarray(block_sparse_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mask))
    ref = _dense_attention(q, k, v, np.ones((Tq, Tk), bool),
                           1.0 / np.sqrt(D))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_bsa_differentiable():
    """Gradients flow through the segment softmax to q, k, v."""
    T, D = 256, 32
    mask = build_block_mask(T, T, 128, window=1, causal=True)
    rng = np.random.default_rng(4)
    q, k, v = (jnp.asarray(x) for x in _qkv(rng, (T, D)))

    def loss(q, k, v):
        return jnp.sum(block_sparse_attention(q, k, v, mask) ** 2)

    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g in (gq, gk, gv):
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0
    # numeric check on a single coordinate
    eps = 1e-3
    e = jnp.zeros_like(q).at[3, 5].set(eps)
    num = (loss(q + e, k, v) - loss(q - e, k, v)) / (2 * eps)
    assert abs(float(num) - float(gq[3, 5])) < 5e-2 * max(
        1.0, abs(float(num)))


def test_bsa_compute_scales_with_blocks():
    """The SDD really is sampled: block count grows linearly with window,
    not quadratically with T."""
    T = 1024
    m1 = build_block_mask(T, T, 128, window=1, causal=True)
    m2 = build_block_mask(T, T, 128, window=2, causal=True)
    assert m1.n_blocks == T // 128
    assert m2.n_blocks == 2 * (T // 128) - 1
    full = build_block_mask(T, T, 128)
    assert full.n_blocks == (T // 128) ** 2


def test_bsa_shape_validation():
    mask = build_block_mask(256, 256, 128)
    q = jnp.zeros((384, 32))
    with pytest.raises(ValueError):
        block_sparse_attention(q, q, q, mask)
    with pytest.raises(ValueError):
        build_block_mask(200, 256, 128)


# ---------------------------------------------------------------------------
# fused Pallas kernel (attention_pallas.py) — interpret mode on CPU
# ---------------------------------------------------------------------------

from sparta_tpu.ops.attention_pallas import (  # noqa: E402
    block_sparse_attention_pallas,
)


@pytest.mark.parametrize("causal", [False, True])
def test_bsa_pallas_matches_xla(causal):
    """The fused kernel's online softmax must match the XLA path (which is
    itself oracle-checked above) at fp32."""
    T, D, block = 512, 64, 128
    mask = build_block_mask(T, T, block, window=2, causal=causal,
                            global_blocks=1)
    rng = np.random.default_rng(10)
    q, k, v = (jnp.asarray(x) for x in _qkv(rng, (2, T, D)))
    got = np.asarray(block_sparse_attention_pallas(q, k, v, mask))
    ref = np.asarray(block_sparse_attention(q, k, v, mask, impl="xla"))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_bsa_pallas_vs_dense_oracle_batched():
    """[B, H, T, D] operands straight against the dense-masked numpy
    oracle (D=32 exercises the lane-padding path: Dp=128 != D)."""
    B, H, T, D, block = 2, 3, 384, 32, 128
    mask = build_block_mask(T, T, block, window=1, causal=True,
                            global_blocks=1)
    rng = np.random.default_rng(11)
    q, k, v = _qkv(rng, (B, H, T, D))
    got = np.asarray(block_sparse_attention_pallas(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mask))
    ref = _dense_attention(q, k, v, dense_mask_from_block_mask(mask),
                           1.0 / np.sqrt(D))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_bsa_pallas_rectangular():
    Tq, Tk, D = 256, 512, 64
    mask = build_block_mask(Tq, Tk, 128, window=None)
    rng = np.random.default_rng(12)
    q = jnp.asarray(rng.standard_normal((Tq, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((Tk, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((Tk, D)).astype(np.float32))
    got = np.asarray(block_sparse_attention_pallas(q, k, v, mask))
    ref = _dense_attention(np.asarray(q), np.asarray(k), np.asarray(v),
                           np.ones((Tq, Tk), bool), 1.0 / np.sqrt(D))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_bsa_pallas_grad_matches_xla():
    """Default custom_vjp backward (bwd='auto' -> the XLA recompute on
    CPU) must agree with differentiating the XLA path directly."""
    T, D = 256, 64
    mask = build_block_mask(T, T, 128, window=1, causal=True)
    rng = np.random.default_rng(13)
    q, k, v = (jnp.asarray(x) for x in _qkv(rng, (T, D)))

    def loss_pl(q, k, v):
        return jnp.sum(block_sparse_attention_pallas(q, k, v, mask) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(block_sparse_attention(q, k, v, mask,
                                              impl="xla") ** 2)

    gp = jax.grad(loss_pl, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def _flash_grads(q, k, v, mask, bwd):
    def loss(q, k, v):
        return jnp.sum(block_sparse_attention_pallas(
            q, k, v, mask, None, bwd).astype(jnp.float32) ** 2)

    return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)


def _xla_grads(q, k, v, mask):
    def loss(q, k, v):
        return jnp.sum(block_sparse_attention(
            q, k, v, mask, impl="xla").astype(jnp.float32) ** 2)

    return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("global_blocks", [0, 1])
def test_flash_backward_matches_xla(causal, global_blocks):
    """The fused flash backward (bwd='pallas': dq over the row ELL,
    dk/dv over the transposed ELL, P rebuilt from the saved lse) must
    reproduce the XLA path's gradients."""
    T, D = 512, 64
    mask = build_block_mask(T, T, 128, window=2, causal=causal,
                            global_blocks=global_blocks)
    rng = np.random.default_rng(21)
    q, k, v = (jnp.asarray(x) for x in _qkv(rng, (T, D)))
    gp = _flash_grads(q, k, v, mask, "pallas")
    gx = _xla_grads(q, k, v, mask)
    for name, a, b in zip("qkv", gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"d{name}")


def test_flash_backward_ragged_mask_and_lead_dims():
    """Data-derived mask (uneven blocks per row AND per column — dead
    slots on both the row ELL and the transposed ELL) with batch x head
    leading dims."""
    from sparta_tpu.formats.csr import rmat_csr
    from sparta_tpu.ops.attention import block_mask_from_csr

    m = rmat_csr(11, edge_factor=2, seed=7)         # 2048 nodes, power-law
    mask = block_mask_from_csr(m, block=128)
    # genuinely ragged on BOTH axes (several distinct per-row and
    # per-column block counts -> dead slots in row and transposed ELLs)
    assert len(set(np.bincount(mask.br).tolist())) > 2
    assert len(set(np.bincount(mask.bc).tolist())) > 2
    T, D = mask.nbr * 128, 64
    rng = np.random.default_rng(22)
    q, k, v = (jnp.asarray(x) for x in _qkv(rng, (2, T, D)))
    gp = _flash_grads(q, k, v, mask, "pallas")
    gx = _xla_grads(q, k, v, mask)
    for name, a, b in zip("qkv", gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"d{name}")


def test_flash_backward_rectangular():
    """Cross-attention: T_q != T_k, so wmax/umax and the two ELLs differ."""
    Tq, Tk, D = 256, 512, 64
    mask = build_block_mask(Tq, Tk, 128, window=None)  # dense pattern
    rng = np.random.default_rng(23)
    q = jnp.asarray(rng.standard_normal((Tq, D)).astype(np.float32))
    k, v = (jnp.asarray(rng.standard_normal((Tk, D)).astype(np.float32))
            for _ in range(2))
    gp = _flash_grads(q, k, v, mask, "pallas")
    gx = _xla_grads(q, k, v, mask)
    for name, a, b in zip("qkv", gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"d{name}")


def test_flash_backward_bf16():
    """bf16 inputs: fp32 softmax/accumulate inside, bf16 MXU operands —
    same numerics class as the XLA path, loose elementwise tolerance."""
    T, D = 512, 64
    mask = build_block_mask(T, T, 128, window=3, causal=True)
    rng = np.random.default_rng(24)
    q, k, v = (jnp.asarray(x, jnp.bfloat16) for x in _qkv(rng, (T, D)))
    gp = _flash_grads(q, k, v, mask, "pallas")
    gx = _xla_grads(q, k, v, mask)
    for name, a, b in zip("qkv", gp, gx):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=0.1, atol=0.15, err_msg=f"d{name}")


def test_bsa_impl_dispatch():
    """impl='auto' routes to XLA on the CPU backend; explicit impls agree."""
    T, D = 256, 64
    mask = build_block_mask(T, T, 128, window=2, causal=True)
    rng = np.random.default_rng(14)
    q, k, v = (jnp.asarray(x) for x in _qkv(rng, (T, D)))
    a = np.asarray(block_sparse_attention(q, k, v, mask, impl="auto"))
    x = np.asarray(block_sparse_attention(q, k, v, mask, impl="xla"))
    p = np.asarray(block_sparse_attention(q, k, v, mask, impl="pallas"))
    h = np.asarray(block_sparse_attention(q, k, v, mask, impl="hybrid"))
    np.testing.assert_allclose(a, x, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(p, x, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(h, x, rtol=1e-6, atol=1e-7)


def test_hybrid_grad_dispatch_matches_xla():
    """impl='hybrid' (the accelerator training default): forward equals
    the XLA path, and grads equal differentiating it (on CPU the hybrid
    backward falls through to the XLA vjp — dispatch correctness)."""
    T, D = 512, 64
    mask = build_block_mask(T, T, 128, window=2, causal=True)
    rng = np.random.default_rng(31)
    q, k, v = (jnp.asarray(x) for x in _qkv(rng, (T, D)))

    def loss_h(q, k, v):
        return jnp.sum(block_sparse_attention(
            q, k, v, mask, impl="hybrid") ** 2)

    gh = jax.grad(loss_h, argnums=(0, 1, 2))(q, k, v)
    gx = _xla_grads(q, k, v, mask)
    for name, a, b in zip("qkv", gh, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=f"d{name}")


def test_hybrid_accelerator_branch_semantics():
    """The accelerator branch of the hybrid backward — XLA-computed lse
    feeding the flash kernels — exercised explicitly under interpret
    (the CPU dispatch would otherwise skip it)."""
    from sparta_tpu.ops.attention_pallas import (
        _pallas_backward,
        _xla_forward_lse,
    )

    T, D = 512, 64
    mask = build_block_mask(T, T, 128, window=2, causal=True)
    rng = np.random.default_rng(32)
    q, k, v = (jnp.asarray(x) for x in _qkv(rng, (2, T, D)))
    scale = 1.0 / np.sqrt(D)
    o, lse = _xla_forward_lse(q, k, v, mask, scale)
    # the XLA lse must equal the kernel's definition: logsumexp of the
    # masked scaled scores per query row
    from sparta_tpu.ops.attention import dense_mask_from_block_mask

    s = np.einsum("htd,hsd->hts", np.asarray(q), np.asarray(k)) * scale
    s = np.where(dense_mask_from_block_mask(mask)[None], s, -np.inf)
    ref_lse = np.log(np.exp(
        s - s.max(-1, keepdims=True)).sum(-1)) + s.max(-1)
    np.testing.assert_allclose(np.asarray(lse), ref_lse, rtol=1e-5,
                               atol=1e-5)
    g = jnp.asarray(rng.standard_normal(o.shape).astype(np.float32))
    lse_r = jnp.broadcast_to(
        lse.reshape(-1, T)[..., None].astype(jnp.float32), (2, T, 128))
    dq, dk, dv = _pallas_backward(q, k, v, g, o, lse_r, mask, scale,
                                  interpret=True)
    _, vjp = jax.vjp(
        lambda a, b, c: block_sparse_attention(a, b, c, mask, scale=scale,
                                               impl="xla"), q, k, v)
    xq, xk, xv = vjp(g)
    for name, a, b in zip("qkv", (dq, dk, dv), (xq, xk, xv)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=f"d{name}")


def test_block_mask_from_csr_graph_pattern():
    """Data-derived attention pattern: every nnz of the (reordered) matrix
    lands inside a mask block; reordering concentrates the pattern into
    fewer blocks; attention through the pattern matches the dense oracle."""
    from sparta_tpu.formats import random_block_csr
    from sparta_tpu.ops.attention import block_mask_from_csr
    from sparta_tpu.reorder import BlockingEngine
    from sparta_tpu.definitions import BlockingType

    b = 16
    m = random_block_csr(8 * b, 8 * b, block=b, block_density=0.2,
                         intra_density=0.5, seed=3)  # shuffled rows
    mask_nat = block_mask_from_csr(m, b)
    # coverage: every nonzero inside some block
    dm = dense_mask_from_block_mask(mask_nat)
    coo = m.to_scipy().tocoo()
    sym = set(zip(coo.row.tolist(), coo.col.tolist()))
    sym |= {(c, r) for r, c in sym}
    assert all(dm[r, c] for r, c in sym)

    eng = BlockingEngine(tau=0.3, col_block_size=b, row_block_size=b,
                         blocking_algo=BlockingType.iterative_clocked,
                         force_fixed_size=True)
    grouping = eng.get_grouping(m)
    mask_re = block_mask_from_csr(m, b, grouping=grouping)
    assert mask_re.n_blocks <= mask_nat.n_blocks  # reorder concentrates

    # attention through the data-derived pattern == dense-masked oracle
    rng = np.random.default_rng(0)
    T = mask_nat.nbr * b
    q, k, v = _qkv(rng, (T, 64))
    got = np.asarray(block_sparse_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mask_nat,
        impl="xla"))
    ref = _dense_attention(q, k, v, dm, 1.0 / np.sqrt(64))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_block_mask_from_csr_causal_and_diagonal():
    """causal=True keeps lower-triangular blocks + intra-block tri; the
    diagonal is always present so no softmax row is empty."""
    from sparta_tpu.formats.csr import rmat_csr
    from sparta_tpu.ops.attention import block_mask_from_csr

    m = rmat_csr(7, edge_factor=2, seed=1)
    mask = block_mask_from_csr(m, 16, causal=True)
    assert all(j <= i for i, j in zip(mask.br, mask.bc))
    assert mask.causal
    diag = {(i, i) for i in range(mask.nbr)}
    assert diag <= set(zip(mask.br, mask.bc))
    dm = dense_mask_from_block_mask(mask)
    assert dm.diagonal().all()


# ---------------------------------------------------------------------------
# v2 chunked kernels: builder invariants + multi-chunk (nch > 1) paths
# ---------------------------------------------------------------------------

def test_chunk_layout():
    from sparta_tpu.ops.attention_pallas import _CHUNK_MAX, _chunk_layout

    for wmax in range(1, 40):
        nch, ch = _chunk_layout(wmax)
        assert ch <= _CHUNK_MAX
        assert nch * ch >= wmax            # covers every slot
        assert nch * ch - wmax < ch        # waste bounded by one chunk
        if wmax <= _CHUNK_MAX:
            assert nch == 1 and ch == wmax  # no padding when one chunk fits


@pytest.mark.parametrize("causal", [False, True])
def test_mask_to_ell_chunked_invariants(causal):
    """Every block appears exactly once; dead slots carry the -1e30 bias;
    under causal the diagonal block sits in the LAST slot of every row
    (the kernel's static-position triangular mask depends on it)."""
    from sparta_tpu.ops.attention_pallas import _NEG_BIG, _mask_to_ell_chunked

    mask = build_block_mask(1024, 1024, 128, window=3, causal=causal,
                            global_blocks=2)
    nch, ch, bc, bias_cols = _mask_to_ell_chunked(mask)
    assert bc.shape == (mask.nbr, nch * ch)
    assert bias_cols.shape == (mask.nbr, nch, ch * mask.block)
    live = bias_cols.reshape(mask.nbr, nch * ch, mask.block)[:, :, 0] == 0
    assert (bias_cols.reshape(mask.nbr, nch * ch, mask.block)
            == np.where(live, np.float32(0.0),
                        np.float32(_NEG_BIG))[:, :, None]).all()
    for r in range(mask.nbr):
        want = sorted(j for i, j in zip(mask.br, mask.bc) if i == r)
        got = sorted(bc[r][live[r]].tolist())
        assert got == want, f"row {r}"
        if causal and r in want:
            assert bc[r, -1] == r and live[r, -1], \
                f"diagonal not in last slot for row {r}"


def test_mask_to_ell_t_chunked_invariants():
    from sparta_tpu.ops.attention_pallas import _mask_to_ell_t_chunked

    mask = build_block_mask(1024, 1024, 128, window=3, causal=True,
                            global_blocks=2)
    nch, ch, br, livet = _mask_to_ell_t_chunked(mask)
    assert br.shape == livet.shape == (mask.nbc, nch * ch)
    for c in range(mask.nbc):
        want = sorted(i for i, j in zip(mask.br, mask.bc) if j == c)
        got = sorted(br[c][livet[c] > 0].tolist())
        assert got == want, f"col {c}"
        if c in want:  # diagonal query tile in the last slot
            assert br[c, -1] == c and livet[c, -1] > 0


@pytest.mark.parametrize("causal", [False, True])
def test_bsa_pallas_multichunk_forward_and_grad(causal):
    """A dense pattern at 12 block rows forces wmax=12 -> nch=2 chunks:
    exercises the cross-chunk online-softmax rescale, the causal diagonal
    in the LAST chunk's last slot, and the chunked backward, none of
    which single-chunk windowed masks touch."""
    from sparta_tpu.ops.attention_pallas import _mask_to_ell_chunked

    T, D = 12 * 128, 64
    mask = build_block_mask(T, T, 128, window=None, causal=causal)
    nch, ch, _, _ = _mask_to_ell_chunked(mask)
    assert nch >= 2, "test shape must force multiple chunks"
    rng = np.random.default_rng(21)
    q, k, v = (jnp.asarray(x) for x in _qkv(rng, (2, T, D)))
    got = np.asarray(block_sparse_attention_pallas(q, k, v, mask))
    ref = np.asarray(block_sparse_attention(q, k, v, mask, impl="xla"))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)

    gp = _flash_grads(q, k, v, mask, "pallas")
    gx = _xla_grads(q, k, v, mask)
    for name, a, b in zip("qkv", gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=f"d{name}")


@pytest.mark.parametrize("rows", [2, 4])
def test_bsa_pallas_v2_rows_per_step(rows):
    """rows>1 processes several query tiles per grid step (fixed-cost
    amortization knob); must be bit-compatible with rows=1."""
    from sparta_tpu.ops.attention_pallas import _pallas_forward

    T, D = 1024, 64
    mask = build_block_mask(T, T, 128, window=2, causal=True,
                            global_blocks=1)
    rng = np.random.default_rng(33)
    q, k, v = (jnp.asarray(x) for x in _qkv(rng, (2, T, D)))
    sc = 1.0 / np.sqrt(D)
    base, lse1 = _pallas_forward(q, k, v, mask, sc, with_lse=True)
    got, lse_r = _pallas_forward(q, k, v, mask, sc, with_lse=True,
                                 rows=rows)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(lse_r), np.asarray(lse1),
                               rtol=0, atol=0)

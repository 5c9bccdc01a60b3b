"""GPipe pipeline parallelism on the virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from sparta_tpu.models import (
    BlockSparseTransformer,
    TransformerConfig,
    lm_loss,
)
from sparta_tpu.models.pp import make_pp_train_step, stack_layer_params
from sparta_tpu.parallel import make_mesh, make_mesh_2d


@pytest.fixture(scope="module")
def pp_setup():
    cfg = TransformerConfig(
        vocab=64, d_model=32, n_heads=2, n_layers=4, d_ff=64, max_seq=64,
        block=16, ffn_block_density=0.5, attention="local", attn_window=2,
        attn_global_blocks=1)
    model = BlockSparseTransformer.create(cfg, jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1))
    tokens = jax.random.randint(jax.random.PRNGKey(2), (8, 33), 0,
                                cfg.vocab)
    return model, params, tokens


@pytest.mark.parametrize("n_micro", [1, 2, 4])
def test_pp_loss_matches_unsharded(pp_setup, n_micro):
    """The GPipe schedule is a pure execution layout: first-step loss must
    equal lm_loss for any microbatch count (1 = no pipelining, 4 = one
    token-batch per microbatch)."""
    model, params, tokens = pp_setup
    mesh = make_mesh_2d((2, 4), axes=("dp", "pp"))
    init_s, step = make_pp_train_step(model, optax.sgd(0.0), mesh,
                                      n_micro=n_micro)
    hp, st, opt_s, toks_s = init_s(jax.random.PRNGKey(1), tokens)
    with jax.sharding.set_mesh(mesh):
        _, _, _, loss = step(hp, st, opt_s, toks_s)
    l_ref = float(lm_loss(model, params, tokens))
    assert float(loss) == pytest.approx(l_ref, abs=1e-4)


def test_pp_grads_match_unsharded(pp_setup):
    """Pipeline gradients (through scan + ppermute transposes) must equal
    the unsharded lm_loss gradients for both head and stacked layers."""
    import functools

    from jax.sharding import PartitionSpec as P

    from sparta_tpu.models.pp import _pp_loss_local, stack_ffn_structure

    model, params, tokens = pp_setup
    mesh = make_mesh_2d((2, 4), axes=("dp", "pp"))
    structure = stack_ffn_structure(model)
    stacked = stack_layer_params(params)
    head = {k: v for k, v in params.items() if k != "layers"}

    def pp_loss(head, stacked, tokens):
        fn = jax.shard_map(
            functools.partial(_pp_loss_local, model, axis_pp="pp",
                              n_stages=4, n_micro=2, axis_dp="dp", n_dp=2),
            mesh=mesh, in_specs=(P(), P("pp"), P("pp"), P("dp")),
            out_specs=P())
        return fn(head, stacked, structure, tokens)

    (gh, gs) = jax.grad(pp_loss, argnums=(0, 1))(head, stacked, tokens)
    g_ref = jax.grad(functools.partial(lm_loss, model))(params, tokens)
    gh_ref = {k: v for k, v in g_ref.items() if k != "layers"}
    gs_ref = stack_layer_params(g_ref)
    for a, b in zip(jax.tree.leaves(gh), jax.tree.leaves(gh_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)
    for a, b in zip(jax.tree.leaves(gs), jax.tree.leaves(gs_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_pp_pure_1d_mesh(pp_setup):
    """axis_dp=None: a 1-D pure-pipeline mesh (4 stages, no data
    parallelism) trains and matches the unsharded loss."""
    model, params, tokens = pp_setup
    mesh = make_mesh(4, axis="pp")
    init_s, step = make_pp_train_step(model, optax.adamw(1e-3), mesh,
                                      n_micro=4, axis_dp=None)
    hp, st, opt_s, toks_s = init_s(jax.random.PRNGKey(1), tokens)
    l_ref = float(lm_loss(model, params, tokens))
    with jax.sharding.set_mesh(mesh):
        losses = []
        for _ in range(3):
            hp, st, opt_s, loss = step(hp, st, opt_s, toks_s)
            losses.append(float(loss))
    assert losses[0] == pytest.approx(l_ref, abs=1e-4)
    assert losses[-1] < losses[0]


def test_pp_rejects_bad_configs():
    cfg = TransformerConfig(
        vocab=32, d_model=16, n_heads=2, n_layers=3, d_ff=32, max_seq=32,
        block=16, attention="local", attn_window=1)
    model = BlockSparseTransformer.create(cfg, jax.random.PRNGKey(0))
    mesh = make_mesh_2d((2, 4), axes=("dp", "pp"))
    with pytest.raises(ValueError, match="divisible"):
        make_pp_train_step(model, optax.sgd(0.1), mesh, n_micro=2)
    cfg_moe = TransformerConfig(
        vocab=32, d_model=16, n_heads=2, n_layers=4, d_ff=32, max_seq=32,
        block=16, attention="local", attn_window=1, moe_experts=2)
    model_moe = BlockSparseTransformer.create(cfg_moe, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="moe"):
        make_pp_train_step(model_moe, optax.sgd(0.1), mesh, n_micro=2)

from .gcn import (
    GCN,
    GCNConfig,
    make_gcn_train_step,
    make_sharded_gcn_apply,
    normalize_adjacency,
)
from .gcn_sample import (
    BlockSampler,
    MiniBatch,
    apply_minibatch,
    features_to_blocks,
    make_minibatch_train_step,
    seed_labels,
)
from .layers import BlockSparseLinear, make_block_mask
from .moe import BlockSparseMoE
from .pp import make_pp_train_step
from .serve import generate, sample_logits
from .sp import make_sp_train_step
from .train import (
    lm_loss,
    make_sharded_decode,
    make_sharded_train_step,
    make_train_step,
)
from .transformer import BlockSparseTransformer, TransformerConfig

__all__ = [
    "BlockSampler",
    "BlockSparseLinear",
    "BlockSparseMoE",
    "BlockSparseTransformer",
    "MiniBatch",
    "apply_minibatch",
    "features_to_blocks",
    "make_minibatch_train_step",
    "seed_labels",
    "GCN",
    "GCNConfig",
    "make_gcn_train_step",
    "make_sharded_gcn_apply",
    "normalize_adjacency",
    "TransformerConfig",
    "lm_loss",
    "make_block_mask",
    "make_pp_train_step",
    "make_sharded_decode",
    "make_sharded_train_step",
    "make_sp_train_step",
    "make_train_step",
    "generate",
    "sample_logits",
]

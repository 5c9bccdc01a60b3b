"""Int8 quantized blocked SpMM.

The reference defines an int8 compute path via cuBLAS type switches
(cuda_utilities.cpp:24-26, CUDA_R_8I).  TPU-natively: per-block symmetric
int8 quantization of the A blocks, per-row-stripe quantization of B, int8
MXU matmuls accumulated in int32, dequantized by the product of scales into
fp32.  v5e int8 throughput is 2x bf16.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from .device import BellDevice


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QBellDevice:
    cols_idx: jax.Array  # int32 [nbr, max_nb]
    nb_row: jax.Array    # int32 [nbr]
    q_vals: jax.Array    # int8 [nbr, max_nb, bh, bw]
    scales: jax.Array    # f32 [nbr, max_nb]

    def tree_flatten(self):
        return (self.cols_idx, self.nb_row, self.q_vals, self.scales), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def from_bell(cls, bell: BellDevice) -> "QBellDevice":
        v = bell.vals.astype(jnp.float32)
        amax = jnp.max(jnp.abs(v), axis=(2, 3))
        scale = jnp.where(amax > 0, amax / 127.0, 1.0)
        q = jnp.clip(jnp.round(v / scale[:, :, None, None]), -127, 127).astype(jnp.int8)
        return cls(bell.cols_idx, bell.nb_row, q, scale)


def quantize_b(B: jax.Array, bw: int):
    """Quantize B per row-stripe of width bw -> (int8 [nbc, bw, N], f32 [nbc])."""
    Bt = B.astype(jnp.float32).reshape(-1, bw, B.shape[1])
    amax = jnp.max(jnp.abs(Bt), axis=(1, 2))
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(Bt / scale[:, None, None]), -127, 127).astype(jnp.int8)
    return q, scale


@jax.jit
def bell_spmm_int8(qbell: QBellDevice, Bq: jax.Array, bscale: jax.Array) -> jax.Array:
    """C = dequant( Aq @ Bq ):  int8 x int8 -> int32 MXU, fp32 dequant."""
    nbr, max_nb, bh, bw = qbell.q_vals.shape
    N = Bq.shape[2]
    safe_idx = jnp.maximum(qbell.cols_idx, 0)

    def step(acc, k):
        stripes = Bq[safe_idx[:, k]]  # int8 [nbr, bw, N]
        prod = jax.lax.dot_general(
            qbell.q_vals[:, k], stripes,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )
        deq = prod.astype(jnp.float32) * (
            qbell.scales[:, k] * bscale[safe_idx[:, k]]
        )[:, None, None]
        return acc + deq, None

    acc0 = jnp.zeros((nbr, bh, N), dtype=jnp.float32)
    acc, _ = jax.lax.scan(step, acc0, jnp.arange(max_nb))
    return acc.reshape(nbr * bh, N)

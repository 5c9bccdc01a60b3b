"""Differentiable blocked SpMM: Pallas forward, XLA backward.

The Pallas kernels have no VJP of their own; this wraps them with a
custom_vjp whose backward pass reuses the gather/scatter structure:

  C = A @ B            (A blocked, values V[r,k] at block-cols J[r,k])
  dV[r,k] = dC_r @ B_{J[r,k]}^T      (per-block outer product, batched MXU)
  dB_{J[r,k]} += V[r,k]^T @ dC_r     (scatter-add over block columns)

so the block-sparse transformer trains through the fast kernel.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .bell_pallas import bell_spmm_pallas_auto
from .bell_xla import bell_spmm_xla
from .device import BellDevice


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def bell_spmm(cols_idx, nb_row, vals, use_pallas: bool, B):
    dev = BellDevice(cols_idx, nb_row, vals)
    if use_pallas:
        return bell_spmm_pallas_auto(dev, B)
    return bell_spmm_xla(dev, B)


def _fwd(cols_idx, nb_row, vals, use_pallas, B):
    out = bell_spmm(cols_idx, nb_row, vals, use_pallas, B)
    return out, (cols_idx, nb_row, vals, B)


def _bwd(use_pallas, res, dC):
    cols_idx, nb_row, vals, B = res
    nbr, max_nb, bh, bw = vals.shape
    N = B.shape[1]
    dC = dC.astype(jnp.float32)
    dCr = dC.reshape(nbr, bh, N)
    Bt = B.astype(jnp.float32).reshape(-1, bw, N)
    safe_idx = jnp.maximum(cols_idx, 0)
    valid = (cols_idx >= 0).astype(jnp.float32)

    # dV[r,k] = dC_r @ B_{J[r,k]}^T
    def dv_step(_, k):
        stripes = Bt[safe_idx[:, k]]  # [nbr, bw, N]
        dv = jax.lax.dot_general(
            dCr, stripes,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [nbr, bh, bw]
        return None, dv * valid[:, k, None, None]

    _, dV = jax.lax.scan(dv_step, None, jnp.arange(max_nb))
    dV = jnp.moveaxis(dV, 0, 1).astype(vals.dtype)  # [nbr, max_nb, bh, bw]

    # dB: scatter-add V^T @ dC_r into block-row stripes of B
    def db_step(acc, k):
        contrib = jax.lax.dot_general(
            vals[:, k].astype(jnp.float32), dCr,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [nbr, bw, N]
        contrib = contrib * valid[:, k, None, None]
        return acc.at[safe_idx[:, k]].add(contrib), None

    dBt0 = jnp.zeros_like(Bt)
    dBt, _ = jax.lax.scan(db_step, dBt0, jnp.arange(max_nb))
    dB = dBt.reshape(B.shape).astype(B.dtype)
    return None, None, dV, dB


bell_spmm.defvjp(_fwd, _bwd)

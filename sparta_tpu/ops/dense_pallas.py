"""Dense matmul — Pallas MXU kernel (reference CUTLASS dense GEMM analogue,
cutlass_bellpack_lib.cu:268-377).

A standard tiled kernel: grid (M/bm, N/bn, K/bk) with fp32 VMEM accumulation
over the K dimension.  Exists as the dense calibration point for the blocked
sparse kernels (the XLA jnp.dot baseline is usually at least as fast; this
pins down any gap we leave on the table with hand-written pipelines).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(a_ref, b_ref, o_ref, acc_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot(
        a_ref[...], b_ref[...], preferred_element_type=jnp.float32
    )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk", "interpret"))
def dense_matmul_pallas(
    A: jax.Array,
    B: jax.Array,
    bm: int = 512,
    bn: int = 512,
    bk: int = 512,
    interpret: bool = False,
) -> jax.Array:
    M, K = A.shape
    K2, N = B.shape
    assert K == K2
    interpret = interpret or jax.default_backend() == "cpu"
    bm, bn, bk = min(bm, M), min(bn, N), min(bk, K)
    if M % bm or N % bn or K % bk:
        raise ValueError(f"shapes ({M},{K})x({K},{N}) not divisible by tiles")
    grid = (M // bm, N // bn, K // bk)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((M, N), B.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=(M * K + K * N + M * N) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(A, B)

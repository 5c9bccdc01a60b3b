"""Probe round 2 for the fine-grained SpMM design (see gather_probe.py):

  A. gather rate curve: row width x dtype (is the 223 GB/s N=512 bf16 rate
     a byte cap or a row cap?)
  B. Pallas mask-matmul combine: CSR-ordered slot contributions streamed
     sequentially, reduced onto 256-row output tiles by an on-the-fly
     one-hot [R, C] @ [C, nt] MXU matmul — no gather, no scatter.
  C. end-to-end w=1 slab pipeline on a real power-law graph:
     contribs = vals * B[cols] (XLA gather, N=512 slabs) -> mask combine,
     vs segment_sum combine, vs the BCOO scatter baseline.

Usage: python scripts/fine_probe.py [--quick]
"""
from __future__ import annotations

import argparse
import functools
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default="results/fine_probe.json")
    args = ap.parse_args()

    import jax

    from sparta_tpu.bench.device import require_device

    require_device()
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from sparta_tpu.bench.timing import time_op

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    out = {}

    def cell(name, fn, B, bytes_moved, reps=3):
        try:
            avg, std, _ = time_op(fn, B, reps=reps)
            gbps = bytes_moved / avg / 1e9
            log(f"{name:36}: {avg*1e3:8.3f} ms  {gbps:7.1f} GB/s  (std {std*1e3:.3f})")
            out[name] = {"ms": round(avg * 1e3, 4), "gbps": round(gbps, 1)}
            return avg
        except Exception as e:  # noqa: BLE001
            log(f"{name:36}: FAILED {type(e).__name__}: {str(e)[:200]}")
            out[name] = {"error": str(e)[:200]}
            return None

    # ---------------------------------------------------------------- A --
    K, S = 65536, 262144
    idx = jnp.asarray(rng.integers(0, K, S), dtype=jnp.int32)
    for N, dt in ((256, jnp.bfloat16), (1024, jnp.bfloat16),
                  (512, jnp.int8), (1024, jnp.int8), (2048, jnp.int8)):
        B = jnp.asarray((rng.standard_normal((K, N)) * 10), dtype=dt)
        cell(f"A gather {jnp.dtype(dt).name} N={N}",
             lambda b, i=idx: b[i], B, S * N * jnp.dtype(dt).itemsize)
    B5 = jnp.asarray(rng.standard_normal((K, 512)), dtype=jnp.bfloat16)
    idx1m = jnp.asarray(rng.integers(0, K, 1 << 20), dtype=jnp.int32)
    cell("A gather bf16 N=512 S=1M",
         lambda b, i=idx1m: b[i], B5, (1 << 20) * 512 * 2)

    # ---------------------------------------------------------------- B --
    # mask-matmul combine kernel
    R, C, nt = 256, 2048, 512

    def combine_kernel(tptr_ref, rows_hbm, contrib_hbm, out_ref,
                       cbuf, rbuf, acc_ref, sems, *, R, C, nt):
        t = pl.program_id(0)
        start = tptr_ref[t]
        n = tptr_ref[t + 1] - start
        nch = (n + C - 1) // C
        acc_ref[...] = jnp.zeros_like(acc_ref)
        base = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0) + t * R

        def body(c, _):
            off = start + c * C
            cp = pltpu.make_async_copy(
                contrib_hbm.at[pl.ds(off, C)], cbuf, sems.at[0])
            rp = pltpu.make_async_copy(
                rows_hbm.at[:, pl.ds(off, C)], rbuf, sems.at[1])
            cp.start()
            rp.start()
            cp.wait()
            rp.wait()
            mask = (rbuf[...] == base).astype(cbuf.dtype)
            acc_ref[...] += jax.lax.dot(
                mask, cbuf[...], preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, nch, body, 0)
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)

    @functools.partial(jax.jit, static_argnames=("M", "R", "C", "nt"))
    def mask_combine(tptr, rows2d, contribs, M, R=R, C=C, nt=nt):
        ntiles = M // R
        kern = functools.partial(combine_kernel, R=R, C=C, nt=nt)
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(ntiles,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                          pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec((R, nt), lambda t, *_: (t, 0)),
                scratch_shapes=[
                    pltpu.VMEM((C, nt), contribs.dtype),
                    pltpu.VMEM((1, C), jnp.int32),
                    pltpu.VMEM((R, nt), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((M, nt), contribs.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=jax.default_backend() == "cpu",
        )(tptr, rows2d, contribs)

    # synthetic CSR-ordered rows: power-law-ish degrees over M rows
    M = 21760  # multiple of 256
    deg = np.maximum(rng.zipf(1.7, M) % 400, 1)
    deg = (deg * (S / deg.sum())).astype(np.int64)
    deg = np.maximum(deg, 0)
    rows_np = np.repeat(np.arange(M, dtype=np.int32), deg)
    Sreal = rows_np.size
    row_ptr = np.zeros(M + 1, dtype=np.int64)
    np.cumsum(deg, out=row_ptr[1:])
    from sparta_tpu.ops.fine import tile_aligned_layout
    tptr, new_pos, Spad = tile_aligned_layout(row_ptr, R, chunk=C)
    rows_pad = np.full(Spad, -1, dtype=np.int32)
    rows_pad[new_pos] = rows_np
    contribs_np = np.zeros((Spad, nt), dtype=np.float32)
    contribs_np[new_pos] = rng.standard_normal((Sreal, nt)).astype(np.float32)

    contribs = jnp.asarray(contribs_np, dtype=jnp.bfloat16)
    rows2d = jnp.asarray(rows_pad[None, :])
    tptr_j = jnp.asarray(tptr)

    try:
        got = np.asarray(mask_combine(tptr_j, rows2d, contribs, M))
        want = np.zeros((M, nt), np.float32)
        np.add.at(want, rows_np,
                  np.asarray(contribs, dtype=np.float32)[new_pos])
        err = np.abs(got.astype(np.float32) - want).max() / \
            (np.abs(want).max() + 1e-9)
        log(f"B combine correctness: relerr {err:.2e}")
        out["B_relerr"] = float(err)
        cell(f"B mask-combine S={Sreal}",
             lambda c: mask_combine(tptr_j, rows2d, c, M),
             contribs, Sreal * nt * 2)
        cell("B segment_sum same data",
             lambda c: jax.ops.segment_sum(
                 c[:Sreal].astype(jnp.float32),
                 jnp.asarray(rows_np), num_segments=M,
                 indices_are_sorted=True),
             contribs, Sreal * nt * 2)
    except Exception as e:  # noqa: BLE001
        import traceback
        log(f"B: FAILED {type(e).__name__}: {str(e)[:500]}")
        traceback.print_exc(limit=3, file=sys.stderr)
        out["B"] = {"error": str(e)[:300]}

    # ---------------------------------------------------------------- C --
    # end-to-end w=1 slab pipeline on ia-wikiquote
    try:
        from sparta_tpu.datasets import load_reference_graph
        m = load_reference_graph("ia-wikiquote-user-edits-nodup")
    except Exception as e:  # noqa: BLE001
        log(f"C: reference graph unavailable: {e}")
        m = None
    if m is not None:
        N = 2048
        nslabs = N // nt
        Mpad = (m.rows + R - 1) // R * R
        nnz = m.nnz
        rp = np.zeros(m.rows + 1, dtype=np.int64)
        np.cumsum(m.row_nnz, out=rp[1:])
        from sparta_tpu.ops.fine import tile_aligned_layout
        tptr_t, new_pos, Spad = tile_aligned_layout(rp, R, chunk=C)
        # pad tptr out to the padded-row tile count (empty trailing tiles)
        full = np.full(Mpad // R + 1, tptr_t[-1], dtype=np.int32)
        full[: tptr_t.size] = tptr_t
        tptr_t = full
        cols_np = np.zeros(Spad, dtype=np.int32)
        cols_np[new_pos] = m.indices
        vals_np = np.zeros(Spad, dtype=np.float32)
        vals_np[new_pos] = m.values()
        rows_np = np.full(Spad, -1, dtype=np.int32)
        rows_np[new_pos] = np.repeat(np.arange(m.rows, dtype=np.int32),
                                     m.row_nnz)

        cols_j = jnp.asarray(cols_np)
        vals_j = jnp.asarray(vals_np, dtype=jnp.bfloat16)
        rows2d = jnp.asarray(rows_np[None, :])
        tptr_j = jnp.asarray(tptr_t)
        B = jnp.asarray(rng.standard_normal((m.cols, N)),
                        dtype=jnp.bfloat16)
        flops = 2 * nnz * N

        @jax.jit
        def fine_spmm(b):
            outs = []
            for s in range(nslabs):
                bs = jax.lax.slice_in_dim(b, s * nt, (s + 1) * nt, axis=1)
                contrib = vals_j[:, None] * bs[cols_j]
                outs.append(mask_combine(tptr_j, rows2d, contrib, Mpad))
            return jnp.concatenate(outs, axis=1)

        @jax.jit
        def fine_spmm_segsum(b):
            outs = []
            rsafe = jnp.asarray(np.where(rows_np < 0, 0, rows_np))
            vmask = jnp.asarray((rows_np >= 0).astype(np.float32),
                                dtype=jnp.bfloat16)
            for s in range(nslabs):
                bs = jax.lax.slice_in_dim(b, s * nt, (s + 1) * nt, axis=1)
                contrib = (vals_j * vmask)[:, None] * bs[cols_j]
                outs.append(jax.ops.segment_sum(
                    contrib.astype(jnp.float32), rsafe,
                    num_segments=m.rows, indices_are_sorted=True))
            return jnp.concatenate(outs, axis=1).astype(b.dtype)

        # correctness vs BCOO
        from sparta_tpu.ops import bcoo_spmm, csr_to_bcoo
        A = csr_to_bcoo(m, dtype=jnp.bfloat16)
        want = np.asarray(bcoo_spmm(A, B[:, :512]).astype(jnp.float32))
        got = np.asarray(fine_spmm(B))[: m.rows, :512].astype(np.float32)
        err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        log(f"C correctness vs bcoo: relerr {err:.2e}")
        out["C_relerr"] = float(err)

        t1 = cell(f"C fine mask N={N}", fine_spmm, B, flops // 1)
        t2 = cell(f"C fine segsum N={N}", fine_spmm_segsum, B, flops // 1)
        t3 = cell("C bcoo baseline", lambda b: bcoo_spmm(A, b), B, flops)
        if t1 and t3:
            log(f"C fine-mask vs bcoo: {t3/t1:.2f}x")
            out["C_speedup_vs_bcoo"] = round(t3 / t1, 2)

    from sparta_tpu.bench.results import write_result
    write_result(args.out, out, quick=args.quick, hw_only=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

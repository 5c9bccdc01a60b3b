"""Measure the v5e primitive ceilings that bound any fine-grained SpMM:

  g1  raw XLA row gather  B[idx]           (random / sorted idx, N, dtype)
  g2  XLA scatter-add     zeros.at[rows].add(X)  (sorted, promise-in-bounds)
  g3  one-shot nnz-level  segment_sum(vals*B[cols], rows)  (the whole SpMM
      as one gather + one sorted segment reduce)
  g4  Pallas in-kernel gather: jnp.take_along_axis on a VMEM-resident
      operand (tpu dynamic_gather) — per-op cost
  g5  Pallas per-row DMA gather from HBM — per-DMA issue overhead

Everything the FELL / csr_spmm_auto design rests on follows from these
five numbers.  Usage: python scripts/gather_probe.py [--quick]
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
    ap.add_argument("--out", default="results/gather_probe.json")
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
            log(f"{name:34}: {avg*1e3:8.3f} ms  {gbps:7.1f} GB/s  (std {std*1e3:.3f})")
            out[name] = {"ms": round(avg * 1e3, 4), "gbps": round(gbps, 1)}
        except Exception as e:  # noqa: BLE001
            log(f"{name:34}: FAILED {type(e).__name__}: {str(e)[:200]}")
            out[name] = {"error": str(e)[:200]}

    # ---------------------------------------------------------------- g1 --
    K, S = 65536, 262144
    for N in (512, 2048) if not args.quick else (512,):
        B = jnp.asarray(rng.standard_normal((K, N)), dtype=jnp.bfloat16)
        moved = S * N * 2
        idx_r = jnp.asarray(rng.integers(0, K, S), dtype=jnp.int32)
        idx_s = jnp.sort(idx_r)
        cell(f"g1 gather rand N={N}", lambda b, i=idx_r: b[i], B, moved)
        cell(f"g1 gather sorted N={N}", lambda b, i=idx_s: b[i], B, moved)
        if N == 512:
            B32 = B.astype(jnp.float32)
            cell("g1 gather rand f32 N=512",
                 lambda b, i=idx_r: b[i], B32, S * N * 4)

    # ---------------------------------------------------------------- g2 --
    N = 512
    X = jnp.asarray(rng.standard_normal((S, N)), dtype=jnp.bfloat16)
    rows_s = jnp.asarray(np.sort(rng.integers(0, K, S)), dtype=jnp.int32)
    moved = S * N * 2

    def scat_sorted(x, r=rows_s):
        return jnp.zeros((K, N), jnp.float32).at[r].add(
            x.astype(jnp.float32), indices_are_sorted=True,
            mode="promise_in_bounds")

    def scat_plain(x, r=rows_s):
        return jnp.zeros((K, N), jnp.float32).at[r].add(x.astype(jnp.float32))

    def segsum(x, r=rows_s):
        return jax.ops.segment_sum(x.astype(jnp.float32), r, num_segments=K,
                                   indices_are_sorted=True)

    cell("g2 scatter-add sorted+pib N=512", scat_sorted, X, moved)
    cell("g2 scatter-add plain N=512", scat_plain, X, moved)
    cell("g2 segment_sum sorted N=512", segsum, X, moved)

    # ---------------------------------------------------------------- g3 --
    # whole SpMM in one fused expression at nnz granularity
    vals = jnp.asarray(rng.standard_normal(S), dtype=jnp.bfloat16)
    cols = idx_r if not args.quick else idx_r
    B512 = jnp.asarray(rng.standard_normal((K, 512)), dtype=jnp.bfloat16)

    def one_shot(b, c=cols, r=rows_s, v=vals):
        contrib = v[:, None].astype(jnp.float32) * b[c].astype(jnp.float32)
        return jax.ops.segment_sum(contrib, r, num_segments=K,
                                   indices_are_sorted=True).astype(b.dtype)

    cell("g3 gather+segsum nnz-level N=512", one_shot, B512,
         2 * S * 512 * 2)

    # ---------------------------------------------------------------- g4 --
    # in-kernel VMEM gather via take_along_axis (tpu dynamic_gather):
    # operand [C, nt], indices broadcast [C, nt]; R chained gathers
    C, nt, R = 1024, 512, 16
    gidx = jnp.asarray(rng.integers(0, C, C), dtype=jnp.int32)

    def g4_kernel(idx_ref, x_ref, o_ref):
        x = x_ref[...]
        idx2 = jax.lax.broadcast_in_dim(idx_ref[...], (C, nt), (0,))
        acc = jnp.zeros((C, nt), jnp.float32)
        for i in range(R):
            g = jnp.take_along_axis(x, (idx2 + i) % C, axis=0)
            acc = acc + g.astype(jnp.float32)
        o_ref[...] = acc.astype(x.dtype)

    Xg = jnp.asarray(rng.standard_normal((C, nt)), dtype=jnp.bfloat16)

    def g4(b, i=gidx):
        return pl.pallas_call(
            g4_kernel,
            out_shape=jax.ShapeDtypeStruct((C, nt), b.dtype),
        )(i, b)

    try:
        r0 = np.asarray(g4(Xg))
        # oracle: chained gathers of x at (idx+i)%C
        xs = np.asarray(Xg, dtype=np.float32)
        accv = np.zeros((C, nt), np.float32)
        gi = np.asarray(gidx)
        for i in range(R):
            accv += xs[(gi + i) % C]
        ok = np.allclose(r0, accv.astype(np.float32), rtol=2e-2, atol=1e-1)
        log(f"g4 correctness: {ok}")
        cell(f"g4 vmem take_along_axis x{R}", g4, Xg, R * C * nt * 2)
        if "g4 vmem take_along_axis x16" in out and \
                "ms" in out[f"g4 vmem take_along_axis x{R}"]:
            per = out[f"g4 vmem take_along_axis x{R}"]["ms"] / R
            log(f"   per-gather [{C},{nt}]: {per*1e3:.1f} us")
    except Exception as e:  # noqa: BLE001
        log(f"g4: FAILED {type(e).__name__}: {str(e)[:300]}")
        out["g4"] = {"error": str(e)[:300]}

    # out-shape != operand-shape variant (is non-square gather supported?)
    def g4b_kernel(idx_ref, x_ref, o_ref):
        idx2 = jax.lax.broadcast_in_dim(idx_ref[...], (256, nt), (0,))
        o_ref[...] = jnp.take_along_axis(x_ref[...], idx2, axis=0)

    def g4b(b, i=gidx[:256]):
        return pl.pallas_call(
            g4b_kernel,
            out_shape=jax.ShapeDtypeStruct((256, nt), b.dtype),
        )(i, b)

    try:
        np.asarray(g4b(Xg))
        log("g4b non-square gather: SUPPORTED")
        out["g4b_nonsquare"] = "supported"
    except Exception as e:  # noqa: BLE001
        log(f"g4b non-square gather: unsupported ({str(e)[:120]})")
        out["g4b_nonsquare"] = str(e)[:120]

    # ---------------------------------------------------------------- g5 --
    # per-row DMA gather HBM->VMEM: G rows per grid step, G sems, unrolled
    G = 128
    Sg = 65536 if not args.quick else 16384
    KN = (K, 512)
    Bh = jnp.asarray(rng.standard_normal(KN), dtype=jnp.bfloat16)
    didx = np.sort(rng.integers(0, K, Sg)).astype(np.int32)

    def g5_kernel(idx_ref, b_hbm, o_ref, sems):
        chunk = pl.program_id(0)
        copies = []
        for i in range(G):
            c = pltpu.make_async_copy(
                b_hbm.at[pl.ds(idx_ref[chunk * G + i], 1)],
                o_ref.at[pl.ds(i, 1)],
                sems.at[i],
            )
            c.start()
            copies.append(c)
        for c in copies:
            c.wait()

    grid = Sg // G

    def g5(b, i=jnp.asarray(didx)):
        return pl.pallas_call(
            g5_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(grid,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec((G, 512), lambda c, *_: (c, 0)),
                scratch_shapes=[pltpu.SemaphoreType.DMA((G,))],
            ),
            out_shape=jax.ShapeDtypeStruct((Sg, 512), b.dtype),
        )(i, b)

    try:
        got = np.asarray(g5(Bh))
        ok = np.array_equal(got, np.asarray(Bh)[didx])
        log(f"g5 correctness: {ok}")
        cell("g5 dma row-gather N=512", g5, Bh, Sg * 512 * 2)
        if "ms" in out.get("g5 dma row-gather N=512", {}):
            per = out["g5 dma row-gather N=512"]["ms"] * 1e6 / Sg
            log(f"   per-row DMA: {per:.0f} ns")
    except Exception as e:  # noqa: BLE001
        log(f"g5: FAILED {type(e).__name__}: {str(e)[:300]}")
        out["g5"] = {"error": str(e)[:300]}

    from sparta_tpu.bench.results import write_result
    write_result(args.out, out, quick=args.quick, hw_only=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

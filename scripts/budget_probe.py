"""Per-component time budget of the unrolled compact kernel at the
headline shape (VERDICT r1 #4): decompose the measured ~401us into
dots / fori overhead / B-tile load / vals DMA / grid overhead by timing
surgically modified kernel variants.

Variants (same grid, same DMAs unless noted):
  full        : the production kernel
  no_dots     : dots removed (DMAs + loop + writes only) -> non-MXU floor
  no_vals_dma : vals DMA replaced by reusing slot 0 (B load + dots)
  no_btile    : B tile load skipped (vals DMA + dots on stale VMEM)
  empty       : body empty, loop still runs -> grid + loop floor
  tn256/tn128 : tile-width sensitivity (B reload count)
  bh256       : 256-tall blocks (fixed-chop of the same grouping)
  par_grid    : dimension_semantics ("parallel","arbitrary") on j

Run on the real chip: python scripts/budget_probe.py [--quick]
"""
from __future__ import annotations

import argparse
import functools
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default="results/budget_probe.json")
    args = ap.parse_args()

    import jax

    from sparta_tpu.bench.device import require_device

    require_device()
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from sparta_tpu.bench.tau import search_tau
    from sparta_tpu.bench.timing import time_op
    from sparta_tpu.formats import bell_from_csr, random_block_csr
    from sparta_tpu.ops.bell_compact import (
        compact_auto_chunk,
        compact_from_host_padded,
    )

    def log(*a):
        print(*a, file=sys.stderr, flush=True)

    n, block, N = (2048, 128, 512) if args.quick else (10240, 128, 2048)
    m = random_block_csr(n, n, block=block, block_density=0.08,
                         intra_density=0.13, seed=7)
    res = search_tau(m, block, block, taus=(0.5, 0.3))
    grouping = res.grouping
    dtype = jnp.bfloat16

    results = {}

    def make_kernel(mode):
        def kernel(row_ptr_ref, cols_ref, vals_hbm, b_hbm, out_ref,
                   b_tile, vbuf, acc_ref, bsem, vsems, *, bw, tn, chunk,
                   nslots=2):
            j = pl.program_id(0)
            i = pl.program_id(1)
            if mode != "no_btile":
                @pl.when(i == 0)
                def _():
                    cp = pltpu.make_async_copy(
                        b_hbm.at[:, pl.ds(j * tn, tn)], b_tile, bsem)
                    cp.start()
                    cp.wait()
            start = row_ptr_ref[i]
            nchunks = (row_ptr_ref[i + 1] - start) // chunk

            def vdma(c, slot):
                return pltpu.make_async_copy(
                    vals_hbm.at[pl.ds(start + c * chunk, chunk)],
                    vbuf.at[slot], vsems.at[slot])

            if mode != "no_vals_dma":
                @pl.when(nchunks > 0)
                def _():
                    vdma(0, 0).start()

            acc_ref[...] = jnp.zeros_like(acc_ref)

            def body(c, _):
                slot = jax.lax.rem(c, 2)
                if mode != "no_vals_dma":
                    @pl.when(c + 1 < nchunks)
                    def _():
                        vdma(c + 1, jax.lax.rem(c + 1, 2)).start()
                    vdma(c, slot).wait()
                if mode not in ("no_dots", "empty"):
                    for k in range(chunk):
                        jb = cols_ref[start + c * chunk + k]
                        acc_ref[...] += jax.lax.dot(
                            vbuf[slot, k],
                            b_tile[pl.ds(jb * bw, bw), :],
                            preferred_element_type=jnp.float32)
                return 0

            if mode != "empty_noloop":
                jax.lax.fori_loop(0, nchunks, body, 0)
            out_ref[...] = acc_ref[...].astype(out_ref.dtype)
        return kernel

    def build(bh, tn, mode="full", semantics=("arbitrary", "arbitrary")):
        from sparta_tpu.utils import get_fixed_size_grouping

        g2 = None if grouping is None else get_fixed_size_grouping(grouping, bh)
        bell = bell_from_csr(m, g2, block_row_size=bh, block_col_size=block)
        chunk = compact_auto_chunk(bell.nb_row)
        cdev = compact_from_host_padded(bell, chunk, dtype=dtype)
        total, BH, bw = cdev.vals_flat.shape
        nbr = cdev.n_block_rows
        K = bell.shape[1]
        kernel = functools.partial(make_kernel(mode), bw=bw, tn=tn,
                                   chunk=chunk)
        flops = 2 * bell.total_nzblocks * bh * bw * N

        @jax.jit
        def run(B):
            return pl.pallas_call(
                kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=2,
                    grid=(N // tn, nbr),
                    in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                              pl.BlockSpec(memory_space=pl.ANY)],
                    out_specs=pl.BlockSpec(
                        (BH, tn), lambda j, i, *_: (i, j),
                        memory_space=pltpu.VMEM),
                    scratch_shapes=[
                        pltpu.VMEM((K, tn), B.dtype),
                        pltpu.VMEM((2, chunk, BH, bw), cdev.vals_flat.dtype),
                        pltpu.VMEM((BH, tn), jnp.float32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA((2,)),
                    ],
                ),
                out_shape=jax.ShapeDtypeStruct((nbr * BH, N), B.dtype),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=semantics),
            )(cdev.row_ptr, cdev.cols_flat, cdev.vals_flat, B)

        return run, flops, int(total), chunk

    B = jnp.asarray(
        np.random.default_rng(0).standard_normal((-(-n // block) * block, N)),
        dtype=dtype)

    cases = [
        ("full_tn512", 128, 512, "full", ("arbitrary", "arbitrary")),
        ("par_grid", 128, 512, "full", ("parallel", "arbitrary")),
        ("no_dots", 128, 512, "no_dots", ("arbitrary", "arbitrary")),
        ("no_vals_dma", 128, 512, "no_vals_dma", ("arbitrary", "arbitrary")),
        ("no_btile", 128, 512, "no_btile", ("arbitrary", "arbitrary")),
        ("empty", 128, 512, "empty", ("arbitrary", "arbitrary")),
        ("tn256", 128, 256, "full", ("arbitrary", "arbitrary")),
        ("bh256_tn512", 256, 512, "full", ("arbitrary", "arbitrary")),
    ]
    if args.quick:
        cases = cases[:3]
    for name, bh, tn, mode, sem in cases:
        try:
            run, flops, total, chunk = build(bh, tn, mode, sem)
            avg, std, _ = time_op(run, B, warmup=1, reps=3)
            results[name] = {
                "us": round(avg * 1e6, 1),
                "eff_tflops": round(flops / avg / 1e12, 1),
                "padded_blocks": total, "chunk": chunk,
            }
            log(f"{name:14s}: {avg*1e6:8.1f} us  "
                f"({flops/avg/1e12:6.1f} TF/s eff)  blocks={total} c={chunk}")
        except Exception as e:  # noqa: BLE001
            results[name] = {"error": f"{type(e).__name__}: {str(e)[:150]}"}
            log(f"{name:14s}: FAILED {type(e).__name__}: {str(e)[:150]}")

    from sparta_tpu.bench.results import write_result
    write_result(args.out, results, quick=args.quick, hw_only=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

"""VERDICT r2 #3: the two unexplored headline-kernel knobs.

  (a) bw=256 blocks: halve the block count (halves fori iterations and
      chunk-padding dots) at ~2x per-dot time — the repo's latency model
      (93 ns/dot ~= 34 ns MXU + ~60 ns issue) predicts a net win.
  (b) explicit double-buffered out-tile DMA: the 100 us pipeline floor is
      ~57 us of serialized C writes; overlap the finished tile's HBM write
      with the next block-row's compute via a manual 2-slot output buffer.

Runs the headline bench shape (10240^2 planted blocks, N=2048) and times:
  unrolled bw=128 (baseline) / unrolled bw=256 / dbout bw=128 /
  dbout bw=256, with correctness checks against the XLA reference.

Usage: python scripts/knobs_probe.py [--quick]
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


def build_dbout(jax, jnp, pl, pltpu):
    """Guard-free unrolled kernel with manual double-buffered output DMA."""

    def kernel(row_ptr_ref, cols_ref, vals_hbm, b_hbm, out_hbm,
               b_tile, vbuf, acc_ref, obuf, bsem, vsems, osems,
               *, bw, tn, chunk, nslots, bh):
        j = pl.program_id(0)
        i = pl.program_id(1)
        nbr = pl.num_programs(1)
        nj = pl.num_programs(0)

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

        for s in range(nslots - 1):
            @pl.when(s < nchunks)
            def _(s=s):
                vdma(s, s).start()

        acc_ref[...] = jnp.zeros_like(acc_ref)

        def body(c, _):
            slot = jax.lax.rem(c, nslots)

            @pl.when(c + (nslots - 1) < nchunks)
            def _():
                vdma(c + (nslots - 1),
                     jax.lax.rem(c + (nslots - 1), nslots)).start()

            vdma(c, slot).wait()
            for k in range(chunk):
                jb = cols_ref[start + c * chunk + k]
                acc_ref[...] += jax.lax.dot(
                    vbuf[slot, k], b_tile[pl.ds(jb * bw, bw), :],
                    preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, nchunks, body, 0)

        g = j * nbr + i
        oslot = jax.lax.rem(g, 2)

        def odma(slot):
            return pltpu.make_async_copy(
                obuf.at[slot],
                out_hbm.at[pl.ds(i * bh, bh), pl.ds(j * tn, tn)],
                osems.at[slot])

        # before overwriting obuf[oslot], drain the write issued 2 steps
        # ago on the same slot (wait is a semaphore count of equal bytes)
        @pl.when(g >= 2)
        def _():
            odma(oslot).wait()

        obuf[oslot] = acc_ref[...].astype(obuf.dtype)
        odma(oslot).start()

        # final step: drain both outstanding writes
        @pl.when(g == nj * nbr - 1)
        def _():
            @pl.when(g >= 1)
            def _():
                odma(jax.lax.rem(g + 1, 2)).wait()
            odma(oslot).wait()

    @functools.partial(
        jax.jit, static_argnames=("tn", "chunk", "nslots", "out_dtype"))
    def dbout(bell, B, tn=512, chunk=4, nslots=2, out_dtype=None):
        total, bh, bw = bell.vals_flat.shape
        nbr = bell.n_block_rows
        K, N = B.shape
        out_dtype = out_dtype or B.dtype
        kern = functools.partial(kernel, bw=bw, tn=tn, chunk=chunk,
                                 nslots=nslots, bh=bh)
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(N // tn, nbr),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                          pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                scratch_shapes=[
                    pltpu.VMEM((K, tn), B.dtype),
                    pltpu.VMEM((nslots, chunk, bh, bw),
                               bell.vals_flat.dtype),
                    pltpu.VMEM((bh, tn), jnp.float32),
                    pltpu.VMEM((2, bh, tn), out_dtype),
                    pltpu.SemaphoreType.DMA(()),
                    pltpu.SemaphoreType.DMA((nslots,)),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((nbr * bh, N), out_dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                has_side_effects=True,
            ),
            interpret=jax.default_backend() == "cpu",
        )(bell.row_ptr, bell.cols_flat, bell.vals_flat, B)

    return dbout


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default="results/knobs_probe.json")
    args = ap.parse_args()

    import jax

    from sparta_tpu.bench.device import require_device

    require_device()
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from sparta_tpu.bench.timing import time_op
    from sparta_tpu.bench.tau import search_tau
    from sparta_tpu.formats import bell_from_csr, random_block_csr
    from sparta_tpu.ops import (
        bell_spmm_pallas_compact_unrolled,
        bell_spmm_xla,
        BellDevice,
        compact_auto_chunk,
        compact_from_host_padded,
        compact_optimal_chunk,
    )

    log(f"devices: {jax.devices()}")
    if args.quick:
        n, block, bdens, intra, N = 2048, 128, 0.05, 0.35, 512
    else:
        n, block, bdens, intra, N = 10240, 128, 0.08, 0.13, 2048
    m = random_block_csr(n, n, block=block, block_density=bdens,
                         intra_density=intra, seed=7)
    log(f"matrix: {n}x{n} nnz={m.nnz}")
    res = search_tau(m, block, block, taus=(0.5, 0.3, 0.1, 0.05)
                     if not args.quick else (0.3, 0.1))
    grouping = res.grouping
    dtype = jnp.bfloat16
    out = {}
    dbout = build_dbout(jax, jnp, pl, pltpu)

    def cell(name, fn, B, flops, ref=None, reps=3):
        try:
            if ref is not None:
                got = np.asarray(fn(B)).astype(np.float32)[: ref.shape[0]]
                err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
                if err > 3e-2:
                    log(f"{name:24}: WRONG relerr={err:.3e}")
                    out[name] = {"error": f"relerr {err:.3e}"}
                    return
            avg, std, _ = time_op(fn, B, reps=reps)
            log(f"{name:24}: {avg*1e6:9.1f} us  ({flops/avg/1e12:6.2f} TF/s, "
                f"std {std*1e6:.1f})")
            out[name] = {"us": round(avg * 1e6, 1),
                         "tfs": round(flops / avg / 1e12, 2)}
        except Exception as e:  # noqa: BLE001
            log(f"{name:24}: FAILED {type(e).__name__}: {str(e)[:200]}")
            out[name] = {"error": str(e)[:200]}

    for bw in (128, 256):
        bell = bell_from_csr(m, grouping, block_row_size=block,
                             block_col_size=bw)
        chunk = compact_auto_chunk(bell.nb_row)
        cpad = compact_from_host_padded(bell, chunk, dtype=dtype)
        B = jnp.asarray(
            np.random.default_rng(0).standard_normal((bell.shape[1], N)),
            dtype=dtype)
        flops = 2 * bell.total_nzblocks * block * bw * N
        log(f"bw={bw}: nzblocks={bell.total_nzblocks} chunk={chunk} "
            f"K={bell.shape[1]}")
        out[f"bw{bw}_blocks"] = int(bell.total_nzblocks)
        # XLA reference for correctness
        dev = BellDevice.from_host(bell, dtype=dtype)
        ref = np.asarray(bell_spmm_xla(dev, B)).astype(np.float32)
        cell(f"unrolled bw={bw}",
             lambda b, c=cpad, ch=chunk: bell_spmm_pallas_compact_unrolled(
                 c, b, tn=512, chunk=ch), B, flops, ref)
        cell(f"dbout bw={bw}",
             lambda b, c=cpad, ch=chunk: dbout(c, b, tn=512, chunk=ch),
             B, flops, ref)
        # chunk sensitivity at bw=256 (mean nb halves -> smaller chunk)
        if bw == 256:
            for ch2 in {2, 3, max(chunk - 1, 2)}:
                if ch2 == chunk:
                    continue
                cp2 = compact_from_host_padded(bell, ch2, dtype=dtype)
                cell(f"unrolled bw=256 c={ch2}",
                     lambda b, c=cp2, ch=ch2:
                     bell_spmm_pallas_compact_unrolled(c, b, tn=512, chunk=ch),
                     B, flops, ref)
        # exact histogram-argmin chunk vs the mean heuristic (r4: the
        # selector now models both; this measures the delta directly)
        ch_opt = compact_optimal_chunk(bell.nb_row)
        if ch_opt != chunk:
            cpo = compact_from_host_padded(bell, ch_opt, dtype=dtype)
            cell(f"unrolled bw={bw} c_opt={ch_opt}",
                 lambda b, c=cpo, ch=ch_opt:
                 bell_spmm_pallas_compact_unrolled(c, b, tn=512, chunk=ch),
                 B, flops, ref)

    # --- paired-structure section: the verdict's actual hypothesis is
    # "halve the BLOCK COUNT at the same FLOPs".  On the 128-planted
    # headline matrix a 256 re-tile does NOT do that (random blocks don't
    # pair: ~0.96x blocks at 2x width = ~1.92x FLOPs).  Plant 256-wide
    # blocks instead: the 128-tiling has exactly 2x the blocks at half
    # width — identical FLOPs, so bw256-vs-bw128 isolates the grid-step
    # scalar cost the model says dominates.
    n2 = 2048 if args.quick else 10240
    m2 = random_block_csr(n2, n2, block=256, block_density=0.08,
                          intra_density=0.13, seed=11, shuffle_rows=False)
    log(f"\npaired matrix: {n2}x{n2} nnz={m2.nnz} (256-planted, natural)")
    for bw in (128, 256):
        bell = bell_from_csr(m2, None, block_row_size=128,
                             block_col_size=bw)
        chunk = compact_auto_chunk(bell.nb_row)
        cpad = compact_from_host_padded(bell, chunk, dtype=dtype)
        B = jnp.asarray(
            np.random.default_rng(1).standard_normal((bell.shape[1], N)),
            dtype=dtype)
        flops = 2 * bell.total_nzblocks * 128 * bw * N
        log(f"paired bw={bw}: nzblocks={bell.total_nzblocks} chunk={chunk}")
        out[f"paired_bw{bw}_blocks"] = int(bell.total_nzblocks)
        dev = BellDevice.from_host(bell, dtype=dtype)
        ref = np.asarray(bell_spmm_xla(dev, B)).astype(np.float32)
        cell(f"paired unrolled bw={bw}",
             lambda b, c=cpad, ch=chunk: bell_spmm_pallas_compact_unrolled(
                 c, b, tn=512, chunk=ch), B, flops, ref)
        cell(f"paired dbout bw={bw}",
             lambda b, c=cpad, ch=chunk: dbout(c, b, tn=512, chunk=ch),
             B, flops, ref)

    # --- heavy-tailed rows: where the mean heuristic and the exact
    # histogram argmin disagree most (power-law nb_row) — compare both
    # chunks through the unrolled kernel on a natural-128 rmat blocking
    from sparta_tpu.formats.csr import rmat_csr

    scale = 10 if args.quick else 13
    m3 = rmat_csr(scale, edge_factor=8, seed=4)
    bell3 = bell_from_csr(m3, None, block_row_size=128)
    ch_h = compact_auto_chunk(bell3.nb_row)
    ch_o = compact_optimal_chunk(bell3.nb_row)
    B3 = jnp.asarray(
        np.random.default_rng(2).standard_normal((bell3.shape[1], N)),
        dtype=dtype)
    fl3 = 2 * bell3.total_nzblocks * 128 * 128 * N
    log(f"\nrmat{scale}: nzblocks={bell3.total_nzblocks} "
        f"chunk heur={ch_h} opt={ch_o}")
    out["rmat_chunks"] = {"heur": ch_h, "opt": ch_o,
                          "blocks": int(bell3.total_nzblocks)}
    dev3 = BellDevice.from_host(bell3, dtype=dtype)
    ref3 = np.asarray(bell_spmm_xla(dev3, B3)).astype(np.float32)
    for name, ch in (("heur", ch_h), ("opt", ch_o)):
        if name == "opt" and ch_o == ch_h:
            continue
        cp3 = compact_from_host_padded(bell3, ch, dtype=dtype)
        cell(f"rmat unrolled c_{name}={ch}",
             lambda b, c=cp3, cc=ch: bell_spmm_pallas_compact_unrolled(
                 c, b, tn=512, chunk=cc), B3, fl3, ref3)

    from sparta_tpu.bench.results import write_result
    write_result(args.out, out, quick=args.quick, hw_only=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

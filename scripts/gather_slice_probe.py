"""Strided-slice vs contiguous-copy gather rates.

The r5 narrow-slab change regressed dedup on rmat17 (41.0 -> 53.9 ms)
while the gather microbench said 2x FASTER.  Hypothesis: the microbench
gathered CONTIGUOUS [K, nt] tables, but the production slab is
``lax.slice_in_dim(B, ...)`` of a [K, 2048] operand — XLA fuses the
slice into the gather, so rows are strided across the FULL 512 MB
address range of B: the "table size" the rate cliff keys on never
shrank, and narrower slabs just issue more slow gathers.

Cells (K=131072, N=2048 bf16 — the rmat17 class; S ~ its slot count):
  - contiguous [K, nt] control (what gather_probe2 measured)
  - strided slice B[:, :nt][idx]               (what production does)
  - optimization_barrier(B[:, :nt])[idx]       (forced contiguous copy)
for nt in {512, 256}, plus the barrier-copy cost alone.

Decides whether _take_rows should force-materialize slabs before
gathering.  Usage: python scripts/gather_slice_probe.py [--quick]
"""
from __future__ import annotations

import argparse
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
    ap.add_argument("--out", default="results/gather_slice_probe.json")
    args = ap.parse_args()

    import jax

    from sparta_tpu.bench.device import require_device
    from sparta_tpu.bench.results import write_result
    from sparta_tpu.bench.timing import time_op

    require_device()
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    out = {}

    K = 1 << 16 if args.quick else 1 << 17
    S = 1 << 17 if args.quick else 786_432
    B = jnp.asarray(rng.standard_normal((K, 2048)), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, K, S), jnp.int32)

    def cell(name, fn, arg, bytes_moved, reps=3):
        try:
            avg, _, _ = time_op(fn, arg, warmup=1, reps=reps)
            gbps = bytes_moved / avg / 1e9
            log(f"{name:34}: {avg*1e3:9.3f} ms  {gbps:7.1f} GB/s")
            out[name] = {"ms": round(avg * 1e3, 4), "gbps": round(gbps, 1)}
            write_result(args.out, out, quick=args.quick, hw_only=True)
        except Exception as e:  # noqa: BLE001 — grid cell, non-fatal
            log(f"{name:34}: FAILED {type(e).__name__}: {str(e)[:200]}")
            out[name] = {"error": str(e)[:200]}

    for nt in (512, 256):
        mb = K * nt * 2 >> 20
        Bc = jnp.asarray(np.asarray(B[:, :nt]))  # truly contiguous
        cell(f"contiguous [K,{nt}] ({mb}MB)",
             lambda b, i=idx: b[i], Bc, S * nt * 2)
        del Bc
        cell(f"strided slice nt={nt}",
             lambda b, i=idx, n=nt: jax.lax.slice_in_dim(b, 0, n, axis=1)[i],
             B, S * nt * 2)
        cell(f"barrier copy+gather nt={nt}",
             lambda b, i=idx, n=nt: jax.lax.optimization_barrier(
                 jax.lax.slice_in_dim(b, 0, n, axis=1))[i],
             B, S * nt * 2)
        cell(f"barrier copy only nt={nt}",
             lambda b, n=nt: jax.lax.optimization_barrier(
                 jax.lax.slice_in_dim(b, 0, n, axis=1)) + 0,
             B, K * nt * 2 * 2)

    # full-pipeline check: dedup on an rmat with K in the slow class
    if not args.quick:
        from sparta_tpu.formats.csr import rmat_csr
        from sparta_tpu.ops.fine import DedupDevice, dedup_spmm

        m = rmat_csr(17, edge_factor=8, seed=4)
        Bt = jnp.asarray(rng.standard_normal((m.cols, 2048)), jnp.bfloat16)
        for R in (128, 256):
            dev = DedupDevice.from_csr(m, dtype=jnp.bfloat16, tile_rows=R)
            fl = 2 * m.nnz * 2048
            cell(f"dedup rmat17 R={R}",
                 lambda b, d=dev: dedup_spmm(d, b), Bt, fl)

    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Probe round 3 for the fine-grained SpMM family:

  A. large-S gather cliff: does splitting one S=1M row gather into
     256k-row pieces recover the small-S 223 GB/s rate? (drives whether
     dedup_spmm should chunk its gathers on big graphs)
  B. dedup tile_rows sweep (R=128 vs 256) at a realistic power-law shape:
     the model says R=128 wins (less W traffic / MXU time); measure.
  C. int8 gather rate at N=512 (the dedup_int8 slab width).

Usage: python scripts/fine_probe2.py [--out results/fine_probe2.json]
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
    ap.add_argument("--out", default="results/fine_probe2.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sparta_tpu.bench.device import require_device
    from sparta_tpu.bench.results import write_result
    from sparta_tpu.bench.timing import time_op

    require_device()
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    out = {}
    outp = Path(args.out)
    outp.parent.mkdir(parents=True, exist_ok=True)

    def cell(name, fn, B, bytes_moved, reps=3):
        try:
            avg, std, _ = time_op(fn, B, reps=reps)
            gbps = bytes_moved / avg / 1e9
            log(f"{name:34}: {avg*1e3:8.3f} ms  {gbps:7.1f} GB/s")
            out[name] = {"ms": round(avg * 1e3, 4), "gbps": round(gbps, 1)}
        except Exception as e:  # noqa: BLE001
            log(f"{name:34}: FAILED {type(e).__name__}: {str(e)[:160]}")
            out[name] = {"error": str(e)[:160]}
        write_result(outp, out, hw_only=True)

    # ------------------------------------------------------------- A --
    K, S = 131072, 1 << 20
    B5 = jnp.asarray(rng.standard_normal((K, 512)), dtype=jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, K, S), dtype=jnp.int32)
    bts = S * 512 * 2
    cell("A gather S=1M whole", lambda b: b[idx], B5, bts)
    for pieces in (4, 8):
        csz = S // pieces

        def chunked(b, csz=csz, pieces=pieces):
            return jnp.concatenate(
                [b[jax.lax.dynamic_slice_in_dim(idx, i * csz, csz)]
                 for i in range(pieces)], axis=0)

        cell(f"A gather S=1M in {pieces} pieces", chunked, B5, bts)
    # same data, small-S reference
    idx256 = idx[: 1 << 18]
    cell("A gather S=256k ref", lambda b: b[idx256], B5, (1 << 18) * 512 * 2)

    # ------------------------------------------------------------- C --
    B8 = jnp.asarray(
        np.clip(rng.standard_normal((K, 512)) * 40, -127, 127), jnp.int8)
    cell("C gather int8 S=1M", lambda b: b[idx], B8, S * 512)
    cell("C gather int8 S=256k", lambda b: b[idx256], B8, (1 << 18) * 512)

    # ------------------------------------------------------------- B --
    from sparta_tpu.formats.csr import rmat_csr
    from sparta_tpu.ops.fine import DedupDevice, dedup_spmm

    m = rmat_csr(15, edge_factor=8, seed=1)
    Bf = jnp.asarray(rng.standard_normal((m.cols, 2048)), dtype=jnp.bfloat16)
    flops = 2 * m.nnz * 2048
    for R in (128, 256):
        dev = DedupDevice.from_csr(m, dtype=jnp.bfloat16, tile_rows=R)
        log(f"B rmat15 R={R}: slots={dev.n_slots} nnz={m.nnz}")
        out[f"B_slots_R{R}"] = dev.n_slots
        cell(f"B dedup rmat15 R={R}",
             lambda b, d=dev: dedup_spmm(d, b), Bf, flops)
        cell(f"B dedup_int8 rmat15 R={R}",
             lambda b, d=dev: dedup_spmm(d, b, b_int8=True), Bf, flops)
        del dev

    print(json.dumps(out))


if __name__ == "__main__":
    main()

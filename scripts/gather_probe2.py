"""Gather-rate calibration grid: rate(table_bytes, n_idx) for B[idx].

VERDICT r4 missing #2: the fine/dedup cost model keyed the 223-vs-90 GB/s
gather fork on index count (S) alone, but fine_probe2 measured 59.8 GB/s
at S=256k on a K=131072 table (128 MB) where the original gather_probe
grid (K=65536, 64 MB) measured 223 — the rate depends on TABLE size too
(plausibly row-reuse: S random indices over K rows re-hit each row S/K
times on average, and re-hits appear to ride a faster path).

This probe measures the full surface the model needs:

  - bf16 512-col slabs (rowbytes=1024, the fine/dedup production gather):
    K in {32k..512k} x S in {64k, 256k, 1M}
  - int8 512-col slabs (rowbytes=512, the b_int8 variant):
    K in {64k, 131k, 512k} x S in {256k, 1M}
  - diagnostic: same table BYTES at different rowbytes (K=262144 x 256
    cols vs K=131072 x 512 cols, both 128 MB) to separate table-bytes
    from row-count dependence
  - control: contiguous device-to-device copy of a 512 MB slab (HBM peak
    anchor for the 'gathers can never beat this' sanity bound)

Output feeds GATHER_RATE_GRID in sparta_tpu/ops/fine.py (gather_bps()).
Usage: python scripts/gather_probe2.py [--quick]
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
    ap.add_argument("--out", default="results/gather_probe2.json")
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
    outp = Path(args.out)
    outp.parent.mkdir(parents=True, exist_ok=True)

    def cell(name, fn, arg, bytes_moved, reps=2):
        try:
            avg, std, _ = time_op(fn, arg, warmup=1, reps=reps)
            gbps = bytes_moved / avg / 1e9
            log(f"{name:32}: {avg*1e3:9.3f} ms  {gbps:7.1f} GB/s")
            out[name] = {"ms": round(avg * 1e3, 4), "gbps": round(gbps, 1)}
            write_result(outp, out, quick=args.quick, hw_only=True)
            return gbps
        except Exception as e:  # noqa: BLE001 — grid cell, non-fatal
            log(f"{name:32}: FAILED {type(e).__name__}: {str(e)[:160]}")
            out[name] = {"error": str(e)[:160]}
            write_result(outp, out, quick=args.quick, hw_only=True)
            return None

    # HBM peak anchor: contiguous copy (read + write) of a big slab
    big = jnp.asarray(rng.standard_normal((1 << 17, 512)), jnp.bfloat16)
    cell("copy 128MB contiguous", lambda b: b + 0, big, 2 * big.nbytes)

    Ks = (1 << 15, 1 << 16, 1 << 17) if args.quick else (
        1 << 15, 1 << 16, 1 << 17, 1 << 18, 1 << 19)
    Ss = (1 << 16, 1 << 18) if args.quick else (1 << 16, 1 << 18, 1 << 20)

    # --- bf16 512-col slabs: the production fine/dedup gather shape ---
    grid_bf16 = {}
    for K in Ks:
        B = jnp.asarray(rng.standard_normal((K, 512)), jnp.bfloat16)
        mb = B.nbytes >> 20
        for S in Ss:
            idx = jnp.asarray(rng.integers(0, K, S), jnp.int32)
            g = cell(f"bf16 K={K>>10}k({mb}MB) S={S>>10}k",
                     lambda b, i=idx: b[i], B, S * 1024)
            if g:
                grid_bf16[f"{mb}MB"] = grid_bf16.get(f"{mb}MB", {})
                grid_bf16[f"{mb}MB"][f"S{S>>10}k"] = round(g, 1)
        del B
    out["grid_bf16_1KBrow"] = grid_bf16
    write_result(outp, out, quick=args.quick, hw_only=True)

    # --- int8 512-col slabs (rowbytes=512): the b_int8 gather ---
    grid_i8 = {}
    for K in ((1 << 16, 1 << 17) if args.quick else
              (1 << 16, 1 << 17, 1 << 19)):
        B8 = jnp.asarray(
            np.clip(rng.standard_normal((K, 512)) * 40, -127, 127), jnp.int8)
        mb = B8.nbytes >> 20
        for S in ((1 << 18,) if args.quick else (1 << 18, 1 << 20)):
            idx = jnp.asarray(rng.integers(0, K, S), jnp.int32)
            g = cell(f"int8 K={K>>10}k({mb}MB) S={S>>10}k",
                     lambda b, i=idx: b[i], B8, S * 512)
            if g:
                grid_i8[f"{mb}MB"] = grid_i8.get(f"{mb}MB", {})
                grid_i8[f"{mb}MB"][f"S{S>>10}k"] = round(g, 1)
        del B8
    out["grid_int8_512Brow"] = grid_i8
    write_result(outp, out, quick=args.quick, hw_only=True)

    # --- diagnostic: 128 MB table at 256 cols (rowbytes=512, bf16) vs the
    # 512-col K=131072 cell above — same bytes, 2x rows.  If these match
    # per-BYTE, table BYTES is the axis; if they match per-ROW, row count.
    if not args.quick:
        K = 1 << 18
        B = jnp.asarray(rng.standard_normal((K, 256)), jnp.bfloat16)
        for S in (1 << 18, 1 << 20):
            idx = jnp.asarray(rng.integers(0, K, S), jnp.int32)
            cell(f"bf16x256 K=256k(128MB) S={S>>10}k",
                 lambda b, i=idx: b[i], B, S * 512)
        del B

    # --- narrow-slab mitigation cells (r5: _pick_slab now narrows the
    # slab so the table stays <= 64 MB — these are the cells that
    # validate it): bf16 256-col at 64/32 MB and bf16 128-col at 64 MB
    for K, cols in (((1 << 17), 256), ((1 << 16), 256), ((1 << 18), 128)):
        B = jnp.asarray(rng.standard_normal((K, cols)), jnp.bfloat16)
        mb = B.nbytes >> 20
        for S in ((1 << 18,) if args.quick else (1 << 18, 1 << 20)):
            idx = jnp.asarray(rng.integers(0, K, S), jnp.int32)
            cell(f"bf16x{cols} K={K>>10}k({mb}MB) S={S>>10}k",
                 lambda b, i=idx: b[i], B, S * cols * 2)
        del B

    print(json.dumps(out))


if __name__ == "__main__":
    main()

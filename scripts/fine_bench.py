"""Real-hardware benchmark for the fine-grained SpMM paths (ops/fine.py)
on the shapes where blocking loses: the reference's two power-law real
graphs plus the scale-17 RMAT negative-result case from graph_bench.

For each matrix at N=2048 bf16 measures:
  - bcoo     : the jax.experimental.sparse scatter baseline (round-2 status quo)
  - fell     : pure-XLA virtual-row ELL + sorted segment_sum
  - fine     : slab gather + Pallas mask-matmul combine (production path)
  - auto     : whatever csr_spmm_auto now picks (name recorded)

Writes results/fine_bench.json.  Usage: python scripts/fine_bench.py [--quick]
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
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--out", default="results/fine_bench.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sparta_tpu.bench.device import wait_for_device
    from sparta_tpu.bench.timing import time_op
    from sparta_tpu.datasets import load_reference_graph
    from sparta_tpu.formats.csr import rmat_csr
    from sparta_tpu.ops import (
        FellDevice,
        FineDevice,
        bcoo_spmm,
        csr_spmm_auto,
        csr_to_bcoo,
        fell_spmm,
        fine_spmm,
    )

    wait_for_device()
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    N = args.n
    out = {"n_cols": N, "dtype": "bfloat16"}

    targets = []
    for name in ("ia-wikiquote-user-edits-nodup", "social_location"):
        try:
            targets.append((name, load_reference_graph(name)))
        except FileNotFoundError as e:
            log(f"skip {name}: {e}")
    if not args.quick:
        targets.append(("rmat17_ef8", rmat_csr(17, edge_factor=8, seed=1)))

    for name, m in targets:
        log(f"\n=== {name}: {m.rows}x{m.cols} nnz={m.nnz} "
            f"fill={m.nnz/(m.rows*m.cols):.5%}")
        row = {"rows": m.rows, "cols": m.cols, "nnz": m.nnz}
        flops = 2 * m.nnz * N
        B = jnp.asarray(rng.standard_normal((m.cols, N)), dtype=jnp.bfloat16)
        want = np.asarray(m.to_scipy() @ np.asarray(B, np.float32))
        denom = np.abs(want).max() + 1e-9

        def cell(tag, fn, check=True):
            try:
                if check:
                    got = np.asarray(fn(B), np.float32)[: m.rows]
                    err = np.abs(got - want).max() / denom
                    assert err < 5e-2, f"{tag} relerr {err:.2e}"
                avg, std, _ = time_op(fn, B, reps=3)
                log(f"  {tag:10}: {avg*1e3:9.3f} ms  "
                    f"{flops/avg/1e12:6.2f} TF/s  (std {std*1e3:.3f})")
                row[tag] = {"ms": round(avg * 1e3, 3),
                            "tflops": round(flops / avg / 1e12, 3)}
                return avg
            except Exception as e:  # noqa: BLE001
                log(f"  {tag:10}: FAILED {type(e).__name__}: {str(e)[:200]}")
                row[tag] = {"error": str(e)[:200]}
                return None

        A = csr_to_bcoo(m, dtype=jnp.bfloat16)
        t_bcoo = cell("bcoo", lambda b: bcoo_spmm(A, b))
        del A

        fdev = FellDevice.from_csr(m, dtype=jnp.bfloat16)
        row["fell_width"] = fdev.width
        t_fell = cell("fell", lambda b: fell_spmm(fdev, b))
        del fdev

        dev = FineDevice.from_csr(m, dtype=jnp.bfloat16)
        t_fine = cell("fine", lambda b: fine_spmm(dev, b))
        del dev

        fn, picked, _ = csr_spmm_auto(m, N, dtype=jnp.bfloat16)
        row["auto_pick"] = picked
        cell("auto", fn)

        if t_bcoo and t_fine:
            row["fine_vs_bcoo"] = round(t_bcoo / t_fine, 2)
            log(f"  fine vs bcoo: {row['fine_vs_bcoo']}x")
        if t_bcoo and t_fell:
            row["fell_vs_bcoo"] = round(t_bcoo / t_fell, 2)
        out[name] = row

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()

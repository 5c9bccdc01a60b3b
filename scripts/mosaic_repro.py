"""Minimal on-device repro for the fine/dedup Mosaic compile failure seen
in fine_bench r4 (remote_compile HTTP 500, helper exit 1).

Runs each fine-family kernel at a tiny shape, then at the failing graph's
shape, printing the first full traceback it can extract.

Usage: python scripts/mosaic_repro.py [--stage N]
"""
from __future__ import annotations

import argparse
import sys
import traceback
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graph", default="ia-wikiquote-user-edits-nodup")
    args = ap.parse_args()

    from sparta_tpu.bench.device import require_device

    require_device()
    import jax
    import jax.numpy as jnp

    from sparta_tpu.datasets import load_reference_graph
    from sparta_tpu.formats.csr import rmat_csr
    from sparta_tpu.ops.fine import (
        DedupDevice,
        FineDevice,
        dedup_spmm,
        fine_spmm,
    )

    log(f"devices: {jax.devices()}")

    def cell(tag, fn):
        try:
            out = fn()
            out.block_until_ready()
            log(f"{tag}: OK {out.shape}")
            return True
        except Exception:
            log(f"{tag}: FAILED")
            tb = traceback.format_exc()
            log(tb[:4000])
            return False

    # stage 1: tiny synthetic through both kernels
    m_small = rmat_csr(10, edge_factor=4, seed=3)
    B1 = jnp.asarray(
        np.random.default_rng(0).standard_normal((m_small.cols, 256)),
        dtype=jnp.bfloat16)
    fd = FineDevice.from_csr(m_small, dtype=jnp.bfloat16)
    cell("fine_small", lambda: fine_spmm(fd, B1))
    dd = DedupDevice.from_csr(m_small, dtype=jnp.bfloat16)
    cell("dedup_small", lambda: dedup_spmm(dd, B1))

    # stage 2: the failing graph
    m = load_reference_graph(args.graph)
    B = jnp.asarray(
        np.random.default_rng(0).standard_normal((m.cols, 2048)),
        dtype=jnp.bfloat16)
    fd2 = FineDevice.from_csr(m, dtype=jnp.bfloat16)
    cell("fine_graph", lambda: fine_spmm(fd2, B))
    dd2 = DedupDevice.from_csr(m, dtype=jnp.bfloat16)
    cell("dedup_graph", lambda: dedup_spmm(dd2, B))


if __name__ == "__main__":
    main()

"""Compile-and-run the fused RDMA ring kernel on the real chip (n=1 ring).

One chip can't exercise the RDMA hops, but an n=1 ring compiles the FULL
kernel through Mosaic (VMEM slots, fp32 accumulator, per-row out DMAs,
the credit-protocol code paths are present but the s < n-1 sends never
fire) — catching any compiled-lowering issue the interpret-mode tests
can't see, and timing the resident-A single-kernel walk against the
standard unrolled kernel on the same matrix.

Usage: python scripts/ring_kernel_probe.py [--quick]
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
    ap.add_argument("--out", default="results/ring_kernel_probe.json")
    args = ap.parse_args()

    import jax

    from sparta_tpu.bench.device import require_device

    require_device()
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sparta_tpu.bench.timing import time_op
    from sparta_tpu.formats import bell_from_csr, random_block_csr
    from sparta_tpu.ops import (
        bell_spmm_pallas_compact_unrolled,
        compact_auto_chunk,
        compact_from_host_padded,
    )
    from sparta_tpu.parallel import (
        make_mesh,
        shard_bell_rowwise,
        spmm_ring_pallas,
    )

    log(f"devices: {jax.devices()}")
    if args.quick:
        n_, N = 1024, 256
    else:
        # N=512 keeps the n=1 stress case (everything resident on ONE
        # chip: slots + pbuf + output all full-size) inside the raised
        # 112 MB vmem cap for BOTH kernels; real rings divide by n
        n_, N = 4096, 512
    m = random_block_csr(n_, n_, block=128, block_density=0.15,
                         intra_density=0.3, seed=7, shuffle_rows=False)
    bell = bell_from_csr(m, None, block_row_size=128)
    dtype = jnp.bfloat16
    mesh = make_mesh(1)
    dev = shard_bell_rowwise(bell, mesh, dtype=dtype)
    rng = np.random.default_rng(0)
    B = jnp.asarray(rng.standard_normal((bell.shape[1], N)), dtype=dtype)
    Bcol = jax.device_put(B, NamedSharding(mesh, P(None, "x")))
    C_ref = m.to_scipy() @ np.asarray(B, np.float32)[: m.cols]

    out = {"rows": n_, "N": N, "nzblocks": int(bell.total_nzblocks)}
    C = np.asarray(spmm_ring_pallas(dev, Bcol, mesh))
    err = np.abs(C[: m.rows] - C_ref).max() / (np.abs(C_ref).max() + 1e-9)
    log(f"n=1 fused ring correctness rel_err: {err:.2e}")
    out["rel_err"] = float(err)
    assert err < 5e-2, f"fused ring WRONG on chip: {err}"

    # the COLLECTIVE body (global barrier + collective_id + credit
    # semaphore signal/wait, self-targeted and balanced at n=1): this is
    # the code a pod slice runs — Mosaic must compile and execute it
    # (r5: the unexercised version failed right here with
    # "collective_id has to be unspecified or None...")
    Cx = np.asarray(spmm_ring_pallas(dev, Bcol, mesh,
                                     exercise_collective=True))
    err_x = np.abs(Cx[: m.rows] - C_ref).max() / (np.abs(C_ref).max()
                                                  + 1e-9)
    log(f"n=1 ring COLLECTIVE-body correctness rel_err: {err_x:.2e}")
    out["collective_rel_err"] = float(err_x)
    assert err_x < 5e-2, f"collective ring body WRONG on chip: {err_x}"

    flops = 2 * bell.total_nzblocks * 128 * 128 * N
    avg, std, _ = time_op(lambda b: spmm_ring_pallas(dev, b, mesh), Bcol,
                          warmup=1, reps=3)
    out["ring_us"] = round(avg * 1e6, 1)
    out["ring_tfs"] = round(flops / avg / 1e12, 2)
    log(f"fused ring (n=1): {avg*1e6:9.1f} us ({out['ring_tfs']} TF/s)")

    # the reduce-scatter dual, n=1 (compute + final copy, no RDMA hops)
    from sparta_tpu.parallel import (
        pad_block_rows,
        split_bell_cols,
        spmm_reduce_scatter_pallas,
    )

    bell_p = pad_block_rows(bell, 1)
    ci, nb, v, k_part = split_bell_cols(bell_p, 1)
    Bp = np.zeros((k_part * 128, N), np.float32)
    Bp[: bell.shape[1]] = np.asarray(B, np.float32)
    rs_in = (jnp.asarray(ci), jnp.asarray(nb),
             jnp.asarray(v, dtype=dtype),
             jnp.asarray(Bp.reshape(1, k_part * 128, N), dtype=dtype))
    Crs = np.asarray(spmm_reduce_scatter_pallas(*rs_in, mesh))
    err_rs = np.abs(Crs[: m.rows] - C_ref).max() / (np.abs(C_ref).max()
                                                    + 1e-9)
    log(f"n=1 fused reduce-scatter correctness rel_err: {err_rs:.2e}")
    out["rs_rel_err"] = float(err_rs)
    assert err_rs < 5e-2, f"fused reduce-scatter WRONG on chip: {err_rs}"
    Crsx = np.asarray(spmm_reduce_scatter_pallas(
        *rs_in, mesh, exercise_collective=True))
    err_rsx = np.abs(Crsx[: m.rows] - C_ref).max() / (np.abs(C_ref).max()
                                                      + 1e-9)
    log(f"n=1 reduce-scatter COLLECTIVE-body rel_err: {err_rsx:.2e}")
    out["rs_collective_rel_err"] = float(err_rsx)
    assert err_rsx < 5e-2, f"collective rs body WRONG on chip: {err_rsx}"
    avg_rs, _, _ = time_op(
        lambda b: spmm_reduce_scatter_pallas(rs_in[0], rs_in[1], rs_in[2],
                                             b, mesh), rs_in[3],
        warmup=1, reps=3)
    out["rs_us"] = round(avg_rs * 1e6, 1)
    out["rs_tfs"] = round(flops / avg_rs / 1e12, 2)
    log(f"fused reduce-scatter (n=1): {avg_rs*1e6:9.1f} us "
        f"({out['rs_tfs']} TF/s)")

    chunk = compact_auto_chunk(bell.nb_row)
    cpad = compact_from_host_padded(bell, chunk, dtype=dtype)
    avg2, _, _ = time_op(
        lambda b: bell_spmm_pallas_compact_unrolled(
            cpad, b, tn=256 if N % 256 == 0 else 128, chunk=chunk),
        B, warmup=1, reps=3)
    out["unrolled_us"] = round(avg2 * 1e6, 1)
    out["unrolled_tfs"] = round(flops / avg2 / 1e12, 2)
    log(f"unrolled baseline: {avg2*1e6:9.1f} us ({out['unrolled_tfs']} TF/s)")

    from sparta_tpu.bench.results import write_result
    write_result(args.out, out, quick=args.quick, hw_only=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Sweep all bell SpMM kernel variants at the headline bench shape (real TPU).

Each case runs in its own subprocess so a kernel fault (e.g. VMEM OOM taking
down the TPU worker) doesn't kill the remaining cases; between cases we wait
for the tunnel/worker to come back.

Usage: python scripts/kernel_sweep3.py [--n 10240] [--bcols 2048]
"""
from __future__ import annotations

import argparse
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CASE_SRC = """
import sys, time
sys.path.insert(0, {repo!r})
import numpy as np
import jax, jax.numpy as jnp
from sparta_tpu.bench.timing import time_op
from sparta_tpu.bench.tau import search_tau
from sparta_tpu.formats import bell_from_csr, random_block_csr
from sparta_tpu.ops import (BellDevice, bell_spmm_pallas,
                            bell_spmm_pallas_bcache, bell_spmm_xla)
from sparta_tpu.ops.bell_compact import BellCompactDevice, bell_spmm_pallas_compact

dtype = jnp.bfloat16 if {dtype!r} == "bfloat16" else jnp.float32
n, block, N = {n}, 128, {bcols}
m = random_block_csr(n, n, block=block, block_density={bdens}, intra_density=0.13, seed=7)
res = search_tau(m, block, block, taus=(0.5, 0.3))
bell = bell_from_csr(m, res.grouping, block_row_size=block)
dev = BellDevice.from_host(bell, dtype=dtype)
cdev = BellCompactDevice.from_host(bell, dtype=dtype)
B = jnp.asarray(np.random.default_rng(0).standard_normal((bell.shape[1], N)), dtype=dtype)
flops = 2 * bell.total_nzblocks * block * block * N
kind, tn = {kind!r}, {tn}
fn = dict(
    xla=lambda b: bell_spmm_xla(dev, b),
    gather=lambda b: bell_spmm_pallas(dev, b, tn=tn),
    bcache=lambda b: bell_spmm_pallas_bcache(dev, b, tn=tn),
    compact=lambda b: bell_spmm_pallas_compact(cdev, b, tn=tn),
)[kind]
avg, std, _ = time_op(fn, B, warmup=1, reps=3)
print(f"RESULT {{avg*1e3:.4f}} ms {{flops/avg/1e12:.2f}} TFLOP/s std={{std*1e3:.4f}}")
"""


def wait_for_device(max_wait=1200):
    t0 = time.time()
    while time.time() - t0 < max_wait:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp;"
             "x = jnp.ones((256, 256)); print(float((x @ x)[0, 0]))"],
            capture_output=True, timeout=300,
        )
        if r.returncode == 0:
            return True
        time.sleep(30)
    return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10240)
    ap.add_argument("--bcols", type=int, default=2048)
    ap.add_argument("--bdens", type=float, default=0.08)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    cases = [("xla", 0)]
    cases += [("gather", tn) for tn in (256, 512, 1024, 2048)
              if args.bcols % tn == 0]
    # bcache tn must satisfy K*tn*item + pipeline copies <= ~16MB scoped vmem
    cases += [("bcache", tn) for tn in (128, 256)
              if args.bcols % tn == 0 and args.n * tn * 2 * 1.6 < 16e6]
    cases += [("compact", tn) for tn in (128, 256, 512)
              if args.bcols % tn == 0]

    for kind, tn in cases:
        if not wait_for_device():
            print(f"{kind} tn={tn}: DEVICE UNAVAILABLE", flush=True)
            continue
        src = CASE_SRC.format(repo=str(REPO), n=args.n, bcols=args.bcols,
                              bdens=args.bdens, dtype=args.dtype,
                              kind=kind, tn=tn)
        t0 = time.time()
        r = subprocess.run([sys.executable, "-c", src], capture_output=True,
                           text=True, timeout=900)
        line = next((ln for ln in r.stdout.splitlines()
                     if ln.startswith("RESULT")), None)
        if line:
            print(f"{kind:8s} tn={tn:5d}: {line[7:]}  "
                  f"(wall {time.time()-t0:.0f}s)", flush=True)
        else:
            err = (r.stderr.strip().splitlines() or ["?"])[-1]
            print(f"{kind:8s} tn={tn:5d}: FAILED {err[:200]}", flush=True)


if __name__ == "__main__":
    main()

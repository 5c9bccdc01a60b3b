"""Focused kernel sweep: gather kernel tile sizes + XLA path, N in {2048, 8192}.
Single process; JSON lines to results/kernel_sweep.jsonl."""
import json, sys, time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
OUT = Path(__file__).resolve().parent.parent / "results" / "kernel_sweep.jsonl"


def wait_for_device(max_wait=1200):
    t0 = time.time()
    while time.time() - t0 < max_wait:
        try:
            import jax, jax.numpy as jnp
            x = jnp.ones((256, 256)); float((x @ x)[0, 0])
            return True
        except Exception:
            time.sleep(30)
    return False


def main():
    assert wait_for_device()
    import jax.numpy as jnp
    import numpy as np
    from sparta_tpu.formats import random_block_csr, bell_from_csr
    from sparta_tpu.bench.tau import search_tau
    from sparta_tpu.ops import BellDevice, bell_spmm_pallas, bell_spmm_xla
    from sparta_tpu.bench.timing import time_op

    def record(**kw):
        kw["ts"] = time.time()
        with open(OUT, "a") as f:
            f.write(json.dumps(kw) + "\n")
        print(kw, file=sys.stderr, flush=True)

    m = random_block_csr(10240, 10240, block=128, block_density=0.08,
                         intra_density=0.13, seed=7)
    res = search_tau(m, 128, 128, taus=(0.3,))
    bell = bell_from_csr(m, res.grouping, block_row_size=128)
    dt = jnp.bfloat16
    gdev = BellDevice.from_host(bell, dtype=dt)
    for N in (2048, 8192):
        B = jnp.asarray(np.random.default_rng(0).standard_normal(
            (bell.shape[1], N)), dtype=dt)
        flops = 2 * bell.total_nzblocks * 128 * 128 * N
        cfgs = [("bell_xla", lambda b: bell_spmm_xla(gdev, b))]
        for tn in (512, 1024, 2048):
            if N % tn == 0:
                cfgs.append((f"gather_tn{tn}",
                             lambda b, tn=tn: bell_spmm_pallas(gdev, b, tn=tn)))
        for name, fn in cfgs:
            try:
                avg, std, _ = time_op(fn, B, reps=5)
                record(kernel=name, N=N, ms=avg*1e3, std_ms=std*1e3,
                       tflops_eff=flops/avg/1e12)
            except Exception as e:
                record(kernel=name, N=N, error=f"{type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()

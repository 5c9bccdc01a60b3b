"""Runs when the tunnel recovers: full bench + N=8192 kernel points +
timing validation. Appends to results/tpu_followup.jsonl."""
import json, subprocess, sys, time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
OUT = Path(__file__).resolve().parent.parent / "results" / "tpu_followup.jsonl"


def record(**kw):
    kw["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(kw, file=sys.stderr, flush=True)


def wait_for_device(max_wait=7200):
    t0 = time.time()
    while time.time() - t0 < max_wait:
        try:
            import jax, jax.numpy as jnp
            x = jnp.ones((256, 256)); float((x @ x)[0, 0])
            return True
        except Exception:
            time.sleep(60)
    return False


def main():
    if not wait_for_device():
        record(event="device never recovered")
        return
    record(event="device up")

    import jax.numpy as jnp
    import numpy as np
    from sparta_tpu.formats import random_block_csr, bell_from_csr
    from sparta_tpu.bench.tau import search_tau
    from sparta_tpu.ops import BellDevice, bell_spmm_pallas, bcoo_spmm, csr_to_bcoo
    from sparta_tpu.bench.timing import time_op

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
        for tn in (512, 1024):
            try:
                avg, std, _ = time_op(
                    lambda b, tn=tn: bell_spmm_pallas(gdev, b, tn=tn), B, reps=5)
                record(kernel=f"gather_tn{tn}", N=N, ms=avg*1e3, std_ms=std*1e3,
                       tflops_eff=flops/avg/1e12)
            except Exception as e:
                record(kernel=f"gather_tn{tn}", N=N,
                       error=f"{type(e).__name__}: {str(e)[:120]}")
                wait_for_device(1800)
        # CSR baseline at this N
        try:
            bcoo = csr_to_bcoo(m, dtype=dt)
            avg, std, _ = time_op(lambda b: bcoo_spmm(bcoo, b), B[: m.cols], reps=3)
            record(kernel="csr_bcoo", N=N, ms=avg*1e3, std_ms=std*1e3)
        except Exception as e:
            record(kernel="csr_bcoo", N=N, error=f"{type(e).__name__}: {str(e)[:120]}")
            wait_for_device(1800)

    # full bench for the headline
    try:
        out = subprocess.run([sys.executable, "bench.py"], capture_output=True,
                             timeout=900, text=True,
                             cwd=Path(__file__).resolve().parent.parent)
        record(event="bench_full", stdout=out.stdout.strip(),
               tail=out.stderr.strip().splitlines()[-4:])
    except Exception as e:
        record(event="bench_full_failed", error=str(e)[:200])


if __name__ == "__main__":
    main()

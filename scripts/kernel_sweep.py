"""Kernel perf sweep on the real TPU: all SpMM backends x tile sizes x dtypes.
Appends JSON lines to results/kernel_sweep.jsonl. Retries while the device
tunnel is flaky."""
import json, sys, time, traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
OUT = Path(__file__).resolve().parent.parent / "results" / "kernel_sweep.jsonl"


def wait_for_device(max_wait=1800):
    t0 = time.time()
    while time.time() - t0 < max_wait:
        try:
            import jax, jax.numpy as jnp
            x = jnp.ones((256, 256))
            float((x @ x)[0, 0])
            return True
        except Exception:
            time.sleep(30)
    return False


def main():
    if not wait_for_device():
        print("device never came up", file=sys.stderr)
        sys.exit(1)
    import jax, jax.numpy as jnp
    import numpy as np
    from sparta_tpu.formats import random_block_csr, bell_from_csr
    from sparta_tpu.bench.tau import search_tau
    from sparta_tpu.ops import BellDevice, bell_spmm_pallas, bell_spmm_xla
    from sparta_tpu.ops.bell_pallas import bell_spmm_pallas_bcache
    from sparta_tpu.ops.bell_compact import BellCompactDevice, bell_spmm_pallas_compact
    from sparta_tpu.bench.timing import time_op

    results = []

    def record(**kw):
        kw["ts"] = time.time()
        results.append(kw)
        with open(OUT, "a") as f:
            f.write(json.dumps(kw) + "\n")
        print(kw, file=sys.stderr)

    m = random_block_csr(10240, 10240, block=128, block_density=0.08,
                         intra_density=0.13, seed=7)
    res = search_tau(m, 128, 128, taus=(0.3,))
    bell = bell_from_csr(m, res.grouping, block_row_size=128)

    for N in (2048, 8192):
        for dts in ("bf16", "f32"):
            dt = jnp.bfloat16 if dts == "bf16" else jnp.float32
            gdev = BellDevice.from_host(bell, dtype=dt)
            cdev = BellCompactDevice.from_host(bell, dtype=dt)
            B = jnp.asarray(np.random.default_rng(0).standard_normal(
                (bell.shape[1], N)), dtype=dt)
            flops = 2 * bell.total_nzblocks * 128 * 128 * N
            cfgs = [("bell_xla", lambda b: bell_spmm_xla(gdev, b))]
            for tn in (256, 512, 1024):
                if N % tn:
                    continue
                cfgs.append((f"gather_tn{tn}",
                             lambda b, tn=tn: bell_spmm_pallas(gdev, b, tn=tn)))
                cfgs.append((f"compact_tn{tn}",
                             lambda b, tn=tn: bell_spmm_pallas_compact(cdev, b, tn=tn)))
                if 10240 * tn * jnp.dtype(dt).itemsize * 2 < 11e6:
                    cfgs.append((f"bcache_tn{tn}",
                                 lambda b, tn=tn: bell_spmm_pallas_bcache(gdev, b, tn=tn)))
            for name, fn in cfgs:
                for attempt in range(3):
                    try:
                        avg, std, _ = time_op(fn, B, reps=3)
                        record(kernel=name, N=N, dtype=dts, ms=avg * 1e3,
                               std_ms=std * 1e3, tflops_eff=flops / avg / 1e12)
                        break
                    except Exception as e:
                        err = f"{type(e).__name__}: {str(e)[:150]}"
                        if attempt == 2:
                            record(kernel=name, N=N, dtype=dts, error=err)
                        else:
                            time.sleep(20)
                            if not wait_for_device(600):
                                record(kernel=name, N=N, dtype=dts,
                                       error="device lost: " + err)
                                break


if __name__ == "__main__":
    main()
